package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters (the
  * Spark 4 unified Column API hides them). Lives under an o.a.s.sql
  * subpackage purely for access; graft code calls only these two. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The compile-time constant behind a `lit()` Column, if it is one
    * (the internal Literal node is `private[sql]`). */
  def literalValue(c: Column): Option[Any] = c.node match {
    case l: org.apache.spark.sql.internal.Literal => Option(l.value)
    case _ => None
  }
}
