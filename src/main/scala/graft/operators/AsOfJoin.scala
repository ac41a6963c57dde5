package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the right row with the
  * greatest timestamp ≤ the left row's timestamp, per key — the
  * event-enrichment operator Spark has no native form for (DuckDB/kdb
  * ASOF JOIN, pandas merge_asof).
  *
  * Scale design: NOT a range cross-join. Both sides are tagged and
  * UNIONed, then a single per-key window (`last_value ignoreNulls` over
  * rows-unbounded-preceding, ordered by (ts, side)) carries the latest
  * right payload forward onto each left row. One shuffle on the key,
  * state O(1) per row — survives arbitrarily large sides and arbitrary
  * time skew, unlike bucketed range joins.
  */
object AsOfJoin {

  /** Backward as-of join.
    *
    * @param left     left rows (enrichment targets)
    * @param right    right rows (lookup stream)
    * @param keyCols  equi-join key shared by both sides
    * @param leftTs   left ordering column (numeric or timestamp)
    * @param rightTs  right ordering column, same type/scale as leftTs
    * @param rightPayload right columns to attach (prefixed `asof_`)
    *
    * Right rows tied on (key, ts) must be pre-deduplicated if a
    * deterministic winner is required.
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // unified schema: key, ts, side, left payload (nulls on right rows),
    // right payload (nulls on left rows)
    val leftPayload = leftCols.filterNot(c => keyCols.contains(c) || c == leftTs)
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(s"asof_$c")): _*)
    // at equal ts the right row sorts first (__side 0 < 1) → "≤" semantics
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
      .withColumnRenamed("__ts", leftTs)
  }

  /** Convenience: Column-based payload selection on the result. */
  def payloadCol(name: String): Column = col(s"asof_$name")
}
