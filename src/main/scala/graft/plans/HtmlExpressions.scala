package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native HTML expressions over [[graft.operators.Html]] (r16; the
  * "curation from crawl bytes" stage-0): per-row string work, no UDF,
  * fully pipelined with the scan. All three return NULL on NULL input
  * and never throw on soup — crawl HTML is hostile by default. */

/** jusText main-content extraction (good blocks joined by '\n').
  * `useStoplist = false` selects the published no-stoplist mode
  * (stopLow = stopHigh = 0): classification by length + link density
  * only — the setting for non-English or synthetic corpora. */
case class HtmlMainText(child: Expression, useStoplist: Boolean = true,
                        lengthLow: Int = 70, lengthHigh: Int = 200,
                        maxLinkDensity: Double = 0.2)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_main_text"
  override protected def nullSafeEval(input: Any): Any = {
    val (lo, hi) = if (useStoplist) (0.30, 0.32) else (0.0, 0.0)
    UTF8String.fromString(graft.operators.Html.extractMainText(
      input.asInstanceOf[UTF8String].toString,
      graft.operators.Html.EnglishStopwords,
      lengthLow, lengthHigh, lo, hi, maxLinkDensity))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Full-text strip: all retained blocks (tags/scripts/styles/comments
  * removed, entities decoded, whitespace normalized) joined by '\n'. */
case class HtmlStripTags(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_strip"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.operators.Html.stripTags(
      input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** GetHTMLElement (NiFi html bundle): inner text of every element
  * matching a CSS-lite selector (`tag`, `#id`, `.class`, combinations,
  * `[attr=value]`), in document order. */
case class HtmlSelect(child: Expression, selector: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_html_select"
  override protected def nullSafeEval(input: Any): Any = {
    val hits = graft.operators.Html.selectText(
      input.asInstanceOf[UTF8String].toString, selector)
    new GenericArrayData(hits.map(UTF8String.fromString).toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points (the TextHashExpressions convention). */
object HtmlFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def mainText(c: Column, useStoplist: Boolean = true,
               lengthLow: Int = 70, lengthHigh: Int = 200,
               maxLinkDensity: Double = 0.2): Column =
    ColumnBridge.column(HtmlMainText(ColumnBridge.expression(c),
      useStoplist, lengthLow, lengthHigh, maxLinkDensity))

  def stripTags(c: Column): Column =
    ColumnBridge.column(HtmlStripTags(ColumnBridge.expression(c)))

  def selectText(c: Column, selector: String): Column =
    ColumnBridge.column(HtmlSelect(ColumnBridge.expression(c), selector))
}
