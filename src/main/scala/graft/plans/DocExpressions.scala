package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native document-parsing expressions over [[graft.operators.Doc]]
  * (r17; the ParseDocument front door of a RAG flow): per-row
  * binary/string work, no UDF, pipelined with the scan. NULL in →
  * NULL out; a PDF outside the documented subset extracts "" rather
  * than throwing (the caller's failure route keys on emptiness). */

/** PDF bytes → text per the [[graft.operators.Doc.pdfText]] subset. */
case class PdfText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_pdf_text"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.operators.Doc.pdfText(
      input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Markdown → plain text per [[graft.operators.Doc.markdownText]]. */
case class MarkdownText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_markdown_text"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.operators.Doc.markdownText(
      input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DocExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def pdfText(c: Column): Column =
    ColumnBridge.column(PdfText(ColumnBridge.expression(c)))
  def markdownText(c: Column): Column =
    ColumnBridge.column(MarkdownText(ColumnBridge.expression(c)))
}
