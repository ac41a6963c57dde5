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

/** RecursiveCharacterTextSplitter chunks
  * ([[graft.operators.Retrieval.recursiveSplit]]): text →
  * array<string> of chunks ≤ chunkSize chars with ≤ overlap carryover.
  * Parameters are spec constants, validated at construction. */
case class RecursiveChunks(child: Expression, chunkSize: Int, overlap: Int,
                           separators: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
    s"RecursiveChunks: need 0 <= overlap < chunkSize, got $chunkSize/$overlap")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_recursive_chunks"
  override protected def nullSafeEval(input: Any): Any = {
    val chunks = graft.operators.Retrieval.recursiveSplit(
      input.asInstanceOf[UTF8String].toString, separators.toList, chunkSize, overlap)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      chunks.map(UTF8String.fromString).toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DocExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def pdfText(c: Column): Column =
    ColumnBridge.column(PdfText(ColumnBridge.expression(c)))
  def markdownText(c: Column): Column =
    ColumnBridge.column(MarkdownText(ColumnBridge.expression(c)))
  def recursiveChunks(c: Column, chunkSize: Int, overlap: Int,
                      separators: Seq[String]): Column =
    ColumnBridge.column(RecursiveChunks(ColumnBridge.expression(c),
      chunkSize, overlap, separators))
}
