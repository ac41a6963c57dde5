package graft.plans

import java.io.ByteArrayInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ConvertExcelToCSV (NiFi `ConvertExcelToCSVProcessor`): convert each
  * sheet of an XLSX payload to RFC-4180 CSV — one output element per
  * sheet. No POI exists offline, and none is needed: XLSX is a zip of
  * well-documented XML parts (ECMA-376), so this parses the container
  * directly with the JDK — zip via `ZipInputStream`, parts via StAX
  * (DTD + external entities disabled: spreadsheet payloads are
  * untrusted input and must not XXE). Parts consumed: `xl/workbook.xml`
  * (sheet names + relationship ids), `xl/_rels/workbook.xml.rels`
  * (id → worksheet part), `xl/sharedStrings.xml` (string table,
  * rich-text runs concatenated), `xl/worksheets/sheetN.xml` (cells).
  *
  * Cell semantics (the ECMA-376 `t` attribute): `s` = shared-string
  * index, `inlineStr` = inline `<is><t>`, `str` = formula result
  * string, `b` = boolean (rendered true/false), default = the raw
  * `<v>` text. Numbers and date serials pass through VERBATIM — the
  * deterministic analog of NiFi's Format-Cell-Values=false default
  * (locale-dependent re-formatting would break byte-stable output).
  * Missing cells inside a row render empty; wholly absent row numbers
  * render as empty lines, so CSV line N is spreadsheet row N+skip.
  * Fields containing comma/quote/CR/LF are quoted with doubled quotes.
  *
  * Like every payload expression here ([[AvroSplit]], zipEntries):
  * per-sheet work inside ONE CodegenFallback expression, array output
  * exploded by the operator wrapper, malformed payloads degrade to an
  * EMPTY array (route on zero sheets for NiFi's failure relationship).
  *
  * @param sheets    sheet names to extract; empty = all sheets
  * @param skipRows  leading spreadsheet rows dropped per sheet
  * @param skipCols  1-based spreadsheet column numbers dropped (NiFi's
  *                  Columns To Skip)
  */
case class ExcelToCsv(child: Expression, sheets: Seq[String],
                      skipRows: Int, skipCols: Seq[Int])
    extends UnaryExpression with CodegenFallback {
  require(skipRows >= 0, "ExcelToCsv: skipRows must be >= 0")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sheet", StringType, nullable = false),
    StructField("csv", StringType, nullable = false))))
  override def prettyName: String = "graft_excel_to_csv"

  @transient private lazy val wanted: Set[String] = sheets.toSet
  @transient private lazy val dropCols: Set[Int] = skipCols.map(_ - 1).toSet
  @transient private lazy val xif: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      // one pass over the zip: collect the parts we need by name
      val parts = scala.collection.mutable.Map.empty[String, Array[Byte]]
      val zin = new java.util.zip.ZipInputStream(new ByteArrayInputStream(bytes))
      var e = zin.getNextEntry
      while (e != null) {
        val n = e.getName
        if (n == "xl/workbook.xml" || n == "xl/_rels/workbook.xml.rels" ||
            n == "xl/sharedStrings.xml" || n.startsWith("xl/worksheets/")) {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var k = zin.read(buf)
          while (k >= 0) { bos.write(buf, 0, k); k = zin.read(buf) }
          parts(n) = bos.toByteArray
        }
        e = zin.getNextEntry
      }
      zin.close()
      val wb = parts.getOrElse("xl/workbook.xml",
        return new GenericArrayData(Array.empty[Any]))
      val shared = parts.get("xl/sharedStrings.xml").map(parseShared)
        .getOrElse(Array.empty[String])
      val rels = parts.get("xl/_rels/workbook.xml.rels").map(parseRels)
        .getOrElse(Map.empty[String, String])
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      parseWorkbook(wb).foreach { case (name, rid) =>
        if (wanted.isEmpty || wanted.contains(name)) {
          val target = rels.get(rid) match {
            case Some(t) => if (t.startsWith("/")) t.drop(1) else "xl/" + t
            case None => "" // rels part absent → skip (malformed container)
          }
          parts.get(target).foreach { sheetXml =>
            out += InternalRow(UTF8String.fromString(name),
              UTF8String.fromString(sheetToCsv(sheetXml, shared)))
          }
        }
      }
      new GenericArrayData(out.toArray)
    } catch {
      case _: java.io.IOException | _: javax.xml.stream.XMLStreamException |
           _: RuntimeException =>
        new GenericArrayData(Array.empty[Any]) // malformed → empty, never throw
    }
  }

  /** workbook.xml → (sheet name, relationship id) in authored order. */
  private def parseWorkbook(xml: Array[Byte]): Seq[(String, String)] = {
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(xml))
    val out = Seq.newBuilder[(String, String)]
    try while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        var name: String = null; var rid: String = null
        var i = 0
        while (i < r.getAttributeCount) {
          r.getAttributeLocalName(i) match {
            case "name" => name = r.getAttributeValue(i)
            case "id"   => rid = r.getAttributeValue(i) // r:id
            case _ =>
          }
          i += 1
        }
        if (name != null && rid != null) out += ((name, rid))
      }
    } finally r.close()
    out.result()
  }

  /** workbook.xml.rels → id → target part path (relative to xl/). */
  private def parseRels(xml: Array[Byte]): Map[String, String] = {
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(xml))
    val out = Map.newBuilder[String, String]
    try while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship") {
        var id: String = null; var target: String = null
        var i = 0
        while (i < r.getAttributeCount) {
          r.getAttributeLocalName(i) match {
            case "Id" => id = r.getAttributeValue(i)
            case "Target" => target = r.getAttributeValue(i)
            case _ =>
          }
          i += 1
        }
        if (id != null && target != null) out += (id -> target)
      }
    } finally r.close()
    out.result()
  }

  /** sharedStrings.xml → string table; rich-text runs concatenate (all
    * `<t>` text inside each `<si>`). */
  private def parseShared(xml: Array[Byte]): Array[String] = {
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(xml))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inSi = false; var inT = false
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        r.getLocalName match {
          case "si" => inSi = true; cur.setLength(0)
          case "t" if inSi => inT = true
          case _ =>
        }
      case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
        if (inT) cur.append(r.getText)
      case XMLStreamConstants.END_ELEMENT =>
        r.getLocalName match {
          case "t" => inT = false
          case "si" => inSi = false; out += cur.toString
          case _ =>
        }
      case _ =>
    } finally r.close()
    out.toArray
  }

  /** "BC12" → 0-based column index (54). */
  private def colOf(ref: String): Int = {
    var i = 0; var c = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    c - 1
  }

  private def csvField(s: String): String =
    if (s.exists(ch => ch == ',' || ch == '"' || ch == '\n' || ch == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def sheetToCsv(xml: Array[Byte], shared: Array[String]): String = {
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(xml))
    val sb = new StringBuilder
    var emittedRows = 0 // spreadsheet rows seen or gap-filled so far
    val cells = scala.collection.mutable.ArrayBuffer.empty[String]
    var rowNum = 0
    var cellCol = -1; var cellType = "n"; var inV = false; var inIs = false
    val v = new StringBuilder
    def renderRow(): Unit = {
      if (rowNum > skipRows) {
        // gap rows (and the first row after skip) keep CSV line = row
        while (emittedRows < rowNum - skipRows - 1) { sb.append('\n'); emittedRows += 1 }
        var lastIdx = cells.length - 1
        while (lastIdx >= 0 && cells(lastIdx).isEmpty) lastIdx -= 1
        var i = 0; var outIdx = 0
        while (i <= lastIdx) {
          if (!dropCols.contains(i)) {
            if (outIdx > 0) sb.append(',')
            sb.append(csvField(cells(i)))
            outIdx += 1
          }
          i += 1
        }
        sb.append('\n')
        emittedRows += 1
      }
      cells.clear()
    }
    def put(col: Int, value: String): Unit = {
      while (cells.length <= col) cells += ""
      cells(col) = value
    }
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        r.getLocalName match {
          case "row" =>
            rowNum = Option(r.getAttributeValue(null, "r")).map(_.toInt)
              .getOrElse(rowNum + 1)
          case "c" =>
            val ref = r.getAttributeValue(null, "r")
            cellCol = if (ref != null) colOf(ref) else cellCol + 1
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
            v.setLength(0)
          case "v" => inV = true
          case "is" => inIs = true
          case "t" if inIs => inV = true
          case _ =>
        }
      case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
        if (inV) v.append(r.getText)
      case XMLStreamConstants.END_ELEMENT =>
        r.getLocalName match {
          case "v" | "t" => inV = false
          case "is" => inIs = false
          case "c" =>
            val s = cellType match {
              case "s" =>
                val idx = v.toString.trim.toInt
                if (idx >= 0 && idx < shared.length) shared(idx) else ""
              case "b" => if (v.toString.trim == "1") "true" else "false"
              case _ => v.toString // n, str, inlineStr (accumulated via <t>)
            }
            if (cellCol >= 0 && s.nonEmpty) put(cellCol, s)
          case "row" => renderRow()
          case _ =>
        }
      case _ =>
    } finally r.close()
    sb.toString
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExcelExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def excelToCsv(c: Column, sheets: Seq[String] = Nil, skipRows: Int = 0,
                 skipCols: Seq[Int] = Nil): Column =
    ColumnBridge.column(ExcelToCsv(ColumnBridge.expression(c), sheets, skipRows, skipCols))
}
