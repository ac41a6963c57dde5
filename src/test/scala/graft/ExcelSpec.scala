package graft

import org.apache.spark.sql.functions._
import graft.operators.Records

/** ConvertExcelToCSV over a hand-assembled ECMA-376 container (zip +
  * XML written directly — INDEPENDENT of the parser under test, so
  * the gates prove the published format, not the implementation). */
class ExcelSpec extends SparkSpec {
  import spark.implicits._

  private def entry(zos: java.util.zip.ZipOutputStream, name: String, body: String): Unit = {
    zos.putNextEntry(new java.util.zip.ZipEntry(name))
    zos.write(body.getBytes("UTF-8"))
    zos.closeEntry()
  }

  /** Two sheets; sheet one exercises shared strings (plain + rich-run
    * + comma-quoting), numbers, inline strings, booleans, formula
    * strings, missing cells and a wholly absent row. */
  private def xlsxBytes(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    entry(zos, "[Content_Types].xml", "<Types/>") // present in real files; parser ignores
    entry(zos, "xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Data" sheetId="1" r:id="rId1"/>
        |<sheet name="Notes" sheetId="2" r:id="rId2"/></sheets></workbook>""".stripMargin)
    entry(zos, "xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    entry(zos, "xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">
        |<si><t>hello</t></si>
        |<si><r><t>wo</t></r><r><t>,rld</t></r></si></sst>""".stripMargin)
    entry(zos, "xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1">
        |  <c r="A1" t="s"><v>0</v></c>
        |  <c r="B1"><v>42</v></c>
        |  <c r="C1" t="inlineStr"><is><t>inl</t></is></c>
        |  <c r="D1" t="s"><v>1</v></c>
        |</row>
        |<row r="3">
        |  <c r="A3" t="b"><v>1</v></c>
        |  <c r="C3" t="str"><v>f</v></c>
        |</row>
        |</sheetData></worksheet>""".stripMargin)
    entry(zos, "xl/worksheets/sheet2.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1"><v>7.25</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    bos.toByteArray
  }

  test("all cell types, rich-run shared strings, quoting, row gaps") {
    val df = Seq((1L, xlsxBytes())).toDF("id", "content")
    val out = Records.excelToCsv(df, "content")
      .select("sheet", "csv").as[(String, String)].collect().toMap
    assert(out.keySet == Set("Data", "Notes"))
    assert(out("Data") ==
      "hello,42,inl,\"wo,rld\"\n" + // rich runs concatenate; comma quotes
      "\n" +                        // absent row 2 keeps line = row
      "true,,f\n")                  // bool renders, missing B3 renders empty
    assert(out("Notes") == "7.25\n") // numeric serials verbatim
  }

  test("sheet selection, row skip, column skip") {
    val df = Seq((1L, xlsxBytes())).toDF("id", "content")
    val one = Records.excelToCsv(df, "content", sheets = Seq("Notes"))
      .select("sheet").as[String].collect()
    assert(one.toSeq == Seq("Notes"))
    val skipped = Records.excelToCsv(df, "content", sheets = Seq("Data"),
        skipRows = 1, skipCols = Seq(2)) // drop spreadsheet column B
      .select("csv").as[String].head()
    assert(skipped == "\n" + "true,f\n") // row 1 gone; B3 was empty anyway
  }

  test("malformed payloads become a null failure row; empty zip yields none") {
    val df = Seq((1L, "not a zip".getBytes), (2L, xlsxBytes())).toDF("id", "content")
    val out = Records.excelToCsv(df, "content")
      .select("id", "csv").collect().map(r => (r.getLong(0), r.isNullAt(1)))
    assert(out.count(_ == (1L, true)) == 1)
    assert(out.count { case (id, n) => id == 2L && !n } == 2)
  }

  test("ConvertExcelToCSV compiles in a flow with native plan node") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "x", "type": "ConvertExcelToCSV",
        |     "properties": {"Sheets to Extract": "Data"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "x"}},
        |    {"source": {"id": "x"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val in = Seq((1L, xlsxBytes())).toDF("id", "content")
    val out = FlowCompiler.compile(spark, flow, Map("in" -> in))("out")
    assert(out.select("sheet").as[String].collect().toSeq == Seq("Data"))
    assert(out.queryExecution.executedPlan.toString.contains("graft_excel_to_csv"))
  }
}
