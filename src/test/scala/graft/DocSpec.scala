package graft

import org.apache.spark.sql.functions._
import graft.operators.Doc

/** ParseDocument gates (r17, NiFi 2.x GenAI front door): the JDK-only
  * PDF subset extractor against bytes this spec constructs — both
  * through [[Doc.synthPdf]] (round-trip law) and HAND-WRITTEN PDF
  * fragments exercising grammar the synth never emits (TJ kerning
  * arrays, hex strings, escapes, multi-stream, unsupported filters) —
  * plus the CommonMark strip and the flow-node wiring. */
class DocSpec extends SparkSpec {
  import spark.implicits._

  test("pdf round-trip law: synthPdf -> pdfText is identity, raw and Flate") {
    val texts = Seq(
      "hello pdf world",
      "line one\nline two\nline three",
      "escapes: (parens) back\\slash and\ttab",
      "", // empty document
      "unicode: café — résumé")
    for (t <- texts; compress <- Seq(false, true)) {
      assert(Doc.pdfText(Doc.synthPdf(t, compress)) === t,
        s"round-trip (compress=$compress) for ${t.take(20)}")
    }
  }

  test("pdf grammar the synth never emits: TJ arrays, hex strings, quote ops, multi-stream") {
    def pdfWith(content: String): Array[Byte] = {
      val c = content.getBytes("ISO-8859-1")
      (s"%PDF-1.4\n4 0 obj\n<< /Length ${c.length} >>\nstream\n$content\nendstream\nendobj\n%%EOF\n")
        .getBytes("ISO-8859-1")
    }
    // TJ: strings concatenate, kerning numbers ignored
    assert(Doc.pdfText(pdfWith("BT [(Hel) -120 (lo) 30 ( world)] TJ ET")) === "Hello world",
      "TJ array concatenates its strings")
    // hex strings decode bytes
    assert(Doc.pdfText(pdfWith("BT <48656C6C6F> Tj ET")) === "Hello")
    // ' starts a new line then shows; " takes word/char spacing first
    assert(Doc.pdfText(pdfWith("BT (a) Tj (b) ' ET")) === "a\nb")
    assert(Doc.pdfText(pdfWith("BT (a) Tj 1 2 (b) \" ET")) === "a\nb")
    // octal escape; a lone backslash before an ordinary char drops
    assert(Doc.pdfText(pdfWith("BT (A\\101\\software) Tj ET")) === "AAsoftware")
    // Td/T* between shows break lines; text outside BT/ET is ignored
    assert(Doc.pdfText(pdfWith("(junk) Tj BT (x) Tj T* (y) Tj ET")) === "x\ny")
    // two content streams join with a newline
    val two = ("%PDF-1.4\n" +
      "4 0 obj\n<< /Length 12 >>\nstream\nBT (p1) Tj ET\nendstream\nendobj\n" +
      "6 0 obj\n<< /Length 12 >>\nstream\nBT (p2) Tj ET\nendstream\nendobj\n%%EOF\n")
      .getBytes("ISO-8859-1")
    assert(Doc.pdfText(two) === "p1\np2")
    // unsupported filter skips the stream instead of garbling
    val dct = ("%PDF-1.4\n4 0 obj\n<< /Length 4 /Filter /DCTDecode >>\n" +
      "stream\n\nendstream\nendobj\n%%EOF\n").getBytes("ISO-8859-1")
    assert(Doc.pdfText(dct) === "")
    // not a PDF at all -> "" (the failure route keys on emptiness)
    assert(Doc.pdfText("plain text".getBytes("UTF-8")) === "")
    assert(Doc.pdfText(Array.empty[Byte]) === "")
  }

  test("CID/Type0 fonts (r18): ToUnicode CMap decodes 2-byte show strings; bfranges; font tracking") {
    // round-trip: every distinct char CID-mapped, shows as hex strings
    val texts = Seq("hello cid world", "line one\nline two",
      "unicode: café — résumé ☕", "")
    for (t <- texts)
      assert(Doc.pdfText(Doc.synthPdfCid(t)) === t, s"CID round-trip for ${t.take(20)}")
    // bfrange parsing: contiguous form increments the last code unit;
    // array form maps each code to its own string; bfchar coexists
    val cmap =
      """1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfrange
        |<0010> <0012> <0041>
        |<0020> <0021> [<0058> <0059>]
        |endbfrange
        |1 beginbfchar
        |<0001> <00E9>
        |endbfchar""".stripMargin
    val m = Doc.parseToUnicodeCMap(cmap)
    assert(m(0x10) === "A" && m(0x11) === "B" && m(0x12) === "C")
    assert(m(0x20) === "X" && m(0x21) === "Y")
    assert(m(0x01) === "é")
    // multi-unit dst: one CID expanding to a two-char ligature
    val lig = Doc.parseToUnicodeCMap(
      "1 beginbfchar\n<0002> <00660069>\nendbfchar")
    assert(lig(0x02) === "fi")
    // font TRACKING: a content stream switching between a CID font and
    // a simple font decodes each show under the font in force
    val cidPdf = Doc.synthPdfCid("zq")
    val raw = new String(cidPdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    // 'z' is CID 1, 'q' is CID 2 in the fixture's distinct-char order
    val mixed = raw.replace("BT\n/F1 12 Tf\n14 TL\n72 720 Td\n<00010002> Tj\nET\n",
      "BT\n/F1 12 Tf\n14 TL\n72 720 Td\n<00010002> Tj\nT*\n" +
      "/F9 12 Tf\n(plain) Tj\nT*\n/F1 12 Tf\n<0002> Tj\nET\n")
    val fixed = mixed.replaceFirst("/Length \\d+ >>\\nstream",
      s"/Length 0 >>\nstream") // length is unused by the scanner
    assert(Doc.pdfText(fixed.getBytes("ISO-8859-1")) === "zq\nplain\nq",
      "Tf switches decode per font; unknown font names byte-decode")
    // unmapped CID contributes nothing (spec: undefined)
    val gap = raw.replace("<00010002> Tj", "<000100FF0002> Tj")
    assert(Doc.pdfText(gap.getBytes("ISO-8859-1")) === "zq")
  }

  test("PDF 1.5 layout (r18): ObjStm + xref stream round-trips; structure streams never garble text") {
    val texts = Seq("hello pdf 1.5", "line one\nline two", "", "café — résumé",
      ("long " * 2000).trim) // pushes the content stream past 10 KB
    for (t <- texts; compress <- Seq(false, true)) {
      assert(Doc.pdfText(Doc.synthPdf(t, compress, objectStreams = true)) === t,
        s"1.5 round-trip (compress=$compress) for ${t.take(20)}")
    }
    val pdf = Doc.synthPdf("anchor text", compress = true, objectStreams = true)
    // the xref STREAM parses: Flate + PNG Up predictor + /W [1 4 1]
    val entries = Doc.xrefStreamEntries(pdf)
    assert(entries.length === 8, "Size 8: objects 0..7")
    val byNum = entries.map(e => e.objNum -> e).toMap
    assert(byNum(0).entryType === 0, "obj 0 free")
    // type-1 rows carry real byte offsets: the content stream object
    // header actually LIVES at the recorded offset
    val raw = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(byNum(1).entryType === 1 &&
      raw.startsWith("1 0 obj", byNum(1).a.toInt), "content stream offset")
    assert(byNum(2).entryType === 1 &&
      raw.startsWith("2 0 obj", byNum(2).a.toInt), "ObjStm offset")
    // type-2 rows point into ObjStm 2 at indices 0..3
    assert((3 to 6).forall(n => byNum(n).entryType === 2 && byNum(n).a === 2L))
    assert((3 to 6).map(n => byNum(n).b) === Seq(0L, 1L, 2L, 3L))
    // the compressed objects parse out of the ObjStm
    val objs = Doc.objStmObjects(pdf)
    assert(objs.keySet === Set(3, 4, 5, 6))
    assert(objs(3).contains("/Type /Catalog"))
    assert(objs(5).contains("/Contents 1 0 R"))
    // an adversarial xref stream whose DECODED bytes spell text
    // operators must not leak into extraction (/Type /XRef skips)
    val evil = "BT (leaked) Tj ET".getBytes("ISO-8859-1")
    val evilPdf = ("%PDF-1.5\n1 0 obj\n<< /Length 12 >>\nstream\nBT (ok) Tj ET\nendstream\nendobj\n" +
      s"2 0 obj\n<< /Type /XRef /Size 3 /W [1 2 1] /Length ${evil.length} >>\nstream\n")
      .getBytes("ISO-8859-1") ++ evil ++ "\nendstream\nendobj\n%%EOF\n".getBytes("ISO-8859-1")
    assert(Doc.pdfText(evilPdf) === "ok", "XRef stream bytes never reach the text replayer")
    // same for an UNFILTERED ObjStm whose dict text could collide
    val stm = "3 0 << /X (BT (nope) Tj ET) >>"
    val objPdf = ("%PDF-1.5\n2 0 obj\n<< /Type /ObjStm /N 1 /First 4 " +
      s"/Length ${stm.length} >>\nstream\n$stm\nendstream\nendobj\n" +
      "1 0 obj\n<< /Length 12 >>\nstream\nBT (ok) Tj ET\nendstream\nendobj\n%%EOF\n")
      .getBytes("ISO-8859-1")
    assert(Doc.pdfText(objPdf) === "ok", "ObjStm bytes never reach the text replayer")
    // classic 1.4 files: xrefStreamEntries returns empty, never throws
    assert(Doc.xrefStreamEntries(Doc.synthPdf("classic")) === Seq.empty)
    assert(Doc.objStmObjects(Doc.synthPdf("classic")) === Map.empty)
  }

  test("nested /DecodeParms dict after /Filter still sniffs FlateDecode (r18 balanced scan)") {
    // lastIndexOf("<<") would pick the DecodeParms sub-dictionary and
    // hide /Filter, mis-treating compressed bytes as unfiltered text
    val content = "BT (nested) Tj ET".getBytes("ISO-8859-1")
    val d = new java.util.zip.Deflater()
    d.setInput(content); d.finish()
    val buf = new Array[Byte](256)
    val n = d.deflate(buf); d.end()
    val comp = java.util.Arrays.copyOf(buf, n)
    val head = (s"%PDF-1.4\n4 0 obj\n<< /Length ${comp.length} /Filter /FlateDecode " +
      "/DecodeParms << /Foo 1 >> >>\nstream\n").getBytes("ISO-8859-1")
    val tail = "\nendstream\nendobj\n%%EOF\n".getBytes("ISO-8859-1")
    assert(Doc.pdfText(head ++ comp ++ tail) === "nested")
  }

  test("failed stream-dict scan skips the stream instead of leaking bytes as text (r19, ADVICE)") {
    // a stream whose dictionary exceeds the lookback bound (a huge
    // /Index-style array) must NOT default to page content: without a
    // readable dict we can't rule out /Type /XRef or an unknown
    // /Filter, and the old "" -> plain-text path appended the raw
    // bytes to extracted text as garbage
    val hugeIndex = (0 until 20000).map(i => s"$i 1").mkString(" ") // ~100+ KB
    val pdf = (s"%PDF-1.5\n1 0 obj\n<< /Type /XRef /Index [ $hugeIndex ] /W [1 2 2] >>\n" +
      "stream\nBINARYTABLEBYTES\nendstream\nendobj\n" +
      "2 0 obj\n<< /Length 14 >>\nstream\nBT (keep) Tj ET\nendstream\nendobj\n%%EOF\n")
      .getBytes("ISO-8859-1")
    val text = Doc.pdfText(pdf)
    assert(!text.contains("BINARYTABLEBYTES"),
      s"unscannable-dict stream bytes leaked into text: '$text'")
    assert(text === "keep", "readable page streams still extract")
    // a dict-less stream (malformed) is likewise structural/unknown
    val noDict = ("%PDF-1.4\nstream\nGARBAGEBYTES\nendstream\n" +
      "2 0 obj\n<< /Length 12 >>\nstream\nBT (ok) Tj ET\nendstream\nendobj\n%%EOF\n")
      .getBytes("ISO-8859-1")
    assert(Doc.pdfText(noDict) === "ok")
  }

  test("markdown strip: headings, emphasis, links, code, quotes, lists, tables, HTML") {
    val md =
      """# Title
        |
        |Some **bold** and *starred* and _underscored_ text with `code span`.
        |
        |> a quote line
        |
        |- item one
        |- [label](http://example.com/path) trailing
        |1. numbered
        |
        |```
        |raw code **not emphasis**
        |```
        |
        || h1 | h2 |
        ||----|----|
        || a  | b  |
        |
        |![alt text](http://example.com/img.png) caption
        |<span>html drops</span> kept
        |
        |---
        |
        |[ref]: http://example.com/definition
        |tail""".stripMargin
    val plain = Doc.markdownText(md)
    assert(plain ===
      """Title
        |
        |Some bold and starred and underscored text with code span.
        |
        |a quote line
        |
        |item one
        |label trailing
        |numbered
        |
        |raw code **not emphasis**
        |
        |h1 h2
        |a b
        |
        |alt text caption
        |html drops kept
        |
        |tail""".stripMargin)
    assert(Doc.markdownText(null) == null)
    assert(Doc.markdownText("") === "")
  }

  test("flow node: ParseDocument routes each Input Format; bad format fails compile") {
    def flow(fmt: String) =
      s"""{"flowContents": {"name": "parse",
         |  "inputPorts": [{"identifier": "in", "name": "docs"}],
         |  "outputPorts": [{"identifier": "out", "name": "parsed"}],
         |  "processors": [
         |    {"identifier": "p", "name": "Parser",
         |     "type": "org.apache.nifi.processors.parsedocument.ParseDocument",
         |     "properties": {"Content Column": "payload",
         |                    "Output Column": "text", "Input Format": "$fmt"}}],
         |  "connections": [
         |    {"source": {"id": "in"}, "destination": {"id": "p"}},
         |    {"source": {"id": "p"}, "destination": {"id": "out"}}]}}""".stripMargin
    val pdfRows = Seq((1L, Doc.synthPdf("from a pdf", compress = true)))
      .toDF("doc_id", "payload")
    val gotPdf = FlowCompiler.compile(spark, flow("pdf"), Map("docs" -> pdfRows))("parsed")
      .select("text").as[String].collect()
    assert(gotPdf.toSeq === Seq("from a pdf"))
    val mdRows = Seq((1L, "# H\n\n**bold** body")).toDF("doc_id", "payload")
    val gotMd = FlowCompiler.compile(spark, flow("markdown"), Map("docs" -> mdRows))("parsed")
      .select("text").as[String].collect()
    assert(gotMd.toSeq === Seq("H\n\nbold body"))
    val htmlRows = Seq((1L, "<p>para</p><script>x()</script>")).toDF("doc_id", "payload")
    val gotHtml = FlowCompiler.compile(spark, flow("html"), Map("docs" -> htmlRows))("parsed")
      .select("text").as[String].collect()
    assert(gotHtml.toSeq === Seq("para"))
    intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, flow("docx"), Map("docs" -> mdRows))("parsed")
    }
  }

  test("q_parse_pdf / q_parse_markdown run and match their closed forms at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val pdf = QueriesLlm.qParsePdf(spark, d)
    val src = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    assert(pdf.join(src, "doc_id").filter(col("extracted") =!= col("text")).count() === 0L)
    assert(pdf.count() === src.count())
    val md = QueriesLlm.qParseMarkdown(spark, d).filter(col("doc_id") === 0L)
      .select("plain").as[String].collect()(0)
    val row = Tables.documents(spark, d).filter(col("doc_id") === 0L)
      .select("lang", "source", "text").collect()(0)
    assert(md ===
      s"Doc 0\n\n${row.getString(0)} intro\n\nquoted ${row.getString(1)}\n\n" +
      s"first item\nref tail\n\ncode 0\n\na b\n1 2\n\n${row.getString(2)}")
  }
}
