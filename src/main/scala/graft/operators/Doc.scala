package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** ParseDocument (NiFi 2.x GenAI bundle,
  * `org.apache.nifi.processors.parsedocument.ParseDocument` — the
  * document-ingestion front door of a RAG flow: bytes → plain text,
  * feeding ChunkDocument), JDK-only like the rest of the edge family.
  * NiFi delegates to parser libraries; offline this module hand-rolls
  * the two formats a parser library isn't needed for at the fidelity a
  * curation pipeline uses — PDF text extraction from the published PDF
  * 1.x format (ISO 32000 / the classic Adobe spec), and a markdown →
  * plain-text strip — while HTML delegates to the r16 jusText module
  * ([[Html]]) and plain text is a charset decode.
  *
  * == PDF subset (documented honesty boundary) ==
  * [[pdfText]] extracts text from classic (non-object-stream) PDFs:
  * content streams are located by `stream`/`endstream` framing with
  * the preceding object dictionary deciding the filter (`/FlateDecode`
  * inflated via `java.util.zip.Inflater` — zlib IS the PDF Flate
  * codec — or no filter read raw; any other filter skips the stream),
  * and text-showing operators inside `BT`/`ET` blocks are replayed:
  * `Tj`, `'`, `"`, and `TJ` arrays (kerning numbers ignored), with
  * literal strings decoding the full escape grammar (\\n \\r \\t \\b
  * \\f \\( \\) \\\\, \\ddd octal, line continuations) and `<hex>`
  * strings byte-decoded. Line structure: `Td`/`TD`/`T*`/`Tm`/`'`
  * between shows start a new output line; pages/streams join with a
  * newline. String BYTES decode as UTF-8 (falling back to Latin-1 on
  * malformed sequences) — simple-font PDFs with standard encodings
  * round-trip.
  *
  * PDF 1.5 structure (r18, the bound real-world PDFs hit first): text
  * extraction recognizes cross-reference streams (`/Type /XRef`) and
  * compressed object streams (`/Type /ObjStm`) and SKIPS them — their
  * decoded bytes are table rows / serialized dictionaries, never page
  * text — while [[xrefStreamEntries]] parses the 1.5 xref chain (/W
  * widths, /Index subsections, Flate + PNG /Predictor, /Prev) and
  * [[objStmObjects]] extracts the objects hidden inside /ObjStm, all
  * with `java.util.zip.Inflater` only.
  *
  * CID/Type0 fonts (r18, closing the last extraction bound): a font
  * resource carrying a /ToUnicode CMap decodes its show strings as
  * 2-byte CIDs through the parsed map — `Tf` tracks the font in
  * force, bfchar AND bfrange (contiguous + array forms) parse per ISO
  * 32000 §9.10.3, unmapped codes contribute nothing. Documented
  * approximations: the 2-byte codespace (what every real writer
  * emits — variable-width codespaces are out), and font NAMES resolve
  * through a whole-document merge of /Font resource dicts (per-page
  * scoping needs a full page-tree walk; real writers number font
  * resources uniquely). CID fonts WITHOUT a ToUnicode CMap (glyph
  * mapping only via the font program's cmap table) remain out — that
  * genuinely needs a font parser.
  *
  * [[synthPdf]] writes a minimal one-page PDF (optionally
  * Flate-compressed) whose extraction round-trips the input text
  * EXACTLY — the fixture generator for specs and the `q_parse_pdf`
  * oracle (the [[Multimodal.synthWavSegments]] discipline: a real
  * byte-level decoder proven against bytes this repo can construct
  * deterministically).
  *
  * == Markdown subset ==
  * [[markdownText]] strips CommonMark surface syntax to text: ATX
  * headings, emphasis runs (`**` `*` `__` `_`), inline code spans,
  * fenced code blocks (fences dropped, code kept), links/images
  * (label kept, URL dropped), list bullets and blockquote markers,
  * thematic breaks, HTML tags; reference-style link definitions drop.
  * Tables keep cell text (pipes → spaces). */
object Doc {

  // ------------------------------------------------------------- PDF

  /** Extract text from PDF bytes per the subset above. Unparseable
    * input (no %PDF header, no usable stream) yields "" — the caller
    * decides the failure route on emptiness. */
  def pdfText(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 8) return ""
    val head = new String(bytes, 0, math.min(8, bytes.length), ISO_8859_1)
    if (!head.startsWith("%PDF")) return ""
    val raw = new String(bytes, ISO_8859_1) // byte-faithful view
    // CID/Type0 support (r18): font NAME -> ToUnicode CID map, built
    // once per file (cheap guard: most PDFs have no /ToUnicode at all)
    val cidFonts: Map[String, Map[Int, String]] =
      if (raw.contains("/ToUnicode")) cidFontMap(bytes, raw) else Map.empty
    val out = new StringBuilder
    var from = 0
    var first = true
    while ({ val s = raw.indexOf("stream", from); s >= 0 }) {
      val s = raw.indexOf("stream", from)
      // dictionary of THIS stream object: scan backwards from the
      // keyword balancing <</>> pairs — lastIndexOf("<<") would pick
      // the innermost open, and a sub-dictionary nested after /Filter
      // (e.g. /DecodeParms << /Predictor … >>) would hide /Filter from
      // the sniff, mis-treating compressed bytes as unfiltered text
      val dict = streamDict(raw, s)
      // stream data begins after the keyword's EOL (CRLF or LF)
      var dataStart = s + "stream".length
      if (dataStart < raw.length && raw.charAt(dataStart) == '\r') dataStart += 1
      if (dataStart < raw.length && raw.charAt(dataStart) == '\n') dataStart += 1
      val end = raw.indexOf("endstream", dataStart)
      if (end < 0) return out.toString
      from = end + "endstream".length
      val flate = dict.contains("/FlateDecode")
      val plain = !dict.contains("/Filter")
      // PDF 1.5 structure streams are NOT page content: a
      // cross-reference stream (/Type /XRef) inflates to binary table
      // rows and an object stream (/Type /ObjStm) to serialized
      // DICTIONARIES — running the text replayer over either appends
      // garbage. They are parsed by [[xrefStreamEntries]] /
      // [[objStmObjects]]; text extraction skips them. A FAILED dict
      // scan (empty result — the dict exceeded the lookback bound or
      // nesting was malformed) is treated as structural/unknown too
      // (r19, ADVICE): without a dict we cannot rule out /Type /XRef
      // or a /Filter we don't inflate, and defaulting such bytes to
      // page content is how compressed-table garbage leaks into text.
      val structural = dict.isEmpty ||
        TypeXRef.findFirstIn(dict).isDefined ||
        TypeObjStm.findFirstIn(dict).isDefined
      if ((flate || plain) && !structural) {
        val data = java.util.Arrays.copyOfRange(bytes, dataStart, end)
        val content =
          if (plain) Some(data)
          else inflate(data)
        content.foreach { c =>
          val text = contentText(c, cidFonts)
          if (text.nonEmpty) {
            if (!first) out.append('\n')
            out.append(text)
            first = false
          }
        }
      }
    }
    out.toString
  }

  /** The full `<< … >>` dictionary text ending just before position
    * `s` (the `stream` keyword), found by a backwards scan that
    * BALANCES `<<`/`>>` pairs so nested sub-dictionaries stay inside.
    * Bounded lookback — 64 KB (r19: raised from 8 KB so an xref
    * stream's large /Index array fits); a scan that still fails
    * returns "" and the CALLER treats that as structural/unknown and
    * skips the stream rather than defaulting its bytes to page
    * content. */
  private def streamDict(raw: String, s: Int): String = {
    val lo = math.max(1, s - 65536)
    var i = s - 1
    var depth = 0
    var end = -1
    while (i >= lo) {
      if (raw.charAt(i) == '>' && raw.charAt(i - 1) == '>') {
        if (end < 0) end = i + 1
        depth += 1; i -= 2
      } else if (raw.charAt(i) == '<' && raw.charAt(i - 1) == '<') {
        depth -= 1
        if (depth <= 0) return raw.substring(i - 1, if (end >= 0) end else s)
        i -= 2
      } else i -= 1
    }
    ""
  }

  private val TypeXRef = "/Type\\s*/XRef\\b".r
  private val TypeObjStm = "/Type\\s*/ObjStm\\b".r

  // ------------------------------------------- PDF 1.5 object streams

  /** One cross-reference-stream row: `entryType` 0 = free, 1 = plain
    * object (`a` = byte offset), 2 = compressed object (`a` = number of
    * the /ObjStm holding it, `b` = index within it). */
  final case class XrefEntry(objNum: Int, entryType: Int, a: Long, b: Long)

  /** Parse the PDF 1.5 cross-reference STREAM chain starting at the
    * trailing `startxref` offset: /W field widths, /Index subsections
    * (default `[0 Size]`), FlateDecode, PNG /Predictor (the form every
    * writer emits — /DecodeParms << /Predictor 12 /Columns C >>), and
    * /Prev chaining (bounded). Classic `xref` TABLES return empty —
    * the linear content scan never needed them; this parser exists for
    * the 1.5 layout where objects hide inside /ObjStm. Unparseable
    * input yields empty (the caller's failure route). */
  def xrefStreamEntries(bytes: Array[Byte]): Seq[XrefEntry] = {
    if (bytes == null || bytes.length < 16) return Seq.empty
    val raw = new String(bytes, ISO_8859_1)
    val sx = raw.lastIndexOf("startxref")
    if (sx < 0) return Seq.empty
    val off = "\\d+".r.findFirstIn(raw.substring(sx + 9, math.min(raw.length, sx + 40)))
      .map(_.toLong).getOrElse(-1L)
    val out = scala.collection.mutable.ArrayBuffer.empty[XrefEntry]
    var at = off
    var hops = 0
    while (at >= 0 && at < bytes.length && hops < 32) {
      hops += 1
      at = xrefStreamAt(bytes, raw, at.toInt, out)
    }
    out.toSeq
  }

  /** Parse ONE xref stream object at `off`; returns the /Prev offset
    * (or -1 when the chain ends / the object isn't an xref stream). */
  private def xrefStreamAt(bytes: Array[Byte], raw: String, off: Int,
                           out: scala.collection.mutable.ArrayBuffer[XrefEntry]): Long = {
    val s = raw.indexOf("stream", off)
    if (s < 0) return -1L
    val dict = streamDict(raw, s)
    if (TypeXRef.findFirstIn(dict).isEmpty) return -1L // classic table or junk
    val data = streamData(bytes, raw, s).flatMap(decodeXrefData(dict, _))
      .getOrElse(return -1L)
    val w = "/W\\s*\\[\\s*(\\d+)\\s+(\\d+)\\s+(\\d+)\\s*\\]".r.findFirstMatchIn(dict)
      .map(m => (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt))
      .getOrElse(return -1L)
    val size = "/Size\\s+(\\d+)".r.findFirstMatchIn(dict).map(_.group(1).toInt).getOrElse(0)
    val index: Seq[(Int, Int)] =
      "/Index\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(dict) match {
        case Some(m) =>
          val ns = "\\d+".r.findAllIn(m.group(1)).map(_.toInt).toSeq
          ns.grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
        case None => Seq((0, size))
      }
    val rowLen = w._1 + w._2 + w._3
    if (rowLen <= 0) return -1L
    var pos = 0
    def field(width: Int): Long = {
      var v = 0L; var i = 0
      while (i < width) { v = (v << 8) | (data(pos) & 0xFFL); pos += 1; i += 1 }
      v
    }
    index.foreach { case (start, n) =>
      var i = 0
      while (i < n && pos + rowLen <= data.length) {
        val t = if (w._1 == 0) 1L else field(w._1) // absent type field defaults to 1
        val a = field(w._2)
        val b = field(w._3)
        out += XrefEntry(start + i, t.toInt, a, b)
        i += 1
      }
    }
    "/Prev\\s+(\\d+)".r.findFirstMatchIn(dict).map(_.group(1).toLong).getOrElse(-1L)
  }

  /** The raw data bytes of the stream whose keyword starts at `s`. */
  private def streamData(bytes: Array[Byte], raw: String, s: Int): Option[Array[Byte]] = {
    var dataStart = s + "stream".length
    if (dataStart < raw.length && raw.charAt(dataStart) == '\r') dataStart += 1
    if (dataStart < raw.length && raw.charAt(dataStart) == '\n') dataStart += 1
    val end = raw.indexOf("endstream", dataStart)
    if (end < 0) None
    else Some(java.util.Arrays.copyOfRange(bytes, dataStart, end))
  }

  /** Inflate (when /FlateDecode) then reverse the PNG row predictor
    * (when /Predictor >= 10) — the encoding every real writer uses for
    * xref streams. */
  private def decodeXrefData(dict: String, data: Array[Byte]): Option[Array[Byte]] = {
    val inflated =
      if (dict.contains("/FlateDecode")) inflate(data)
      else if (!dict.contains("/Filter")) Some(data)
      else None
    inflated.map { d =>
      val pred = "/Predictor\\s+(\\d+)".r.findFirstMatchIn(dict)
        .map(_.group(1).toInt).getOrElse(1)
      if (pred < 10) d
      else {
        val cols = "/Columns\\s+(\\d+)".r.findFirstMatchIn(dict)
          .map(_.group(1).toInt).getOrElse(1)
        pngUnpredict(d, cols)
      }
    }
  }

  /** Reverse the PNG per-row filters (None/Sub/Up/Average/Paeth) on
    * `columns`-byte rows each prefixed with its filter-type byte. */
  private def pngUnpredict(data: Array[Byte], columns: Int): Array[Byte] = {
    if (columns <= 0) return data
    val nRows = data.length / (columns + 1)
    val out = new Array[Byte](nRows * columns)
    var r = 0
    while (r < nRows) {
      val ft = data(r * (columns + 1)) & 0xFF
      val src = r * (columns + 1) + 1
      val dst = r * columns
      var i = 0
      while (i < columns) {
        val v = data(src + i) & 0xFF
        val left = if (i > 0) out(dst + i - 1) & 0xFF else 0
        val up = if (r > 0) out(dst - columns + i) & 0xFF else 0
        val ul = if (r > 0 && i > 0) out(dst - columns + i - 1) & 0xFF else 0
        val x = ft match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + ((left + up) / 2)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            v + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => v
        }
        out(dst + i) = (x & 0xFF).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  /** Every object stored inside any /ObjStm (PDF 1.5 compressed object
    * stream) in the file: object number → its serialized body text.
    * Layout per ISO 32000 §7.5.7: the decoded stream opens with /N
    * (objnum, offset) integer pairs; object i's body starts at
    * /First + offset_i. */
  def objStmObjects(bytes: Array[Byte]): Map[Int, String] = {
    if (bytes == null || bytes.length < 8) return Map.empty
    val raw = new String(bytes, ISO_8859_1)
    val out = scala.collection.mutable.LinkedHashMap.empty[Int, String]
    var from = 0
    while ({ val s = raw.indexOf("stream", from); s >= 0 }) {
      val s = raw.indexOf("stream", from)
      val dict = streamDict(raw, s)
      val end = raw.indexOf("endstream", s)
      if (end < 0) return out.toMap
      from = end + "endstream".length
      if (TypeObjStm.findFirstIn(dict).isDefined) {
        for {
          data <- streamData(bytes, raw, s)
          dec <- if (dict.contains("/FlateDecode")) inflate(data)
                 else if (!dict.contains("/Filter")) Some(data) else None
          n <- "/N\\s+(\\d+)".r.findFirstMatchIn(dict).map(_.group(1).toInt)
          first <- "/First\\s+(\\d+)".r.findFirstMatchIn(dict).map(_.group(1).toInt)
        } {
          val text = new String(dec, ISO_8859_1)
          if (first <= text.length) {
            val header = "\\d+".r.findAllIn(text.substring(0, first)).map(_.toInt).toSeq
            val pairs = header.grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq.take(n)
            pairs.zipWithIndex.foreach { case ((objNum, o), i) =>
              val lo = math.min(text.length, first + o)
              val hi = if (i + 1 < pairs.length) math.min(text.length, first + pairs(i + 1)._2)
                       else text.length
              if (lo <= hi) out(objNum) = text.substring(lo, hi).trim
            }
          }
        }
      }
    }
    out.toMap
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val out = new ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return None // stuck
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: java.util.zip.DataFormatException => None }

  /** Replay one decoded content stream's text operators. */
  private def contentText(content: Array[Byte],
                          cidFonts: Map[String, Map[Int, String]] = Map.empty): String = {
    val s = new String(content, ISO_8859_1)
    val out = new StringBuilder
    val line = new StringBuilder
    var inText = false
    def flushLine(): Unit = {
      if (line.nonEmpty) {
        if (out.nonEmpty) out.append('\n')
        out.append(line)
        line.clear()
      }
    }
    var i = 0
    val n = s.length
    // CID decoding is a FONT property: `/F1 12 Tf` selects the font,
    // and strings shown under a Type0 font with a ToUnicode CMap decode
    // as 2-byte CIDs through the map; everything else keeps the
    // UTF-8-with-Latin-1-fallback byte decode. The pending buffer holds
    // raw BYTES so the decode happens under the font in force at the
    // OPERATOR, not at tokenize time.
    var lastName: String = null
    var curCid: Map[Int, String] = null
    def dec(bs: Array[Byte]): String =
      if (curCid == null) decodeBytes(bs) else decodeCid(bs, curCid)
    // pending string operands for the NEXT operator (TJ arrays carry
    // their strings in brackets; Tj/'/" take the preceding string)
    var pending = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def emit(): Unit = { pending.foreach(bs => line ++= dec(bs)); pending.clear() }
    while (i < n) {
      s.charAt(i) match {
        case '(' =>
          val (bs, next) = literalString(s, i)
          pending += bs; i = next
        case '<' if i + 1 < n && s.charAt(i + 1) != '<' =>
          val close = s.indexOf('>', i)
          if (close < 0) i = n
          else {
            val hex = s.substring(i + 1, close).filterNot(_.isWhitespace)
            val bs = hex.grouped(2).map(h =>
              Integer.parseInt(if (h.length == 2) h else h + "0", 16).toByte).toArray
            pending += bs
            i = close + 1
          }
        case '<' => i += 2 // '<<' dictionary open (inline image dicts etc.)
        case '%' => i = { val e = s.indexOf('\n', i); if (e < 0) n else e + 1 }
        case '/' =>
          val start = i + 1
          i += 1
          while (i < n && !s.charAt(i).isWhitespace && !"()<>[]/%".contains(s.charAt(i))) i += 1
          lastName = s.substring(start, i)
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          val start = i
          while (i < n && !s.charAt(i).isWhitespace &&
                 s.charAt(i) != '(' && s.charAt(i) != '<' &&
                 s.charAt(i) != '[' && s.charAt(i) != ']' && s.charAt(i) != '/') i += 1
          val op = s.substring(start, i)
          op match {
            case "BT" => inText = true
            case "ET" => inText = false; flushLine(); pending.clear()
            case "Tf" =>
              curCid = if (lastName == null) null else cidFonts.getOrElse(lastName, null)
              pending.clear()
            case "Tj" | "TJ" => if (inText) emit() else pending.clear()
            case "'" | "\"" => if (inText) { flushLine(); emit() } else pending.clear()
            case "Td" | "TD" | "T*" | "Tm" =>
              if (inText) flushLine()
              pending.clear() // positioning ops consume no strings
            case _ => pending.clear() // other operators drop their operands
          }
        case _ => i += 1
      }
    }
    flushLine()
    out.toString
  }

  /** Decode a CID-coded show string through a ToUnicode map: 2-byte
    * big-endian codes (the codespace every real writer emits);
    * unmapped codes contribute nothing (the spec leaves them
    * undefined); an odd trailing byte falls back to the byte decode
    * of that byte. */
  private def decodeCid(bs: Array[Byte], m: Map[Int, String]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i + 1 < bs.length) {
      val code = ((bs(i) & 0xFF) << 8) | (bs(i + 1) & 0xFF)
      m.get(code).foreach(sb ++= _)
      i += 2
    }
    if (i < bs.length) sb ++= decodeBytes(Array(bs(i)))
    sb.toString
  }

  /** Decode one literal string starting at `s(open) == '('`; returns
    * (raw BYTES, index past the closing paren) — the text decode
    * happens at the show OPERATOR, under the font in force. Balanced
    * parens inside the string are legal PDF. */
  private def literalString(s: String, open: Int): (Array[Byte], Int) = {
    val bs = new ByteArrayOutputStream
    var depth = 1
    var i = open + 1
    val n = s.length
    while (i < n && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < n =>
          s.charAt(i + 1) match {
            case 'n' => bs.write('\n'); i += 2
            case 'r' => bs.write('\r'); i += 2
            case 't' => bs.write('\t'); i += 2
            case 'b' => bs.write('\b'); i += 2
            case 'f' => bs.write('\f'); i += 2
            case '(' => bs.write('('); i += 2
            case ')' => bs.write(')'); i += 2
            case '\\' => bs.write('\\'); i += 2
            case '\n' => i += 2 // line continuation
            case '\r' => i += (if (i + 2 < n && s.charAt(i + 2) == '\n') 3 else 2)
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0
              while (j < n && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1
              }
              bs.write(v & 0xFF); i = j
            case other => bs.write(other.toInt); i += 2 // lone backslash drops
          }
        case '(' => depth += 1; bs.write('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) bs.write(')')
          i += 1
        case c => bs.write(c.toInt & 0xFF); i += 1
      }
    }
    (bs.toByteArray, i)
  }

  /** String bytes → text: UTF-8 when well-formed, Latin-1 otherwise
    * (the simple-font posture documented above). */
  private def decodeBytes(bs: Array[Byte]): String = {
    val dec = UTF_8.newDecoder()
    try dec.decode(java.nio.ByteBuffer.wrap(bs)).toString
    catch { case _: java.nio.charset.CharacterCodingException => new String(bs, ISO_8859_1) }
  }

  /** Minimal one-page PDF whose [[pdfText]] extraction round-trips
    * `text` exactly: one content stream, one line of text per input
    * line (`T*` between), full escape coverage. `compress` runs the
    * content through Flate (the common real-PDF shape). */
  def synthPdf(text: String, compress: Boolean = false,
               objectStreams: Boolean = false): Array[Byte] = {
    def esc(line: String): String =
      line.flatMap {
        case '\\' => "\\\\"
        case '(' => "\\("
        case ')' => "\\)"
        case '\r' => "\\r"
        case c => c.toString
      }
    val shows = text.split("\n", -1).zipWithIndex.map { case (l, i) =>
      (if (i == 0) "" else "T*\n") + s"(${esc(l)}) Tj\n"
    }.mkString
    val contentStr = s"BT\n/F1 12 Tf\n14 TL\n72 720 Td\n${shows}ET\n"
    val contentRaw = contentStr.getBytes(UTF_8)
    val content = if (compress) deflate(contentRaw) else contentRaw
    val filter = if (compress) " /Filter /FlateDecode" else ""
    if (objectStreams) return synthPdf15(content, filter)
    val out = new ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    w("%PDF-1.4\n")
    def obj(body: String): Unit = { offsets += out.size(); w(body) }
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    obj("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n")
    offsets += out.size()
    w(s"4 0 obj\n<< /Length ${content.length}$filter >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    obj("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xref = out.size()
    w(s"xref\n0 6\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** The PDF 1.5 layout (ISO 32000 §7.5.7–7.5.8): the document objects
    * live compressed inside ONE /ObjStm; the cross-reference is a
    * /Type /XRef STREAM (Flate + PNG Up predictor, /W [1 2 1]) with
    * type-2 rows pointing into the object stream; no classic trailer.
    * The content stream stays a top-level stream object (content
    * streams cannot live in an ObjStm, per spec). */
  private def synthPdf15(content: Array[Byte], filter: String): Array[Byte] = {
    val out = new ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.5\n")
    // obj 1: page content (plain or Flate per `filter`)
    val off1 = out.size()
    w(s"1 0 obj\n<< /Length ${content.length}$filter >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    // obj 2: the ObjStm holding objects 3 (catalog), 4 (pages),
    // 5 (page) and 6 (font)
    val bodies = Seq(
      3 -> "<< /Type /Catalog /Pages 4 0 R >>",
      4 -> "<< /Type /Pages /Kids [5 0 R] /Count 1 >>",
      5 -> ("<< /Type /Page /Parent 4 0 R /MediaBox [0 0 612 792] " +
        "/Contents 1 0 R /Resources << /Font << /F1 6 0 R >> >> >>"),
      6 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val offs = bodies.scanLeft(0)((acc, b) => acc + b._2.length + 1).init
    val header = bodies.zip(offs).map { case ((n, _), o) => s"$n $o" }.mkString(" ") + "\n"
    val stmText = header + bodies.map(_._2 + "\n").mkString
    val stmData = deflate(stmText.getBytes(ISO_8859_1))
    val off2 = out.size()
    w(s"2 0 obj\n<< /Type /ObjStm /N ${bodies.length} /First ${header.length} " +
      s"/Length ${stmData.length} /Filter /FlateDecode >>\nstream\n")
    out.write(stmData)
    w("\nendstream\nendobj\n")
    // obj 7: the xref STREAM — rows for objects 0..7, W [1 2 1],
    // PNG Up predictor over 4-byte columns (the shape real writers emit)
    val off7 = out.size()
    val rows: Seq[(Int, Int, Int)] = Seq(
      (0, 0, 65535),            // obj 0: free
      (1, off1, 0),             // obj 1: content stream, plain offset
      (1, off2, 0),             // obj 2: the ObjStm itself
      (2, 2, 0), (2, 2, 1), (2, 2, 2), (2, 2, 3), // objs 3-6 inside ObjStm 2
      (1, off7, 0))             // obj 7: this xref stream
    val cols = 6 // W [1 4 1]
    val plainRows = rows.map { case (t, a, b) =>
      Array[Byte](t.toByte, ((a >> 24) & 0xFF).toByte, ((a >> 16) & 0xFF).toByte,
        ((a >> 8) & 0xFF).toByte, (a & 0xFF).toByte, (b & 0xFF).toByte)
    }
    val predicted = new ByteArrayOutputStream
    var prev = new Array[Byte](cols)
    plainRows.foreach { row =>
      predicted.write(2) // PNG Up filter
      var i = 0
      while (i < cols) { predicted.write((row(i) - prev(i)) & 0xFF); i += 1 }
      prev = row
    }
    val xrefData = deflate(predicted.toByteArray)
    w(s"7 0 obj\n<< /Type /XRef /Size 8 /Root 3 0 R /W [1 4 1] " +
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $cols >> " +
      s"/Length ${xrefData.length} >>\nstream\n")
    out.write(xrefData)
    w(s"\nendstream\nendobj\nstartxref\n$off7\n%%EOF\n")
    out.toByteArray
  }


  // ---------------------------------------------- CID / ToUnicode (r18)

  /** Font NAME → ToUnicode CID map for every font that carries a
    * /ToUnicode CMap. Resolution walks the object graph the linear
    * way: every `/Font << /Fn N 0 R … >>` resource entry (in top-level
    * bodies AND inside /ObjStm objects) names a font object; a font
    * object carrying `/ToUnicode M 0 R` points at the CMap stream,
    * which inflates and parses. A font name bound to different objects
    * across pages keeps the LAST binding (documented approximation —
    * per-page resource scoping needs a full page-tree walk; real
    * writers number font resources uniquely per document). */
  private def cidFontMap(bytes: Array[Byte], raw: String): Map[String, Map[Int, String]] = {
    val objBodies: Map[Int, String] = topLevelObjects(raw) ++ objStmObjects(bytes)
    // every /Font resource dict, wherever it appears
    val fontRefs = scala.collection.mutable.LinkedHashMap[String, Int]()
    val entry = "/([A-Za-z0-9_.]+)\\s+(\\d+)\\s+\\d+\\s+R".r
    def scanFontDicts(text: String): Unit = {
      var at = text.indexOf("/Font")
      while (at >= 0) {
        val open = text.indexOf("<<", at)
        if (open >= 0 && open - at < 32) {
          val body = balancedDict(text, open)
          entry.findAllMatchIn(body).foreach { m =>
            fontRefs(m.group(1)) = m.group(2).toInt
          }
        }
        at = text.indexOf("/Font", at + 5)
      }
    }
    scanFontDicts(raw)
    objBodies.values.foreach(scanFontDicts)
    val toUni = "/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R".r
    fontRefs.flatMap { case (name, objNum) =>
      for {
        fontBody <- objBodies.get(objNum)
        m <- toUni.findFirstMatchIn(fontBody)
        data <- objectStreamData(bytes, raw, m.group(1).toInt)
        cmap = parseToUnicodeCMap(new String(data, ISO_8859_1))
        if cmap.nonEmpty
      } yield name -> cmap
    }.toMap
  }

  /** Top-level `N G obj … endobj` bodies (dict text; a stream object's
    * body includes its dict — and its data, which the regex consumers
    * above simply scan past). */
  private def topLevelObjects(raw: String): Map[Int, String] = {
    val out = scala.collection.mutable.LinkedHashMap[Int, String]()
    val objHdr = "(?m)(\\d+)\\s+\\d+\\s+obj\\b".r
    objHdr.findAllMatchIn(raw).foreach { m =>
      val end = raw.indexOf("endobj", m.end)
      if (end > 0) out(m.group(1).toInt) = raw.substring(m.end, end)
    }
    out.toMap
  }

  /** Forward balanced `<< … >>` extraction starting at `open`
    * (index of the `<<`). */
  private def balancedDict(text: String, open: Int): String = {
    var i = open
    var depth = 0
    val n = text.length
    while (i + 1 < n) {
      if (text.charAt(i) == '<' && text.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (text.charAt(i) == '>' && text.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return text.substring(open, i)
      }
      else i += 1
    }
    text.substring(open)
  }

  /** The decoded stream DATA of top-level object `objNum` (inflated
    * when /FlateDecode). None when the object is absent or has no
    * stream. */
  private def objectStreamData(bytes: Array[Byte], raw: String,
                               objNum: Int): Option[Array[Byte]] = {
    val hdr = s"(?m)(?<!\\d)$objNum\\s+\\d+\\s+obj\\b".r
    hdr.findFirstMatchIn(raw).flatMap { m =>
      val end = raw.indexOf("endobj", m.end)
      val st = raw.indexOf("stream", m.end)
      if (st < 0 || (end > 0 && st > end)) None
      else {
        val dict = streamDict(raw, st)
        streamData(bytes, raw, st).flatMap { data =>
          if (dict.contains("/FlateDecode")) inflate(data)
          else if (!dict.contains("/Filter")) Some(data)
          else None
        }
      }
    }
  }

  /** Parse a ToUnicode CMap's bfchar/bfrange sections (ISO 32000
    * §9.10.3 / the CMap spec): `beginbfchar` pairs map one code to a
    * UTF-16BE string (possibly several code units); `beginbfrange`
    * triples map a contiguous code range to consecutive values, or —
    * the array form — each code to its own string. Codes are the
    * 2-byte codespace every real writer emits. */
  private[graft] def parseToUnicodeCMap(text: String): Map[Int, String] = {
    val out = scala.collection.mutable.LinkedHashMap[Int, String]()
    val hex = "<([0-9A-Fa-f]+)>".r
    def utf16(hexStr: String): String = {
      val cs = hexStr.grouped(4).filter(_.length == 4)
        .map(h => Integer.parseInt(h, 16).toChar).mkString
      cs
    }
    def code(hexStr: String): Int = Integer.parseInt(hexStr, 16)
    val bfchar = "(?s)beginbfchar(.*?)endbfchar".r
    bfchar.findAllMatchIn(text).foreach { sec =>
      val toks = hex.findAllMatchIn(sec.group(1)).map(_.group(1)).toSeq
      toks.grouped(2).foreach {
        case Seq(src, dst) => out(code(src)) = utf16(dst)
        case _ => ()
      }
    }
    val bfrange = "(?s)beginbfrange(.*?)endbfrange".r
    // entries are either `<lo> <hi> <dst>` or `<lo> <hi> [<d1> <d2> …]`
    val entryRe = ("<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*" +
      "(?:<([0-9A-Fa-f]+)>|\\[((?:\\s*<[0-9A-Fa-f]+>)+)\\s*\\])").r
    bfrange.findAllMatchIn(text).foreach { sec =>
      entryRe.findAllMatchIn(sec.group(1)).foreach { m =>
        val lo = code(m.group(1)); val hi = code(m.group(2))
        if (m.group(3) != null) {
          // consecutive values: increment the LAST code unit (the CMap
          // spec's rule for ranges)
          val base = utf16(m.group(3))
          var c = lo
          while (c <= hi) {
            if (base.nonEmpty) {
              val bumped = base.dropRight(1) + (base.last + (c - lo)).toChar
              out(c) = bumped
            }
            c += 1
          }
        } else {
          val dsts = hex.findAllMatchIn(m.group(4)).map(g => utf16(g.group(1))).toSeq
          dsts.zipWithIndex.foreach { case (d, i) =>
            if (lo + i <= hi) out(lo + i) = d
          }
        }
      }
    }
    out.toMap
  }

  /** CID-font fixture generator: a one-page PDF whose text shows
    * through a Type0 font with a ToUnicode CMap — each distinct
    * character of `text` gets a CID, the content stream shows 2-byte
    * hex strings, and [[pdfText]] must round-trip EXACTLY (the
    * [[synthPdf]] discipline, CID edition). */
  def synthPdfCid(text: String): Array[Byte] = {
    val chars = text.filterNot(_ == '\n').distinct
    val cid: Map[Char, Int] = chars.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
    def hexOf(line: String): String =
      line.map(c => f"${cid(c)}%04X").mkString
    val shows = text.split("\n", -1).zipWithIndex.map { case (l, i) =>
      (if (i == 0) "" else "T*\n") + s"<${hexOf(l)}> Tj\n"
    }.mkString
    val contentStr = s"BT\n/F1 12 Tf\n14 TL\n72 720 Td\n${shows}ET\n"
    val content = contentStr.getBytes(ISO_8859_1)
    val bfchars = chars.map { c =>
      f"<${cid(c)}%04X> <${c.toInt}%04X>"
    }.mkString("\n")
    val cmap =
      s"""/CIDInit /ProcSet findresource begin
         |12 dict begin
         |begincmap
         |1 begincodespacerange
         |<0000> <FFFF>
         |endcodespacerange
         |${chars.length} beginbfchar
         |$bfchars
         |endbfchar
         |endcmap
         |CMapName currentdict /CMap defineresource pop
         |end
         |end""".stripMargin
    val cmapBytes = cmap.getBytes(ISO_8859_1)
    val out = new ByteArrayOutputStream
    def w(x: String): Unit = out.write(x.getBytes(ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    w("%PDF-1.4\n")
    def obj(body: String): Unit = { offsets += out.size(); w(body) }
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    obj("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n")
    offsets += out.size()
    w(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    obj("5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CID " +
      "/Encoding /Identity-H /DescendantFonts [7 0 R] /ToUnicode 6 0 R >>\nendobj\n")
    offsets += out.size()
    w(s"6 0 obj\n<< /Length ${cmapBytes.length} >>\nstream\n")
    out.write(cmapBytes)
    w("\nendstream\nendobj\n")
    obj("7 0 obj\n<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth-CID " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >>\nendobj\n")
    val xref = out.size()
    w(s"xref\n0 8\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  // -------------------------------------------------------- Markdown

  /** CommonMark surface syntax → plain text (subset documented in the
    * object scaladoc). Line-oriented: block markers strip per line,
    * then inline spans strip within the line. */
  // Precompiled strip patterns (r18): String.replaceAll/replaceFirst/
  // matches compile their regex on EVERY call — the old body compiled
  // 13 regexes per LINE per document in the hot loop, which the honest
  // bench surfaced as the heaviest per-row cost in the parse family
  // (q_parse_markdown 18.1 s at m100). Compiled once; semantics
  // byte-identical (DocSpec + the exact q_parse_markdown oracle gate).
  /** Necessary-condition scan for [[markdownText]]'s strip passes
    * (r19): true iff some pass COULD touch this line. Containment
    * triggers — '#' (heading/heading tail), '`' (code span), '['
    * (image/link/ref-def), '<' (html tag), '|' (table), '*' / '_'
    * (emphasis/strong/thematic). Block-anchor triggers on the first
    * non-space char — '>' (quote), '-'/'+' (bullet/thematic), digit
    * (ordered list). Everything else ('-' mid-line, '>' mid-line,
    * digits mid-line, '!') cannot match any pass without one of the
    * containment chars also present. */
  private def mdMarked(raw: String, t: String): Boolean = {
    var j = 0
    while (j < raw.length) {
      val c = raw.charAt(j)
      if (c == '#' || c == '`' || c == '[' || c == '<' || c == '|' ||
          c == '*' || c == '_') return true
      j += 1
    }
    t.nonEmpty && {
      val c = t.charAt(0)
      c == '>' || c == '-' || c == '+' || (c >= '0' && c <= '9')
    }
  }

  private object Md {
    import java.util.regex.Pattern
    val thematic = Pattern.compile("(\\*\\s*){3,}|(-\\s*){3,}|(_\\s*){3,}")
    val refDef = Pattern.compile("\\[[^\\]]+\\]:\\s*\\S.*")
    val heading = Pattern.compile("^\\s{0,3}#{1,6}\\s+")
    val headingTail = Pattern.compile("\\s#+\\s*$")
    val quote = Pattern.compile("^\\s{0,3}>\\s?")
    val bullet = Pattern.compile("^\\s*[-*+]\\s+")
    val ordered = Pattern.compile("^\\s*\\d{1,9}[.)]\\s+")
    val image = Pattern.compile("!\\[([^\\]]*)\\]\\([^)]*\\)")
    val link = Pattern.compile("\\[([^\\]]+)\\]\\([^)]*\\)")
    val codeSpan = Pattern.compile("`([^`]*)`")
    val strong = Pattern.compile("(\\*\\*|__)(.+?)\\1")
    val emStar = Pattern.compile("(?<![\\w*])\\*([^*\\s][^*]*)\\*(?![\\w*])")
    val emUnder = Pattern.compile("(?<![\\w_])_([^_\\s][^_]*)_(?![\\w_])")
    val htmlTag = Pattern.compile("<[^>\\s][^>]*>")
    val tableSep = Pattern.compile("\\|?\\s*:?-{2,}.*")
    val pipes = Pattern.compile("\\s*\\|\\s*")
    val blankRuns = Pattern.compile("\n{3,}")
  }

  def markdownText(md: String): String = {
    if (md == null) return null
    val out = new StringBuilder
    var inFence = false
    md.split("\n", -1).foreach { raw =>
      val t = raw.trim
      if (t.startsWith("```") || t.startsWith("~~~")) {
        inFence = !inFence // fence lines drop, enclosed code keeps
      } else if (inFence) {
        out.append(raw).append('\n')
      } else if (!mdMarked(raw, t)) {
        // r19 fast path (verdict task 6 — the heaviest per-row strip):
        // crawl-corpus lines are mostly plain prose, and the pass chain
        // below ran 11 compiled matchers on every one of them. One char
        // scan decides whether ANY pass could match — `mdMarked` checks
        // the NECESSARY condition of each regex (its trigger char, or
        // its block-anchor first char) — and an unmarked line passes
        // through verbatim. Equivalence is pinned by DocSpec's strip
        // grammar test and the exact q_parse_markdown oracle.
        out.append(raw).append('\n')
      } else if (Md.thematic.matcher(t).matches()) {
        () // thematic break drops
      } else if (Md.refDef.matcher(t).matches()) {
        () // reference-style link definition drops
      } else {
        var line = raw
        // block markers: heading hashes, blockquote, list bullets
        line = Md.headingTail.matcher(
          Md.heading.matcher(line).replaceFirst("")).replaceFirst("")
        line = Md.quote.matcher(line).replaceFirst("")
        line = Md.bullet.matcher(line).replaceFirst("")
        line = Md.ordered.matcher(line).replaceFirst("")
        // inline: images keep alt, links keep label, code spans unwrap,
        // emphasis runs drop, raw HTML tags drop, table pipes → space
        line = Md.image.matcher(line).replaceAll("$1")
        line = Md.link.matcher(line).replaceAll("$1")
        line = Md.codeSpan.matcher(line).replaceAll("$1")
        line = Md.strong.matcher(line).replaceAll("$2")
        line = Md.emStar.matcher(line).replaceAll("$1")
        line = Md.emUnder.matcher(line).replaceAll("$1")
        line = Md.htmlTag.matcher(line).replaceAll("")
        if (line.contains('|') && Md.tableSep.matcher(t).matches())
          () // table separator row drops
        else {
          if (line.contains('|'))
            line = Md.pipes.matcher(line).replaceAll(" ").trim
          out.append(line).append('\n')
        }
      }
    }
    // collapse the markdown's blank-line rhythm conservatively: runs of
    // 3+ newlines → 2 (paragraph breaks keep), drop the trailing one
    val s = Md.blankRuns.matcher(out.toString).replaceAll("\n\n")
    if (s.endsWith("\n")) s.dropRight(1) else s
  }
}
