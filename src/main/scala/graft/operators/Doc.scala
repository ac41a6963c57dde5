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
  * round-trip; CID/subset-font PDFs needing ToUnicode CMaps and
  * PDF 1.5 object streams are OUT of this subset (a parser library is
  * the right tool there; the flow seam is format-agnostic either way).
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
      if (flate || plain) {
        val data = java.util.Arrays.copyOfRange(bytes, dataStart, end)
        val content =
          if (plain) Some(data)
          else inflate(data)
        content.foreach { c =>
          val text = contentText(c)
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
    * Bounded lookback (stream dicts are small); malformed nesting
    * degrades to from-the-innermost-open (the old sniff). */
  private def streamDict(raw: String, s: Int): String = {
    val lo = math.max(1, s - 8192)
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
  private def contentText(content: Array[Byte]): String = {
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
    // pending string operands for the NEXT operator (TJ arrays carry
    // their strings in brackets; Tj/'/" take the preceding string)
    var pending = scala.collection.mutable.ArrayBuffer.empty[String]
    def emit(): Unit = { pending.foreach(line ++= _); pending.clear() }
    while (i < n) {
      s.charAt(i) match {
        case '(' =>
          val (str, next) = literalString(s, i)
          pending += str; i = next
        case '<' if i + 1 < n && s.charAt(i + 1) != '<' =>
          val close = s.indexOf('>', i)
          if (close < 0) i = n
          else {
            val hex = s.substring(i + 1, close).filterNot(_.isWhitespace)
            val bs = hex.grouped(2).map(h =>
              Integer.parseInt(if (h.length == 2) h else h + "0", 16).toByte).toArray
            pending += decodeBytes(bs)
            i = close + 1
          }
        case '<' => i += 2 // '<<' dictionary open (inline image dicts etc.)
        case '%' => i = { val e = s.indexOf('\n', i); if (e < 0) n else e + 1 }
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          val start = i
          while (i < n && !s.charAt(i).isWhitespace &&
                 s.charAt(i) != '(' && s.charAt(i) != '<' &&
                 s.charAt(i) != '[' && s.charAt(i) != ']' && s.charAt(i) != '/') i += 1
          val op = s.substring(start, i)
          op match {
            case "BT" => inText = true
            case "ET" => inText = false; flushLine(); pending.clear()
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

  /** Decode one literal string starting at `s(open) == '('`; returns
    * (decoded text, index past the closing paren). Balanced parens
    * inside the string are legal PDF. */
  private def literalString(s: String, open: Int): (String, Int) = {
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
    (decodeBytes(bs.toByteArray), i)
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
  def synthPdf(text: String, compress: Boolean = false): Array[Byte] = {
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
    val content =
      if (!compress) contentRaw
      else {
        val d = new java.util.zip.Deflater()
        d.setInput(contentRaw); d.finish()
        val out = new ByteArrayOutputStream
        val buf = new Array[Byte](8192)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end()
        out.toByteArray
      }
    val filter = if (compress) " /Filter /FlateDecode" else ""
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

  // -------------------------------------------------------- Markdown

  /** CommonMark surface syntax → plain text (subset documented in the
    * object scaladoc). Line-oriented: block markers strip per line,
    * then inline spans strip within the line. */
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
      } else if (t.matches("(\\*\\s*){3,}|(-\\s*){3,}|(_\\s*){3,}")) {
        () // thematic break drops
      } else if (t.matches("\\[[^\\]]+\\]:\\s*\\S.*")) {
        () // reference-style link definition drops
      } else {
        var line = raw
        // block markers: heading hashes, blockquote, list bullets
        line = line.replaceFirst("^\\s{0,3}#{1,6}\\s+", "")
          .replaceFirst("\\s#+\\s*$", "")
        line = line.replaceFirst("^\\s{0,3}>\\s?", "")
        line = line.replaceFirst("^\\s*[-*+]\\s+", "")
        line = line.replaceFirst("^\\s*\\d{1,9}[.)]\\s+", "")
        // inline: images keep alt, links keep label, code spans unwrap,
        // emphasis runs drop, raw HTML tags drop, table pipes → space
        line = line.replaceAll("!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
        line = line.replaceAll("\\[([^\\]]+)\\]\\([^)]*\\)", "$1")
        line = line.replaceAll("`([^`]*)`", "$1")
        line = line.replaceAll("(\\*\\*|__)(.+?)\\1", "$2")
        line = line.replaceAll("(?<![\\w*])\\*([^*\\s][^*]*)\\*(?![\\w*])", "$1")
        line = line.replaceAll("(?<![\\w_])_([^_\\s][^_]*)_(?![\\w_])", "$1")
        line = line.replaceAll("<[^>\\s][^>]*>", "")
        if (line.contains('|') && t.matches("\\|?\\s*:?-{2,}.*"))
          () // table separator row drops
        else {
          if (line.contains('|'))
            line = line.replaceAll("\\s*\\|\\s*", " ").trim
          out.append(line).append('\n')
        }
      }
    }
    // collapse the markdown's blank-line rhythm conservatively: runs of
    // 3+ newlines → 2 (paragraph breaks keep), drop the trailing one
    val s = out.toString.replaceAll("\n{3,}", "\n\n")
    if (s.endsWith("\n")) s.dropRight(1) else s
  }
}
