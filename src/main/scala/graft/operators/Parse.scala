package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log/line parsing operators (NiFi ExtractGrok, ParseSyslog,
  * ValidateCsv). (Capability reference: NiFi 2.7 as deployed by
  * /root/reference/dev.nifi.yaml:1.)
  *
  * All narrow, codegen'd regexp work — the 100 TB cost model is one
  * regex pass per record, no shuffle, fully pushdown-friendly upstream.
  */
object Parse {

  /** Grok base patterns (public grok pattern library subset, re-expressed
    * as RE2/Java-compatible regexes — no possessive quantifiers). */
  val grokPatterns: Map[String, String] = Map(
    "WORD"       -> "\\b\\w+\\b",
    "NOTSPACE"   -> "\\S+",
    "DATA"       -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT"        -> "[+-]?\\d+",
    "NUMBER"     -> "[+-]?\\d+(?:\\.\\d+)?",
    "IP"         -> "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}",
    "HOSTNAME"   -> "\\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}\\.?)+\\b",
    "UUID"       -> "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "MAC"        -> "(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}",
    "UNIXPATH"   -> "(?:/[\\w.-]+)+/?",
    "URIPROTO"   -> "[A-Za-z][A-Za-z0-9+.-]*",
    "QS"         -> "\"[^\"]*\"",
    "HTTPDATE"   -> "\\d{2}/\\w{3}/\\d{4}:\\d{2}:\\d{2}:\\d{2} [+-]\\d{4}",
    "TIMESTAMP_ISO8601" ->
      "\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?(?:Z|[+-]\\d{2}:?\\d{2})?",
    "LOGLEVEL"   -> "TRACE|DEBUG|INFO|WARN|ERROR|FATAL")

  /** Common Log Format line (the COMMONAPACHELOG composite): use with
    * [[extractGrok]] to parse access logs into
    * (clientip, ident, auth, timestamp, verb, request, httpversion,
    * response, bytes). */
  val commonApacheLog: String =
    "%{IP:clientip} %{NOTSPACE:ident} %{NOTSPACE:auth} " +
    "[%{HTTPDATE:timestamp}] \"%{WORD:verb} %{NOTSPACE:request} " +
    "HTTP/%{NUMBER:httpversion}\" %{INT:response} %{INT:bytes}"

  private val grokRef = "%\\{(\\w+)(?::(\\w+))?\\}".r

  /** Compile a grok expression (`%{PATTERN:name}` references + literal
    * text) into (regex with capture groups, field names in group order).
    * Unnamed references (`%{INT}`) match without capturing. */
  def compileGrok(expr: String): (String, Seq[String]) = {
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var last = 0
    for (m <- grokRef.findAllMatchIn(expr)) {
      sb.append(java.util.regex.Pattern.quote(expr.substring(last, m.start)))
      val pat = grokPatterns.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"unknown grok pattern %{${m.group(1)}}"))
      if (m.group(2) != null) { names += m.group(2); sb.append(s"($pat)") }
      else sb.append(s"(?:$pat)")
      last = m.end
    }
    sb.append(java.util.regex.Pattern.quote(expr.substring(last)))
    (sb.toString, names.toSeq)
  }

  /** ExtractGrok: parse a line column with a grok expression; one output
    * column per named reference (null when the line doesn't match —
    * NiFi's `unmatched` relationship is a `route` on those nulls). */
  def extractGrok(df: DataFrame, lineCol: String, expr: String): DataFrame = {
    val (regex, names) = compileGrok(expr)
    // ONE regex match per row (r19 — the parseCef treatment): the
    // groups array is null on no-match, so each field below is exactly
    // the old when(rlike, extract) value (null when unmatched, ""
    // only for a matched-but-empty group).
    val withG = df.withColumn("__grok_g",
      graft.plans.RegexExpressions.regexGroups(col(lineCol), regex))
    names.zipWithIndex.foldLeft(withG) { case (d, (name, i)) =>
      d.withColumn(name, element_at(col("__grok_g"), i + 1))
    }.drop("__grok_g")
  }

  /** RFC-3164-ish syslog line: `<PRI>MMM dd HH:mm:ss host tag[pid]: msg`
    * (pri, pid optional — the common relaxed form ParseSyslog accepts). */
  val syslogRegex: String =
    "^(?:<(\\d+)>)?" +                                    // 1 pri
    "([A-Z][a-z]{2} [ \\d]\\d \\d{2}:\\d{2}:\\d{2}) " +   // 2 timestamp
    "(\\S+) " +                                           // 3 host
    "([^\\s:\\[]+)(?:\\[(\\d+)\\])?: " +                  // 4 tag, 5 pid
    "(.*)$"                                               // 6 msg

  /** ParseSyslog: structured fields from a syslog line column; severity/
    * facility derived from PRI (pri = facility*8 + severity). */
  def parseSyslog(df: DataFrame, lineCol: String): DataFrame = {
    // ONE regex match per row (r19 — the parseCef treatment; was a
    // rlike+extract pair per field). A non-matching line yields a null
    // groups array, so every field below is the old when(rlike, …)
    // value; an absent OPTIONAL group (pri/pid) captured null, which
    // regexp_extract — and RegexGroups — surface as "".
    val g = col("__sl_g")
    def grp(i: Int): Column = element_at(g, i)
    // optional groups capture "" when absent — null them before the cast
    // (ANSI mode rejects cast('' as int))
    val pri = when(grp(1) =!= "", grp(1)).cast("int")
    df.withColumn("__sl_g",
        graft.plans.RegexExpressions.regexGroups(col(lineCol), syslogRegex))
      .withColumn("pri", pri)
      .withColumn("facility", floor(pri / 8).cast("int"))
      .withColumn("severity", (pri % 8).cast("int"))
      .withColumn("sl_ts", grp(2))
      .withColumn("sl_host", grp(3))
      .withColumn("sl_tag", grp(4))
      .withColumn("sl_pid", when(grp(5) =!= "", grp(5)).cast("int"))
      .withColumn("sl_msg", grp(6))
      .drop("__sl_g")
  }

  /** PutSyslog's formatting half (r13): compose an RFC 3164 line from
    * columns — the exact inverse of [[parseSyslog]], so a
    * putSyslog → ListenSyslog → parseSyslog round-trip recovers every
    * field (the spec pins it). pri = facility·8 + severity (§4.1.1).
    * Pure codegen'd concat — format then hand to `Net.putTcp`/`putUdp`
    * (or any sink). */
  def syslogLine(facility: Column, severity: Column, ts: Column, host: Column,
                 tag: Column, msg: Column): Column =
    concat(lit("<"), (facility * 8 + severity).cast("int").cast("string"), lit(">"),
      ts, lit(" "), host, lit(" "), tag, lit(": "), msg)

  /** Dotted-quad IPv4 → unsigned 32-bit value as a long (for range/CIDR
    * joins). Null for malformed addresses (ANSI-safe). */
  def ipv4ToLong(c: Column): Column = {
    val p = split(c, "\\.")
    def oct(i: Int): Column = element_at(p, i).cast("long")
    when(c.rlike("^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$") &&
         oct(1) <= 255 && oct(2) <= 255 && oct(3) <= 255 && oct(4) <= 255,
      oct(1) * 16777216L + oct(2) * 65536L + oct(3) * 256L + oct(4))
  }

  /** ParseCEF (NiFi ParseCEF): ArcSight Common Event Format —
    * `CEF:version|vendor|product|device_version|sig_id|name|severity|ext`
    * where `ext` is space-separated key=value pairs. Header fields split
    * on UNESCAPED `|` — each header group is `(?:\\.|[^|\\])*`, so a
    * spec-legal `\|` (or any other backslash escape) inside a header
    * value stays within its field instead of desyncing the rest of the
    * line. Escapes are NOT unquoted in the output (values carry the raw
    * `\|`). Requested extension keys are pulled with anchored regexes
    * (a value runs until the next ` key=` or end). Narrow. */
  def parseCef(df: DataFrame, lineCol: String,
               extensionKeys: Seq[String]): DataFrame = {
    val h = "((?:\\\\.|[^|\\\\])*)" // one header field honoring CEF escaping
    val hdr = s"^CEF:(\\d+)\\|$h\\|$h\\|$h\\|$h\\|$h\\|$h\\|(.*)$$"
    // ONE header match per row (r19): the groups array is materialized
    // as its own column — NULL when the line doesn't match, so each
    // element_at below is exactly the old when(rlike, extract) value.
    // CollapseProject keeps a non-cheap multi-referenced producer in
    // its own Project, so the match runs once however many fields read
    // it (was ~9 full matches/row as per-field rlike+extract pairs).
    val g = col("__cef_g")
    def grp(i: Int): Column = element_at(g, i)
    val base = df
      .withColumn("__cef_g", graft.plans.RegexExpressions.regexGroups(col(lineCol), hdr))
      .withColumn("cef_version", when(grp(1) =!= "", grp(1)).cast("int"))
      .withColumn("cef_vendor", grp(2))
      .withColumn("cef_product", grp(3))
      .withColumn("cef_device_version", grp(4))
      .withColumn("cef_sig_id", grp(5))
      .withColumn("cef_name", grp(6))
      .withColumn("cef_severity", grp(7))
      .withColumn("__ext", grp(8))
      .drop("__cef_g")
    extensionKeys.foldLeft(base) { (d, k) =>
      val kq = java.util.regex.Pattern.quote(k)
      val pat = s"(?:^|\\s)$kq=(.*?)(?=\\s+\\S+=|$$)"
      d.withColumn(s"cef_$k",
        element_at(graft.plans.RegexExpressions.regexGroups(col("__ext"), pat), 1))
    }.drop("__ext")
  }

  /** ValidateCsv: check a delimited line column against per-field rules.
    * `fieldRules` = (1-based field index, rule name, validator over the
    * extracted field). Adds `violations` and `is_valid` like
    * [[Records.validate]]; a missing field (index past the split) is a
    * violation of that rule. */
  def validateCsv(df: DataFrame, lineCol: String, delim: String,
                  expectedFields: Int,
                  fieldRules: Seq[(Int, String, Column => Column)]): DataFrame = {
    // r19: materialize the split ONCE — it was inlined into every
    // rule's size/element_at pair (~2 regex splits of the line per
    // rule); as its own multi-referenced projection column it is
    // evaluated once per row (CollapseProject keeps it).
    val parts = col("__csv_parts")
    val arity: (String, Column) = "field_count" -> (size(parts) === expectedFields)
    val rules: Seq[(String, Column)] = arity +: fieldRules.map {
      case (idx, name, rule) =>
        name -> (size(parts) >= idx && coalesce(rule(element_at(parts, idx)), lit(false)))
    }
    Records.validate(
      df.withColumn("__csv_parts",
        split(col(lineCol), java.util.regex.Pattern.quote(delim), -1)),
      rules: _*).drop("__csv_parts")
  }

  /** ExtractEmailHeaders (NiFi): named RFC-822/5322 headers from a raw
    * message column. The header block ends at the first blank line;
    * folded continuation lines (leading whitespace) are unfolded before
    * matching; header names match case-insensitively, first occurrence
    * wins (RFC 5322 trace-field convention). Output columns
    * `email_<name>` (lowercased, `-`→`_`). Narrow, regex-only. */
  def extractEmailHeaders(df: DataFrame, msgCol: String,
                          headers: Seq[String]): DataFrame = {
    // header block = everything before the first blank line; unfold
    // CRLF/NL + leading-whitespace continuations into single spaces.
    // r19: the block is materialized ONCE per row (it was inlined into
    // every header's rlike+extract pair, re-running its two regex
    // passes over the whole message per header), and each header then
    // costs one match over the short block instead of two.
    val block = regexp_replace(
      regexp_extract(col(msgCol), "(?s)^(.*?)(?:\\r?\\n\\r?\\n|$)", 1),
      "\\r?\\n[ \\t]+", " ")
    val withBlock = df.withColumn("__hdr_block", block)
    headers.foldLeft(withBlock) { (d, h) =>
      val hq = java.util.regex.Pattern.quote(h)
      val pat = s"(?im)^$hq:[ \\t]*(.*?)[ \\t]*$$"
      val out = "email_" + h.toLowerCase.replace('-', '_')
      d.withColumn(out, element_at(
        graft.plans.RegexExpressions.regexGroups(col("__hdr_block"), pat), 1))
    }.drop("__hdr_block")
  }

  /** ExtractEmailAttachments (NiFi): explode a raw MIME multipart
    * message into one row per attachment part —
    * (attach_name, attach_type, attach_bytes) appended to the input
    * row. RFC 2045/2046 subset, JDK-only: boundary from the top-level
    * Content-Type, parts split on the dash-boundary lines, per-part
    * headers unfolded; base64 and quoted-printable transfer encodings
    * decoded (7bit/8bit pass through as UTF-8 bytes). Parts without a
    * Content-Disposition filename (inline bodies) are skipped, like
    * the NiFi processor. Messages that aren't multipart produce no
    * rows. Narrow per-row work — no shuffle. */
  def extractEmailAttachments(df: DataFrame, msgCol: String): DataFrame = {
    val parse = udf { (msg: String) =>
      if (msg == null) Array.empty[(String, String, Array[Byte])]
      else MimeParser.attachments(msg).toArray
    }
    df.withColumn("__att", explode(parse(col(msgCol))))
      .withColumn("attach_name", col("__att._1"))
      .withColumn("attach_type", col("__att._2"))
      .withColumn("attach_bytes", col("__att._3"))
      .drop("__att")
  }
}

/** Minimal RFC 2045/2046 MIME multipart reader backing
  * [[Parse.extractEmailAttachments]] — deliberately a subset: one
  * nesting level (multipart/mixed of leaf parts; nested multiparts are
  * recursed into), base64 + quoted-printable decoders from the RFC
  * text, no charset transcoding (bytes are the deliverable). */
private[operators] object MimeParser {
  private val HeaderEnd = "\\r?\\n\\r?\\n".r

  private def headerBlock(s: String): (Map[String, String], String) = {
    val m = HeaderEnd.findFirstMatchIn(s)
    val (head, body) = m match {
      case Some(mm) => (s.substring(0, mm.start), s.substring(mm.end))
      case None => (s, "")
    }
    val unfolded = head.replaceAll("\\r?\\n[ \\t]+", " ")
    val hs = unfolded.split("\\r?\\n").toSeq.flatMap { line =>
      val i = line.indexOf(':')
      if (i <= 0) None
      else Some(line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim)
    }.toMap
    (hs, body)
  }

  private def param(headerValue: String, name: String): Option[String] = {
    val p = ("(?i)" + java.util.regex.Pattern.quote(name) + "=\"?([^\";]+)\"?").r
    p.findFirstMatchIn(headerValue).map(_.group(1))
  }

  private def decode(body: String, encoding: String): Array[Byte] =
    encoding.toLowerCase match {
      case "base64" =>
        java.util.Base64.getMimeDecoder.decode(body.replaceAll("\\s", ""))
      case "quoted-printable" =>
        val b = new scala.collection.mutable.ArrayBuffer[Byte]()
        // soft line breaks removed first (RFC 2045 §6.7 rule 5)
        val s = body.replaceAll("=\\r?\\n", "")
        def hexDigit(c: Char): Int =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else -1
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          // a malformed escape ('=ZZ', '=' at end) is emitted literally
          // (RFC 2045 §6.7: "a reasonable approach ... include the '='
          // character and the following character") instead of throwing
          // and failing the whole Spark task
          val hi = if (c == '=' && i + 2 < s.length) hexDigit(s.charAt(i + 1)) else -1
          val lo = if (hi >= 0) hexDigit(s.charAt(i + 2)) else -1
          if (hi >= 0 && lo >= 0) {
            b += ((hi << 4) | lo).toByte
            i += 3
          } else { b += c.toByte; i += 1 }
        }
        b.toArray
      case _ => body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }

  /** (filename, content-type, bytes) for every attachment part. */
  def attachments(msg: String): Seq[(String, String, Array[Byte])] = {
    val (hs, body) = headerBlock(msg)
    val ct = hs.getOrElse("content-type", "")
    if (!ct.toLowerCase.startsWith("multipart/")) return Nil
    param(ct, "boundary") match {
      case None => Nil
      case Some(b) =>
        val delim = "--" + b
        // parts live between dash-boundary LINES — RFC 2046 §5.1.1 says
        // the delimiter is the boundary preceded by CRLF (or at the very
        // start), so body text merely CONTAINING '--boundary' mid-line
        // must not split a part
        body.split("(^|\\r?\\n)" + java.util.regex.Pattern.quote(delim))
          .drop(1) // preamble
          .takeWhile(p => !p.startsWith("--"))
          .toSeq.flatMap { raw =>
            val part = raw.replaceFirst("^\\r?\\n", "")
            val (ph, pbody) = headerBlock(part)
            val pct = ph.getOrElse("content-type", "text/plain")
            if (pct.toLowerCase.startsWith("multipart/"))
              attachments(part) // nested multipart
            else {
              val disp = ph.getOrElse("content-disposition", "")
              param(disp, "filename").orElse(param(pct, "name")).map { fn =>
                val enc = ph.getOrElse("content-transfer-encoding", "7bit")
                // the CRLF preceding the next boundary belongs to the
                // delimiter and was consumed by the line-start split —
                // pbody is exactly the part's content
                (fn, pct.split(";")(0).trim, decode(pbody, enc))
              }
            }
          }
    }
  }
}
