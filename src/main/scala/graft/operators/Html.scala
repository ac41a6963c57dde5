package graft.operators

import scala.collection.mutable

/** HTML → text extraction for crawl-sourced corpora (SURVEY §2.4; the
  * r15 verdict's "largest remaining distance between curation panel and
  * curation pipeline"): every real pretraining chain (C4, CCNet,
  * RefinedWeb, FineWeb) STARTS from raw HTML, so the curation panel
  * needs a stage-0 that turns markup into main-content text.
  *
  * Two public algorithms, both JDK-only and hand-rolled:
  *
  *  - [[stripTags]]: the trivial full-text form — drop tags, scripts,
  *    styles, comments; decode entities; normalize whitespace.
  *  - [[extractMainText]]: jusText-style main-content extraction
  *    (Pomikálek, "Removing boilerplate and duplicate content from web
  *    corpora", 2011 — the published block-classification algorithm
  *    also used by corpus pipelines such as cs.fit sources of C4-era
  *    cleaners): segment into blocks at block-level tags, score each
  *    block by length / link density / stopword density, classify
  *    good·near-good·short·bad context-free, then resolve short and
  *    near-good blocks from their good/bad neighbors. The documented
  *    no-stoplist mode (stopLow = stopHigh = 0) reduces the classifier
  *    to length + link-density evidence — the right setting for
  *    non-English or synthetic corpora.
  *
  * The tokenizer is deliberately tolerant (real crawl HTML is soup):
  * unclosed tags, attribute junk, stray `<`, comments, CDATA and
  * doctypes all pass through without throwing; `<script>`/`<style>`
  * bodies are raw-text until their matching close tag per the HTML
  * spec's raw-text element rule.
  *
  * Scale posture: pure per-row string work behind native expressions
  * ([[graft.plans.HtmlMainText]]) — no shuffle, no UDF, fully
  * pipelined with the scan; the curation panel downstream is unchanged.
  */
object Html {

  /** One text block between block-level tag boundaries.
    * `linkChars` counts characters emitted inside `<a>` elements —
    * the numerator of jusText's link density. */
  final case class Block(text: String, linkChars: Int)

  /** Block-level elements (HTML spec block boundaries + the HTML5
    * sectioning set): a block flushes when one opens OR closes. */
  private val BlockTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "center", "col", "colgroup", "dd", "details", "dialog", "div", "dl",
    "dt", "fieldset", "figcaption", "figure", "footer", "form", "h1",
    "h2", "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "html",
    "legend", "li", "main", "menu", "nav", "ol", "optgroup", "option",
    "p", "pre", "section", "select", "summary", "table", "tbody", "td",
    "textarea", "tfoot", "th", "thead", "title", "tr", "ul")

  /** Raw-text elements: content is not markup until the matching close
    * tag. `title`/`textarea` are escapable-raw-text (entities decode),
    * handled the same way here minus entity subtleties. */
  private val RawTextTags: Set[String] = Set("script", "style")

  /** Elements whose text never belongs to extractable content. */
  private val DropTags: Set[String] = Set("script", "style", "noscript",
    "template", "iframe", "object", "embed", "svg", "head")

  /** HTML void elements: never have content or a close tag, so they
    * must parse as self-closing even without the XHTML `/` — otherwise
    * a bare `<embed>` (a DropTag) would swallow the rest of the
    * document, and a selector matching `<img>` would capture to EOF. */
  private val VoidTags: Set[String] = Set("area", "base", "br", "col",
    "embed", "hr", "img", "input", "link", "meta", "param", "source",
    "track", "wbr")

  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "amp;" -> "&",
    "shy" -> "", "times" -> "×", "middot" -> "·")

  /** Decode `&name;`, `&#123;` and `&#x1f;` entities; unknown names
    * stay literal (crawl text contains bare `&`). */
  private[operators] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 10) { out.append('&'); i += 1 }
        else {
          val name = s.substring(i + 1, semi)
          if (name.startsWith("#x") || name.startsWith("#X")) {
            try { out.appendCodePoint(Integer.parseInt(name.substring(2), 16)); i = semi + 1 }
            catch { case _: Exception => out.append('&'); i += 1 }
          } else if (name.startsWith("#")) {
            try { out.appendCodePoint(Integer.parseInt(name.substring(1))); i = semi + 1 }
            catch { case _: Exception => out.append('&'); i += 1 }
          } else NamedEntities.get(name.toLowerCase(java.util.Locale.ROOT)) match {
            case Some(rep) => out.append(rep); i = semi + 1
            case None => out.append('&'); i += 1
          }
        }
      }
    }
    out.toString
  }

  private def normalizeWs(s: String): String =
    s.split("\\s+").filter(_.nonEmpty).mkString(" ")

  /** Case-insensitive `</name` scan without copying the document
    * (a per-script `toLowerCase` of the whole page would be O(n²) on
    * script-heavy crawl HTML). Returns -1 when unclosed. */
  private def findCloseTag(html: String, name: String, from: Int): Int = {
    val target = "</" + name
    var i = from
    val n = html.length
    while (i >= 0 && i + target.length <= n) {
      i = html.indexOf('<', i)
      if (i < 0 || i + target.length > n) return -1
      if (html.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  /** Tokenize `html` into text blocks. Single pass; see the class
    * scaladoc for tolerance rules. */
  def blocks(html: String): Vector[Block] = {
    val out = mutable.ArrayBuffer.empty[Block]
    val buf = new java.lang.StringBuilder
    var linkChars = 0
    var linkDepth = 0
    var dropDepth = 0 // inside script/style/noscript/head/...
    def flush(): Unit = {
      val t = normalizeWs(decodeEntities(buf.toString))
      if (t.nonEmpty) out += Block(t, math.min(linkChars, t.length))
      buf.setLength(0); linkChars = 0
    }
    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') {
        if (dropDepth == 0) {
          buf.append(c)
          if (linkDepth > 0 && !Character.isWhitespace(c)) linkChars += 1
        }
        i += 1
      } else if (html.startsWith("<!--", i)) {
        val end = html.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
      } else if (html.startsWith("<![CDATA[", i)) {
        val end = html.indexOf("]]>", i + 9)
        i = if (end < 0) n else end + 3
      } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
        val end = html.indexOf('>', i + 1) // doctype / processing instruction
        i = if (end < 0) n else end + 1
      } else {
        // parse a tag: </name ...> or <name attr="..." ...>
        var j = i + 1
        val closing = j < n && html.charAt(j) == '/'
        if (closing) j += 1
        val nameStart = j
        while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-')) j += 1
        val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
        if (name.isEmpty) { // stray '<' — literal text
          if (dropDepth == 0) buf.append('<')
          i += 1
        } else {
          // find tag end, honoring quoted attribute values
          var k = j
          var q = 0.toChar
          while (k < n && (q != 0 || html.charAt(k) != '>')) {
            val ch = html.charAt(k)
            if (q != 0) { if (ch == q) q = 0 }
            else if (ch == '"' || ch == '\'') q = ch
            k += 1
          }
          val selfClose = k > i && k <= n && html.charAt(math.min(k, n) - 1) == '/'
          val tagEnd = if (k < n) k + 1 else n
          if (!closing && RawTextTags(name)) {
            // raw text: skip to the matching </name>
            val close = findCloseTag(html, name, tagEnd)
            if (BlockTags(name)) flush()
            i = if (close < 0) n else {
              val gt = html.indexOf('>', close)
              if (gt < 0) n else gt + 1
            }
          } else {
            val effSelfClose = selfClose || VoidTags(name)
            if (BlockTags(name)) flush()
            if (DropTags(name) && !RawTextTags(name)) {
              if (closing) dropDepth = math.max(0, dropDepth - 1)
              else if (!effSelfClose) dropDepth += 1
            }
            if (name == "a") {
              if (closing) linkDepth = math.max(0, linkDepth - 1)
              else if (!effSelfClose) linkDepth += 1
            }
            // separate inline flow across tags with a space only for
            // <br>-like voids? No: text "a<b>c</b>" must stay "ac"-free
            // of false joins — jusText keeps inline text contiguous, so
            // nothing is appended here.
            i = tagEnd
          }
        }
      }
    }
    flush()
    out.toVector
  }

  /** Full-text strip: every retained block joined by newline. */
  def stripTags(html: String): String =
    blocks(html).map(_.text).mkString("\n")

  /** Default English stoplist (compact function-word core — the
    * heuristic needs density, not linguistic coverage). */
  val EnglishStopwords: Set[String] = Set(
    "a", "about", "above", "after", "again", "all", "an", "and", "any",
    "are", "as", "at", "be", "because", "been", "before", "being",
    "below", "between", "both", "but", "by", "can", "did", "do", "does",
    "down", "during", "each", "few", "for", "from", "further", "had",
    "has", "have", "he", "her", "here", "him", "his", "how", "i", "if",
    "in", "into", "is", "it", "its", "just", "me", "more", "most", "my",
    "no", "nor", "not", "now", "of", "off", "on", "once", "only", "or",
    "other", "our", "out", "over", "own", "same", "she", "so", "some",
    "such", "than", "that", "the", "their", "them", "then", "there",
    "these", "they", "this", "those", "through", "to", "too", "under",
    "until", "up", "very", "was", "we", "were", "what", "when", "where",
    "which", "while", "who", "why", "will", "with", "you", "your")

  /** jusText context-free classes. */
  private final val Bad = 0
  private final val Short = 1
  private final val NearGood = 2
  private final val Good = 3

  /** jusText main-content extraction; returns the good blocks' text
    * joined by `"\n"`.
    *
    * Context-free classification per block (published defaults
    * lengthLow=70, lengthHigh=200, stopLow=0.30, stopHigh=0.32,
    * maxLinkDensity=0.2):
    *   1. link density > maxLinkDensity → bad
    *   2. contains © or "&copy;" → bad (the published copyright rule)
    *   3. length < lengthLow → bad if any link chars, else short
    *   4. stopword density ≥ stopHigh → good if length > lengthHigh,
    *      else near-good
    *   5. stopword density ≥ stopLow → near-good
    *   6. otherwise bad
    * No-stoplist mode: stopLow = stopHigh = 0 (every density passes
    * rule 4) — the published recommendation when no stoplist exists
    * for the corpus language.
    *
    * Context pass (the graft-pinned resolution of the published
    * neighborhood rule): for each short/near-good block, look at the
    * nearest context-free good/bad neighbor on each side;
    * near-good → good iff either neighbor is good; short → good iff
    * BOTH neighbors are good. Edges count as bad. */
  def extractMainText(html: String,
                      stopwords: Set[String] = EnglishStopwords,
                      lengthLow: Int = 70, lengthHigh: Int = 200,
                      stopLow: Double = 0.30, stopHigh: Double = 0.32,
                      maxLinkDensity: Double = 0.2): String = {
    val bs = blocks(html)
    if (bs.isEmpty) return ""
    val cls = bs.map { b =>
      val len = b.text.length
      val linkDensity = if (len == 0) 0.0 else b.linkChars.toDouble / len
      lazy val words = b.text.toLowerCase(java.util.Locale.ROOT).split(" ")
      lazy val stopDensity =
        if (stopLow <= 0 && stopHigh <= 0) 1.0 // no-stoplist mode
        else if (words.isEmpty) 0.0
        else words.count(stopwords.contains).toDouble / words.length
      if (linkDensity > maxLinkDensity) Bad
      else if (b.text.contains("©") || b.text.contains("&copy;")) Bad
      else if (len < lengthLow) { if (b.linkChars > 0) Bad else Short }
      else if (stopDensity >= stopHigh) { if (len > lengthHigh) Good else NearGood }
      else if (stopDensity >= stopLow) NearGood
      else Bad
    }.toArray
    // context pass over the context-free classes
    val n = cls.length
    val prevCtx = new Array[Int](n) // nearest good/bad to the left (Bad at edge)
    var run = Bad
    var i = 0
    while (i < n) {
      prevCtx(i) = run
      if (cls(i) == Good || cls(i) == Bad) run = cls(i)
      i += 1
    }
    val nextCtx = new Array[Int](n)
    run = Bad
    i = n - 1
    while (i >= 0) {
      nextCtx(i) = run
      if (cls(i) == Good || cls(i) == Bad) run = cls(i)
      i -= 1
    }
    val keep = (0 until n).filter { k =>
      cls(k) match {
        case Good => true
        case NearGood => prevCtx(k) == Good || nextCtx(k) == Good
        case Short => prevCtx(k) == Good && nextCtx(k) == Good
        case _ => false
      }
    }
    keep.map(k => bs(k).text).mkString("\n")
  }

  // ------------------------------------------------------------------
  // CSS-selector-lite over the same tokenizer (GetHTMLElement below)

  /** A parsed element for selector matching. */
  private final case class El(name: String, id: String, classes: Set[String],
                              attrs: Map[String, String])

  private def parseAttrs(s: String): Map[String, String] = {
    val m = mutable.Map.empty[String, String]
    val p = java.util.regex.Pattern.compile(
      """([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("([^"]*)"|'([^']*)'|[^\s>]*))?""")
    val mt = p.matcher(s)
    while (mt.find()) {
      val k = mt.group(1).toLowerCase(java.util.Locale.ROOT)
      val v = Option(mt.group(3)).orElse(Option(mt.group(4)))
        .getOrElse(Option(mt.group(2)).getOrElse(""))
      if (k.nonEmpty) m(k) = v
    }
    m.toMap
  }

  /** Minimal CSS selector: `tag`, `#id`, `.class`, `tag.class`,
    * `tag#id`, and `[attr=value]` suffixes — the working subset of
    * NiFi's GetHTMLElement property (which delegates to jsoup).
    * Returns the matched elements' inner TEXT (entity-decoded,
    * whitespace-normalized), in document order. */
  private val SelectorPattern = java.util.regex.Pattern
    .compile("""^([a-zA-Z][a-zA-Z0-9-]*)?(#[\w-]+)?((?:\.[\w-]+)*)((?:\[[^\]]+\])*)$""")

  /** Validate a GetHTMLElement selector without running it — NiFi
    * rejects an invalid selector at processor validation, so the flow
    * compiler calls this once per processor rather than letting a bad
    * selector throw per-row at execution time. */
  def validateSelector(selector: String): Unit = {
    val sel = selector.trim
    require(sel.nonEmpty && SelectorPattern.matcher(sel).matches(),
      s"GetHTMLElement: unsupported selector '$selector'")
  }

  def selectText(html: String, selector: String): Vector[String] = {
    val sel = selector.trim
    val m = SelectorPattern.matcher(sel)
    require(m.matches(), s"GetHTMLElement: unsupported selector '$selector'")
    val wantTag = Option(m.group(1)).map(_.toLowerCase(java.util.Locale.ROOT))
    val wantId = Option(m.group(2)).map(_.drop(1))
    val wantClasses = Option(m.group(3)).filter(_.nonEmpty)
      .map(_.split('.').filter(_.nonEmpty).toSet).getOrElse(Set.empty[String])
    val wantAttrs = Option(m.group(4)).filter(_.nonEmpty).map { g =>
      g.drop(1).dropRight(1).split("\\]\\[").map { kv =>
        val eq = kv.indexOf('=')
        if (eq < 0) kv -> null
        else kv.substring(0, eq) ->
          kv.substring(eq + 1).stripPrefix("\"").stripSuffix("\"")
      }.toMap
    }.getOrElse(Map.empty[String, String])

    def matches(el: El): Boolean =
      wantTag.forall(_ == el.name) &&
      wantId.forall(id => el.id == id) &&
      wantClasses.subsetOf(el.classes) &&
      wantAttrs.forall { case (k, v) =>
        el.attrs.get(k).exists(av => v == null || av == v) }

    val out = mutable.ArrayBuffer.empty[String]
    // depth of currently-matched elements; capture text under any match
    var captureDepth = 0
    val capture = new java.lang.StringBuilder
    val stack = mutable.ArrayBuffer.empty[(String, Boolean)] // (name, wasMatch)
    var dropDepth = 0
    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') {
        if (captureDepth > 0 && dropDepth == 0) capture.append(c)
        i += 1
      } else if (html.startsWith("<!--", i)) {
        val e = html.indexOf("-->", i + 4); i = if (e < 0) n else e + 3
      } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
        val e = html.indexOf('>', i + 1); i = if (e < 0) n else e + 1
      } else {
        var j = i + 1
        val closing = j < n && html.charAt(j) == '/'
        if (closing) j += 1
        val nameStart = j
        while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-')) j += 1
        val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
        if (name.isEmpty) { if (captureDepth > 0) capture.append('<'); i += 1 }
        else {
          // block boundaries separate inner text (the jsoup .text()
          // contract): "<p>a</p><p>b</p>" reads "a b", never "ab"
          if (captureDepth > 0 && BlockTags(name)) capture.append(' ')
          var k = j; var q = 0.toChar
          while (k < n && (q != 0 || html.charAt(k) != '>')) {
            val ch = html.charAt(k)
            if (q != 0) { if (ch == q) q = 0 }
            else if (ch == '"' || ch == '\'') q = ch
            k += 1
          }
          val selfClose = k > i && html.charAt(math.min(k, n) - 1) == '/'
          val tagEnd = if (k < n) k + 1 else n
          if (!closing && RawTextTags(name)) {
            val close = findCloseTag(html, name, tagEnd)
            i = if (close < 0) n else {
              val gt = html.indexOf('>', close); if (gt < 0) n else gt + 1
            }
          } else if (closing) {
            // pop to the matching open tag if present
            val idx = stack.lastIndexWhere(_._1 == name)
            if (idx >= 0) {
              val popped = stack.size - idx
              (0 until popped).foreach { _ =>
                val (popName, wasMatch) = stack.remove(stack.size - 1)
                if (DropTags(popName)) dropDepth = math.max(0, dropDepth - 1)
                if (wasMatch) {
                  captureDepth -= 1
                  if (captureDepth == 0) {
                    out += normalizeWs(decodeEntities(capture.toString))
                    capture.setLength(0)
                  }
                }
              }
            }
            i = tagEnd
          } else {
            val attrStr = html.substring(j, math.min(k, n))
            val attrs = parseAttrs(attrStr)
            val el = El(name, attrs.getOrElse("id", ""),
              attrs.get("class").map(_.split("\\s+").filter(_.nonEmpty).toSet)
                .getOrElse(Set.empty), attrs)
            val isMatch = matches(el)
            if (!selfClose && !VoidTags(name)) {
              stack += ((name, isMatch))
              if (isMatch) captureDepth += 1
              if (DropTags(name)) dropDepth += 1
            } else if (isMatch) out += "" // void/self-closed match: empty text
            i = tagEnd
          }
        }
      }
    }
    // unclosed matched elements flush at EOF
    while (stack.nonEmpty) {
      val (popName, wasMatch) = stack.remove(stack.size - 1)
      if (DropTags(popName)) dropDepth = math.max(0, dropDepth - 1)
      if (wasMatch) {
        captureDepth -= 1
        if (captureDepth == 0) {
          out += normalizeWs(decodeEntities(capture.toString))
          capture.setLength(0)
        }
      }
    }
    out.toVector
  }

  // ------------------------------------------------------------------
  // DataFrame operators (flow vocabulary)

  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions.{col, explode}

  /** ExtractHTMLMainContent: content column → main-text column via the
    * jusText classifier (native expression; narrow). */
  def extractMain(df: DataFrame, contentCol: String = "content",
                  outCol: String = "main_text", useStoplist: Boolean = true,
                  lengthLow: Int = 70, lengthHigh: Int = 200,
                  maxLinkDensity: Double = 0.2): DataFrame =
    df.withColumn(outCol, graft.plans.HtmlFunctions.mainText(
      col(contentCol), useStoplist, lengthLow, lengthHigh, maxLinkDensity))

  /** GetHTMLElement (NiFi html bundle): one row per element matching
    * the CSS-lite selector, inner text in `outCol`; rows without a
    * match drop (NiFi routes those originals to not-found). */
  def getElement(df: DataFrame, contentCol: String, selector: String,
                 outCol: String = "element"): DataFrame =
    df.withColumn(outCol,
      explode(graft.plans.HtmlFunctions.selectText(col(contentCol), selector)))
}
