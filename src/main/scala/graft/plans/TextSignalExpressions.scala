package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass replacements for the `TextAnalysis` signal
  * columns (r19 optimization round, guide §"per-task work" / §4).
  *
  * The original formulations composed builtins:
  * `filter(split(c,"\\s+"), len>0)` for tokens, then per-signal
  * higher-order functions (`ArrayFilter` with `array_contains(lower(t))`
  * lambdas) and regex passes (`regexp_replace` ×3 for cjk/alpha/
  * non-space lengths). Two structural costs at per-row grain:
  * HOF lambdas are interpreted per ELEMENT (no codegen, boxing per
  * token), and each signal re-evaluates the shared `split` + its own
  * regex scan — `langId` alone walked the text ~10× per row (4 stopword
  * filters over re-split tokens + 3 regex rewrites). Bench r19 baseline:
  * q_lang_id 2.08 s for 5 000 × 300-char rows ≈ 0.4 ms/row of pure
  * expression work.
  *
  * These expressions compute each signal in ONE allocation-free walk of
  * the UTF-8 bytes. The arithmetic mirrors the Column formulations
  * OPERAND FOR OPERAND (same int counts, same cast-to-double division,
  * same greatest/fold shapes), so every declared oracle sees
  * bit-identical output — TextSignalSpec pins equality against the
  * original Column chains on adversarial inputs (CJK, NULLs, empty,
  * uppercase Unicode, ws-only).
  *
  * Tokenization contract (shared with [[TextHash.isWs]] and every
  * DuckDB oracle): tokens are maximal runs of non-`\s` bytes where `\s`
  * is exactly Java-regex `[ \t\n\x0B\f\r]`; `length()` counts
  * codepoints like Spark's `Length`; `lower()` is
  * `UTF8String.toLowerCase` (ASCII fast path, JDK full mapping
  * otherwise) — the same call Spark's `Lower` makes.
  */
object TextSignal {

  /** Stopword profiles in fold order (en < es < de < fr) — the
    * canonical lists `TextAnalysis.profiles` documents and every
    * langid oracle replays. All entries are ≤4 ASCII chars (packed
    * lookup below depends on it; the require gates additions). */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "a", "that", "it", "for", "was", "on", "with"),
    "es" -> Seq("de", "la", "que", "el", "en", "y", "los", "del", "se", "las", "por", "un", "para"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich", "des", "auf", "ist"),
    "fr" -> Seq("de", "la", "le", "et", "les", "des", "en", "un", "du", "une", "que", "est", "pour"))

  /** Lowered ≤4-byte ASCII token packed into a long:
    * bytes little-endian in the low 32 bits, length in bits 32+. */
  @inline private def pack(b0: Int, b1: Int, b2: Int, b3: Int, len: Int): Long =
    ((len.toLong) << 32) |
      ((b3.toLong & 0xFF) << 24) | ((b2.toLong & 0xFF) << 16) |
      ((b1.toLong & 0xFF) << 8) | (b0.toLong & 0xFF)

  // sorted (key, langMask) arrays for allocation-free binary search
  private val (stopKeys, stopMasks): (Array[Long], Array[Int]) = {
    val m = scala.collection.mutable.Map[Long, Int]()
    profiles.zipWithIndex.foreach { case ((_, words), li) =>
      words.foreach { w =>
        require(w.length <= 4 && w.forall(ch => ch >= 'a' && ch <= 'z'),
          s"stopword '$w' must be <=4 lowercase ASCII chars for packed lookup")
        val b = w.getBytes("US-ASCII")
        def at(i: Int): Int = if (i < b.length) b(i).toInt else 0
        val k = pack(at(0), at(1), at(2), at(3), b.length)
        m(k) = m.getOrElse(k, 0) | (1 << li)
      }
    }
    val sorted = m.toArray.sortBy(_._1)
    (sorted.map(_._1), sorted.map(_._2))
  }

  @inline private def stopMask(key: Long): Int = {
    val idx = java.util.Arrays.binarySearch(stopKeys, key)
    if (idx >= 0) stopMasks(idx) else 0
  }

  /** Lang-mask of one token given its bytes — the exact value
    * `array_contains(stop_l, lower(t))` tests per language. ASCII
    * tokens lower in place; non-ASCII tokens take
    * `UTF8String.toLowerCase` (full JDK mapping, e.g. Kelvin
    * U+212A → 'k') and can only match if the result is ≤4 ASCII. */
  private def tokenMask(bytes: Array[Byte], start: Int, len: Int, ascii: Boolean): Int = {
    if (ascii) {
      if (len > 4) return 0
      @inline def low(i: Int): Int = {
        val b = bytes(start + i).toInt
        if (b >= 'A' && b <= 'Z') b + 32 else b
      }
      len match {
        case 1 => stopMask(pack(low(0), 0, 0, 0, 1))
        case 2 => stopMask(pack(low(0), low(1), 0, 0, 2))
        case 3 => stopMask(pack(low(0), low(1), low(2), 0, 3))
        case _ => stopMask(pack(low(0), low(1), low(2), low(3), 4))
      }
    } else {
      val lowered = UTF8String.fromBytes(bytes, start, len).toLowerCase
      val lb = lowered.getBytes
      if (lb.length > 4) return 0
      var i = 0
      while (i < lb.length) { if (lb(i) < 0) return 0; i += 1 }
      def at(j: Int): Int = if (j < lb.length) lb(j).toInt else 0
      stopMask(pack(at(0), at(1), at(2), at(3), lb.length))
    }
  }

  /** One walk over the UTF-8 bytes: codepoint length, non-`\s`
    * codepoint count, CJK codepoint count, `\s+`-token count, and (when
    * `needStops`) per-language stopword hit counts. */
  final class Scan {
    var totalChars = 0 // length(c)
    var nonSpace = 0   // length(regexp_replace(c, "\\s+", ""))
    var cjk = 0        // CJK codepoints among nonSpace
    var nTokens = 0    // size(filter(split(c,"\\s+"), len>0))
    var en = 0; var es = 0; var de = 0; var fr = 0
  }

  def scan(u: UTF8String, needStops: Boolean): Scan = {
    val s = new Scan
    val bytes = u.getBytes
    val n = bytes.length
    var i = 0
    var tokStart = -1
    var tokAscii = true
    @inline def endToken(end: Int): Unit = {
      if (tokStart >= 0) {
        s.nTokens += 1
        if (needStops) {
          val mask = tokenMask(bytes, tokStart, end - tokStart, tokAscii)
          if (mask != 0) {
            if ((mask & 1) != 0) s.en += 1
            if ((mask & 2) != 0) s.es += 1
            if ((mask & 4) != 0) s.de += 1
            if ((mask & 8) != 0) s.fr += 1
          }
        }
        tokStart = -1; tokAscii = true
      }
    }
    while (i < n) {
      val b = bytes(i)
      if (b >= 0) { // ASCII: 1 byte = 1 codepoint
        s.totalChars += 1
        if (TextHash.isWs(b)) endToken(i)
        else { s.nonSpace += 1; if (tokStart < 0) tokStart = i }
        i += 1
      } else {
        // multi-byte codepoint: never \s, always token content
        if (tokStart < 0) tokStart = i
        tokAscii = false
        s.totalChars += 1
        s.nonSpace += 1
        val ub = b & 0xFF
        val seqLen = if (ub < 0xE0) 2 else if (ub < 0xF0) 3 else 4
        // CJK targets (U+3040–U+30FF, U+4E00–U+9FFF) are all 3-byte
        if (seqLen == 3 && i + 2 < n) {
          val cp = ((ub & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) | (bytes(i + 2) & 0x3F)
          if ((cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF)) s.cjk += 1
        }
        i += math.min(seqLen, n - i)
      }
    }
    endToken(n)
    s
  }

  /** Count of `[a-z]` codepoints in `lower(c)` — `alphaRatio`'s
    * numerator (`length(regexp_replace(lower(c), "[^a-z]", ""))`).
    * a–z bytes are unambiguous in UTF-8, so a byte count over the
    * lowered bytes is the codepoint count. */
  def alphaCount(u: UTF8String): Int = {
    val lb = u.toLowerCase.getBytes
    var i = 0; var c = 0
    while (i < lb.length) {
      val b = lb(i)
      if (b >= 'a' && b <= 'z') c += 1
      i += 1
    }
    c
  }
}

/** Tokens: `filter(split(c, "\\s+"), t => length(t) > 0)` as one pass —
  * array of maximal non-`\s` runs. */
case class WsTokens(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ws_tokens"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) >= 0 && TextHash.isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !(bytes(i) >= 0 && TextHash.isWs(bytes(i)))) i += 1
      if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `size(wsTokens(c)).cast("long")`. */
case class WsTokenCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ws_token_count"

  override protected def nullSafeEval(input: Any): Any =
    TextSignal.scan(input.asInstanceOf[UTF8String], needStops = false).nTokens.toLong

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `length(regexp_replace(c,"\\s+","")).cast(double) /
  *  greatest(tokenCount(c), 1L).cast(double)`. */
case class MeanTokenLen(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_mean_token_len"

  override protected def nullSafeEval(input: Any): Any = {
    val s = TextSignal.scan(input.asInstanceOf[UTF8String], needStops = false)
    s.nonSpace.toDouble / math.max(s.nTokens.toLong, 1L).toDouble
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `length(regexp_replace(lower(c),"[^a-z]","")).cast(double) /
  *  greatest(length(c), 1).cast(double)`. */
case class AlphaRatio(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_alpha_ratio"

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    TextSignal.alphaCount(u).toDouble / math.max(u.numChars(), 1).toDouble
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** English stopword share of tokens — `langScore(toks, "en")`:
  * `size(filter(toks, t => array_contains(stop_en, lower(t)))).cast(double)
  *  / greatest(size(toks), 1).cast(double)`. */
case class StopwordRatio(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_stopword_ratio"

  override protected def nullSafeEval(input: Any): Any = {
    val s = TextSignal.scan(input.asInstanceOf[UTF8String], needStops = true)
    s.en.toDouble / math.max(s.nTokens, 1).toDouble
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `TextAnalysis.qualityScore` composite, operand-identical:
  * `lenOk*0.25 + tokOk*0.25 + stopOk*0.2 + alphaRatio*0.3` with the
  * same left-associated adds and 1.0/0.0 gate literals. */
case class QualityScoreHeuristic(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_quality_score"

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = TextSignal.scan(u, needStops = true)
    val lenOk = if (s.totalChars >= 50 && s.totalChars <= 100000) 1.0 else 0.0
    val meanTok = s.nonSpace.toDouble / math.max(s.nTokens.toLong, 1L).toDouble
    val tokOk = if (meanTok >= 3.0 && meanTok <= 10.0) 1.0 else 0.0
    val stopRatio = s.en.toDouble / math.max(s.nTokens, 1).toDouble
    val stopOk = if (stopRatio >= 0.01) 1.0 else 0.0
    val alpha = TextSignal.alphaCount(u).toDouble / math.max(s.totalChars, 1).toDouble
    lenOk * 0.25 + tokOk * 0.25 + stopOk * 0.2 + alpha * 0.3
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `TextAnalysis.langId` decision, fold-identical: 'zh' when
  * cjkRatio > 0.3, else the best-scoring profile by strictly-greater
  * fold in en<es<de<fr order when ≥ minScore, else 'und'. NULL input
  * yields 'und' — exactly what the original when-chain produced
  * (every `when` condition is NULL, so the otherwise branch fires). */
case class LangIdHeuristic(child: Expression, minScore: Double)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_lang_id"

  private val und = UTF8String.fromString("und")
  private val zh = UTF8String.fromString("zh")
  private val langs = Array("en", "es", "de", "fr").map(UTF8String.fromString)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return und
    val s = TextSignal.scan(v.asInstanceOf[UTF8String], needStops = true)
    val cjkRatio = s.cjk.toDouble / math.max(s.nonSpace, 1).toDouble
    if (cjkRatio > 0.3) return zh
    val denom = math.max(s.nTokens, 1).toDouble
    val scores = Array(s.en.toDouble / denom, s.es.toDouble / denom,
      s.de.toDouble / denom, s.fr.toDouble / denom)
    var bestIdx = 0
    var best = scores(0)
    var i = 1
    while (i < 4) {
      if (scores(i) > best) bestIdx = i
      best = math.max(scores(i), best)
      i += 1
    }
    if (best >= minScore) langs(bestIdx) else und
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `size(regexp_extract_all(c, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]", 0))
  *  .cast("long")` — letter runs, digit runs, single other non-`\s`
  * codepoints, counted in one pass (greedy leftmost = maximal runs). */
case class BpeishCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpeish_count"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    var i = 0
    var count = 0L
    @inline def isLetter(b: Byte): Boolean =
      (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
    @inline def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
    while (i < n) {
      val b = bytes(i)
      if (b >= 0) {
        if (isLetter(b)) {
          count += 1
          while (i < n && bytes(i) >= 0 && isLetter(bytes(i))) i += 1
        } else if (isDigit(b)) {
          count += 1
          while (i < n && bytes(i) >= 0 && isDigit(bytes(i))) i += 1
        } else {
          if (!TextHash.isWs(b)) count += 1
          i += 1
        }
      } else {
        // non-ASCII codepoint: matches [^A-Za-z0-9\s] once
        count += 1
        val ub = b & 0xFF
        val seqLen = if (ub < 0xE0) 2 else if (ub < 0xF0) 3 else 4
        i += math.min(seqLen, n - i)
      }
    }
    count
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `lower(regexp_replace(c, "\\s+", " "))` — the fingerprint
  * normalization (collapse every `\s+` run to one space, then
  * `UTF8String.toLowerCase`) in one pass + one lower call. */
case class WsCollapseLower(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_ws_collapse_lower"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var i = 0
    var o = 0
    while (i < n) {
      val b = bytes(i)
      if (b >= 0 && TextHash.isWs(b)) {
        out(o) = ' '; o += 1
        i += 1
        while (i < n && bytes(i) >= 0 && TextHash.isWs(bytes(i))) i += 1
      } else {
        out(o) = b; o += 1
        i += 1
      }
    }
    UTF8String.fromBytes(out, 0, o).toLowerCase
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextSignalExpressions {
  def wsTokens(c: Column): Column =
    ColumnBridge.column(WsTokens(ColumnBridge.expression(c)))
  def wsTokenCount(c: Column): Column =
    ColumnBridge.column(WsTokenCount(ColumnBridge.expression(c)))
  def meanTokenLen(c: Column): Column =
    ColumnBridge.column(MeanTokenLen(ColumnBridge.expression(c)))
  def alphaRatio(c: Column): Column =
    ColumnBridge.column(AlphaRatio(ColumnBridge.expression(c)))
  def stopwordRatio(c: Column): Column =
    ColumnBridge.column(StopwordRatio(ColumnBridge.expression(c)))
  def qualityScore(c: Column): Column =
    ColumnBridge.column(QualityScoreHeuristic(ColumnBridge.expression(c)))
  def langId(c: Column, minScore: Double): Column =
    ColumnBridge.column(LangIdHeuristic(ColumnBridge.expression(c), minScore))
  def bpeishCount(c: Column): Column =
    ColumnBridge.column(BpeishCount(ColumnBridge.expression(c)))
  def wsCollapseLower(c: Column): Column =
    ColumnBridge.column(WsCollapseLower(ColumnBridge.expression(c)))
}
