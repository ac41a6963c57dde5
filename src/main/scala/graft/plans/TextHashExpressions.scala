package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-hashing hot paths of the dedup suite.
  *
  * The higher-order-function formulations (transform/aggregate lambdas)
  * are NOT codegen'd by Catalyst — every element evaluation is
  * interpreted with boxing. At 100 TB the per-row work here is the whole
  * job, so these run as single primitive JVM loops per row instead
  * (~50–100× the HOF path on the minhash benchmark). Eval-based with
  * CodegenFallback: one virtual call per ROW is noise; the inner loops
  * are allocation-free.
  *
  * Hashing: FNV-1a 64 over the UTF-8 bytes + splitmix64 finalizer
  * (public-domain constructions), two independent seeds combined as
  * g_i = h1 + i·h2 (Kirsch–Mitzenmacher double hashing) so k minhash
  * permutations cost 2 hashes + k adds per shingle, not k hashes.
  */
object TextHash {
  final val Seed1 = 0x9E3779B97F4A7C15L
  final val Seed2 = 0xC2B2AE3D27D4EB4FL

  @inline private def splitmix(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** FNV-1a over bytes[start, start+len) + splitmix finalizer. */
  def hashBytes(bytes: Array[Byte], start: Int, len: Int, seed: Long): Long = {
    var h = seed ^ 0xCBF29CE484222325L
    var i = start
    val end = start + len
    while (i < end) { h = (h ^ (bytes(i) & 0xFF)) * 0x100000001B3L; i += 1 }
    splitmix(h)
  }

  /** Public splitmix64 finalizer (for rolling n-gram key combination). */
  def mix64(x: Long): Long = splitmix(x)

  /** THE whitespace contract for every byte-level tokenizer here:
    * exactly Java-regex `\s` = [ \t\n\x0B\f\r] — the same set
    * `TextAnalysis.wsTokens` splits on and every DuckDB oracle
    * replays. `Character.isWhitespace` is deliberately NOT used: it
    * also classifies 0x1C–0x1F (the ASCII file/group/record/unit
    * separators, present in real web crawls) as separators, which
    * would silently give the repetition/Gopher panels different token
    * counts than tokenCount and every groupBy-token query. */
  @inline def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
}

/** MinHash signature of the byte n-gram shingle set: array<long> of
  * `numHashes` minima. One pass over the content, no allocations beyond
  * the signature array. */
case class MinHashSignature(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val windows = math.max(n - shingleN + 1, 1)
    var i = 0
    while (i < windows) {
      val len = math.min(shingleN, n - i)
      val h1 = TextHash.hashBytes(bytes, i, len, TextHash.Seed1)
      val h2 = TextHash.hashBytes(bytes, i, len, TextHash.Seed2) | 1L
      var j = 0
      var g = h1
      while (j < numHashes) {
        if (g < mins(j)) mins(j) = g
        g += h2
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted distinct 64-bit hashes of the byte n-gram shingle set —
  * the compact set representation for Jaccard (collision probability
  * ~|S|²/2⁶⁴, negligible). */
case class HashedShingles(child: Expression, shingleN: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val windows = math.max(n - shingleN + 1, 1)
    val hs = new Array[Long](windows)
    var i = 0
    while (i < windows) {
      hs(i) = TextHash.hashBytes(bytes, i, math.min(shingleN, n - i), TextHash.Seed1)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // dedup in place
    var out = 0
    var k = 0
    while (k < windows) {
      if (k == 0 || hs(k) != hs(k - 1)) { hs(out) = hs(k); out += 1 }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |A ∩ B| for two SORTED distinct long arrays — one merge scan, no
  * hash table, no allocation. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over whitespace tokens: per-token hash votes on each
  * bit, sign of the vote sum becomes the bit. Single pass, no token
  * array materialization (the HOF form interprets 64 lambdas per
  * token). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val votes = new Array[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      // skip whitespace
      while (i < n && TextHash.isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !TextHash.isWs(bytes(i))) i += 1
      if (i > start) {
        val h = TextHash.hashBytes(bytes, start, i - start, TextHash.Seed1)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
    }
    var sim = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |A ∩ B| for two SORTED distinct long arrays with an early-abort
  * bound: once the remaining elements can no longer reach `required`,
  * returns -1 immediately. For threshold joins (Jaccard ≥ t ⟺
  * |A∩B| ≥ t/(1+t)·(|A|+|B|)) most non-matching pairs abort midway —
  * same exact count as [[SortedIntersectCount]] whenever the result
  * is ≥ required. */
case class SortedIntersectAtLeast(left: Expression, right: Expression,
                                  requiredExpr: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = requiredExpr
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_at_least"

  override protected def nullSafeEval(a: Any, b: Any, r: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val required = r.asInstanceOf[Int]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      if (c + math.min(nx - i, ny - j) < required) return -1
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    if (c >= required) c else -1
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(left = f, right = s, requiredExpr = t)
}

/** Shannon entropy (log2) of a string's codepoint distribution — the
  * Dolma-style gibberish/encoding-noise signal: natural prose sits
  * ~4.0–4.5 bits/char, base64 blobs and repeated-char runs fall far
  * outside. Computed as log2(N) − (Σ c·log2 c)/N over per-codepoint
  * counts c — integer-count logs, summed in ASCENDING CODEPOINT order
  * so the double accumulation is deterministic run-to-run and
  * engine-reproducible. One pass, one small map per row, no shuffle. */
case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.TreeMap[Int, Long]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) 0.0
    else {
      var acc = 0.0
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next().toDouble
        acc += c * (math.log(c) / math.log(2.0))
      }
      math.log(n.toDouble) / math.log(2.0) - acc / n
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fraction of whitespace tokens taken by the single most frequent
  * token — the Gopher-style within-document repetition signal. One pass,
  * one small hash map per row (token counts keyed by token hash; the
  * ~|tokens|²/2⁶⁴ collision probability is negligible). */
case class TopTokenFraction(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_top_token_fraction"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val counts = new java.util.HashMap[Long, Int]()
    var total = 0
    var max = 0
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && TextHash.isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !TextHash.isWs(bytes(i))) i += 1
      if (i > start) {
        total += 1
        val h = TextHash.hashBytes(bytes, start, i - start, TextHash.Seed1)
        val c = counts.merge(h, 1, (a, b) => a + b)
        if (c > max) max = c
      }
    }
    if (total == 0) 0.0 else max.toDouble / total
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (canonical composition) — the dedup
  * pre-pass real pipelines run first (SlimPajama's cleaning step):
  * visually-identical strings with different codepoint sequences
  * ("e"+COMBINING ACUTE vs "é") otherwise hash apart and defeat exact
  * and near dedup alike. JDK `java.text.Normalizer` (deterministic,
  * Unicode-standard), narrow, no shuffle. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The Gopher repetition panel (Rae et al. 2021, arXiv:2112.11446
  * App. A1.1.2 — "repetition removal", the within-document filter
  * FineWeb/Dolma reuse): 13 signals in ONE pass per document, returned
  * as a struct of doubles so the whole panel costs a single narrow
  * projection over the scan — at 100 TB this filter IS the job, and an
  * explode+groupBy formulation would shuffle every n-gram of the corpus.
  *
  * Exact semantics (each engine-reproducible; denominators documented):
  *  - Segments: lines = text split on '\n', paragraphs = split on the
  *    literal "\n\n"; each segment is trimmed of {' ','\t','\r','\n'}
  *    and blank segments are dropped. A segment occurrence beyond the
  *    first of an identical (post-trim, exact string) segment is a
  *    duplicate. `dup_*_frac` = duplicates / segments;
  *    `dup_*_char_frac` = Σ codepoint-length of duplicate occurrences /
  *    Σ codepoint-length of all segments (paragraph lengths include
  *    their interior '\n's).
  *  - Word n-grams: over the whitespace-token stream of the WHOLE text
  *    (crossing line boundaries, as in the paper). The character length
  *    of an n-gram is the sum of its tokens' codepoint lengths
  *    (separators excluded); the denominator for every n-gram signal is
  *    the total codepoint length of all tokens.
  *  - `top{2,3,4}_frac`: count(g*)·charlen(g*) / total-token-chars for
  *    the most frequent n-gram g*; ties on count broken by the larger
  *    count·charlen (deterministic, engine-neutral). Overlapping
  *    occurrences mean the value can exceed 1 (the published
  *    implementations do not cap either; the filter threshold is ≤0.2).
  *  - `dup{5..10}_frac`: fraction of token characters covered by the
  *    UNION of the character spans of all occurrences of n-grams that
  *    occur ≥2 times — span-union, so overlap is not double-counted.
  *
  * Tokens are counted by 64-bit hash (FNV-1a + splitmix, rolled across
  * the window) — within-document collision probability ~|grams|²/2⁶⁴,
  * negligible, same contract as [[TopTokenFraction]]. */
case class RepetitionPanel(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = RepetitionPanel.schema
  override def prettyName: String = "graft_repetition_panel"

  private def segmentDup(segs: Array[String]): (Double, Double) = {
    val seen = new java.util.HashSet[String]()
    var total = 0L; var chars = 0L; var dup = 0L; var dupChars = 0L
    var i = 0
    while (i < segs.length) {
      val raw = segs(i)
      var a = 0; var b = raw.length
      while (a < b && (raw.charAt(a) == ' ' || raw.charAt(a) == '\t' ||
        raw.charAt(a) == '\r' || raw.charAt(a) == '\n')) a += 1
      while (b > a && (raw.charAt(b - 1) == ' ' || raw.charAt(b - 1) == '\t' ||
        raw.charAt(b - 1) == '\r' || raw.charAt(b - 1) == '\n')) b -= 1
      if (b > a) {
        val seg = raw.substring(a, b)
        val len = seg.codePointCount(0, seg.length).toLong
        total += 1; chars += len
        if (!seen.add(seg)) { dup += 1; dupChars += len }
      }
      i += 1
    }
    (if (total == 0) 0.0 else dup.toDouble / total,
     if (chars == 0) 0.0 else dupChars.toDouble / chars)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    val out = new Array[Double](13)

    val (dlf, dlcf) = segmentDup(s.split('\n'))
    val (dpf, dpcf) = segmentDup(s.split("\n\n"))
    out(0) = dlf; out(1) = dlcf; out(2) = dpf; out(3) = dpcf

    // ---- tokenize once: per-token hash, codepoint length, char offset
    val bytes = u.getBytes
    val nB = bytes.length
    var t = 0
    var i = 0
    // first pass: count tokens
    while (i < nB) {
      while (i < nB && TextHash.isWs(bytes(i))) i += 1
      val start = i
      while (i < nB && !TextHash.isWs(bytes(i))) i += 1
      if (i > start) t += 1
    }
    val nT = t
    val hs = new Array[Long](math.max(nT, 1))
    val lens = new Array[Int](math.max(nT, 1))
    val offs = new Array[Long](math.max(nT, 1))
    var totalChars = 0L
    i = 0; t = 0
    while (i < nB) {
      while (i < nB && TextHash.isWs(bytes(i))) i += 1
      val start = i
      var cps = 0
      while (i < nB && !TextHash.isWs(bytes(i))) {
        if ((bytes(i) & 0xC0) != 0x80) cps += 1 // count codepoints, not bytes
        i += 1
      }
      if (i > start) {
        hs(t) = TextHash.hashBytes(bytes, start, i - start, TextHash.Seed1)
        lens(t) = cps
        offs(t) = totalChars
        totalChars += cps
        t += 1
      }
    }

    val keys = new Array[Long](math.max(nT, 1))
    var n = 2
    while (n <= 10) {
      val windows = nT - n + 1 // out slot n+2: top2..4 → 4..6, dup5..10 → 7..12
      if (windows <= 0) {
        out(n + 2) = 0.0
      } else {
        // value packs (charlen << 32) | count — count < 2³² for any doc
        val counts = new java.util.HashMap[Long, java.lang.Long]()
        var w = 0
        while (w < windows) {
          var kh = 0xCBF29CE484222325L
          var j = 0
          while (j < n) { kh = TextHash.mix64(kh * 0x100000001B3L + hs(w + j)); j += 1 }
          keys(w) = kh
          val prev = counts.get(kh)
          if (prev == null) {
            val charlen = offs(w + n - 1) + lens(w + n - 1) - offs(w)
            counts.put(kh, (charlen << 32) | 1L)
          } else counts.put(kh, prev + 1L)
          w += 1
        }
        if (n <= 4) {
          var mc = 0L; var best = 0L
          val it = counts.values().iterator()
          while (it.hasNext) {
            val v = it.next().longValue()
            val c = v & 0xFFFFFFFFL; val cl = v >>> 32
            if (c > mc) { mc = c; best = c * cl }
            else if (c == mc && c * cl > best) best = c * cl
          }
          out(n + 2) = if (totalChars == 0) 0.0 else best.toDouble / totalChars
        } else {
          var covered = 0L; var curEnd = Long.MinValue
          var w2 = 0
          while (w2 < windows) {
            if ((counts.get(keys(w2)).longValue() & 0xFFFFFFFFL) >= 2L) {
              val st = offs(w2)
              val en = offs(w2 + n - 1) + lens(w2 + n - 1)
              val from = math.max(st, curEnd)
              if (en > from) covered += en - from
              if (en > curEnd) curEnd = en
            }
            w2 += 1
          }
          out(n + 2) = if (totalChars == 0) 0.0 else covered.toDouble / totalChars
        }
      }
      n += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      out.map(d => d: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionPanel {
  val fieldNames: Seq[String] = Seq(
    "dup_line_frac", "dup_line_char_frac", "dup_para_frac",
    "dup_para_char_frac", "top2_frac", "top3_frac", "top4_frac",
    "dup5_frac", "dup6_frac", "dup7_frac", "dup8_frac", "dup9_frac",
    "dup10_frac")
  val schema: StructType =
    StructType(fieldNames.map(StructField(_, DoubleType, nullable = false)))
}

/** Feature-hashed text embedding (the "hashing trick", Weinberger et
  * al. 2009 / sklearn HashingVectorizer): whitespace tokens hash into
  * `dim` slots with a ±1 sign bit, the slot counts L2-normalize into a
  * unit `array<float>`. The deterministic embedding stand-in for the
  * flow vocabulary's GenAI leg (NiFi 2.x RAG flows call an embedding
  * SERVICE here; offline, a fixed hash gives the same vector for the
  * same text on every run, so index parity pins are exact): texts
  * sharing tokens land in shared slots, so cosine over these vectors
  * IS a (sign-randomized) token-overlap kernel — real retrieval
  * signal, zero model weights. Tokenizer contract: [[TextHash.isWs]],
  * the same `\s` set as `TextAnalysis.wsTokens`. Empty/whitespace text
  * → the zero vector (no tokens, nothing to normalize). */
case class HashedTextEmbedding(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(dim >= 2, s"HashedTextEmbedding: dim >= 2, got $dim")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_hash_embed"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val acc = new Array[Double](dim)
    val n = bytes.length
    var i = 0
    while (i < n) {
      while (i < n && TextHash.isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !TextHash.isWs(bytes(i))) i += 1
      if (i > start) {
        val h = TextHash.hashBytes(bytes, start, i - start, TextHash.Seed1)
        // low bit → sign, remaining bits → slot (independent enough
        // after the splitmix finalizer)
        val slot = (((h >>> 1) % dim) + dim) % dim
        acc(slot.toInt) += (if ((h & 1L) == 0L) 1.0 else -1.0)
      }
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += acc(j) * acc(j); j += 1 }
    val inv = if (ss == 0.0) 0.0 else 1.0 / math.sqrt(ss)
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) { out(j) = (acc(j) * inv).toFloat; j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHashExpressions {
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
  def repetitionPanel(c: Column): Column =
    ColumnBridge.column(RepetitionPanel(ColumnBridge.expression(c)))
  def topTokenFraction(c: Column): Column =
    ColumnBridge.column(TopTokenFraction(ColumnBridge.expression(c)))
  def charEntropy(c: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(c)))
  def simHash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
  def minHashSig(c: Column, shingleN: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), shingleN, numHashes))
  def hashedShingles(c: Column, shingleN: Int): Column =
    ColumnBridge.column(HashedShingles(ColumnBridge.expression(c), shingleN))
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sortedIntersectAtLeast(a: Column, b: Column, required: Column): Column =
    ColumnBridge.column(SortedIntersectAtLeast(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      ColumnBridge.expression(required)))
  def hashedTextEmbedding(c: Column, dim: Int): Column =
    ColumnBridge.column(HashedTextEmbedding(ColumnBridge.expression(c), dim))
}
