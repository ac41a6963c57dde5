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
      while (i < n && Character.isWhitespace(bytes(i).toChar)) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(bytes(i).toChar)) i += 1
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
      while (i < n && Character.isWhitespace(bytes(i).toChar)) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(bytes(i).toChar)) i += 1
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

object TextHashExpressions {
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
}
