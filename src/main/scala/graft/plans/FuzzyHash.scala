package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Context-triggered piecewise hashing (NiFi FuzzyHashContent analog) —
  * the ssdeep ALGORITHM re-expressed from its public description
  * (Kornblum 2006, "Identifying almost identical files using context
  * triggered piecewise hashing"): a rolling hash over a 7-byte window
  * decides chunk boundaries (when `roll % blockSize == blockSize-1`),
  * each chunk contributes one base64 character of its FNV hash, and the
  * digest carries two granularities (blockSize and 2·blockSize) so
  * digests of nearby-sized inputs stay comparable. Digests are NOT
  * byte-compatible with ssdeep's (different non-rolling hash/alphabet
  * seeding) — same construction, comparable behavior: localized edits
  * change only the chunk characters they touch.
  *
  * Similarity: compare digests of the same (or adjacent) block size
  * with a Levenshtein ratio — Spark's builtin `levenshtein` composes,
  * see [[graft.operators.Records.fuzzyHashSimilarity]].
  */
object FuzzyHash {

  private val B64 =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"

  final val DigestChars = 64 // target digest length, as in CTPH

  /** Smallest block size 3·2^i whose expected digest fits DigestChars. */
  def initialBlockSize(len: Int): Long = {
    var bs = 3L
    while (bs * DigestChars < len) bs *= 2
    bs
  }

  /** (blockSize, digest@blockSize, digest@2·blockSize). Deterministic;
    * empty input → ("3:", "") equivalents. CTPH restarts at a finer
    * granularity when the digest is too short to be comparable (fewer
    * than half the target chars); the restart carries the previous
    * digest forward — digestAt(bs) at one iteration IS digestAt(2·bs')
    * of the next — so each halving costs ONE pass, not two. */
  def digest(bytes: Array[Byte]): (Long, String, String) = {
    var bs = initialBlockSize(bytes.length)
    var d1 = digestAt(bytes, bs)
    var d2: String = null // lazily: only the no-restart path needs it
    while (d1.length < DigestChars / 2 && bs > 3) {
      d2 = d1
      bs /= 2
      d1 = digestAt(bytes, bs)
    }
    if (d2 == null) d2 = digestAt(bytes, bs * 2)
    (bs, d1, d2)
  }

  /** One CTPH pass at one block size: rolling 7-byte window triggers a
    * boundary when roll % bs == bs-1; chunk char = fnv & 63. */
  private def digestAt(bytes: Array[Byte], bs: Long): String = {
    val sb = new java.lang.StringBuilder
    // ssdeep-style rolling hash state over a 7-byte window
    val windowSize = 7
    val window = new Array[Int](windowSize)
    var s1 = 0L; var s2 = 0L; var s3 = 0L
    var chunk = 0xCBF29CE484222325L // FNV offset, reset per chunk
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      val slot = i % windowSize
      s2 -= s1
      s2 += windowSize.toLong * b
      s1 += b
      s1 -= window(slot)
      window(slot) = b
      s3 = (s3 << 5) ^ b
      val roll = s1 + s2 + s3
      chunk = (chunk ^ b) * 0x100000001B3L
      if (sb.length < DigestChars - 1 && java.lang.Long.remainderUnsigned(roll, bs) == bs - 1) {
        sb.append(B64((chunk & 63).toInt))
        chunk = 0xCBF29CE484222325L
      }
      i += 1
    }
    if (bytes.nonEmpty) sb.append(B64((chunk & 63).toInt)) // trailing chunk
    sb.toString
  }
}

/** `graft_fuzzy_hash(binary|string)` → "blocksize:digest1:digest2"
  * (CTPH digest string). Null-safe; empty content hashes to "3::". */
case class FuzzyHashExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fuzzy_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case u: UTF8String  => u.getBytes
      case b: Array[Byte] => b
      case other          => other.toString.getBytes("UTF-8")
    }
    val (bs, d1, d2) = FuzzyHash.digest(bytes)
    UTF8String.fromString(s"$bs:$d1:$d2")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FuzzyHashExpr {
  def apply(c: Column): Column = ColumnBridge.column(
    FuzzyHashExpr(ColumnBridge.expression(c)))
}
