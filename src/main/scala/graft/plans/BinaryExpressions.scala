package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** NiFi CompressContent, per-record: gzip a binary payload column (and
  * back). Deterministic output (GZIPOutputStream writes no mtime).
  * Eval-based expressions — the deflate loop dwarfs the per-row virtual
  * call. */
case class GzipCompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_gzip"
  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val bos = new ByteArrayOutputStream(math.max(64, bytes.length / 2))
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class GzipDecompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_gunzip"
  override protected def nullSafeEval(input: Any): Any = {
    val in = new GZIPInputStream(new ByteArrayInputStream(input.asInstanceOf[Array[Byte]]))
    val out = new ByteArrayOutputStream(256)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** CompressContent's remaining codecs (NiFi supports gzip, snappy,
  * lz4, zstd): each backed by the codec jar Spark itself ships for
  * parquet/shuffle compression, so no new dependency. zstd and lz4 use
  * their self-describing FRAME formats (interoperable with the
  * command-line tools and NiFi's codecs); snappy is the raw block
  * format with the length header Snappy.compress embeds. */
case class ZstdCompress(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_zstd"
  override protected def nullSafeEval(input: Any): Any =
    com.github.luben.zstd.Zstd.compress(input.asInstanceOf[Array[Byte]], level)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ZstdDecompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_unzstd"
  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val known = com.github.luben.zstd.Zstd.decompressedSize(bytes)
    if (known > 0) com.github.luben.zstd.Zstd.decompress(bytes, known.toInt)
    else { // frame without content size (foreign producer): stream it
      val in = new com.github.luben.zstd.ZstdInputStream(new ByteArrayInputStream(bytes))
      val out = new ByteArrayOutputStream(256)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    }
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Lz4Compress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_lz4"
  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val bos = new ByteArrayOutputStream(math.max(64, bytes.length / 2))
    val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
    out.write(bytes); out.close()
    bos.toByteArray
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Lz4Decompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_unlz4"
  override protected def nullSafeEval(input: Any): Any = {
    val in = new net.jpountz.lz4.LZ4FrameInputStream(
      new ByteArrayInputStream(input.asInstanceOf[Array[Byte]]))
    val out = new ByteArrayOutputStream(256)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SnappyCompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_snappy"
  override protected def nullSafeEval(input: Any): Any =
    org.xerial.snappy.Snappy.compress(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SnappyDecompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_unsnappy"
  override protected def nullSafeEval(input: Any): Any =
    org.xerial.snappy.Snappy.uncompress(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** UnpackContent (zip mode): explode a zip-archive payload into its
  * entries as array<struct<name, data>> — pair with `explode` for one
  * row per archived file (NiFi's UnpackContent relationship shape).
  * Directory entries are skipped; a malformed archive throws (route
  * the error with a try/failure wrapper upstream if needed). */
case class ZipEntries(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("data", BinaryType, nullable = false))))
  override def prettyName: String = "graft_zip_entries"
  override protected def nullSafeEval(input: Any): Any = {
    val in = new java.util.zip.ZipInputStream(
      new ByteArrayInputStream(input.asInstanceOf[Array[Byte]]))
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    var e = in.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        val out = new ByteArrayOutputStream(math.max(64, e.getSize.toInt.max(0)))
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        rows += org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(e.getName),
          out.toByteArray)
      }
      e = in.getNextEntry
    }
    in.close()
    new GenericArrayData(rows.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MergeContent (zip mode): pack an array<struct<name, data>> of
  * entries into ONE zip archive payload (the inverse of [[ZipEntries]]
  * — NiFi's merge/unpack speak zip in both directions). Entry
  * timestamps are pinned to epoch 0 so the archive bytes are
  * DETERMINISTIC (ZipOutputStream otherwise stamps wall-clock mtimes
  * into every local header — two identical merges would differ). */
case class ZipPack(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_zip_pack"
  override protected def nullSafeEval(input: Any): Any = {
    val entries = input.asInstanceOf[ArrayData]
    val bos = new ByteArrayOutputStream(1024)
    val zos = new java.util.zip.ZipOutputStream(bos)
    var i = 0
    while (i < entries.numElements()) {
      val row = entries.getStruct(i, 2)
      val e = new java.util.zip.ZipEntry(row.getUTF8String(0).toString)
      e.setTime(0L) // deterministic bytes
      zos.putNextEntry(e)
      zos.write(row.getBinary(1))
      zos.closeEntry()
      i += 1
    }
    zos.close()
    bos.toByteArray
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** UnpackContent (tar mode): explode a POSIX ustar archive into
  * array<struct<name, data>> — the header format is public and simple
  * (512-byte blocks: name at 0/100, size as octal at 124/12, typeflag
  * at 156, magic "ustar" at 257, prefix at 345/155; data follows in
  * 512-padded blocks; ≥2 zero blocks end the stream). Directory
  * entries (typeflag '5') are skipped; regular files are typeflag '0'
  * or NUL. A malformed header (bad size digits) throws. */
case class TarEntries(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("data", BinaryType, nullable = false))))
  override def prettyName: String = "graft_tar_entries"
  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    var off = 0
    def str(start: Int, len: Int): String = {
      var end = start
      val bound = start + len
      while (end < bound && bytes(off + end) != 0) end += 1
      new String(bytes, off + start, end - start, java.nio.charset.StandardCharsets.UTF_8)
    }
    def octal(start: Int, len: Int): Long = {
      var v = 0L
      var i = start
      val bound = start + len
      while (i < bound) {
        val b = bytes(off + i)
        if (b >= '0' && b <= '7') v = v * 8 + (b - '0')
        else if (b != ' ' && b != 0)
          throw new IllegalArgumentException(s"tar: bad octal digit at header offset $i")
        i += 1
      }
      v
    }
    while (off + 512 <= bytes.length && bytes(off) != 0) {
      val name0 = str(0, 100)
      val prefix = str(345, 155)
      val name = if (prefix.nonEmpty) s"$prefix/$name0" else name0
      val size = octal(124, 12)
      require(size <= Int.MaxValue, s"tar: entry size $size exceeds the in-memory bound")
      val typeflag = bytes(off + 156)
      off += 512
      val dataLen = size.toInt
      if (typeflag == '0' || typeflag == 0) {
        require(off + dataLen <= bytes.length, "tar: truncated entry data")
        val data = java.util.Arrays.copyOfRange(bytes, off, off + dataLen)
        rows += org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(name), data)
      }
      off += ((dataLen + 511) / 512) * 512 // data blocks are 512-padded
    }
    new GenericArrayData(rows.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MergeContent (tar mode): pack entries into a POSIX ustar archive —
  * hand-written headers (no tar library exists offline; the format is
  * public), deterministic: mode 0644, uid/gid 0, mtime 0, ustar magic
  * + version "00", checksum per the spec (header summed with the
  * chksum field as spaces). Names longer than 100 bytes use the ustar
  * prefix field (split at a '/'); longer still is rejected. */
case class TarPack(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_tar_pack"
  override protected def nullSafeEval(input: Any): Any = {
    val entries = input.asInstanceOf[ArrayData]
    val bos = new ByteArrayOutputStream(1024)
    def put(h: Array[Byte], start: Int, s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      System.arraycopy(b, 0, h, start, b.length)
    }
    var i = 0
    while (i < entries.numElements()) {
      val row = entries.getStruct(i, 2)
      val fullName = row.getUTF8String(0).toString
      val data = row.getBinary(1)
      val nameBytes = fullName.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val (prefix, name) =
        if (nameBytes.length <= 100) ("", fullName)
        else {
          val cut = fullName.lastIndexOf('/', fullName.length - 1)
          require(cut > 0, s"tar: name too long and unsplittable: $fullName")
          val (p, n) = (fullName.substring(0, cut), fullName.substring(cut + 1))
          require(p.getBytes("UTF-8").length <= 155 && n.getBytes("UTF-8").length <= 100,
            s"tar: name too long: $fullName")
          (p, n)
        }
      val h = new Array[Byte](512)
      // the header array is zero-initialized, so the NUL terminators
      // every octal field needs are already in place — no NUL bytes in
      // source literals (the binary-file lesson from Bpe.scala r13)
      put(h, 0, name)
      put(h, 100, "0000644")
      put(h, 108, "0000000")
      put(h, 116, "0000000")
      put(h, 124, f"${data.length}%011o")
      put(h, 136, "00000000000") // mtime 0 — deterministic
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces for the sum
      h(156) = '0'
      put(h, 257, "ustar") // magic "ustar" NUL + version "00" (POSIX)
      put(h, 263, "00")
      put(h, 345, prefix)
      var sum = 0
      var j = 0
      while (j < 512) { sum += h(j) & 0xFF; j += 1 }
      put(h, 148, f"$sum%06o") // POSIX chksum: 6 octal digits, NUL, space
      h(154) = 0               // the fill above left a space here — restore the NUL
      h(155) = ' '.toByte
      bos.write(h)
      bos.write(data)
      val pad = (512 - data.length % 512) % 512
      bos.write(new Array[Byte](pad))
      i += 1
    }
    bos.write(new Array[Byte](1024)) // two terminating zero blocks
    bos.toByteArray
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket, native form: `bits` sign bits of
  * projections onto pseudo-random planes derived from splitmix64 of
  * (seed, plane, component) — deterministic across executors, one
  * primitive loop per row (the HOF formulation interprets
  * bits × dim lambda calls per row). */
case class HyperplaneBucketExpr(child: Expression, bits: Int, seed: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_bucket"
  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < bits) {
      var proj = 0.0
      var i = 0
      val base = (seed.toLong << 32) | (j.toLong << 20)
      while (i < n) {
        // splitmix64 of (seed | plane | component) → uniform in [-0.5, 0.5)
        var x = base + i
        x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
        x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
        x = x ^ (x >>> 31)
        val w = (x >>> 11).toDouble / (1L << 53).toDouble - 0.5
        proj += v.getFloat(i) * w
        i += 1
      }
      if (proj > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** NiFi SplitContent: split a binary payload at every occurrence of a
  * delimiter byte sequence (delimiter removed; empty segments kept, so
  * consecutive/trailing delimiters round-trip — same contract as
  * string split). One scan, no regex. */
case class SplitBinary(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "graft_split_binary"

  override protected def nullSafeEval(payload: Any, delim: Any): Any = {
    val p = payload.asInstanceOf[Array[Byte]]
    val d = delim.asInstanceOf[Array[Byte]]
    if (d.isEmpty) return new GenericArrayData(Array[Any](p))
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var i = 0
    while (i <= p.length - d.length) {
      var j = 0
      while (j < d.length && p(i + j) == d(j)) j += 1
      if (j == d.length) {
        out += java.util.Arrays.copyOfRange(p, start, i)
        i += d.length
        start = i
      } else i += 1
    }
    out += java.util.Arrays.copyOfRange(p, start, p.length)
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused int8 quantize→dequantize round trip over an `array<float>`:
  * scale = max|xᵢ|/127 (1.0 for all-zero), reconstructed value =
  * ⌊xᵢ/scale + 0.5⌋·scale — one primitive loop per row. The HOF
  * formulation (`dequantize8(quantize8(v))`) duplicates the scale
  * AGGREGATE subtree into every lambda element evaluation (O(dim²)
  * interpreted steps per row — measured ~3 s for 2000×64 floats); this
  * runs the same math in O(dim). */
case class Requantize8(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_requantize8"

  // accept array<float> and array<double>; anything else is an ANALYSIS
  // error (an unchecked getFloat over a double array reads garbage bits)
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) |
           ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    def at(i: Int): Double = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(at(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs == 0.0) 1.0 else maxAbs / 127.0
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(at(i) / scale + 0.5) * scale
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** RFC 4648 base32 (NiFi EncodeContent's third encoding — Spark has
  * base64/hex builtins but no base32). Padded canonical alphabet;
  * decode rejects non-alphabet characters (null result would mask data
  * corruption — NiFi routes those to failure). */
object Base32 {
  private val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
  private val reverse: Array[Byte] = {
    val r = Array.fill[Byte](128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => r(c) = i.toByte }
    r
  }
  def encode(in: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder((in.length + 4) / 5 * 8)
    var buf = 0L; var bits = 0; var i = 0
    while (i < in.length) {
      buf = (buf << 8) | (in(i) & 0xffL); bits += 8
      while (bits >= 5) { bits -= 5; sb.append(alphabet(((buf >> bits) & 31).toInt)) }
      i += 1
    }
    if (bits > 0) sb.append(alphabet(((buf << (5 - bits)) & 31).toInt))
    while (sb.length % 8 != 0) sb.append('=')
    sb.toString
  }
  def decode(s: String): Array[Byte] = {
    val trimmed = s.takeWhile(_ != '=')
    val out = new ByteArrayOutputStream(trimmed.length * 5 / 8 + 1)
    var buf = 0L; var bits = 0; var i = 0
    while (i < trimmed.length) {
      val c = trimmed.charAt(i)
      val v = if (c < 128) reverse(c) else -1
      require(v >= 0, s"invalid base32 character '$c'")
      buf = (buf << 5) | v; bits += 5
      if (bits >= 8) { bits -= 8; out.write(((buf >> bits) & 0xff).toInt) }
      i += 1
    }
    out.toByteArray
  }
}

case class Base32Encode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_base32"
  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      Base32.encode(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Base32Decode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_unbase32"
  override protected def nullSafeEval(input: Any): Any =
    Base32.decode(input.toString)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** HMAC (NiFi VerifyContentMAC): keyed-hash message authentication
  * code over a binary payload. The key is flow CONFIG, not data — it
  * rides in the expression (closure-serialized to executors), never in
  * a column. One initialized Mac per thread (cloned via ThreadLocal —
  * Mac is not thread-safe); doFinal resets it for the next row. */
case class HmacExpr(child: Expression, algorithm: String, key: Array[Byte])
    extends UnaryExpression with CodegenFallback {
  require(key.nonEmpty, "HMAC key must be non-empty")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hmac"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got ${other.catalogString}")
    }
  @transient private lazy val macTL: ThreadLocal[javax.crypto.Mac] =
    new ThreadLocal[javax.crypto.Mac] {
      override def initialValue(): javax.crypto.Mac = {
        val m = javax.crypto.Mac.getInstance(algorithm)
        m.init(new javax.crypto.spec.SecretKeySpec(key, algorithm))
        m
      }
    }
  override protected def nullSafeEval(input: Any): Any =
    macTL.get().doFinal(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BinaryExpressions {
  def gzip(c: Column): Column =
    ColumnBridge.column(GzipCompress(ColumnBridge.expression(c)))
  def gunzip(c: Column): Column =
    ColumnBridge.column(GzipDecompress(ColumnBridge.expression(c)))
  def zstd(c: Column, level: Int = 3): Column =
    ColumnBridge.column(ZstdCompress(ColumnBridge.expression(c), level))
  def unzstd(c: Column): Column =
    ColumnBridge.column(ZstdDecompress(ColumnBridge.expression(c)))
  def lz4(c: Column): Column =
    ColumnBridge.column(Lz4Compress(ColumnBridge.expression(c)))
  def unlz4(c: Column): Column =
    ColumnBridge.column(Lz4Decompress(ColumnBridge.expression(c)))
  def snappy(c: Column): Column =
    ColumnBridge.column(SnappyCompress(ColumnBridge.expression(c)))
  def unsnappy(c: Column): Column =
    ColumnBridge.column(SnappyDecompress(ColumnBridge.expression(c)))
  def zipEntries(c: Column): Column =
    ColumnBridge.column(ZipEntries(ColumnBridge.expression(c)))
  def zipPack(c: Column): Column =
    ColumnBridge.column(ZipPack(ColumnBridge.expression(c)))
  def tarEntries(c: Column): Column =
    ColumnBridge.column(TarEntries(ColumnBridge.expression(c)))
  def tarPack(c: Column): Column =
    ColumnBridge.column(TarPack(ColumnBridge.expression(c)))
  def hyperplaneBucket(c: Column, bits: Int, seed: Int): Column =
    ColumnBridge.column(HyperplaneBucketExpr(ColumnBridge.expression(c), bits, seed))

  def requantize8(c: Column): Column =
    ColumnBridge.column(Requantize8(ColumnBridge.expression(c)))

  def base32(c: Column): Column =
    ColumnBridge.column(Base32Encode(ColumnBridge.expression(c)))
  def unbase32(c: Column): Column =
    ColumnBridge.column(Base32Decode(ColumnBridge.expression(c)))
  def hmac(c: Column, key: Array[Byte], algorithm: String = "HmacSHA256"): Column =
    ColumnBridge.column(HmacExpr(ColumnBridge.expression(c), algorithm, key))
  def splitBinary(payload: Column, delim: Column): Column =
    ColumnBridge.column(SplitBinary(
      ColumnBridge.expression(payload), ColumnBridge.expression(delim)))
}
