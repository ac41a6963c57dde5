package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** GeohashRecord (NiFi geohash bundle, 1.15+): encode (lat, lon) to a
  * geohash and decode back — Niemeyer's public algorithm (the base32
  * alphabet without a/i/l/o, alternating lon/lat bit interleave via
  * binary subdivision). Pure integer/branch arithmetic per row —
  * exact, deterministic, codegen-fallback native expressions (no
  * UDF); out-of-range coordinates and malformed hashes yield NULL
  * (NiFi's failure relationship), never a throw. GeohashSpec pins the
  * published test vectors (ezs42 et al.), encode∘decode stability at
  * every precision, and the NULL contracts. */
object Geohash {
  private val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def encode(lat: Double, lon: Double, precision: Int): String = {
    if (lat.isNaN || lon.isNaN || lat < -90 || lat > 90 || lon < -180 || lon > 180)
      return null
    val sb = new java.lang.StringBuilder(precision)
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var isLon = true
    var bit = 0
    var ch = 0
    while (sb.length < precision) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch <<= 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch <<= 1; latHi = mid }
      }
      isLon = !isLon
      bit += 1
      if (bit == 5) { sb.append(Alphabet.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Cell-center decode: (lat, lon) at the midpoint of the hash's
    * bounding box — the standard inverse (a geohash names a CELL). */
  def decode(hash: String): (Double, Double) = {
    if (hash == null || hash.isEmpty) return null
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var isLon = true
    var i = 0
    while (i < hash.length) {
      val c = hash.charAt(i).toLower.toInt
      if (c >= 128 || Decode(c) < 0) return null
      val v = Decode(c)
      var b = 4
      while (b >= 0) {
        val bit = (v >> b) & 1
        if (isLon) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        isLon = !isLon
        b -= 1
      }
      i += 1
    }
    ((latLo + latHi) / 2, (lonLo + lonHi) / 2)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def geohashEncode(lat: Column, lon: Column, precision: Int): Column =
    ColumnBridge.column(GeohashEncode(ColumnBridge.expression(lat),
      ColumnBridge.expression(lon), precision))
  def geohashDecode(hash: Column): Column =
    ColumnBridge.column(GeohashDecode(ColumnBridge.expression(hash)))
}

case class GeohashEncode(left: Expression, right: Expression, precision: Int)
    extends BinaryExpression with CodegenFallback {
  require(precision >= 1 && precision <= 12, "geohash precision in [1, 12]")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_geohash"
  override protected def nullSafeEval(lat: Any, lon: Any): Any = {
    val h = Geohash.encode(lat.asInstanceOf[Double], lon.asInstanceOf[Double], precision)
    if (h == null) null else UTF8String.fromString(h)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class GeohashDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_geohash_decode"
  override protected def nullSafeEval(input: Any): Any = {
    val r = Geohash.decode(input.asInstanceOf[UTF8String].toString)
    if (r == null) null else InternalRow(r._1, r._2)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
