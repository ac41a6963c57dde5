package graft

import org.apache.spark.sql.functions._
import graft.plans.Geohash

/** GeohashRecord gates: the PUBLISHED vectors (Niemeyer's original
  * u4pruydqqvj example and the classic ezs42), exact cell-center
  * decode values (binary subdivision yields exact dyadic fractions —
  * the doubles are bit-exact, not approximate), encode∘decode
  * stability at every precision, NULL failure contracts, native plan
  * nodes and the flow vocabulary. */
class GeohashSpec extends SparkSpec {
  import spark.implicits._

  test("published vectors encode exactly") {
    assert(Geohash.encode(42.605, -5.603, 5) == "ezs42")
    assert(Geohash.encode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(Geohash.encode(0.0, 0.0, 1) == "s")
    // precision prefixes nest (a coarser hash is a prefix)
    assert(Geohash.encode(57.64911, 10.40744, 4) == "u4pr")
  }

  test("decode returns the exact cell center; encode∘decode is stable") {
    // ezs42's bounds are dyadic fractions: center is bit-exact
    val (lat, lon) = Geohash.decode("ezs42")
    assert(lat == 42.60498046875 && lon == -5.60302734375, s"($lat, $lon)")
    // decoding any hash and re-encoding at the same precision is a
    // fixed point (the center is inside its own cell) — all precisions
    val rng = new scala.util.Random(7)
    (1 to 12).foreach { p =>
      (1 to 20).foreach { _ =>
        val la = rng.nextDouble() * 180 - 90
        val lo = rng.nextDouble() * 360 - 180
        val h = Geohash.encode(la, lo, p)
        val (cla, clo) = Geohash.decode(h)
        assert(Geohash.encode(cla, clo, p) == h, s"unstable at p=$p: $h")
      }
    }
    // case-insensitive decode (NiFi accepts either)
    assert(Geohash.decode("EZS42") == Geohash.decode("ezs42"))
  }

  test("NULL contracts: out-of-range, NaN, malformed hashes") {
    assert(Geohash.encode(91.0, 0.0, 5) == null)
    assert(Geohash.encode(0.0, -181.0, 5) == null)
    assert(Geohash.encode(Double.NaN, 0.0, 5) == null)
    assert(Geohash.decode("ez a2") == null) // 'a' is not in the alphabet
    assert(Geohash.decode("") == null)
    intercept[IllegalArgumentException](Geohash.encode(0, 0, 0) ->
      GeohashSpecHelper.mk(13))
  }

  test("native expressions in the plan; flow vocabulary both modes") {
    val df = spark.range(2).select(col("id"),
      (lit(42.605) + col("id")).as("latitude"), lit(-5.603).as("longitude"))
    val enc = df.withColumn("geohash",
      Geohash.geohashEncode(col("latitude"), col("longitude"), 5))
    assert(enc.queryExecution.executedPlan.toString.contains("graft_geohash"))
    assert(enc.filter(col("id") === 0).select("geohash").as[String].head() == "ezs42")
    // bad rows become NULL, not failures
    val bad = spark.range(1).select(lit(99.0).as("latitude"), lit(0.0).as("longitude"))
      .withColumn("geohash", Geohash.geohashEncode(col("latitude"), col("longitude"), 5))
    assert(bad.select("geohash").collect().head.isNullAt(0))

    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "e", "type": "GeohashRecord",
        |     "properties": {"Mode": "Encode", "Geohash Level": "5"}},
        |    {"identifier": "d", "type": "GeohashRecord",
        |     "properties": {"Mode": "Decode",
        |                    "Latitude Record Path": "/lat2",
        |                    "Longitude Record Path": "/lon2"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "e"}},
        |    {"source": {"id": "e"}, "destination": {"id": "d"}},
        |    {"source": {"id": "d"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val out = FlowCompiler.compile(spark, flow, Map("in" -> df))("out")
      .select("geohash", "lat2", "lon2").as[(String, Double, Double)].collect()
    assert(out.exists { case (h, la, lo) =>
      h == "ezs42" && la == 42.60498046875 && lo == -5.60302734375 })
  }
}

private object GeohashSpecHelper {
  def mk(p: Int) = graft.plans.GeohashEncode(
    org.apache.spark.sql.catalyst.expressions.Literal(0.0),
    org.apache.spark.sql.catalyst.expressions.Literal(0.0), p)
}
