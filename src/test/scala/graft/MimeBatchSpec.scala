package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextAnalysis
import graft.operators.{Multimodal, Records}
import graft.streaming.Streams

class MimeBatchSpec extends SparkSpec {
  import spark.implicits._

  test("identifyMime sniffs magic bytes") {
    val gz = Records.compress(
      Seq((1L, "payload")).toDF("id", "text").withColumn("p", col("text").cast("binary")), "p", "gz")
      .select(col("gz").as("payload"))
    val df = Seq(
      (2L, """{"a":1}"""), (3L, "<doc/>"), (4L, "plain words here")
    ).toDF("id", "text").withColumn("payload", col("text").cast("binary"))
      .select("payload").union(gz)
    val mimes = Records.identifyMime(df, "payload")
      .select("mime_type").as[String].collect().sorted
    assert(mimes === Array("application/gzip", "application/json", "application/xml", "text/plain"))
  }

  test("batched feature extraction equals per-row path") {
    val df = (1 to 150).map(i => (i.toLong, s"content number $i")).toDF("id", "text")
    val media = Multimodal.toMedia(df, "text", "text")
    val a = Multimodal.extractFeatures(spark, media, "payload", 8)
      .select("id", "features").as[(Long, Seq[Float])].collect().toMap
    val b = Multimodal.extractFeaturesBatched(spark, media, "payload", 8, batchSize = 32)
      .select("id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(a == b)
  }

  test("streaming fingerprint dedup: batch text-analysis op composes with streams") {
    val dir = Files.createTempDirectory("graft_fp_stream").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("doc", StringType)))
    Seq(
      """{"ts":"2024-01-01T00:00:01.000Z","doc":"Hello   World"}""",
      """{"ts":"2024-01-01T00:00:02.000Z","doc":"hello world"}""",   // same fingerprint
      """{"ts":"2024-01-01T00:00:03.000Z","doc":"different text"}"""
    ).zipWithIndex.foreach { case (line, i) =>
      Files.writeString(java.nio.file.Path.of(dir, s"f$i.json"), line + "\n")
    }
    val in = Streams.fileStream(spark, dir, schema)
      .withColumn("fp", TextAnalysis.fingerprint(col("doc")))
    val deduped = Streams.dedupe(in, "ts", Seq("fp"), "1 hour")
    val q = Streams.toMemorySink(deduped, "fp_dedup")
    q.processAllAvailable(); q.stop()
    val docs = spark.table("fp_dedup").select("doc").as[String].collect().sorted
    assert(docs.length == 2 && docs.contains("different text"))
  }
}
