package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{C4, Gopher, TextAnalysis}
import graft.streaming.Streams

/** Batch/stream unification for the curation panels: the Gopher rule +
  * repetition panels, the C4 line-rewrite, and the char-entropy signal
  * are pure narrow Columns, so the SAME expressions run unchanged on a
  * Structured Streaming source — the NiFi-style "filter the firehose at
  * ingest" deployment, vs re-filtering the lake in batch. The gate
  * asserts the streaming output is row-identical to the batch panel on
  * the same documents (no watermark/state involved — narrow ops). */
class StreamCurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The first sentence is fine.\nof course it is fine.\nThe first sentence is fine."),
    (2L, "short\nno terminal here\n- bullet line only"),
    (3L, "The quick brown fox jumps high today.\nthat dog sleeps with one eye open!"))

  private def panel(df: org.apache.spark.sql.DataFrame) = {
    val cfg = C4.Config(badWords = Seq("darn"))
    df.select(col("id"),
      md5(C4.cleanedText(col("text"), cfg).cast("binary")).as("cleaned_md5"),
      C4.sentenceCount(C4.cleanedText(col("text"), cfg)).as("n_sentences"),
      Gopher.bulletLineFrac(col("text")).as("bullet_frac"),
      Gopher.repetitionPanel(col("text")).getField("dup_line_frac").as("dup_line_frac"),
      TextAnalysis.charEntropy(col("text")).as("entropy"))
  }

  test("the curation panel runs unchanged on a file stream, row-identical to batch") {
    val dir = Files.createTempDirectory("graft_curation_stream").toString
    docs.zipWithIndex.foreach { case ((id, text), i) =>
      Files.writeString(java.nio.file.Path.of(dir, s"d$i.json"),
        compactJson(id, text) + "\n")
    }
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val streamed = panel(Streams.fileStream(spark, dir, schema))
    assert(streamed.isStreaming)
    val q = Streams.toMemorySink(streamed, "curation_stream")
    q.processAllAvailable(); q.stop()
    val got = spark.table("curation_stream").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val want = panel(docs.toDF("id", "text")).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(got == want)
    // and the signals themselves discriminate as designed
    val bad = spark.table("curation_stream").filter(col("id") === 2).collect().head
    assert(bad.getAs[Int]("n_sentences") == 0) // nothing survives the C4 rewrite
    val rep = spark.table("curation_stream").filter(col("id") === 1).collect().head
    assert(rep.getAs[Double]("dup_line_frac") == 1.0 / 3)
  }

  private def compactJson(id: Long, text: String): String = {
    val esc = text.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    s"""{"id":$id,"text":"$esc"}"""
  }
}
