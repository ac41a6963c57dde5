package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.streaming.Streams

/** Exactly-once file sink: a checkpointed query restarted over the same
  * checkpoint must pick up only NEW input and never duplicate rows —
  * NiFi's guaranteed-delivery story, Spark-first. */
class StreamRestartSpec extends SparkSpec {
  import spark.implicits._

  test("checkpointed parquet sink: restart resumes without duplicates") {
    val in = Files.createTempDirectory("graft_eo_in").toString
    val out = Files.createTempDirectory("graft_eo_out").toString + "/data"
    val ckpt = Files.createTempDirectory("graft_eo_ckpt").toString
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))

    def writeBatch(name: String, lines: Seq[String]): Unit =
      Files.writeString(java.nio.file.Path.of(in, name), lines.mkString("\n") + "\n")

    writeBatch("b0.json", Seq("""{"id":1,"v":"a"}""", """{"id":2,"v":"b"}"""))
    val q1 = Streams.toParquetSink(
      Streams.fileStream(spark, in, schema), out, ckpt, Trigger.AvailableNow())
    assert(q1.awaitTermination(120000), "first run did not finish")

    // new data + restart from the SAME checkpoint
    writeBatch("b1.json", Seq("""{"id":3,"v":"c"}"""))
    val q2 = Streams.toParquetSink(
      Streams.fileStream(spark, in, schema), out, ckpt, Trigger.AvailableNow())
    assert(q2.awaitTermination(120000), "restarted run did not finish")

    val rows = spark.read.schema(schema).parquet(out)
      .select("id").as[Long].collect().sorted
    assert(rows === Array(1L, 2L, 3L), s"expected exactly-once output, got ${rows.mkString(",")}")

    // restart with NO new data: no-op, still no duplicates
    val q3 = Streams.toParquetSink(
      Streams.fileStream(spark, in, schema), out, ckpt, Trigger.AvailableNow())
    assert(q3.awaitTermination(120000))
    assert(spark.read.schema(schema).parquet(out).count() == 3)
  }
}
