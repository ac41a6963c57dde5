package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.Io
import graft.streaming.{Kafka, Streams}

/** Kafka adapter seam: a MemoryStream conformed to the kafka wire
  * schema drives the same composite flow a real ConsumeKafka feed
  * would — consume → decode → route → windowed agg → JDBC upsert sink.
  * On a cluster with spark-sql-kafka, only the source line changes
  * (Kafka.toWire → Kafka.consume). */
class KafkaSeamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("wire schema matches Spark's kafka source contract exactly") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, String, Timestamp)]
    val wire = Kafka.toWire(ms.toDF.toDF("k", "v", "ts"), "events", "k", "v", "ts")
    // names and types must match the contract exactly; nullability of
    // the stand-in may be stricter (non-null satisfies nullable)
    assert(wire.schema.map(f => (f.name, f.dataType)) ===
      Kafka.wireSchema.map(f => (f.name, f.dataType)))
    wire.schema.zip(Kafka.wireSchema).foreach { case (got, want) =>
      assert(!got.nullable || want.nullable, s"${got.name} nullability widens the contract")
    }
    assert(wire.isStreaming)
  }

  test("composite flow: consume -> route -> windowed agg -> upsert sink") {
    implicit val sqlCtx = spark.sqlContext
    val url = s"jdbc:derby:${Files.createTempDirectory("graft_derby_k")}/db;create=true"
    // target table for the sink
    Io.writeJdbc(Seq(("seed", ts(0), 0L)).toDF("key", "win_start", "cnt")
      .filter(lit(false)), url, "graft_kafka_agg")
    val ms = MemoryStream[(String, String, Timestamp)]
    // two keys; key "b" has one malformed record that must route away
    ms.addData(
      ("a", "ok:1", ts(10)), ("a", "ok:2", ts(20)),
      ("b", "ok:3", ts(15)), ("b", "bad", ts(25)),
      ("a", "ok:4", ts(70)))
    val wire = Kafka.toWire(ms.toDF.toDF("k", "v", "ts"), "events", "k", "v", "ts")
    val decoded = Kafka.decodeString(wire)
    // RouteOnContent: only well-formed values continue
    val routed = decoded.filter(col("value").startsWith("ok:"))
    val agged = Streams.windowedAgg(routed, "timestamp", "key", "offset",
        windowDur = "1 minute", delay = "10 minutes")
      .select(col("key"), col("window.start").as("win_start"), col("cnt"))
    val q = agged.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Io.writeJdbc(batch, url, "graft_kafka_agg", mode = "overwrite")
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("ckk").toString)
      .start()
    q.processAllAvailable(); q.stop()
    val rows = Io.readJdbc(spark, url, "graft_kafka_agg")
      .select(col("key"), date_format(col("win_start"), "HH:mm").as("w"), col("cnt"))
      .as[(String, String, Long)].collect().toSet
    // a: 2 records in minute 0 + 1 in minute 1; b: 1 routed record
    assert(rows === Set(("a", "00:00", 2L), ("a", "00:01", 1L), ("b", "00:00", 1L)))
  }
}
