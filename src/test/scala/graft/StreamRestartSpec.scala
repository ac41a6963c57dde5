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

  test("committed STREAMING flow definition: live spool -> compiled flow -> " +
       "exactly-once sink, restart resumes without duplicates") {
    val in = Files.createTempDirectory("graft_flow_in").toString
    val out = Files.createTempDirectory("graft_flow_out").toString + "/alerts"
    val ckpt = Files.createTempDirectory("graft_flow_ckpt").toString
    val schema = StructType(Seq(StructField("line", StringType)))
    val flowJson = {
      val s = getClass.getResourceAsStream("/flows/syslog_stream.json")
      try scala.io.Source.fromInputStream(s, "UTF-8").mkString finally s.close()
    }
    def syslog(pri: Int, host: String, msg: String) =
      s"""{"line": "<$pri>Oct 11 22:14:15 $host app[7]: $msg"}"""
    def spool(name: String, lines: Seq[String]): Unit =
      Files.writeString(java.nio.file.Path.of(in, name), lines.mkString("\n") + "\n")
    // pri = facility*8 + severity → severity 2 (critical) and 6 (normal)
    spool("b0.json", Seq(syslog(10, "h1", "disk fail"), syslog(14, "h1", "login ok")))

    def runOnce(): Unit = {
      // recompile from the committed JSON each run — the restart resumes
      // through the flow definition, not a long-lived query object
      val alerts = FlowCompiler.compile(spark, flowJson,
        Map("syslog" -> Streams.fileStream(spark, in, schema)))("alerts")
      assert(alerts.isStreaming, "compiled flow must stay a streaming frame")
      val q = Streams.toParquetSink(alerts.select("alert", "severity", "sl_msg"),
        out, ckpt, Trigger.AvailableNow())
      assert(q.awaitTermination(120000), "flow run did not finish")
    }
    runOnce()
    val first = spark.read.parquet(out).select("alert").as[String].collect()
    assert(first === Array("sev2:h1"), "only the selected critical route may land")

    // new spool files, then restart from the same checkpoint
    spool("b1.json", Seq(syslog(2, "h2", "kernel oops"), syslog(30, "h3", "noise")))
    runOnce()
    val all = spark.read.parquet(out)
      .select("alert", "sl_msg").as[(String, String)].collect().sorted
    assert(all === Array(("sev2:h1", "disk fail"), ("sev2:h2", "kernel oops")),
      "restart must pick up only new critical lines, no duplicates")

    // idle restart: no new input, no new rows
    runOnce()
    assert(spark.read.parquet(out).count() == 2)
  }
}
