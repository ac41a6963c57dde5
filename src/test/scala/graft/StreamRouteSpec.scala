package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Route
import graft.streaming.Streams

/** Batch/stream unification: the same Route operator works unchanged on
  * a Structured Streaming DataFrame (NiFi routes streams natively; here
  * a single declarative operator covers both modes). */
class StreamRouteSpec extends SparkSpec {
  import spark.implicits._

  test("tagged routing applies to a file stream") {
    val dir = Files.createTempDirectory("graft_route_stream").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("etype", StringType),
      StructField("v", DoubleType)))
    Seq(
      """{"id":1,"etype":"error","v":1.0}""",
      """{"id":2,"etype":"click","v":200.0}""",
      """{"id":3,"etype":"other","v":5.0}"""
    ).zipWithIndex.foreach { case (line, i) =>
      Files.writeString(java.nio.file.Path.of(dir, s"f$i.json"), line + "\n")
    }
    val in = Streams.fileStream(spark, dir, schema)
    val routed = Route.tagged(in, Seq(
      "err" -> (col("etype") === "error"),
      "big" -> (col("v") > 100)))
    val q = Streams.toMemorySink(routed, "routed_stream")
    q.processAllAvailable(); q.stop()
    val rows = spark.table("routed_stream").select("id", "route")
      .as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "err", 2L -> "big", 3L -> "unmatched"))
  }
}
