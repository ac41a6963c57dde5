package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.Io
import graft.streaming.Streams

/** Streaming JDBC upsert sink: keyed delete+insert per micro-batch —
  * re-delivering a key overwrites its row instead of duplicating. */
class StreamJdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url =
    s"jdbc:derby:${Files.createTempDirectory("graft_derby_s")}/db;create=true"

  test("toJdbcUpsertSink upserts by key across streaming runs") {
    implicit val sqlCtx = spark.sqlContext
    // create the target table (quoted lowercase cols, Spark's JDBC style)
    Io.writeJdbc(Seq((0L, "seed")).toDF("id", "v"), url, "graft_up")
    val run1 = MemoryStream[(Long, String)]
    run1.addData((1L, "a1"), (2L, "b1"))
    val q1 = Streams.toJdbcUpsertSink(run1.toDF.toDF("id", "v"), url, "graft_up",
      Seq("id"), Files.createTempDirectory("ck1").toString)
    q1.processAllAvailable(); q1.stop()
    // second run re-delivers key 1 with a new value and adds key 3
    val run2 = MemoryStream[(Long, String)]
    run2.addData((1L, "a2"), (3L, "c1"))
    val q2 = Streams.toJdbcUpsertSink(run2.toDF.toDF("id", "v"), url, "graft_up",
      Seq("id"), Files.createTempDirectory("ck2").toString)
    q2.processAllAvailable(); q2.stop()
    val rows = Io.readJdbc(spark, url, "graft_up")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(rows === Seq((0L, "seed"), (1L, "a2"), (2L, "b1"), (3L, "c1")))
  }
}
