package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Stream-stream interval join: Wait/Notify-style correlation of two
  * live streams with bounded state (watermarks on both sides).
  *
  * NOTE: all data is added BEFORE the query starts — in this harness
  * (shared session, Spark 4.1 runtime.MemoryStream), data added after
  * start() is not reliably picked up by processAllAvailable (the query
  * settles after an empty batch instead; every MemoryStream spec in
  * this suite preloads for the same reason). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("joinWithinInterval matches same-key events within the interval only") {
    implicit val sqlCtx = spark.sqlContext
    val orders = MemoryStream[(String, Timestamp, Double)]
    val ships = MemoryStream[(String, Timestamp, String)]
    // k1 ships 3s after ordering (within ±5s) → joins; k2 ships 30s
    // later → outside the interval; k3 never ships.
    orders.addData(("k1", ts(100), 9.5), ("k2", ts(100), 1.0), ("k3", ts(101), 2.0))
    ships.addData(("k1", ts(103), "ups"), ("k2", ts(130), "fedex"))
    // second batch, later event times: the pair straddles batches of the
    // preloaded stream and still lands within the ±5s interval
    orders.addData(("k4", ts(200), 7.0))
    ships.addData(("k4", ts(199), "dhl"))
    val joined = Streams.joinWithinInterval(
      orders.toDF.toDF("okey", "ots", "amount"),
      ships.toDF.toDF("skey", "sts", "carrier"),
      "okey", "skey", "ots", "sts", delay = "10 seconds", withinSec = 5)
    val q = Streams.toMemorySink(joined.select("okey", "amount", "carrier"), "ss_join")
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_join").as[(String, Double, String)].collect().toSet
    assert(rows === Set(("k1", 9.5, "ups"), ("k4", 7.0, "dhl")))
  }

  test("joinWithinInterval: key and ts columns may share names across sides") {
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[(String, Timestamp, Double)]
    val right = MemoryStream[(String, Timestamp, String)]
    left.addData(("k1", ts(100), 9.5), ("k2", ts(100), 1.0))
    right.addData(("k1", ts(103), "ups"), ("k2", ts(130), "fedex"))
    // both sides name their columns key/ts — the operator renames
    // internally instead of throwing an ambiguous-reference error
    val joined = Streams.joinWithinInterval(
      left.toDF.toDF("key", "ts", "amount"),
      right.toDF.toDF("key", "ts", "carrier"),
      "key", "key", "ts", "ts", delay = "10 seconds", withinSec = 5)
    val q = Streams.toMemorySink(joined.select("key", "amount", "carrier"), "ss_join_same")
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_join_same").as[(String, Double, String)].collect().toSet
    assert(rows === Set(("k1", 9.5, "ups")))
  }
}
