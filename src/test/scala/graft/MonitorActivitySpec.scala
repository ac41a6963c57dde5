package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

class MonitorActivitySpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(key, "")
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally {
      if (prev.nonEmpty) spark.conf.set(key, prev) else spark.conf.unset(key)
    }
  }

  test("monitorActivity emits inactive on watermark passing, restored on resume") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Timestamp)]
      // threshold 30 s, watermark delay 0 for deterministic advancement
      val out = Streams.monitorActivity(input.toDS(), thresholdMs = 30000L, delay = "0 seconds")
      val q = out.writeStream.format("memory").queryName("monitor")
        .outputMode("append").start()
      try {
        input.addData(("a", ts(0)), ("a", ts(10)), ("b", ts(12)))
        q.processAllAvailable() // watermark -> 12s: nothing inactive yet
        input.addData(("b", ts(50)))
        q.processAllAvailable() // watermark -> 50s: a is inactive (10+30 < 50)
        input.addData(("a", ts(60)))
        q.processAllAvailable() // a resumes -> restored
        input.addData(("c", ts(200)))
        q.processAllAvailable() // watermark -> 200: a and b both inactive again
        val rows = spark.table("monitor").as[(String, String, Long)].collect().toSet
        assert(rows.contains(("a", "inactive", 10000L)))
        assert(rows.contains(("a", "activity.restored", 60000L)))
        assert(rows.contains(("b", "inactive", 50000L)))
        assert(rows.contains(("a", "inactive", 60000L)))
      } finally q.stop()
    }
  }

  test("composite flow runs unchanged as a stream (jsonPath -> EL -> route -> windowed agg)") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String, String, Timestamp)]
    val df = input.toDS().toDF("event_id", "user_id", "event_type", "props", "ts")
    // the same batch operators compose on a streaming DataFrame
    val e = graft.operators.Records.jsonPath(df, "props", "k" -> "$.k")
    val up = graft.operators.Records.update(e,
      "k" -> org.apache.spark.sql.functions.col("k").cast("long"),
      "user_tag" -> graft.functions.El.compile("u-${user_id:padLeft(4, '0')}"))
    val routed = graft.operators.Route.tagged(up, Seq(
      "alerts" -> (org.apache.spark.sql.functions.col("event_type") === "error"),
      "traffic" -> org.apache.spark.sql.functions.col("event_type").isin("click", "view")))
    val agg = Streams.windowedAgg(routed, "ts", "route", "k", "10 minutes", "0 seconds")
    val q = agg.writeStream.format("memory").queryName("flow_stream")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, 7L, "error", """{"k":5}""", ts(0)),
        (2L, 8L, "click", """{"k":3}""", ts(30)),
        (3L, 9L, "view", """{"k":2}""", ts(60)))
      q.processAllAvailable()
      input.addData((4L, 1L, "click", """{"k":1}""", ts(3600))) // advance watermark, close window 1
      q.processAllAvailable()
      val rows = spark.table("flow_stream")
        .select("route", "cnt", "sum_value").as[(String, Long, Long)].collect().toSet
      assert(rows.contains(("alerts", 1L, 5L)))
      assert(rows.contains(("traffic", 2L, 5L)))
    } finally q.stop()
  }

  test("socketStream ingests newline records from a live TCP server (ListenTCP)") {
    val server = new java.net.ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val port = server.getLocalPort
    // one-shot server: accept, write three syslog-ish lines, close
    val t = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      out.println("<13>Feb  5 12:00:00 web01 sshd[1]: hello")
      out.println("<14>Feb  5 12:00:01 web02 cron[2]: tick")
      out.println("plain line")
      out.flush()
      Thread.sleep(3000) // keep the connection up while the source reads
      sock.close(); server.close()
    })
    t.setDaemon(true); t.start()
    val lines = Streams.socketStream(spark, "127.0.0.1", port)
    val parsed = graft.operators.Parse.parseSyslog(lines, "value")
    val q = parsed.writeStream.format("memory").queryName("tcp_lines")
      .outputMode("append").start()
    try {
      // socket source has no end-of-stream: poll until the rows land
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250); n = spark.table("tcp_lines").count()
      }
      assert(n >= 3, s"expected 3 socket records, got $n")
      val hosts = spark.table("tcp_lines").select("sl_host")
        .as[Option[String]].collect().flatten.toSet
      assert(hosts == Set("web01", "web02"))
    } finally { q.stop(); t.interrupt() }
  }

  test("dedupeNearSimhash drops prefix-agreeing near-dups within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val base = Array.fill(8)(
      "the quick brown fox jumps over the lazy dog while the cat watches nearby").mkString(" ")
    val input = MemoryStream[(Long, String, Timestamp)]
    val df = input.toDS().toDF("id", "text", "ts")
    // pinned texts: ids 1/2 differ at simhash bits 25 and 48 (hamming 2),
    // so the top-15 band collapses them while id 3 (hamming 37) survives
    val out = Streams.dedupeNearSimhash(df, "text", "ts", "10 minutes", prefixBits = 15)
    val q = out.writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, base, ts(1)),
        (2L, base.replaceFirst("lazy", "idle"), ts(2)), // near-dup of 1 (one token changed)
        (3L, "completely different content about distributed query engines and shuffles " * 8, ts(3)))
      q.processAllAvailable()
      val kept = spark.table("neardup").select("id").as[Long].collect().toSet
      assert(kept.contains(3L), "unrelated doc must survive")
      assert(kept.size == 2, s"near-dup should collapse to one of (1,2): kept $kept")
      assert(kept.contains(1L) || kept.contains(2L))
    } finally q.stop()
  }
}
