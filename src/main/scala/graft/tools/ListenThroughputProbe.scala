package graft.tools

import java.net.{InetSocketAddress, Socket}
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** One-shot ingress-ceiling measurement for the Listen-family single
  * receiver (VERDICT r11 task 5): how many newline-delimited lines/min
  * can `Net.listenTcp`'s spooler accept and durably land, with the
  * flush file I/O moved OUTSIDE the shared batch lock (r12 change —
  * previously every reader thread stalled behind each spool write).
  *
  * Measures two things on a quiet box:
  *  1. RAW SPOOLER CEILING — `nConns` concurrent senders blast
  *     `nLines` total lines at one listener; wall time from first
  *     byte to all lines durably in spool files (tmp+rename only).
  *  2. COMPILED-FLOW END-TO-END — the same spool read back through a
  *     compiled ListenTCP flow (file stream source → parse → filter),
  *     timing the Spark AvailableNow drain, so the artifact records
  *     both the socket-side and the query-side rates.
  *
  * This is a CALIBRATION number for the documented single-receiver
  * contract ("front with a distributed log at scale") — the
  * distributed path is the file/object-store spool the flow actually
  * binds to, which scales with the filesystem, not this socket.
  *
  * Usage: `sbt "runMain graft.tools.ListenThroughputProbe [nLines] [nConns] [batchSize]"`
  */
object ListenThroughputProbe {
  def main(args: Array[String]): Unit = {
    val nLines = if (args.length > 0) args(0).toInt else 2000000
    val nConns = if (args.length > 1) args(1).toInt else 8
    val batchSize = if (args.length > 2) args(2).toInt else 5000
    val spool = Files.createTempDirectory("graft_listen_probe").toString
    val listener = graft.streaming.Net.listenTcp(0, spool, batchSize = batchSize)
    val perConn = nLines / nConns
    // ~60 B/line, the syslog-ish shape the ListenTCP flows carry
    def line(c: Int, i: Int): String =
      s"<13>Oct 11 22:14:15 host$c app[$i]: event $i from connection $c payload"

    val t0 = System.nanoTime()
    val senders = (0 until nConns).map { c =>
      val t = new Thread(() => {
        val sock = new Socket()
        sock.connect(new InetSocketAddress("127.0.0.1", listener.port), 5000)
        val out = new java.io.BufferedOutputStream(sock.getOutputStream, 256 * 1024)
        var i = 0
        while (i < perConn) {
          out.write(line(c, i).getBytes("UTF-8")); out.write('\n'); i += 1
        }
        out.flush(); sock.close()
      }, s"probe-sender-$c")
      t.start(); t
    }
    senders.foreach(_.join())
    val sent = perConn.toLong * nConns
    // durability point: every line in a renamed (non-.tmp) spool file
    def spooled(): Long = {
      val files = Files.list(Paths.get(spool)).iterator().asScala
        .filterNot(_.toString.endsWith(".tmp")).toSeq
      files.map(f => Files.readAllLines(f).size().toLong).sum
    }
    while (spooled() < sent) Thread.sleep(50)
    val ingestSec = (System.nanoTime() - t0) / 1e9
    val files = Files.list(Paths.get(spool)).iterator().asScala
      .filterNot(_.toString.endsWith(".tmp")).size

    // end-to-end: the compiled flow's view of the same spool
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val json = s"""{"flowContents": {"name": "probe-edge",
      "processors": [
        {"identifier": "p-listen", "name": "ProbeSyslog",
         "type": "org.apache.nifi.processors.standard.ListenSyslog",
         "properties": {"Listening Port": "0", "Spool Directory": "$spool"}},
        {"identifier": "p-route", "name": "Severity",
         "type": "org.apache.nifi.processors.standard.RouteOnAttribute",
         "properties": {"notice": "$${severity:equals(5)}"}}],
      "inputPorts": [], "outputPorts": [{"identifier": "o", "name": "notice"}],
      "connections": [
        {"source": {"id": "p-listen"}, "destination": {"id": "p-route"}},
        {"source": {"id": "p-route"}, "destination": {"id": "o"},
         "selectedRelationships": ["notice"]}]}}"""
    val flow = graft.FlowCompiler.parse(json)
    val out = Files.createTempDirectory("graft_listen_probe_out").toString + "/notice"
    val ckpt = Files.createTempDirectory("graft_listen_probe_ckpt").toString
    val t1 = System.nanoTime()
    val df = graft.FlowCompiler.compile(spark, flow,
      Map.empty[String, org.apache.spark.sql.DataFrame])("notice")
    val q = graft.streaming.Streams.toParquetSink(
      df.select("severity", "sl_host", "sl_msg"), out, ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(600000)
    val flowSec = (System.nanoTime() - t1) / 1e9
    val flowRows = spark.read.parquet(out).count()

    println(s"""{"lines":$sent,"conns":$nConns,"batch_size":$batchSize,""" +
      s""""spool_files":$files,"ingest_sec":${f"$ingestSec%.2f"},""" +
      s""""lines_per_min":${(sent / ingestSec * 60).toLong},""" +
      s""""flow_sec":${f"$flowSec%.2f"},"flow_rows":$flowRows,""" +
      s""""flow_rows_per_min":${(sent / flowSec * 60).toLong}}""")
    listener.stop()
    spark.stop()
  }
}
