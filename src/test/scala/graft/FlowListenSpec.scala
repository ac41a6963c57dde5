package graft

import java.net.{DatagramPacket, DatagramSocket, HttpURLConnection, InetSocketAddress, Socket, URL}
import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

import graft.streaming.{Net, Streams}

/** r11 Listen-family flow vocabulary: a NiFi canvas that starts at a
  * push-ingestion edge (ListenHTTP / ListenTCP / ListenUDP /
  * ListenSyslog / HandleHttpRequest) or an FTP remote now COMPILES, and
  * the live endpoints start from the same JSON
  * ([[FlowCompiler.startListeners]]). Every test here drives REAL
  * traffic — HTTP POSTs, TCP/UDP sockets, a live RFC-959 FTP server —
  * through the COMPILED flow, per the r10 verdict's done-criterion. */
class FlowListenSpec extends SparkSpec {
  import spark.implicits._

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/flows/$name.json")
    require(in != null, s"flow resource $name missing")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private def post(url: String, body: String): (Int, String) = {
    val c = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod("POST")
    c.setDoOutput(true)
    c.setConnectTimeout(5000)
    c.setReadTimeout(60000)
    val out = c.getOutputStream
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val code = c.getResponseCode
    val in = if (code < 400) c.getInputStream else c.getErrorStream
    val resp = if (in == null) "" else
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    (code, resp)
  }

  /** Minimal RFC-959 upload client (USER/PASS/PASV/STOR) — raw
    * sockets, independent of the server under test. */
  private def ftpUpload(port: Int, user: String, pass: String,
                        name: String, data: Array[Byte]): Unit = {
    val sock = new Socket("127.0.0.1", port)
    try {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
      val out = sock.getOutputStream
      def cmd(c: String): String = {
        if (c != null) { out.write((c + "\r\n").getBytes("UTF-8")); out.flush() }
        in.readLine()
      }
      assert(cmd(null).startsWith("220"))
      assert(cmd(s"USER $user").startsWith("331"))
      assert(cmd(s"PASS $pass").startsWith("230"))
      val pasv = cmd("PASV")
      assert(pasv.startsWith("227"), pasv)
      val nums = "\\d+".r.findAllIn(pasv).toSeq.takeRight(2).map(_.toInt)
      assert(cmd(s"STOR $name").startsWith("150"))
      val ds = new Socket("127.0.0.1", nums(0) * 256 + nums(1))
      try ds.getOutputStream.write(data) finally ds.close()
      assert(in.readLine().startsWith("226"))
      cmd("QUIT")
    } finally sock.close()
  }

  test("committed ftp_ingest flow: live STOR uploads -> compiled streaming flow -> " +
       "mime-routed trimmed sink") {
    val spool = Files.createTempDirectory("graft_ftpflow_spool").toString
    val out = Files.createTempDirectory("graft_ftpflow_out").toString + "/textual"
    val ckpt = Files.createTempDirectory("graft_ftpflow_ckpt").toString
    val json = resource("ftp_ingest")
    val params = Map("ftp.spool" -> spool, "ftp.pass" -> "upl0ad")
    val flow = FlowCompiler.parse(json)
    val listeners = FlowCompiler.startListeners(flow, params)
    assert(listeners.map(_.tpe) === Seq("ListenFTP"))
    try {
      // live uploads: two text payloads and one binary (PNG magic)
      ftpUpload(listeners.head.port, "loader", "upl0ad", "a.csv",
        "id,v\n1,9\n".getBytes("UTF-8"))
      ftpUpload(listeners.head.port, "loader", "upl0ad", "b.txt",
        "plain words here\n".getBytes("UTF-8"))
      ftpUpload(listeners.head.port, "loader", "upl0ad", "img.png",
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 1, 2))

      val textual = FlowCompiler.compile(spark, flow,
        Map.empty[String, org.apache.spark.sql.DataFrame], params)("textual")
      assert(textual.isStreaming, "ListenFTP must compile to a streaming source")
      // FilterAttribute already shed the transport columns in-flow
      assert(textual.columns.toSeq == Seq("filename", "content", "ingest_tag"))
      val q = Streams.toParquetSink(textual, out, ckpt, Trigger.AvailableNow())
      assert(q.awaitTermination(120000), "flow run did not finish")

      val rows = spark.read.parquet(out)
        .select(col("filename"), col("content").cast("string"), col("ingest_tag"))
        .as[(String, String, String)].collect().sortBy(_._1)
      assert(rows.length == 2, s"only text payloads may land: ${rows.toSeq}")
      assert(rows.map(_._1).forall(f => f.endsWith("-a.csv") || f.endsWith("-b.txt")))
      assert(rows.map(_._2).toSet == Set("id,v\n1,9\n", "plain words here\n"))
      assert(rows.forall { case (f, _, tag) => tag == s"ftp:text/plain:$f" },
        s"ingest_tag must carry mime + spool filename, got ${rows.map(_._3).toSeq}")
    } finally listeners.foreach(_.stop())
  }

  test("committed listen_http flow: live POSTs -> compiled streaming flow -> " +
       "route-filtered checkpointed sink") {
    val spool = Files.createTempDirectory("graft_lh_spool").toString
    val out = Files.createTempDirectory("graft_lh_out").toString + "/metrics"
    val ckpt = Files.createTempDirectory("graft_lh_ckpt").toString
    val json = resource("listen_http")
    val params = Map("http.spool" -> spool)
    val flow = FlowCompiler.parse(json)
    val listeners = FlowCompiler.startListeners(flow, params)
    assert(listeners.map(_.tpe) === Seq("ListenHTTP"))
    val port = listeners.head.port
    try {
      // live traffic: two metric payloads, one heartbeat, one junk
      assert(post(s"http://127.0.0.1:$port/ingest", "metric,cpu,0.93")._1 === 200)
      assert(post(s"http://127.0.0.1:$port/ingest", "hb,node7")._1 === 200)
      assert(post(s"http://127.0.0.1:$port/ingest", "metric,mem,0.41")._1 === 200)
      assert(post(s"http://127.0.0.1:$port/ingest", "garbage")._1 === 200)

      val metrics = FlowCompiler.compile(spark, flow,
        Map.empty[String, org.apache.spark.sql.DataFrame], params)("metrics")
      assert(metrics.isStreaming, "ListenHTTP must compile to a streaming source")
      val q = Streams.toParquetSink(
        metrics.select("content", "route", "ingest_tag"), out, ckpt,
        Trigger.AvailableNow())
      assert(q.awaitTermination(120000), "flow run did not finish")

      val rows = spark.read.parquet(out)
        .select("content", "route", "ingest_tag")
        .as[(String, String, String)].collect().sortBy(_._1)
      assert(rows.map(_._1) === Array("metric,cpu,0.93", "metric,mem,0.41"),
        "only the selected metric route may land in the sink")
      assert(rows.forall(_._2 == "metric"))
      assert(rows.forall { case (_, _, tag) =>
        tag.startsWith("http:metric:") && tag.endsWith(".dat") },
        s"ingest_tag must carry route + spool filename, got ${rows.map(_._3).toSeq}")
    } finally listeners.foreach(_.stop())
  }

  test("ListenSyslog flow: live TCP syslog lines through the compiled stream") {
    val spool = Files.createTempDirectory("graft_lt_spool").toString
    val out = Files.createTempDirectory("graft_lt_out").toString + "/crit"
    val ckpt = Files.createTempDirectory("graft_lt_ckpt").toString
    val json = s"""{"flowContents": {"name": "syslog-edge",
      "processors": [
        {"identifier": "p-listen", "name": "EdgeSyslog",
         "type": "org.apache.nifi.processors.standard.ListenSyslog",
         "properties": {"Listening Port": "0", "Spool Directory": "$spool"}},
        {"identifier": "p-route", "name": "Severity",
         "type": "org.apache.nifi.processors.standard.RouteOnAttribute",
         "properties": {"critical": "$${severity:lt(3)}"}}],
      "inputPorts": [], "outputPorts": [{"identifier": "o", "name": "critical"}],
      "connections": [
        {"source": {"id": "p-listen"}, "destination": {"id": "p-route"}},
        {"source": {"id": "p-route"}, "destination": {"id": "o"},
         "selectedRelationships": ["critical"]}]}}"""
    val flow = FlowCompiler.parse(json)
    val listeners = FlowCompiler.startListeners(flow)
    val port = listeners.head.port
    try {
      // live socket traffic: severity 2 (crit) and 6 (info)
      val sock = new Socket()
      sock.connect(new InetSocketAddress("127.0.0.1", port), 5000)
      val w = new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8")
      w.write("<10>Oct 11 22:14:15 h1 app[7]: disk fail\n")
      w.write("<14>Oct 11 22:14:16 h1 app[7]: login ok\n")
      w.flush(); sock.close()
      // listener flushes its batch on idle (250 ms) — wait for the spool
      eventually {
        assert(Files.list(java.nio.file.Paths.get(spool)).count() >= 1)
      }
      val crit = FlowCompiler.compile(spark, flow,
        Map.empty[String, org.apache.spark.sql.DataFrame])("critical")
      assert(crit.isStreaming)
      val q = Streams.toParquetSink(crit.select("severity", "sl_host", "sl_msg"),
        out, ckpt, Trigger.AvailableNow())
      assert(q.awaitTermination(120000))
      val rows = spark.read.parquet(out)
        .select("severity", "sl_msg").as[(Int, String)].collect()
      assert(rows.toSeq === Seq((2, "disk fail")),
        "only the critical severity may pass the route selection")
    } finally listeners.foreach(_.stop())
  }

  test("ListenUDP flow: live datagrams through the compiled stream") {
    val spool = Files.createTempDirectory("graft_lu_spool").toString
    val out = Files.createTempDirectory("graft_lu_out").toString + "/events"
    val ckpt = Files.createTempDirectory("graft_lu_ckpt").toString
    val json = s"""{"flowContents": {"name": "udp-edge",
      "processors": [
        {"identifier": "p-listen", "name": "EdgeUdp",
         "type": "org.apache.nifi.processors.standard.ListenUDP",
         "properties": {"Listening Port": "0", "Spool Directory": "$spool"}}],
      "inputPorts": [], "outputPorts": [{"identifier": "o", "name": "events"}],
      "connections": [
        {"source": {"id": "p-listen"}, "destination": {"id": "o"}}]}}"""
    val flow = FlowCompiler.parse(json)
    val listeners = FlowCompiler.startListeners(flow)
    val port = listeners.head.port
    try {
      val sock = new DatagramSocket()
      try Seq("evt:a", "evt:b", "evt:c").foreach { m =>
        val b = m.getBytes("UTF-8")
        sock.send(new DatagramPacket(b, b.length,
          new InetSocketAddress("127.0.0.1", port)))
      } finally sock.close()
      eventually {
        assert(Files.list(java.nio.file.Paths.get(spool)).count() >= 1)
      }
      val events = FlowCompiler.compile(spark, flow,
        Map.empty[String, org.apache.spark.sql.DataFrame])("events")
      assert(events.isStreaming)
      val q = Streams.toParquetSink(events, out, ckpt, Trigger.AvailableNow())
      assert(q.awaitTermination(120000))
      assert(spark.read.parquet(out).as[String].collect().sorted
        === Array("evt:a", "evt:b", "evt:c"))
    } finally listeners.foreach(_.stop())
  }

  test("HandleHttpRequest/Response flow: blocked live exchanges released by " +
       "the compiled batch run") {
    val spool = Files.createTempDirectory("graft_hh_spool").toString
    val replies = Files.createTempDirectory("graft_hh_reply").toString
    val json = s"""{"flowContents": {"name": "http-exchange",
      "processors": [
        {"identifier": "p-req", "name": "Receive",
         "type": "org.apache.nifi.processors.standard.HandleHttpRequest",
         "properties": {"Listening Port": "0", "Spool Directory": "$spool",
                        "Reply Directory": "$replies"}},
        {"identifier": "p-up", "name": "Shout",
         "type": "org.apache.nifi.processors.standard.ReplaceText",
         "properties": {"Search Value": "^(.*)$$", "Replacement Value": "ACK:$$1"}},
        {"identifier": "p-resp", "name": "Respond",
         "type": "org.apache.nifi.processors.standard.HandleHttpResponse",
         "properties": {"Reply Directory": "$replies"}}],
      "inputPorts": [], "outputPorts": [{"identifier": "o", "name": "answered"}],
      "connections": [
        {"source": {"id": "p-req"}, "destination": {"id": "p-up"}},
        {"source": {"id": "p-up"}, "destination": {"id": "p-resp"}},
        {"source": {"id": "p-resp"}, "destination": {"id": "o"}}]}}"""
    val flow = FlowCompiler.parse(json)
    val listeners = FlowCompiler.startListeners(flow)
    assert(listeners.map(_.tpe) === Seq("HandleHttpRequest"))
    val port = listeners.head.port
    try {
      // clients block inside the exchange until the flow run replies
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val clients = Seq("ping-1", "ping-2").map { body =>
        Future(post(s"http://127.0.0.1:$port/exchange", body))
      }
      // both requests must be spooled before the batch run services them
      eventually {
        assert(Files.list(java.nio.file.Paths.get(spool))
          .filter(p => p.toString.endsWith(".dat")).count() === 2)
      }
      val answered = FlowCompiler.compile(spark, flow,
        Map.empty[String, org.apache.spark.sql.DataFrame])("answered")
      assert(!answered.isStreaming, "exchange servicing is a batch run")
      val served = answered.select("content").as[String].collect().sorted
      assert(served === Array("ACK:ping-1", "ACK:ping-2"))
      val responses = clients.map(f => Await.result(f, 60.seconds))
      assert(responses.map(_._1).forall(_ == 200), s"clients must get 200, got $responses")
      assert(responses.map(_._2).sorted === Seq("ACK:ping-1", "ACK:ping-2"),
        "each client must receive ITS transformed body")
    } finally listeners.foreach(_.stop())
  }

  test("PutTCP sink flow: compiled run delivers newline-delimited rows to a live receiver") {
    val spool = Files.createTempDirectory("graft_pt_spool").toString
    // the receiver is itself a live TCP spool listener
    val rx = Net.listenTcp(0, spool)
    try {
      val json = s"""{"flowContents": {"name": "tcp-export",
        "processors": [
          {"identifier": "p-gen", "name": "Emit",
           "type": "org.apache.nifi.processors.standard.GenerateFlowFile",
           "properties": {"File Count": "5"}},
          {"identifier": "p-fmt", "name": "Line",
           "type": "org.apache.nifi.processors.attributes.UpdateAttribute",
           "properties": {"value": "row-$${id}"}},
          {"identifier": "p-put", "name": "Ship",
           "type": "org.apache.nifi.processors.standard.PutTCP",
           "properties": {"Hostname": "127.0.0.1", "Port": "${rx.port}"}}],
        "inputPorts": [], "outputPorts": [{"identifier": "o", "name": "shipped"}],
        "connections": [
          {"source": {"id": "p-gen"}, "destination": {"id": "p-fmt"}},
          {"source": {"id": "p-fmt"}, "destination": {"id": "p-put"}},
          {"source": {"id": "p-put"}, "destination": {"id": "o"}}]}}"""
      val shipped = FlowCompiler.compile(spark, json,
        Map.empty[String, org.apache.spark.sql.DataFrame])("shipped")
      assert(shipped.count() === 5)
      eventually {
        val got = Files.list(java.nio.file.Paths.get(spool)).iterator()
        val lines = scala.jdk.CollectionConverters.IteratorHasAsScala(got).asScala
          .filter(_.toString.endsWith(".log"))
          .flatMap(p => Files.readString(p).split("\n")).toSeq.sorted
        assert(lines === (0 until 5).map(i => s"row-$i").sorted)
      }
    } finally rx.stop()
  }

  test("GetFTP/PutFTP flows: payloads through a live RFC-959 server") {
    val root = Files.createTempDirectory("graft_fflow_root")
    val srv = new MiniFtpServer(root)
    spark.sparkContext.hadoopConfiguration
      .set("fs.ftp.data.connection.mode", "PASSIVE_LOCAL_DATA_CONNECTION_MODE")
    spark.sparkContext.hadoopConfiguration.set("fs.ftp.impl.disable.cache", "true")
    try {
      Files.createDirectories(root.resolve("in"))
      Files.write(root.resolve("in/a.txt"), "alpha".getBytes("UTF-8"))
      Files.write(root.resolve("in/b.txt"), "beta".getBytes("UTF-8"))
      Files.write(root.resolve("in/skip.dat"), "nope".getBytes("UTF-8"))
      val common = s""""Hostname": "127.0.0.1", "Port": "${srv.port}",
        "Username": "${srv.user}", "Password": "${srv.pass}""""
      val json = s"""{"flowContents": {"name": "ftp-mirror",
        "processors": [
          {"identifier": "p-get", "name": "Pull",
           "type": "org.apache.nifi.processors.standard.GetFTP",
           "properties": {$common, "Remote Path": "/in",
                          "File Filter Regex": ".*\\\\.txt"}},
          {"identifier": "p-up", "name": "Shout",
           "type": "org.apache.nifi.processors.standard.ReplaceText",
           "properties": {"Search Value": "(.+)", "Replacement Value": "got:$$1"}},
          {"identifier": "p-put", "name": "Push",
           "type": "org.apache.nifi.processors.standard.PutFTP",
           "properties": {$common, "Remote Path": "/out"}}],
        "inputPorts": [], "outputPorts": [{"identifier": "o", "name": "mirrored"}],
        "connections": [
          {"source": {"id": "p-get"}, "destination": {"id": "p-up"}},
          {"source": {"id": "p-up"}, "destination": {"id": "p-put"}},
          {"source": {"id": "p-put"}, "destination": {"id": "o"}}]}}"""
      val mirrored = FlowCompiler.compile(spark, json,
        Map.empty[String, org.apache.spark.sql.DataFrame])("mirrored")
      // output = read-back listing of the remote sink directory
      val names = mirrored.select(element_at(split(col("path"), "/"), -1))
        .as[String].collect().sorted
      assert(names === Array("a.txt", "b.txt"),
        "regex must keep only .txt, and both uploads must list back")
      // the bytes really landed on the server, transformed
      assert(Files.readString(root.resolve("out/a.txt")) === "got:alpha")
      assert(Files.readString(root.resolve("out/b.txt")) === "got:beta")
    } finally srv.stop()
  }

  test("Listen-family + FTP processor types export/parse round-trip") {
    val json = resource("listen_http")
    val flow = FlowCompiler.parse(json)
    val round = FlowCompiler.parse(FlowCompiler.export(flow))
    assert(round === flow)
    assert(FlowCompiler.export(round) === FlowCompiler.export(flow))
  }

  test("startListeners: malformed 'Listening Port' fails with the processor's name, " +
       "not a bare NumberFormatException") {
    val params = Map("http.spool" ->
      Files.createTempDirectory("graft_badport_spool").toString)
    val flow = FlowCompiler.parse(resource("listen_http"))
    val broken = flow.copy(processors = flow.processors.map { p =>
      if (p.tpe.endsWith("ListenHTTP"))
        p.copy(props = p.props.filterNot(_._1 == "Listening Port") :+ ("Listening Port" -> "eighty"))
      else p
    })
    val err = intercept[IllegalArgumentException] {
      FlowCompiler.startListeners(broken, params)
    }
    assert(err.getMessage.contains("Listening Port"))
    assert(err.getMessage.contains("eighty"))
    assert(broken.processors.exists(p => err.getMessage.contains(p.name)))
    val tooBig = flow.copy(processors = flow.processors.map { p =>
      if (p.tpe.endsWith("ListenHTTP"))
        p.copy(props = p.props.filterNot(_._1 == "Listening Port") :+ ("Listening Port" -> "70000"))
      else p
    })
    val err2 = intercept[IllegalArgumentException] {
      FlowCompiler.startListeners(tooBig, params)
    }
    assert(err2.getMessage.contains("65535"))
  }
}
