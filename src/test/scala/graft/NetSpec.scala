package graft

import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress, ServerSocket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

import org.apache.spark.sql.functions._

import graft.streaming.Net

/** ListenUDP spool source + PutTCP/PutUDP executor-side sinks, driven
  * over live loopback sockets. */
class NetSpec extends SparkSpec {
  import spark.implicits._

  test("listenUdp spools datagrams in batches; text source reads them back") {
    val spool = java.nio.file.Files.createTempDirectory("graft-udp").toString
    val listener = Net.listenUdp(0, spool, batchSize = 4, flushMs = 100)
    try {
      val sender = new DatagramSocket()
      val target = new InetSocketAddress("127.0.0.1", listener.port)
      val msgs = (1 to 10).map(i => s"pkt-$i") ++ Seq("multi\nline", "bare\rcr")
      msgs.foreach { m =>
        val b = m.getBytes(UTF_8)
        sender.send(new DatagramPacket(b, b.length, target))
      }
      sender.close()
      // wait for the idle flush to drain the tail batch
      val deadline = System.currentTimeMillis() + 10000
      def lines() = spark.read.textFile(spool).collect().sorted
      while (lines().length < msgs.length && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val got = lines()
      assert(got.length === msgs.length)
      assert(got.contains("pkt-7"))
      // embedded newline was escaped so one datagram stays one line
      assert(got.contains("multi\\nline"))
      // a bare \r is a line terminator to Hadoop's reader too — it must
      // be escaped or the datagram splits into two records
      assert(got.contains("bare\\ncr"))
      // batching: fewer spool files than datagrams
      val files = new java.io.File(spool).listFiles().count(!_.getName.endsWith(".tmp"))
      assert(files < msgs.length, s"expected batched spool files, got $files")
    } finally listener.stop()
  }

  test("putTcp delivers every row newline-delimited, one connection per partition") {
    val server = new ServerSocket(0)
    val received = new ConcurrentLinkedQueue[String]()
    val connections = new java.util.concurrent.atomic.AtomicInteger(0)
    val done = new CountDownLatch(2) // 2 partitions → 2 connections
    val acceptor = new Thread(() => {
      while (!server.isClosed) {
        try {
          val s = server.accept()
          connections.incrementAndGet()
          new Thread(() => {
            val in = scala.io.Source.fromInputStream(s.getInputStream, "UTF-8")
            try in.getLines().foreach(received.add) finally { in.close(); s.close() }
            done.countDown()
          }).start()
        } catch { case _: java.net.SocketException => }
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    try {
      val df = spark.range(0, 20, 1, 2).select(concat(lit("row-"), col("id")).as("value"))
      Net.putTcp(df, "127.0.0.1", server.getLocalPort)
      assert(done.await(15, TimeUnit.SECONDS), "receiver did not finish")
      val got = received.iterator().asScala.toSeq.sorted
      assert(got === (0 until 20).map(i => s"row-$i").sorted)
      assert(connections.get() === 2)
    } finally server.close()
  }

  test("ListenSyslog over UDP: datagrams -> spool -> parseSyslog fields") {
    val spool = java.nio.file.Files.createTempDirectory("graft-syslog").toString
    val listener = Net.listenUdp(0, spool, batchSize = 2, flushMs = 100)
    try {
      val sender = new DatagramSocket()
      val target = new InetSocketAddress("127.0.0.1", listener.port)
      Seq("<34>Oct 11 22:14:15 host1 sshd[123]: accepted",
          "<13>Oct 12 08:00:01 host2 cron: job started").foreach { m =>
        val b = m.getBytes(UTF_8)
        sender.send(new DatagramPacket(b, b.length, target))
      }
      sender.close()
      val deadline = System.currentTimeMillis() + 10000
      while (spark.read.textFile(spool).count() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val parsed = graft.operators.Parse.parseSyslog(
          spark.read.textFile(spool).toDF("value"), "value")
        .select("sl_host", "severity", "sl_pid").orderBy("sl_host")
        .as[(String, Int, Option[Int])].collect()
      assert(parsed === Array(("host1", 2, Some(123)), ("host2", 5, None)))
    } finally listener.stop()
  }

  test("PutSyslog flow: formatted RFC 3164 lines survive a listen -> parse round-trip") {
    val spool = java.nio.file.Files.createTempDirectory("graft-putsyslog").toString
    val listener = Net.listenTcp(0, spool, batchSize = 1, flushMs = 100)
    try {
      val rows = Seq(
        (4, 2, "Oct 11 22:14:15", "edge1", "sshd", "session opened"),
        (1, 5, "Oct 12 08:00:01", "edge2", "cron", "job started"))
        .toDF("facility", "severity", "sl_ts", "sl_host", "sl_tag", "sl_msg")
      val flow = FlowCompiler.parse(
        s"""{"flowContents": {"name": "sysout",
           |  "processors": [
           |    {"identifier": "ps", "name": "emit", "type": "PutSyslog",
           |     "properties": {"Hostname": "127.0.0.1", "Port": "${listener.port}",
           |                    "Protocol": "TCP"}}],
           |  "inputPorts": [{"identifier": "i", "name": "events"}],
           |  "outputPorts": [{"identifier": "o", "name": "sent"}],
           |  "connections": [
           |    {"source": {"id": "i"}, "destination": {"id": "ps"}},
           |    {"source": {"id": "ps"}, "destination": {"id": "o"}}]}}""".stripMargin)
      val outs = FlowCompiler.compile(spark, flow, Map("events" -> rows))
      assert(outs("sent").count() === 2)
      val deadline = System.currentTimeMillis() + 10000
      while (spark.read.textFile(spool).count() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      // the lines must parse back to EXACTLY the fields that were sent
      val parsed = graft.operators.Parse.parseSyslog(
          spark.read.textFile(spool).toDF("value"), "value")
        .select("facility", "severity", "sl_ts", "sl_host", "sl_tag", "sl_msg")
        .orderBy("sl_host")
        .as[(Int, Int, String, String, String, String)].collect()
      assert(parsed === Array(
        (4, 2, "Oct 11 22:14:15", "edge1", "sshd", "session opened"),
        (1, 5, "Oct 12 08:00:01", "edge2", "cron", "job started")))
    } finally listener.stop()
  }

  test("graft_hmac is callable from SQL with literal key, rejects column keys") {
    spark.sql("SELECT hex(graft_hmac('what do ya want for nothing?', 'Jefe')) AS m")
      .as[String].collect() match {
      case Array(m) => assert(m.toLowerCase ===
        "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
    }
    val err = intercept[Exception] {
      spark.sql("SELECT graft_hmac('x', content) FROM (SELECT 'k' AS content)").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("putUdp sends one datagram per row and rejects oversized rows") {
    val receiver = new DatagramSocket(0)
    receiver.setSoTimeout(5000)
    val df = Seq("a", "bb", "ccc").toDF("value").repartition(1)
    Net.putUdp(df, "127.0.0.1", receiver.getLocalPort)
    val got = (1 to 3).map { _ =>
      val pkt = new DatagramPacket(new Array[Byte](128), 128)
      receiver.receive(pkt)
      new String(pkt.getData, pkt.getOffset, pkt.getLength, UTF_8)
    }.sorted
    receiver.close()
    assert(got === Seq("a", "bb", "ccc"))
    val err = intercept[org.apache.spark.SparkException] {
      Net.putUdp(Seq("x" * 100).toDF("value"), "127.0.0.1", 9, maxPacketBytes = 10)
    }
    assert(err.getMessage.contains("datagram limit") ||
           Option(err.getCause).exists(_.getMessage.contains("datagram limit")))
  }

  test("listenTcp TLS: lines spool over SSL; a plaintext client spools nothing (r17)") {
    val spool = java.nio.file.Files.createTempDirectory("graft_tcp_tls").toString
    val l = graft.streaming.Net.listenTcp(0, spool, batchSize = 1,
      ssl = Some(TestKeystore.sslContext))
    try {
      val sock = TestKeystore.sslContext.getSocketFactory
        .createSocket("127.0.0.1", l.port)
      try {
        sock.getOutputStream.write("secured line\n".getBytes("UTF-8"))
        sock.getOutputStream.flush()
      } finally sock.close()
      val deadline = System.currentTimeMillis() + 5000
      def lines() = spark.read.text(spool).count()
      while (lines() < 1 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(spark.read.text(spool).as[String].collect().toSeq == Seq("secured line"))
      // plaintext peer: the reader's first byte triggers the handshake,
      // which dies on non-TLS input — nothing new spools
      val plain = new java.net.Socket("127.0.0.1", l.port)
      try {
        plain.getOutputStream.write("plaintext line\n".getBytes("UTF-8"))
        plain.getOutputStream.flush()
      } catch { case _: java.io.IOException => () }
      finally plain.close()
      Thread.sleep(600) // one flush interval past the refusal
      assert(spark.read.text(spool).count() === 1, "plaintext must not spool")
    } finally l.stop()
  }

  test("flow vocabulary TLS: Keystore Path on ListenHTTP and ListenTCP nodes starts the TLS forms (r17)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_flow_tls")
    val hSpool = dir.resolve("http").toString
    val tSpool = dir.resolve("tcp").toString
    val flow = FlowCompiler.parse(
      s"""{"flowContents": {"name": "tls-edges", "processors": [
         |  {"identifier": "h", "type": "ListenHTTP",
         |   "properties": {"Listening Port": "0", "Spool Directory": "$hSpool",
         |     "Keystore Path": "${TestKeystore.path}",
         |     "Keystore Password": "${TestKeystore.password}"}},
         |  {"identifier": "t", "type": "ListenTCP",
         |   "properties": {"Listening Port": "0", "Spool Directory": "$tSpool",
         |     "Keystore Path": "${TestKeystore.path}",
         |     "Keystore Password": "${TestKeystore.password}"}}],
         |  "outputPorts": [], "connections": []}}""".stripMargin)
    val ls = FlowCompiler.startListeners(flow)
    try {
      val http = ls.find(_.tpe == "ListenHTTP").get
      val tcp = ls.find(_.tpe == "ListenTCP").get
      // HTTPS POST with the matching trust context lands in the spool
      val client = java.net.http.HttpClient.newBuilder()
        .sslContext(TestKeystore.sslContext).build()
      val resp = client.send(java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"https://127.0.0.1:${http.port}/ingest"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString("via https"))
        .build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200)
      assert(new java.io.File(hSpool).listFiles().exists(_.getName.endsWith(".dat")))
      // plain HTTP against the TLS port dies in the handshake
      intercept[java.io.IOException] {
        java.net.http.HttpClient.newHttpClient().send(
          java.net.http.HttpRequest.newBuilder()
            .uri(java.net.URI.create(s"http://127.0.0.1:${http.port}/ingest"))
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString("plain"))
            .build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      // TLS TCP line through the flow-started listener
      val sock = TestKeystore.sslContext.getSocketFactory
        .createSocket("127.0.0.1", tcp.port)
      try { sock.getOutputStream.write("flow tls\n".getBytes("UTF-8")); sock.getOutputStream.flush() }
      finally sock.close()
      val deadline = System.currentTimeMillis() + 5000
      while (spark.read.text(tSpool).count() < 1 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(spark.read.text(tSpool).as[String].collect().toSeq == Seq("flow tls"))
    } finally ls.foreach(_.stop())
  }

  private implicit class RichJIterator[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }
}
