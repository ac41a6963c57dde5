package graft

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.util.concurrent.{CompletableFuture, TimeUnit}

import org.apache.spark.sql.functions._
import graft.streaming.{Streams, Ws}

/** Live-wire gates for the websocket edge (ListenWebSocket /
  * PutWebSocket): the JDK's own RFC 6455 CLIENT drives the hand-rolled
  * server over a real socket — handshake, masking, fragmentation,
  * ping/pong, close, and the resource bounds. Same posture as
  * EmailSpec/FtpSpec. */
class WsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ws_$tag").toString

  private def connect(port: Int): WebSocket =
    HttpClient.newHttpClient().newWebSocketBuilder()
      .buildAsync(URI.create(s"ws://127.0.0.1:$port/"),
        new WebSocket.Listener {})
      .join()

  test("acceptKey matches the RFC 6455 §1.3 worked example") {
    assert(Ws.acceptKey("dGhlIHNhbXBsZSBub25jZQ==") ===
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  test("JDK client messages spool as JSON lines; fragmentation and ping round-trip") {
    val spool = freshDir("listen")
    val l = Ws.listenWebSocket(0, spool, batchSize = 1)
    try {
      val ws = connect(l.port)
      ws.sendText("hello ws", true).join()
      // fragmented message: two frames, one spooled record
      ws.sendText("part-one ", false).join()
      ws.sendText("part-two", true).join()
      // ping must come back as pong (the JDK client handles it silently;
      // a server that drops pings would stall the client's keepalive)
      ws.sendPing(java.nio.ByteBuffer.wrap("k".getBytes)).join()
      ws.sendText("""after "ping" with quotes""", true).join()
      ws.sendClose(WebSocket.NORMAL_CLOSURE, "bye").join()
      val deadline = System.currentTimeMillis() + 5000
      def spooled() = spark.read.json(spool).count()
      while (spooled() < 3 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      val got = spark.read.json(spool).select("session", "msg")
        .as[(String, String)].collect()
      assert(got.map(_._2).toSet ===
        Set("hello ws", "part-one part-two", """after "ping" with quotes"""))
      assert(got.map(_._1).distinct.length === 1, "one session id for one connection")
    } finally l.stop()
  }

  test("oversize text message closes the session with 1009; next connection works") {
    val spool = freshDir("cap")
    val l = Ws.listenWebSocket(0, spool, batchSize = 1, maxMessageBytes = 1024)
    try {
      val status = new CompletableFuture[Integer]()
      val ws = HttpClient.newHttpClient().newWebSocketBuilder()
        .buildAsync(URI.create(s"ws://127.0.0.1:${l.port}/"),
          new WebSocket.Listener {
            override def onClose(w: WebSocket, statusCode: Int, reason: String) = {
              status.complete(statusCode); null
            }
          }).join()
      ws.sendText("x" * 4096, true).join()
      assert(status.get(10, TimeUnit.SECONDS) === 1009, "expected MESSAGE_TOO_BIG close")
      // the listener survives: a fresh session still spools
      val ws2 = connect(l.port)
      ws2.sendText("small", true).join()
      ws2.sendClose(WebSocket.NORMAL_CLOSURE, "bye").join()
      val deadline = System.currentTimeMillis() + 5000
      while (spark.read.json(spool).count() < 1 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(spark.read.json(spool).select("msg").as[String].collect().toSeq === Seq("small"))
    } finally l.stop()
  }

  test("connections past maxConnections are refused before the upgrade") {
    val spool = freshDir("conncap")
    val l = Ws.listenWebSocket(0, spool, maxConnections = 1)
    try {
      val first = connect(l.port) // holds the slot
      val refused = intercept[java.util.concurrent.CompletionException] {
        connect(l.port)
      }
      val cause = refused.getCause
      assert(cause.isInstanceOf[java.io.IOException] ||
        Option(cause.getMessage).exists(_.contains("503")),
        s"unexpected refusal shape: $cause")
      first.sendClose(WebSocket.NORMAL_CLOSURE, "bye").join()
    } finally l.stop()
  }

  test("putWebSocket sends one text message per row from executors") {
    val spool = freshDir("put")
    val l = Ws.listenWebSocket(0, spool, batchSize = 1)
    try {
      val rows = Seq("alpha", "beta", "gamma", "delta")
        .toDF("msg").repartition(2)
      Ws.putWebSocket(rows, s"ws://127.0.0.1:${l.port}/")
      val deadline = System.currentTimeMillis() + 5000
      while (spark.read.json(spool).count() < 4 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      val got = spark.read.json(spool).select("session", "msg")
        .as[(String, String)].collect()
      assert(got.map(_._2).toSet === Set("alpha", "beta", "gamma", "delta"))
      assert(got.map(_._1).distinct.length === 2,
        "one connection per partition, not per row")
    } finally l.stop()
  }

  test("wss (r17): TLS listener + TLS putWebSocket round-trip; plaintext spools nothing") {
    val spool = freshDir("wss")
    val l = Ws.listenWebSocket(0, spool, batchSize = 1,
      ssl = Some(TestKeystore.sslContext))
    try {
      Ws.putWebSocket(Seq("secured msg").toDF("msg"),
        s"wss://127.0.0.1:${l.port}/",
        keystore = Some((TestKeystore.path, TestKeystore.password)))
      val deadline = System.currentTimeMillis() + 5000
      while (spark.read.json(spool).count() < 1 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(spark.read.json(spool).select("msg").as[String].collect().toSeq
        === Seq("secured msg"))
      // a plaintext ws client dies in the TLS layer pre-upgrade
      intercept[Exception] {
        Ws.putWebSocket(Seq("plain").toDF("msg"), s"ws://127.0.0.1:${l.port}/")
      }
      Thread.sleep(400)
      assert(spark.read.json(spool).count() === 1, "plaintext must not spool")
    } finally l.stop()
  }

  test("committed ws_syslog_edge flow: listeners start, both legs deliver live") {
    val spool = freshDir("committed") + "/spool"
    val sysSpool = freshDir("sysspool")
    val sysListener = graft.streaming.Net.listenTcp(0, sysSpool, batchSize = 1)
    val json = {
      val in = getClass.getResourceAsStream("/flows/ws_syslog_edge.json")
      require(in != null, "committed flow missing")
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val flow = FlowCompiler.parse(json)
    val listeners = FlowCompiler.startListeners(flow,
      Map("spool.dir" -> spool, "syslog.port" -> "1", "ws.port" -> "1"))
    assert(listeners.map(_.tpe) === Seq("ListenWebSocket"))
    val wsPort = listeners.head.port
    try {
      val rows = Seq((4, 6, "Oct 13 09:30:00", "edge9", "graft", "ws edge live"))
        .toDF("facility", "severity", "sl_ts", "sl_host", "sl_tag", "sl_msg")
      val outs = FlowCompiler.compile(spark, flow, Map("events" -> rows),
        Map("spool.dir" -> spool, "syslog.port" -> sysListener.port.toString,
            "ws.port" -> wsPort.toString))
      assert(outs("audited").count() === 1)
      // leg 1: the RFC 3164 line reached the TCP syslog receiver
      val deadline = System.currentTimeMillis() + 5000
      while (spark.read.textFile(sysSpool).count() < 1 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      val line = spark.read.textFile(sysSpool).as[String].head()
      assert(line === "<38>Oct 13 09:30:00 edge9 graft: ws edge live")
      // leg 2: PutWebSocket posted into the flow's own ListenWebSocket
      while (spark.read.json(spool).count() < 1 &&
             System.currentTimeMillis() < deadline + 5000) Thread.sleep(100)
      val inbound = outs("inbound")
      assert(inbound.isStreaming)
      val q = Streams.toMemorySink(inbound.select("msg"), "ws_edge_mem")
      try q.processAllAvailable() finally q.stop()
      assert(spark.table("ws_edge_mem").as[String].collect().toSeq === Seq("ws edge live"))
    } finally { listeners.foreach(_.stop()); sysListener.stop() }
  }

  test("flow vocabulary: ListenWebSocket starts from flow JSON; PutWebSocket sink sends") {
    val spool = freshDir("flow") + "/spool"
    val flow = FlowCompiler.parse(
      s"""{"flowContents": {"name": "wsflow",
         |  "processors": [
         |    {"identifier": "lw", "name": "feed", "type": "ListenWebSocket",
         |     "properties": {"Listening Port": "0", "Spool Directory": "$spool"}},
         |    {"identifier": "pw", "name": "notify", "type": "PutWebSocket",
         |     "properties": {"WebSocket URI": "ws://127.0.0.1:#{ws.port}/"}}],
         |  "inputPorts": [{"identifier": "i", "name": "events"}],
         |  "outputPorts": [{"identifier": "o", "name": "inbound"},
         |                  {"identifier": "o2", "name": "sent"}],
         |  "connections": [
         |    {"source": {"id": "lw"}, "destination": {"id": "o"}},
         |    {"source": {"id": "i"}, "destination": {"id": "pw"}},
         |    {"source": {"id": "pw"}, "destination": {"id": "o2"}}]}}""".stripMargin)
    val listeners = FlowCompiler.startListeners(flow, Map("ws.port" -> "1"))
    assert(listeners.map(_.tpe) === Seq("ListenWebSocket"))
    val port = listeners.head.port
    try {
      // the PutWebSocket leg posts INTO the flow's own endpoint
      val outs = FlowCompiler.compile(spark, flow,
        Map("events" -> Seq("""{"k":1}""").toDF("msg")),
        Map("ws.port" -> port.toString))
      assert(outs("sent").count() === 1)
      val deadline = System.currentTimeMillis() + 5000
      while (spark.read.json(spool).count() < 1 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      val inbound = outs("inbound")
      assert(inbound.isStreaming)
      val q = Streams.toMemorySink(inbound.select("session", "msg"), "ws_flow_mem")
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("ws_flow_mem").as[(String, String)].collect()
      assert(got.length === 1 && got(0)._2 === """{"k":1}""")
    } finally listeners.foreach(_.stop())
  }
}
