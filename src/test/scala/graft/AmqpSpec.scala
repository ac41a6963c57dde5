package graft

import org.apache.spark.sql.functions._
import graft.streaming.{Amqp, Streams}

/** Live-wire gates for the AMQP 0-9-1 edge (ConsumeAMQP broker-side
  * ingress / PublishAMQP egress): a hand-rolled spec client drives the
  * hand-rolled server over a real socket — the full connection
  * negotiation, Basic.Publish with content framing (incl. fragmented
  * bodies), Basic.Consume fan-out through direct and topic exchanges,
  * publisher confirms, and the resource bounds. Same posture as
  * MqttSpec/WsSpec. */
class AmqpSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_amqp_$tag").toString

  /** Minimal raw-socket AMQP 0-9-1 client for driving the listener. */
  private final class Cli(port: Int) {
    val sock = new java.net.Socket("127.0.0.1", port)
    sock.setSoTimeout(5000)
    private val in = new java.io.BufferedInputStream(sock.getInputStream)
    private val out = sock.getOutputStream

    private def w16(v: Int) = Array[Byte]((v >>> 8).toByte, (v & 0xFF).toByte)
    private def w32(v: Long) = Array[Byte]((v >>> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    private def w64(v: Long) = w32(v >>> 32) ++ w32(v & 0xFFFFFFFFL)
    private def ss(s: String) = { val u = s.getBytes("UTF-8"); Array[Byte](u.length.toByte) ++ u }
    private def ls(s: String) = { val u = s.getBytes("UTF-8"); w32(u.length) ++ u }

    def frame(tpe: Int, ch: Int, payload: Array[Byte]): Array[Byte] =
      Array(tpe.toByte) ++ w16(ch) ++ w32(payload.length) ++ payload ++ Array(0xCE.toByte)
    def raw(b: Array[Byte]): Unit = { out.write(b); out.flush() }

    /** (type, channel, payload); None on EOF. */
    def readFrame(): Option[(Int, Int, Array[Byte])] = {
      val head = new Array[Byte](7)
      var off = 0
      while (off < 7) {
        val n = in.read(head, off, 7 - off)
        if (n < 0) return None
        off += n
      }
      val size = ((head(3) & 0xFF) << 24) | ((head(4) & 0xFF) << 16) |
        ((head(5) & 0xFF) << 8) | (head(6) & 0xFF)
      val payload = new Array[Byte](size)
      off = 0
      while (off < size) {
        val n = in.read(payload, off, size - off)
        if (n < 0) return None
        off += n
      }
      assert(in.read() === 0xCE)
      Some((head(0) & 0xFF, ((head(1) & 0xFF) << 8) | (head(2) & 0xFF), payload))
    }
    /** Asserts the next frame is method classId.methodId; returns its args. */
    def expectMethod(classId: Int, methodId: Int): Array[Byte] = {
      val (tpe, _, p) = readFrame().getOrElse(sys.error(s"EOF awaiting $classId.$methodId"))
      assert(tpe === 1, s"expected method frame, got $tpe")
      val c = ((p(0) & 0xFF) << 8) | (p(1) & 0xFF)
      val m = ((p(2) & 0xFF) << 8) | (p(3) & 0xFF)
      assert((c, m) === ((classId, methodId)), s"expected $classId.$methodId got $c.$m")
      p.drop(4)
    }

    /** Full connection negotiation; returns this client, channel 1 open. */
    def connect(): Cli = {
      raw(Array[Byte]('A', 'M', 'Q', 'P', 0, 0, 9, 1))
      expectMethod(10, 10) // Start
      raw(frame(1, 0, w16(10) ++ w16(11) ++ w32(0) ++ ss("PLAIN") ++ ls("\u0000t\u0000t") ++ ss("en_US")))
      expectMethod(10, 30) // Tune
      raw(frame(1, 0, w16(10) ++ w16(31) ++ w16(2047) ++ w32(1 << 20) ++ w16(0)))
      raw(frame(1, 0, w16(10) ++ w16(40) ++ ss("/") ++ Array[Byte](0, 0)))
      expectMethod(10, 41) // Open-Ok
      raw(frame(1, 1, w16(20) ++ w16(10) ++ ss("")))
      expectMethod(20, 11) // Channel.Open-Ok
      this
    }
    /** Expect CONNECTION refusal: Start then Close 320 after Start-Ok. */
    def connectRefused(): Int = {
      raw(Array[Byte]('A', 'M', 'Q', 'P', 0, 0, 9, 1))
      expectMethod(10, 10)
      raw(frame(1, 0, w16(10) ++ w16(11) ++ w32(0) ++ ss("PLAIN") ++ ls("\u0000t\u0000t") ++ ss("en_US")))
      val args = expectMethod(10, 50) // Connection.Close
      ((args(0) & 0xFF) << 8) | (args(1) & 0xFF) // reply-code
    }
    def declareExchange(name: String, tpe: String): Unit = {
      raw(frame(1, 1, w16(40) ++ w16(10) ++ w16(0) ++ ss(name) ++ ss(tpe) ++
        Array[Byte](0) ++ w32(0)))
      expectMethod(40, 11)
    }
    def declareQueue(name: String): Unit = {
      raw(frame(1, 1, w16(50) ++ w16(10) ++ w16(0) ++ ss(name) ++ Array[Byte](0) ++ w32(0)))
      expectMethod(50, 11)
    }
    /** AMQP field table with 'S' (long-string) values. */
    private def table(m: Map[String, String]): Array[Byte] = {
      val body = m.toSeq.sortBy(_._1).flatMap { case (k, v) =>
        ss(k).toSeq ++ Seq('S'.toByte) ++ ls(v).toSeq
      }.toArray
      w32(body.length) ++ body
    }
    def bind(queue: String, exchange: String, bkey: String,
             args: Map[String, String] = Map.empty): Unit = {
      raw(frame(1, 1, w16(50) ++ w16(20) ++ w16(0) ++ ss(queue) ++ ss(exchange) ++
        ss(bkey) ++ Array[Byte](0) ++ table(args)))
      expectMethod(50, 21)
    }
    def consume(queue: String): String = {
      raw(frame(1, 1, w16(60) ++ w16(20) ++ w16(0) ++ ss(queue) ++ ss("") ++
        Array[Byte](0) ++ w32(0)))
      val args = expectMethod(60, 21)
      new String(args, 1, args(0) & 0xFF, "UTF-8") // consumer-tag
    }
    def publish(exchange: String, rkey: String, body: String,
                bodyChunks: Int = 1,
                headers: Map[String, String] = Map.empty): Unit = {
      raw(frame(1, 1, w16(60) ++ w16(40) ++ w16(0) ++ ss(exchange) ++ ss(rkey) ++ Array[Byte](0)))
      val b = body.getBytes("UTF-8")
      val props = if (headers.isEmpty) w16(0) else w16(0x2000) ++ table(headers)
      raw(frame(2, 1, w16(60) ++ w16(0) ++ w64(b.length) ++ props))
      val per = math.max(1, b.length / bodyChunks)
      b.grouped(per).foreach(chunk => raw(frame(3, 1, chunk)))
    }
    def confirmSelect(): Unit = {
      raw(frame(1, 1, w16(85) ++ w16(10) ++ Array[Byte](0)))
      expectMethod(85, 11)
    }
    /** Reads one Basic.Deliver + header + body; returns (rkey, body). */
    def readDelivery(): (String, String) = {
      val args = expectMethod(60, 60)
      var p = 0
      val tagLen = args(p) & 0xFF; p += 1 + tagLen   // consumer-tag
      p += 8 + 1                                      // delivery-tag, redelivered
      val exLen = args(p) & 0xFF; p += 1 + exLen      // exchange
      val rkLen = args(p) & 0xFF
      val rkey = new String(args, p + 1, rkLen, "UTF-8")
      val (t2, _, _) = readFrame().getOrElse(sys.error("no content header"))
      assert(t2 === 2)
      val (t3, _, body) = readFrame().getOrElse(sys.error("no content body"))
      assert(t3 === 3)
      (rkey, new String(body, "UTF-8"))
    }
    def close(): Unit = sock.close()
  }

  private def spooled(spool: String): Seq[(String, String, String)] =
    spark.read.json(spool).select("exchange", "rkey", "payload")
      .as[(String, String, String)].collect().toSeq.sorted

  private def eventuallySpooled[T](body: => T): T = {
    var last: Throwable = null
    for (_ <- 1 to 60) {
      try return body
      catch { case scala.util.control.NonFatal(t) => last = t; Thread.sleep(250) }
    }
    throw last
  }

  test("topic bindings: RabbitMQ *.# grammar incl. mid-pattern #") {
    assert(Amqp.topicRouteMatches("a.b.c", "a.b.c"))
    assert(!Amqp.topicRouteMatches("a.b.c", "a.b"))
    assert(Amqp.topicRouteMatches("a.*.c", "a.x.c"))
    assert(!Amqp.topicRouteMatches("a.*.c", "a.x.y.c"))
    assert(Amqp.topicRouteMatches("a.#", "a"))
    assert(Amqp.topicRouteMatches("a.#", "a.x.y"))
    assert(Amqp.topicRouteMatches("#.c", "a.b.c"))     // mid/leading # (AMQP, unlike MQTT)
    assert(Amqp.topicRouteMatches("a.#.c", "a.c"))     // # matches zero levels
    assert(Amqp.topicRouteMatches("a.#.c", "a.x.y.c"))
    assert(!Amqp.topicRouteMatches("a.#.c", "a.x.y"))
    assert(Amqp.topicRouteMatches("#", "anything.at.all"))
  }

  test("negotiation + publish → spool; fragmented content bodies reassemble") {
    val spool = freshDir("pub")
    val l = Amqp.listenAmqp(0, spool, batchSize = 1)
    try {
      val c = new Cli(l.port).connect()
      c.publish("", "q.simple", "hello amqp")
      c.publish("", "q.frag", "a-longer-payload-split-across-frames", bodyChunks = 5)
      eventuallySpooled {
        assert(spooled(spool).map(r => (r._2, r._3)).sorted === Seq(
          ("q.frag", "a-longer-payload-split-across-frames"),
          ("q.simple", "hello amqp")))
      }
      c.close()
    } finally l.stop()
  }

  test("putAmqp → listenAmqp: every row lands, publisher confirms awaited") {
    val spool = freshDir("put")
    val l = Amqp.listenAmqp(0, spool, batchSize = 1)
    try {
      val rows = Seq(("orders.new", "o1"), ("orders.paid", "o2"), ("alerts.hi", "a1"))
        .toDF("rkey", "payload")
      Amqp.putAmqp(rows.repartition(2), "127.0.0.1", l.port)
      eventuallySpooled {
        assert(spooled(spool).map(r => (r._2, r._3)).sorted ===
          Seq(("alerts.hi", "a1"), ("orders.new", "o1"), ("orders.paid", "o2")))
      }
    } finally l.stop()
  }

  test("consume: default exchange routes by queue name; topic exchange routes by pattern") {
    val spool = freshDir("consume")
    val l = Amqp.listenAmqp(0, spool, batchSize = 1)
    try {
      val sub = new Cli(l.port).connect()
      sub.declareExchange("events", "topic")
      sub.declareQueue("inbox")
      sub.bind("inbox", "events", "orders.*.eu")
      sub.consume("inbox")
      val pub = new Cli(l.port).connect()
      pub.publish("events", "orders.new.eu", "match-1")   // matches *
      pub.publish("events", "orders.new.us", "no-match")  // wrong region
      pub.publish("", "inbox", "direct-to-queue")         // default exchange
      pub.publish("events", "orders.paid.eu", "match-2")
      val got = (1 to 3).map(_ => sub.readDelivery())
      assert(got === Seq(("orders.new.eu", "match-1"), ("inbox", "direct-to-queue"),
        ("orders.paid.eu", "match-2")))
      // ingress spools everything regardless of routing
      eventuallySpooled { assert(spooled(spool).size === 4) }
      pub.close(); sub.close()
    } finally l.stop()
  }

  test("headers exchange: x-match any/all binding arguments, x- keys ignored (r16)") {
    // unit gates for the published match rule first
    assert(Amqp.headersMatch(Map("x-match" -> "any", "a" -> "1", "b" -> "2"),
      Map("a" -> "1")))
    assert(!Amqp.headersMatch(Map("x-match" -> "any", "a" -> "1"), Map("a" -> "9")))
    assert(Amqp.headersMatch(Map("x-match" -> "all", "a" -> "1", "b" -> "2"),
      Map("a" -> "1", "b" -> "2", "c" -> "extra")))
    assert(!Amqp.headersMatch(Map("a" -> "1", "b" -> "2"), Map("a" -> "1"))) // default = all
    assert(Amqp.headersMatch(Map("x-match" -> "all", "x-ignored" -> "z"), Map.empty),
      "all with no non-x args matches vacuously (RabbitMQ)")
    assert(!Amqp.headersMatch(Map("x-match" -> "any", "x-ignored" -> "z"), Map.empty),
      "any with no non-x args matches nothing (RabbitMQ)")

    val spool = freshDir("headers")
    val l = Amqp.listenAmqp(0, spool, batchSize = 1)
    try {
      val subAny = new Cli(l.port).connect()
      subAny.declareExchange("hx", "headers")
      subAny.declareQueue("q.any")
      subAny.bind("q.any", "hx", "",
        Map("x-match" -> "any", "format" -> "json", "kind" -> "report"))
      subAny.consume("q.any")
      val subAll = new Cli(l.port).connect()
      subAll.declareQueue("q.all")
      subAll.bind("q.all", "hx", "",
        Map("x-match" -> "all", "format" -> "json", "kind" -> "report"))
      subAll.consume("q.all")
      val pub = new Cli(l.port).connect()
      // m1: only the any-binding matches (one pair present)
      pub.publish("hx", "ignored.rk", "m1", headers = Map("format" -> "json"))
      // m2: both match (all pairs present; the x- key must not matter)
      pub.publish("hx", "ignored.rk", "m2",
        headers = Map("format" -> "json", "kind" -> "report", "x-trace" -> "t1"))
      // m3: neither matches
      pub.publish("hx", "ignored.rk", "m3", headers = Map("other" -> "v"))
      val gotAny = (1 to 2).map(_ => subAny.readDelivery()._2)
      assert(gotAny === Seq("m1", "m2"))
      val gotAll = subAll.readDelivery()._2
      assert(gotAll === "m2")
      // ingress spool records every publish WITH its header table
      eventuallySpooled {
        val rows = spark.read.json(spool)
          .selectExpr("payload", "headers.format", "headers.kind")
          .as[(String, Option[String], Option[String])].collect().sortBy(_._1)
        assert(rows.map(_._1).toSeq === Seq("m1", "m2", "m3"))
        assert(rows(0)._2.contains("json") && rows(0)._3.isEmpty)
        assert(rows(1)._2.contains("json") && rows(1)._3.contains("report"))
      }
      pub.close(); subAny.close(); subAll.close()
    } finally l.stop()
  }

  test("publisher confirms: Confirm.Select → per-publish Basic.Ack with rising tags") {
    val spool = freshDir("confirm")
    val l = Amqp.listenAmqp(0, spool, batchSize = 1)
    try {
      val c = new Cli(l.port).connect()
      c.confirmSelect()
      (1 to 3).foreach { i =>
        c.publish("", s"q$i", s"m$i")
        val args = c.expectMethod(60, 80) // Basic.Ack
        val tag = (0 until 8).foldLeft(0L)((a, j) => (a << 8) | (args(j) & 0xFF))
        assert(tag === i.toLong, s"confirm tag $tag != $i")
      }
      c.close()
      eventuallySpooled { assert(spooled(spool).size === 3) }
    } finally l.stop()
  }

  test("bounds: oversize frame drops before allocation; bad protocol header answered with ours") {
    val spool = freshDir("bounds")
    val l = Amqp.listenAmqp(0, spool, batchSize = 1, frameMax = 1024)
    try {
      val c = new Cli(l.port).connect()
      // declare a 1 MiB frame; server must drop without reading it
      c.raw(Array[Byte](1, 0, 1, 0, 0x10, 0, 0))
      assert(c.readFrame() === None)
      c.close()
      // wrong protocol header → server answers AMQP 0-9-1 and closes (§4.2.2)
      val c2 = new Cli(l.port)
      c2.raw("HTTP/1.1 GET /".getBytes("UTF-8").take(8))
      val echo = new Array[Byte](8)
      val s = c2.sock.getInputStream
      var off = 0
      while (off < 8) { val n = s.read(echo, off, 8 - off); assert(n > 0); off += n }
      assert(echo.toSeq === Seq[Byte]('A', 'M', 'Q', 'P', 0, 0, 9, 1))
      assert(s.read() === -1)
      c2.close()
      // a fresh connection still works
      val c3 = new Cli(l.port).connect()
      c3.publish("", "ok", "fits")
      eventuallySpooled { assert(spooled(spool).map(_._3) === Seq("fits")) }
      c3.close()
    } finally l.stop()
  }

  test("consumeAmqp client: binds a queue to a topic exchange and spools matching deliveries") {
    val brokerSpool = freshDir("broker")
    val consumerSpool = freshDir("consumer")
    val l = Amqp.listenAmqp(0, brokerSpool, batchSize = 1)
    // declare the exchange first (any session may; broker state is shared)
    val admin = new Cli(l.port).connect()
    admin.declareExchange("events", "topic")
    val consumer = Amqp.consumeAmqp("127.0.0.1", l.port, queue = "edge-inbox",
      spoolDir = consumerSpool, exchange = "events", bindingKey = "orders.#",
      batchSize = 1)
    try {
      val pub = new Cli(l.port).connect()
      pub.publish("events", "orders.new.eu", "o-1")
      pub.publish("events", "billing.new", "skip")
      pub.publish("events", "orders.paid", "o-2")
      eventuallySpooled {
        val got = spark.read.json(consumerSpool)
          .select("exchange", "rkey", "payload")
          .as[(String, String, String)].collect().toSeq.sorted
        assert(got === Seq(("events", "orders.new.eu", "o-1"),
                           ("events", "orders.paid", "o-2")))
      }
      eventuallySpooled { assert(spooled(brokerSpool).size === 3) }
      pub.close(); admin.close()
    } finally { consumer.stop(); l.stop() }
  }

  test("connections past maxConnections get Connection.Close 320 before any state") {
    val spool = freshDir("cap")
    val l = Amqp.listenAmqp(0, spool, batchSize = 1, maxConnections = 1)
    try {
      val c1 = new Cli(l.port).connect()
      eventually {
        val c2 = new Cli(l.port)
        try assert(c2.connectRefused() === 320) finally c2.close()
      }
      c1.close()
      eventually {
        val c3 = new Cli(l.port).connect()
        c3.close()
      }
    } finally l.stop()
  }

  test("committed amqp_edge flow: ConsumeAMQP starts, PublishAMQP publishes into it, stream reads") {
    val spool = freshDir("flow") + "/spool"
    val json = {
      val in = getClass.getResourceAsStream("/flows/amqp_edge.json")
      require(in != null, "committed flow missing")
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val flow = FlowCompiler.parse(json)
    val listeners = FlowCompiler.startListeners(flow,
      Map("spool.dir" -> spool, "amqp.port" -> "1"))
    assert(listeners.map(_.tpe) === Seq("ConsumeAMQP"))
    try {
      val rows = Seq(("telemetry.device1", """{"v":1}"""),
                     ("telemetry.device2", """{"v":2}""")).toDF("rkey", "payload")
      val outs = FlowCompiler.compile(spark, flow, Map("events" -> rows),
        Map("spool.dir" -> spool, "amqp.port" -> listeners.head.port.toString))
      assert(outs("published").count() === 2)
      eventuallySpooled { assert(spark.read.json(spool).count() === 2) }
      val inbound = outs("inbound")
      assert(inbound.isStreaming)
      val q = Streams.toMemorySink(inbound.select("rkey", "payload"), "amqp_edge_mem")
      try q.processAllAvailable() finally q.stop()
      assert(spark.table("amqp_edge_mem").as[(String, String)].collect().toSeq.sorted ===
        Seq(("telemetry.device1", """{"v":1}"""), ("telemetry.device2", """{"v":2}""")))
    } finally listeners.foreach(_.stop())
  }
}
