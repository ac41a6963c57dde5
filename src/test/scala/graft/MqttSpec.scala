package graft

import org.apache.spark.sql.functions._
import graft.streaming.{Mqtt, Streams}

/** Live-wire gates for the MQTT 3.1.1 edge (ConsumeMQTT broker-side
  * ingress / PublishMQTT egress): a hand-rolled spec client drives the
  * hand-rolled server over a real socket — CONNECT/CONNACK, QoS 0–1
  * PUBLISH with PUBACK, DUP re-delivery dedup, SUBSCRIBE fan-out with
  * §4.7 wildcards, fragmented frame reads, and the resource bounds.
  * Same posture as WsSpec/EmailSpec. */
class MqttSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mqtt_$tag").toString

  /** Minimal raw-socket MQTT 3.1.1 client for driving the listener. */
  private final class Cli(port: Int) {
    val sock = new java.net.Socket("127.0.0.1", port)
    sock.setSoTimeout(5000)
    private val in = new java.io.BufferedInputStream(sock.getInputStream)
    private val out = sock.getOutputStream
    def raw(bytes: Array[Byte]): Unit = { out.write(bytes); out.flush() }
    private def rl(len: Int): Array[Byte] = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var x = len
      do { var d = x % 128; x /= 128; if (x > 0) d |= 0x80; b += d.toByte } while (x > 0)
      b.toArray
    }
    def packet(tpeFlags: Int, body: Array[Byte]): Array[Byte] =
      Array(tpeFlags.toByte) ++ rl(body.length) ++ body
    def str(s: String): Array[Byte] = {
      val u = s.getBytes("UTF-8")
      Array[Byte]((u.length >>> 8).toByte, (u.length & 0xFF).toByte) ++ u
    }
    /** Returns (type<<4|flags, body); None on EOF/close. */
    def readPacket(): Option[(Int, Array[Byte])] = {
      val b0 = in.read()
      if (b0 < 0) return None
      var mult = 1; var len = 0; var cont = true
      while (cont) {
        val b = in.read()
        if (b < 0) return None
        len += (b & 0x7F) * mult; mult *= 128; cont = (b & 0x80) != 0
      }
      val body = new Array[Byte](len)
      var off = 0
      while (off < len) {
        val n = in.read(body, off, len - off)
        if (n < 0) return None
        off += n
      }
      Some((b0, body))
    }
    /** CONNECT → CONNACK return code. */
    def connect(cid: String = "spec-cli"): Int = {
      raw(packet(0x10, str("MQTT") ++ Array[Byte](4, 2, 0, 60) ++ str(cid)))
      val (t, b) = readPacket().getOrElse(sys.error("no CONNACK"))
      assert(t === 0x20 && b.length === 2)
      b(1) & 0xFF
    }
    def publish(topic: String, payload: String, qos: Int = 0, pid: Int = 0,
                dup: Boolean = false): Unit = {
      val flags = 0x30 | (qos << 1) | (if (dup) 0x08 else 0)
      val pidB = if (qos > 0) Array[Byte]((pid >>> 8).toByte, (pid & 0xFF).toByte)
                 else Array.emptyByteArray
      raw(packet(flags, str(topic) ++ pidB ++ payload.getBytes("UTF-8")))
    }
    def awaitPuback(pid: Int): Unit = {
      val (t, b) = readPacket().getOrElse(sys.error("no PUBACK"))
      assert(t === 0x40 && (((b(0) & 0xFF) << 8) | (b(1) & 0xFF)) === pid)
    }
    def subscribe(pid: Int, filters: String*): Seq[Int] = {
      val body = Array[Byte]((pid >>> 8).toByte, (pid & 0xFF).toByte) ++
        filters.flatMap(f => str(f) ++ Array[Byte](1)).toArray
      raw(packet(0x82, body))
      val (t, b) = readPacket().getOrElse(sys.error("no SUBACK"))
      assert(t === 0x90 && (((b(0) & 0xFF) << 8) | (b(1) & 0xFF)) === pid)
      b.drop(2).map(_.toInt).toSeq
    }
    def disconnect(): Unit = { raw(packet(0xE0, Array.emptyByteArray)); sock.close() }
    def close(): Unit = sock.close()
  }

  private def spooled(spool: String): Seq[(String, String, String)] =
    spark.read.json(spool).select("client", "topic", "payload")
      .as[(String, String, String)].collect().toSeq.sorted

  /** Spool asserts get a wider window than the shared `eventually`,
    * and retry on ANY non-fatal error: before the first spool file
    * lands (the listener's flush is asynchronous), spark.read.json on
    * the empty directory throws UNABLE_TO_INFER_SCHEMA rather than
    * failing an assertion — under full-suite load that window is
    * routinely hit. */
  private def eventuallySpooled[T](body: => T): T = {
    var last: Throwable = null
    for (_ <- 1 to 60) {
      try return body
      catch { case scala.util.control.NonFatal(t) => last = t; Thread.sleep(250) }
    }
    throw last
  }

  test("topic filters: §4.7 wildcard semantics") {
    assert(Mqtt.topicMatches("a/b/c", "a/b/c"))
    assert(!Mqtt.topicMatches("a/b/c", "a/b"))
    assert(Mqtt.topicMatches("a/+/c", "a/x/c"))
    assert(!Mqtt.topicMatches("a/+/c", "a/x/y/c"))
    assert(Mqtt.topicMatches("a/#", "a/x/y"))
    assert(Mqtt.topicMatches("a/#", "a")) // '#' matches zero levels
    assert(Mqtt.topicMatches("#", "a/b"))
    assert(!Mqtt.topicMatches("#", "$SYS/health")) // §4.7.2
    assert(!Mqtt.topicMatches("+/health", "$SYS/health"))
    assert(Mqtt.topicMatches("+/+", "a/b"))
    assert(!Mqtt.topicMatches("+", "a/b"))
  }

  test("putMqtt QoS 1 → listenMqtt: every row lands in the spool, PUBACK-awaited") {
    val spool = freshDir("put")
    val l = Mqtt.listenMqtt(0, spool, batchSize = 1)
    try {
      val rows = Seq(("sensors/a/temp", "21.5"), ("sensors/b/temp", "19.0"),
                     ("logs/app", "started")).toDF("topic", "payload")
      Mqtt.putMqtt(rows.repartition(2), "127.0.0.1", l.port, qos = 1)
      eventuallySpooled {
        assert(spooled(spool).map(r => (r._2, r._3)).sorted ===
          Seq(("logs/app", "started"), ("sensors/a/temp", "21.5"),
              ("sensors/b/temp", "19.0")))
      }
    } finally l.stop()
  }

  test("hand client: fragmented packet bytes parse; QoS 0 spools without ack") {
    val spool = freshDir("frag")
    val l = Mqtt.listenMqtt(0, spool, batchSize = 1)
    try {
      val c = new Cli(l.port)
      assert(c.connect("fraggy") === 0)
      // dribble a QoS-0 PUBLISH one byte at a time — TCP framing must
      // not be assumed to align with packet boundaries
      val pkt = c.packet(0x30, c.str("t/frag") ++ "chunked!".getBytes("UTF-8"))
      pkt.foreach { b => c.raw(Array(b)); Thread.sleep(1) }
      eventuallySpooled {
        assert(spooled(spool) === Seq(("fraggy", "t/frag", "chunked!")))
      }
      c.disconnect()
    } finally l.stop()
  }

  test("QoS-1 DUP re-delivery re-acks without spooling a duplicate") {
    val spool = freshDir("dup")
    val l = Mqtt.listenMqtt(0, spool, batchSize = 1)
    try {
      val c = new Cli(l.port)
      assert(c.connect("dupper") === 0)
      c.publish("q1/t", "only-once", qos = 1, pid = 7)
      c.awaitPuback(7)
      // our PUBACK "got lost": client retransmits with DUP=1
      c.publish("q1/t", "only-once", qos = 1, pid = 7, dup = true)
      c.awaitPuback(7) // still acked
      // a FRESH pid reusing the number without DUP is a new message
      c.publish("q1/t", "second", qos = 1, pid = 8)
      c.awaitPuback(8)
      c.disconnect()
      eventuallySpooled {
        assert(spooled(spool).map(_._3).sorted === Seq("only-once", "second"))
      }
    } finally l.stop()
  }

  test("oversize remaining-length drops the connection before allocation; next connection works") {
    val spool = freshDir("big")
    val l = Mqtt.listenMqtt(0, spool, batchSize = 1, maxPacketBytes = 1024)
    try {
      val c = new Cli(l.port)
      assert(c.connect("big") === 0)
      // declare a 1 MiB publish; server must drop without reading it
      c.raw(Array(0x30.toByte, 0xC0.toByte, 0x84.toByte, 0x40.toByte))
      assert(c.readPacket() === None) // connection closed on us
      c.close()
      val c2 = new Cli(l.port)
      assert(c2.connect("after") === 0)
      c2.publish("ok/t", "fits")
      c2.disconnect()
      eventuallySpooled { assert(spooled(spool).map(_._3) === Seq("fits")) }
    } finally l.stop()
  }

  test("QoS 2 is exactly-once: retransmits while pending re-PUBREC without re-spooling") {
    val spool = freshDir("qos2")
    val l = Mqtt.listenMqtt(0, spool, batchSize = 1)
    try {
      val c = new Cli(l.port)
      assert(c.connect("q2") === 0)
      def awaitAck(wantType: Int, pid: Int): Unit = {
        val (t, b) = c.readPacket().getOrElse(sys.error("no ack"))
        assert(t === wantType && (((b(0) & 0xFF) << 8) | (b(1) & 0xFF)) === pid)
      }
      c.publish("q2/t", "exactly-once", qos = 2, pid = 3)
      awaitAck(0x50, 3) // PUBREC
      // our PUBREC "got lost": retransmit while pending → PUBREC again,
      // no second spool record
      c.publish("q2/t", "exactly-once", qos = 2, pid = 3, dup = true)
      awaitAck(0x50, 3)
      // release: PUBREL → PUBCOMP
      c.raw(c.packet(0x62, Array[Byte](0, 3)))
      awaitAck(0x70, 3) // PUBCOMP
      // after release the pid is free again: a NEW message may reuse it
      c.publish("q2/t", "second", qos = 2, pid = 3)
      awaitAck(0x50, 3)
      c.raw(c.packet(0x62, Array[Byte](0, 3)))
      awaitAck(0x70, 3)
      c.disconnect()
      eventuallySpooled {
        assert(spooled(spool).map(_._3).sorted === Seq("exactly-once", "second"))
      }
    } finally l.stop()
  }

  test("putMqtt QoS 2 runs the full PUBREC/PUBREL/PUBCOMP handshake per row") {
    val spool = freshDir("putq2")
    val l = Mqtt.listenMqtt(0, spool, batchSize = 1)
    try {
      val rows = Seq(("exact/a", "m1"), ("exact/b", "m2")).toDF("topic", "payload")
      Mqtt.putMqtt(rows, "127.0.0.1", l.port, qos = 2)
      eventuallySpooled {
        assert(spooled(spool).map(r => (r._2, r._3)).sorted ===
          Seq(("exact/a", "m1"), ("exact/b", "m2")))
      }
    } finally l.stop()
  }

  test("SUBSCRIBE fan-out: wildcard filters receive matching publishes only") {
    val spool = freshDir("sub")
    val l = Mqtt.listenMqtt(0, spool, batchSize = 1)
    try {
      val sub = new Cli(l.port)
      assert(sub.connect("subscriber") === 0)
      assert(sub.subscribe(11, "sensors/+/temp", "logs/#") === Seq(1, 1))
      val pub = new Cli(l.port)
      assert(pub.connect("publisher") === 0)
      pub.publish("sensors/a/temp", "21.5")      // matches +
      pub.publish("sensors/a/b/temp", "nope")    // too deep for +
      pub.publish("logs/x/y", "deep log")        // matches #
      pub.publish("other/z", "unrelated")        // no filter
      // subscriber sees exactly the two matches, in order, as QoS-0 PUBLISH
      val got = (1 to 2).map { _ =>
        val (t, b) = sub.readPacket().getOrElse(sys.error("no fan-out"))
        assert((t >>> 4) === 3)
        val tl = ((b(0) & 0xFF) << 8) | (b(1) & 0xFF)
        (new String(b, 2, tl, "UTF-8"), new String(b, 2 + tl, b.length - 2 - tl, "UTF-8"))
      }
      assert(got === Seq(("sensors/a/temp", "21.5"), ("logs/x/y", "deep log")))
      pub.disconnect(); sub.disconnect()
      eventuallySpooled { assert(spooled(spool).size === 4) } // ingress spools all
    } finally l.stop()
  }

  test("consumeMqtt client: subscribes to a broker and spools matching deliveries") {
    val brokerSpool = freshDir("broker")
    val consumerSpool = freshDir("consumer")
    val l = Mqtt.listenMqtt(0, brokerSpool, batchSize = 1)
    val consumer = Mqtt.consumeMqtt("127.0.0.1", l.port,
      Seq("sensors/+/temp"), consumerSpool, clientId = "edge-reader", batchSize = 1)
    try {
      val rows = Seq(("sensors/a/temp", "21.5"), ("other/topic", "skip"),
                     ("sensors/b/temp", "19.0")).toDF("topic", "payload")
      Mqtt.putMqtt(rows, "127.0.0.1", l.port, qos = 1)
      // the client's spool carries ONLY the filter matches, same JSON shape
      eventuallySpooled {
        val got = spark.read.json(consumerSpool)
          .select("client", "topic", "payload")
          .as[(String, String, String)].collect().toSeq.sorted
        assert(got === Seq(("edge-reader", "sensors/a/temp", "21.5"),
                           ("edge-reader", "sensors/b/temp", "19.0")))
      }
      // the broker side still spooled everything
      eventuallySpooled { assert(spooled(brokerSpool).size === 3) }
    } finally { consumer.stop(); l.stop() }
  }

  test("flow client mode: ConsumeMQTT with a Broker URI subscribes to an external broker") {
    val brokerSpool = freshDir("extbroker")
    val flowSpool = freshDir("flowclient") + "/spool"
    val broker = Mqtt.listenMqtt(0, brokerSpool, batchSize = 1)
    val flow = FlowCompiler.parse(
      s"""{"flowContents": {"name": "mqttclient",
         |  "processors": [
         |    {"identifier": "cm", "name": "reader", "type": "ConsumeMQTT",
         |     "properties": {"Broker URI": "tcp://127.0.0.1:#{broker.port}",
         |                    "Topic Filter": "metrics/#",
         |                    "Spool Directory": "$flowSpool"}}],
         |  "outputPorts": [{"identifier": "o", "name": "inbound"}],
         |  "connections": [{"source": {"id": "cm"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val listeners = FlowCompiler.startListeners(flow,
      Map("broker.port" -> broker.port.toString))
    assert(listeners.map(_.tpe) === Seq("ConsumeMQTT"))
    try {
      Mqtt.putMqtt(Seq(("metrics/cpu", "0.93"), ("logs/app", "skip"))
        .toDF("topic", "payload"), "127.0.0.1", broker.port, qos = 1)
      eventuallySpooled {
        val got = spark.read.json(flowSpool).select("topic", "payload")
          .as[(String, String)].collect().toSeq
        assert(got === Seq(("metrics/cpu", "0.93")))
      }
    } finally { listeners.foreach(_.stop()); broker.stop() }
  }

  test("connections past maxConnections get CONNACK rc 3 before any state") {
    val spool = freshDir("conncap")
    val l = Mqtt.listenMqtt(0, spool, batchSize = 1, maxConnections = 1)
    try {
      val c1 = new Cli(l.port)
      assert(c1.connect("first") === 0)
      eventually {
        val c2 = new Cli(l.port)
        try assert(c2.connect("second") === 3) finally c2.close()
      }
      c1.disconnect()
      // capacity frees up once the first session ends
      eventually {
        val c3 = new Cli(l.port)
        try assert(c3.connect("third") === 0) finally c3.disconnect()
      }
    } finally l.stop()
  }

  test("committed mqtt_edge flow: ConsumeMQTT starts, PublishMQTT publishes into it, stream reads") {
    val spool = freshDir("flow") + "/spool"
    val json = {
      val in = getClass.getResourceAsStream("/flows/mqtt_edge.json")
      require(in != null, "committed flow missing")
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val flow = FlowCompiler.parse(json)
    val listeners = FlowCompiler.startListeners(flow,
      Map("spool.dir" -> spool, "mqtt.port" -> "1"))
    assert(listeners.map(_.tpe) === Seq("ConsumeMQTT"))
    try {
      val rows = Seq(("devices/d1/state", """{"on":true}"""),
                     ("devices/d2/state", """{"on":false}""")).toDF("topic", "payload")
      val outs = FlowCompiler.compile(spark, flow, Map("events" -> rows),
        Map("spool.dir" -> spool, "mqtt.port" -> listeners.head.port.toString))
      assert(outs("published").count() === 2)
      eventuallySpooled { assert(spark.read.json(spool).count() === 2) }
      val inbound = outs("inbound")
      assert(inbound.isStreaming)
      val q = Streams.toMemorySink(inbound.select("topic", "payload"), "mqtt_edge_mem")
      try q.processAllAvailable() finally q.stop()
      assert(spark.table("mqtt_edge_mem").as[(String, String)].collect().toSeq.sorted ===
        Seq(("devices/d1/state", """{"on":true}"""),
            ("devices/d2/state", """{"on":false}""")))
    } finally listeners.foreach(_.stop())
  }
}
