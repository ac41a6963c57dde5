package graft.streaming

import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** ConsumeMQTT / PublishMQTT (NiFi's IoT edge; the reference deploys
  * NiFi 2.7, whose standard bundle ships the MQTT processors),
  * Spark-first and JDK-only — the SMTP/WS posture: the MQTT 3.1.1 wire
  * protocol (OASIS standard, public) implemented from the spec text on
  * raw sockets, no MQTT library on either side.
  *
  * Role reversal, same as ListenSMTP: NiFi's ConsumeMQTT is a CLIENT of
  * an external broker; offline there is no broker jar, so the ingress
  * here is BROKER-SIDE — [[listenMqtt]] accepts CONNECT / SUBSCRIBE /
  * PUBLISH (QoS 0–2) from any MQTT 3.1.1 client and spools each
  * received PUBLISH as one JSON line `{"client":…,"topic":…,
  * "payload":…}` (atomic tmp+rename, batched — the [[Net.listenTcp]]
  * contract), and the flow binds to the spool DIRECTORY, not the
  * socket. Live subscribers receive matching PUBLISHes back out
  * (MQTT §4.7 topic-filter wildcards `+`/`#`), so the endpoint is a
  * real minimal broker, not just a sink. Single-receiver ingress like
  * every Listen* here — front with a distributed log at scale; the
  * downstream flow never changes.
  *
  * Egress ([[putMqtt]]) publishes one message per row from executors,
  * ONE connection per PARTITION (the putTcp posture): connection count
  * scales with parallelism, not rows. QoS 1 awaits each PUBACK —
  * at-least-once end to end, which is exactly NiFi's PublishMQTT
  * guarantee.
  *
  * Protocol bounds (the ListenSMTP discipline — a hostile peer must
  * not OOM the listener):
  *   - remaining-length varint is capped at 4 bytes by the spec and at
  *     `maxPacketBytes` here; oversize drops the connection before any
  *     payload allocation;
  *   - connections past `maxConnections` get CONNACK return code 0x03
  *     ("server unavailable") and are closed before any session state;
  *   - QoS-1 re-delivery (DUP=1 with a recently-PUBACKed packet id —
  *     the client lost our PUBACK) re-acks WITHOUT spooling a
  *     duplicate, via a bounded per-session id window;
  *   - QoS 2 runs §4.3.3 method A exactly-once: a pid is "pending"
  *     from first PUBLISH to its PUBREL, retransmits in that window
  *     re-PUBREC without re-spooling, PUBREL → PUBCOMP releases it.
  */
object Mqtt {

  /** Handle for a running MQTT endpoint. */
  final class MqttListener private[Mqtt] (server: ServerSocket,
                                          stopFlag: AtomicBoolean,
                                          thread: Thread) {
    def port: Int = server.getLocalPort
    def stop(): Unit = {
      stopFlag.set(true)
      try server.close() catch { case _: Throwable => () }
      thread.join(5000)
    }
  }

  /** MQTT §4.7 topic-filter match: `/`-separated levels, `+` matches
    * exactly one level, `#` matches any remainder (including zero
    * levels; must be last). Filters starting with a wildcard do not
    * match `$`-prefixed topics (§4.7.2). */
  private[graft] def topicMatches(filter: String, topic: String): Boolean = {
    if (topic.startsWith("$") && (filter.startsWith("+") || filter.startsWith("#")))
      return false
    val f = filter.split("/", -1)
    val t = topic.split("/", -1)
    var i = 0
    while (i < f.length) {
      f(i) match {
        case "#" => return i == f.length - 1
        case "+" => if (i >= t.length) return false
        case lev => if (i >= t.length || t(i) != lev) return false
      }
      i += 1
    }
    f.length == t.length
  }

  // ------------------------------------------------------------ wire

  /** Read exactly buf.length bytes; false on EOF. */
  private def readFully(in: java.io.InputStream, buf: Array[Byte]): Boolean = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) return false
      off += n
    }
    true
  }

  /** Remaining-length varint (§2.2.3): 1–4 bytes, 7 bits each,
    * continuation bit 0x80. Returns -1 on EOF, -2 on malformed
    * (a 4th byte with the continuation bit set). */
  private def readRemainingLength(in: java.io.InputStream): Long = {
    var mult = 1L
    var value = 0L
    var i = 0
    while (i < 4) {
      val b = in.read()
      if (b < 0) return -1
      value += (b & 0x7F) * mult
      if ((b & 0x80) == 0) return value
      mult *= 128
      i += 1
    }
    -2
  }

  private def writeRemainingLength(out: java.io.OutputStream, len: Int): Unit = {
    var x = len
    do {
      var d = x % 128
      x /= 128
      if (x > 0) d |= 0x80
      out.write(d)
    } while (x > 0)
  }

  /** Len-prefixed UTF-8 string at `off`; returns (value, nextOff). */
  private def readStr(b: Array[Byte], off: Int): (String, Int) = {
    require(off + 2 <= b.length, "MQTT: truncated string length")
    val n = ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
    require(off + 2 + n <= b.length, "MQTT: truncated string")
    (new String(b, off + 2, n, UTF_8), off + 2 + n)
  }

  private def strBytes(s: String): Array[Byte] = {
    val u = s.getBytes(UTF_8)
    require(u.length < 65536, "MQTT: string too long")
    val out = new Array[Byte](u.length + 2)
    out(0) = (u.length >>> 8).toByte; out(1) = (u.length & 0xFF).toByte
    System.arraycopy(u, 0, out, 2, u.length)
    out
  }

  private def writePacket(out: java.io.OutputStream, tpeFlags: Int,
                          body: Array[Byte]): Unit = out.synchronized {
    out.write(tpeFlags)
    writeRemainingLength(out, body.length)
    out.write(body)
    out.flush()
  }

  private def publishBody(topic: String, payload: Array[Byte],
                          pid: Int): Array[Byte] = {
    val t = strBytes(topic)
    val withPid = pid > 0
    val body = new Array[Byte](t.length + (if (withPid) 2 else 0) + payload.length)
    System.arraycopy(t, 0, body, 0, t.length)
    var o = t.length
    if (withPid) { body(o) = (pid >>> 8).toByte; body(o + 1) = (pid & 0xFF).toByte; o += 2 }
    System.arraycopy(payload, 0, body, o, payload.length)
    body
  }

  // ------------------------------------------------------------ server

  /** Per-connection broker-side state for subscriber fan-out. */
  private final class Session(val out: java.io.OutputStream) {
    @volatile var filters: List[String] = Nil
  }

  /** Start an MQTT 3.1.1 endpoint on `port`; every accepted PUBLISH
    * spools as one JSON line `{"client":"<id>","topic":<t>,
    * "payload":<utf8 text>}` read with `spark.read.json` /
    * `readStream.json`. Port 0 picks a free port (`listener.port`). */
  def listenMqtt(port: Int, spoolDir: String, batchSize: Int = 100,
                 flushMs: Long = 250L, suffix: String = ".jsonl",
                 maxPacketBytes: Int = 1 << 20,
                 maxConnections: Int = 64): MqttListener = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    val server = new ServerSocket(port)
    val stop = new AtomicBoolean(false)
    val seq = new AtomicLong(0L)
    val active = new AtomicInteger(0)
    val sessions = new ConcurrentHashMap[Long, Session]()
    val sessionSeq = new AtomicLong(0L)
    val batch = new scala.collection.mutable.ArrayBuffer[String](batchSize)
    def flush(): Unit = {
      val drained = batch.synchronized {
        if (batch.isEmpty) None
        else {
          val lines = batch.toArray
          batch.clear()
          Some((lines, s"${System.currentTimeMillis()}-${seq.getAndIncrement()}$suffix"))
        }
      }
      drained.foreach { case (lines, name) =>
        val tmp = dir.resolve(name + ".tmp")
        Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(UTF_8))
        Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      }
    }

    val accept = new Thread(() => {
      server.setSoTimeout(flushMs.toInt.max(1))
      while (!stop.get()) {
        try {
          val sock = server.accept()
          val refuse = active.get() >= maxConnections
          if (!refuse) active.incrementAndGet()
          val sid = sessionSeq.getAndIncrement()
          val t = new Thread(() => {
            try runSession(sock, sid, sessions, refuse, maxPacketBytes,
              rec => {
                val doFlush = batch.synchronized { batch += rec; batch.size >= batchSize }
                if (doFlush) flush()
              })
            catch {
              case _: java.io.IOException => () // peer reset
              case _: RuntimeException => ()    // malformed packet body → drop
            }
            finally {
              sessions.remove(sid)
              try sock.close() catch { case _: Throwable => () }
              if (!refuse) active.decrementAndGet()
              flush()
            }
          }, "graft-listen-mqtt-conn")
          t.setDaemon(true)
          t.start()
        } catch {
          case _: java.net.SocketTimeoutException => flush() // idle drain
          // transient accept failure must NOT kill the accept thread (a
          // listener that looks alive but never accepts again); the
          // stop-flag check at the loop head decides actual exit
          case _: java.io.IOException => if (!stop.get()) Thread.sleep(10)
        }
      }
      flush()
    }, "graft-listen-mqtt")
    accept.setDaemon(true)
    accept.start()
    new MqttListener(server, stop, accept)
  }

  /** One broker-side session: CONNECT handshake, then the packet loop
    * until DISCONNECT, EOF, or a protocol bound trips. */
  private def runSession(sock: Socket, sid: Long,
                         sessions: ConcurrentHashMap[Long, Session],
                         refuse: Boolean, maxPacketBytes: Int,
                         emit: String => Unit): Unit = {
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)

    /** Read one packet; None on EOF/oversize/malformed (drop session). */
    def readPacket(): Option[(Int, Array[Byte])] = {
      val b0 = in.read()
      if (b0 < 0) return None
      val len = readRemainingLength(in)
      if (len < 0 || len > maxPacketBytes) return None // EOF, malformed, or bound
      val body = new Array[Byte](len.toInt)
      if (!readFully(in, body)) return None
      Some((b0, body))
    }

    // ---- CONNECT must be first (§3.1)
    val first = readPacket().getOrElse(return)
    if ((first._1 >>> 4) != 1) return // not CONNECT → drop
    if (refuse) {
      // §3.2.2.3 rc 0x03: server unavailable; close before any state
      writePacket(out, 0x20, Array[Byte](0, 3))
      return
    }
    val body = first._2
    val (proto, o1) = readStr(body, 0)
    val level = body(o1) & 0xFF
    if (proto != "MQTT" || level != 4) {
      // §3.2.2.3 rc 0x01: unacceptable protocol level
      writePacket(out, 0x20, Array[Byte](0, 1))
      return
    }
    val connectFlags = body(o1 + 1) & 0xFF
    // keepalive = body(o1+2..3) — the SoTimeout-free spool posture
    // doesn't enforce idle disconnects; bounds are on size, not time
    var o = o1 + 4
    val (clientId0, o2) = readStr(body, o); o = o2
    val clientId = if (clientId0.nonEmpty) clientId0 else s"anon-$sid"
    if ((connectFlags & 0x04) != 0) { // will flag: skip will topic + message
      val (_, a) = readStr(body, o)
      val (_, b) = readStr(body, a)
      o = b
    }
    if ((connectFlags & 0x80) != 0) { val (_, a) = readStr(body, o); o = a } // username
    if ((connectFlags & 0x40) != 0) { val (_, a) = readStr(body, o); o = a } // password
    writePacket(out, 0x20, Array[Byte](0, 0)) // CONNACK accepted

    val session = new Session(out)
    sessions.put(sid, session)

    // bounded QoS-1 re-delivery window: packet ids we already spooled
    // and PUBACKed; DUP retransmits of these re-ack without re-spooling
    val ackedIds = new java.util.LinkedHashSet[Int]()
    val AckWindow = 1024
    // QoS-2 exactly-once state: pids spooled but not yet PUBRELed
    // (bounded by the 16-bit pid space by construction)
    val pendingQos2 = new java.util.HashSet[Int]()

    var open = true
    while (open) {
      readPacket() match {
        case None => return
        case Some((b0, pkt)) =>
          val tpe = b0 >>> 4
          tpe match {
            case 3 => // PUBLISH
              val qos = (b0 >>> 1) & 0x3
              val dup = (b0 & 0x08) != 0
              if (qos > 2) return // malformed QoS bits
              val (topic, to) = readStr(pkt, 0)
              var po = to
              var pid = 0
              if (qos > 0) { pid = ((pkt(po) & 0xFF) << 8) | (pkt(po + 1) & 0xFF); po += 2 }
              val payload = java.util.Arrays.copyOfRange(pkt, po, pkt.length)
              // exactly-once gate: a QoS-2 pid stays "pending" from first
              // receipt until its PUBREL — retransmits in that window must
              // not re-spool (§4.3.3 method A); QoS-1 retransmits dedup on
              // the bounded acked-id window (DUP flag + recently acked)
              val redelivery =
                (qos == 1 && dup && ackedIds.contains(pid)) ||
                (qos == 2 && pendingQos2.contains(pid))
              if (!redelivery) {
                emit(s"""{"client":${Ws.jsonStr(clientId)},"topic":${Ws.jsonStr(topic)},""" +
                  s""""payload":${Ws.jsonStr(new String(payload, UTF_8))}}""")
                // broker fan-out to live subscribers with a matching filter
                sessions.forEach { (_, s) =>
                  if (s.filters.exists(f => topicMatches(f, topic)))
                    try writePacket(s.out, 0x30, publishBody(topic, payload, 0))
                    catch { case _: java.io.IOException => () } // dead subscriber
                }
                if (qos == 1) {
                  ackedIds.add(pid)
                  if (ackedIds.size > AckWindow) {
                    val it = ackedIds.iterator(); it.next(); it.remove()
                  }
                }
                if (qos == 2) pendingQos2.add(pid)
              }
              if (qos == 1)
                writePacket(out, 0x40, Array(((pid >>> 8) & 0xFF).toByte, (pid & 0xFF).toByte))
              if (qos == 2)
                writePacket(out, 0x50, Array(((pid >>> 8) & 0xFF).toByte, (pid & 0xFF).toByte))
            case 6 => // PUBREL (§3.6: flags must be 0b0010) → PUBCOMP
              if ((b0 & 0x0F) != 0x02) return
              val pid = ((pkt(0) & 0xFF) << 8) | (pkt(1) & 0xFF)
              pendingQos2.remove(pid)
              writePacket(out, 0x70, Array(((pid >>> 8) & 0xFF).toByte, (pid & 0xFF).toByte))
            case 8 => // SUBSCRIBE (§3.8: flags must be 0b0010)
              if ((b0 & 0x0F) != 0x02) return
              val pid = ((pkt(0) & 0xFF) << 8) | (pkt(1) & 0xFF)
              var so = 2
              val granted = scala.collection.mutable.ArrayBuffer.empty[Byte]
              val filters = scala.collection.mutable.ArrayBuffer.empty[String]
              while (so < pkt.length) {
                val (f, n) = readStr(pkt, so)
                val reqQos = pkt(n) & 0x3
                so = n + 1
                filters += f
                granted += math.min(reqQos, 1).toByte // we grant at most QoS 1
              }
              session.filters = (session.filters ++ filters).distinct
              val sub = new Array[Byte](2 + granted.length)
              sub(0) = (pid >>> 8).toByte; sub(1) = (pid & 0xFF).toByte
              granted.zipWithIndex.foreach { case (g, i) => sub(2 + i) = g }
              writePacket(out, 0x90, sub)
            case 10 => // UNSUBSCRIBE (§3.10: flags 0b0010)
              if ((b0 & 0x0F) != 0x02) return
              val pid = ((pkt(0) & 0xFF) << 8) | (pkt(1) & 0xFF)
              var uo = 2
              val gone = scala.collection.mutable.ArrayBuffer.empty[String]
              while (uo < pkt.length) {
                val (f, n) = readStr(pkt, uo); uo = n; gone += f
              }
              session.filters = session.filters.filterNot(gone.contains)
              writePacket(out, 0xB0, Array(((pid >>> 8) & 0xFF).toByte, (pid & 0xFF).toByte))
            case 12 => writePacket(out, 0xD0, Array.emptyByteArray) // PINGREQ → PINGRESP
            case 14 => open = false // DISCONNECT
            case _ => return // anything else (incl. a second CONNECT) → drop
          }
      }
    }
  }

  // ------------------------------------------------------------ client

  /** Handle for a running MQTT consumer client. */
  final class MqttConsumer private[Mqtt] (sock: Socket, thread: Thread) {
    def stop(): Unit = {
      try sock.close() catch { case _: Throwable => () } // unblocks the reader
      thread.join(5000)
    }
  }

  /** ConsumeMQTT in its NATIVE direction — a CLIENT of an external
    * broker (what NiFi's processor actually is): CONNECT, SUBSCRIBE to
    * `topicFilters` at QoS ≤ 1, then spool every delivered PUBLISH as
    * the same `{"client":…,"topic":…,"payload":…}` JSON lines
    * [[listenMqtt]] spools (client = this consumer's id), so the
    * downstream flow is IDENTICAL whichever side of the socket the
    * broker is on. QoS-1 deliveries are PUBACKed after the spool
    * append — at-least-once, NiFi's guarantee. The spec drives it
    * against this file's own broker (a live wire peer); against an
    * external broker only host/port change. */
  def consumeMqtt(host: String, port: Int, topicFilters: Seq[String],
                  spoolDir: String, clientId: String = "graft-consume",
                  batchSize: Int = 100, flushMs: Long = 250L,
                  suffix: String = ".jsonl",
                  maxPacketBytes: Int = 1 << 20,
                  connectTimeoutMs: Int = 5000): MqttConsumer = {
    require(topicFilters.nonEmpty, "consumeMqtt: no topic filters")
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port), connectTimeoutMs)
    sock.setSoTimeout(flushMs.toInt.max(1))
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    val seq = new AtomicLong(0L)
    val batch = new scala.collection.mutable.ArrayBuffer[String](batchSize)
    def flush(): Unit = {
      val drained = batch.synchronized {
        if (batch.isEmpty) None
        else {
          val lines = batch.toArray
          batch.clear()
          Some((lines, s"${System.currentTimeMillis()}-${seq.getAndIncrement()}$suffix"))
        }
      }
      drained.foreach { case (lines, name) =>
        val tmp = dir.resolve(name + ".tmp")
        Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(UTF_8))
        Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      }
    }
    // CONNECT → CONNACK (rc 0), SUBSCRIBE → SUBACK, synchronously —
    // callers get a live subscription or an exception, never a silent
    // half-connected consumer
    writePacket(out, 0x10, strBytes("MQTT") ++ Array[Byte](4, 0x02, 0, 60) ++ strBytes(clientId))
    val h0 = in.read(); val rl = readRemainingLength(in)
    require(h0 == 0x20 && rl == 2, s"consumeMqtt: bad CONNACK header $h0/$rl")
    val ack = new Array[Byte](2)
    require(readFully(in, ack) && ack(1) == 0, s"consumeMqtt: CONNECT refused rc=${ack(1)}")
    val subBody = Array[Byte](0, 1) ++
      topicFilters.flatMap(f => strBytes(f) ++ Array[Byte](1)).toArray
    writePacket(out, 0x82, subBody)
    val s0 = in.read(); val sl = readRemainingLength(in)
    require(s0 == 0x90 && sl >= 2, s"consumeMqtt: bad SUBACK header $s0/$sl")
    val sb = new Array[Byte](sl.toInt)
    require(readFully(in, sb) && sb.drop(2).forall(g => (g & 0xFF) <= 2),
      "consumeMqtt: subscription rejected")

    val reader = new Thread(() => {
      try {
        var open = true
        while (open) {
          val b0 =
            try in.read()
            catch { case _: java.net.SocketTimeoutException => flush(); -2 }
          if (b0 == -1) open = false
          else if (b0 >= 0) {
            // the rest of the packet is in flight: switch from the
            // idle-flush timeout to a generous read timeout so a
            // mid-packet tick can't kill the consumer
            sock.setSoTimeout(30000)
            val len = readRemainingLength(in)
            if (len < 0 || len > maxPacketBytes) open = false
            else {
              val body = new Array[Byte](len.toInt)
              if (!readFully(in, body)) open = false
              else (b0 >>> 4) match {
                case 3 => // delivered PUBLISH
                  val qos = (b0 >>> 1) & 0x3
                  val (topic, to) = readStr(body, 0)
                  var po = to
                  var pid = 0
                  if (qos > 0) { pid = ((body(po) & 0xFF) << 8) | (body(po + 1) & 0xFF); po += 2 }
                  val payload = new String(body, po, body.length - po, UTF_8)
                  val doFlush = batch.synchronized {
                    batch += s"""{"client":${Ws.jsonStr(clientId)},"topic":${Ws.jsonStr(topic)},""" +
                      s""""payload":${Ws.jsonStr(payload)}}"""
                    batch.size >= batchSize
                  }
                  if (doFlush) flush()
                  // ack AFTER the record is at least buffered (at-least-once)
                  if (qos == 1)
                    writePacket(out, 0x40, Array(((pid >>> 8) & 0xFF).toByte, (pid & 0xFF).toByte))
                case 13 => () // PINGRESP
                case _ => ()  // ignore other server packets
              }
              sock.setSoTimeout(flushMs.toInt.max(1))
            }
          }
        }
      } catch { case _: java.io.IOException => () } // closed by stop()
      finally flush()
    }, "graft-consume-mqtt")
    reader.setDaemon(true)
    reader.start()
    new MqttConsumer(sock, reader)
  }

  /** PublishMQTT: publish one message per row, ONE client connection
    * per PARTITION opened on the executor. `topicCol` may be a column
    * name or, when absent from the frame, every row publishes to the
    * literal `topic`. QoS 1 awaits each PUBACK (at-least-once); QoS 2
    * runs the full PUBREC/PUBREL/PUBCOMP handshake (exactly-once to
    * the broker); QoS 0 is fire-and-forget. */
  def putMqtt(df: DataFrame, host: String, port: Int,
              payloadCol: String = "payload", topicCol: String = "topic",
              topic: String = "", qos: Int = 1,
              connectTimeoutMs: Int = 5000): Unit = {
    require(qos >= 0 && qos <= 2, s"putMqtt supports QoS 0/1/2, got $qos")
    val withTopic =
      if (df.columns.contains(topicCol)) df.select(col(topicCol).cast("string"), col(payloadCol).cast("string"))
      else {
        require(topic.nonEmpty, s"putMqtt: no '$topicCol' column and no literal topic")
        df.select(lit(topic), col(payloadCol).cast("string"))
      }
    withTopic.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val sock = new Socket()
        try {
          sock.connect(new InetSocketAddress(host, port), connectTimeoutMs)
          sock.setSoTimeout(30000)
          val in = new java.io.BufferedInputStream(sock.getInputStream)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          val cid = strBytes(s"graft-put-${java.util.UUID.randomUUID().toString.take(8)}")
          val vh = strBytes("MQTT") ++ Array[Byte](4, 0x02, 0, 60) // level 4, clean session
          writePacket(out, 0x10, vh ++ cid)
          // CONNACK
          val h0 = in.read(); val rl = readRemainingLength(in)
          require(h0 == 0x20 && rl == 2, s"putMqtt: bad CONNACK header $h0/$rl")
          val ack = new Array[Byte](2)
          require(readFully(in, ack) && ack(1) == 0, s"putMqtt: CONNECT refused rc=${ack(1)}")
          var pid = 0
          rows.foreach { r =>
            val t = r.getString(0); val m = r.getString(1)
            require(t != null && m != null, "putMqtt: null topic/payload")
            if (qos == 0) writePacket(out, 0x30, publishBody(t, m.getBytes(UTF_8), 0))
            else {
              pid = (pid % 65535) + 1
              // server sends nothing unsolicited here (no SUBSCRIBE), so
              // each ack is the next packet on the wire
              def awaitAck(wantType: Int, what: String): Unit = {
                val a0 = in.read(); val al = readRemainingLength(in)
                require(a0 == wantType && al == 2, s"putMqtt: bad $what header $a0/$al")
                val ab = new Array[Byte](2)
                require(readFully(in, ab), s"putMqtt: EOF in $what")
                val gotPid = ((ab(0) & 0xFF) << 8) | (ab(1) & 0xFF)
                require(gotPid == pid, s"putMqtt: $what id $gotPid != $pid")
              }
              writePacket(out, 0x30 | (qos << 1), publishBody(t, m.getBytes(UTF_8), pid))
              if (qos == 1) awaitAck(0x40, "PUBACK")
              else { // QoS 2: PUBREC → PUBREL → PUBCOMP
                awaitAck(0x50, "PUBREC")
                writePacket(out, 0x62, Array(((pid >>> 8) & 0xFF).toByte, (pid & 0xFF).toByte))
                awaitAck(0x70, "PUBCOMP")
              }
            }
          }
          writePacket(out, 0xE0, Array.emptyByteArray) // DISCONNECT
        } finally sock.close()
      }
    }
  }
}
