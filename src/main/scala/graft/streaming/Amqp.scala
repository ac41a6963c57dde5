package graft.streaming

import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** ConsumeAMQP / PublishAMQP (NiFi's RabbitMQ edge; nifi-amqp-nar
  * ships in the NiFi 2.7 standard bundle the reference deploys),
  * Spark-first and JDK-only — the MQTT/SMTP posture: the AMQP 0-9-1
  * wire protocol (public OASIS/RabbitMQ spec) implemented from the
  * spec text on raw sockets, no client library on either side.
  *
  * Role reversal, same as ConsumeMQTT: NiFi's ConsumeAMQP is a CLIENT
  * of an external broker; offline there is none, so the ingress here
  * is BROKER-SIDE — [[listenAmqp]] speaks the 0-9-1 connection
  * negotiation (protocol header → Start/Start-Ok → Tune/Tune-Ok →
  * Open/Open-Ok), channel open, exchange/queue declare + bind,
  * Basic.Publish with content header + (possibly fragmented) body
  * frames, Basic.Consume with live Basic.Deliver fan-out, and
  * publisher confirms (Confirm.Select → per-publish Basic.Ack — the
  * delivery guarantee NiFi's PublishAMQP rides). Every accepted
  * publish spools one JSON line `{"exchange":…,"rkey":…,"payload":…}`
  * (atomic tmp+rename, batched — the [[Net.listenTcp]] contract); the
  * flow binds to the spool DIRECTORY.
  *
  * Routing model (documented subset): the default exchange `""`
  * routes by queue name (0-9-1 mandatory behavior); declared
  * exchanges route direct (binding key = routing key), topic
  * (`.`-separated levels, `*` = one level, `#` = zero or more — the
  * RabbitMQ grammar, implemented in [[topicRouteMatches]]), fanout
  * (bind with `#`), or headers (r16: binding-argument table matched
  * against the message's header table under `x-match` any/all —
  * [[headersMatch]]; matching happens AT the broker, and delivered
  * frames carry no properties — the spool line records the headers).
  *
  * Protocol bounds (the ListenSMTP discipline): frames above
  * `frameMax` drop the connection before any payload allocation; a
  * wrong protocol header answers with the server's supported version
  * (the spec's §4.2.2 rule) and closes; connections past
  * `maxConnections` complete Start/Start-Ok and then get
  * Connection.Close reply-code 320 ("connection-forced") before any
  * session state.
  *
  * Egress ([[putAmqp]]) publishes one message per row from executors,
  * ONE connection per PARTITION, with publisher confirms awaited per
  * message — at-least-once, NiFi PublishAMQP's posture. */
object Amqp {

  /** Handle for a running AMQP endpoint. */
  final class AmqpListener private[Amqp] (server: ServerSocket,
                                          stopFlag: AtomicBoolean,
                                          thread: Thread) {
    def port: Int = server.getLocalPort
    def stop(): Unit = {
      stopFlag.set(true)
      try server.close() catch { case _: Throwable => () }
      thread.join(5000)
    }
  }

  /** Headers-exchange match (AMQP 0-9-1 §3.1.3 + the RabbitMQ
    * contract): binding arguments name the required header pairs;
    * `x-match` = `all` (default — every named pair present and equal)
    * or `any` (at least one); keys starting with `x-` never
    * participate in matching. Edge semantics follow RabbitMQ: an
    * empty argument set matches everything under `all` (vacuous) and
    * nothing under `any`. */
  private[graft] def headersMatch(bindArgs: Map[String, String],
                                  headers: Map[String, String]): Boolean = {
    val rel = bindArgs.filterNot(_._1.startsWith("x-"))
    if (bindArgs.getOrElse("x-match", "all") == "any")
      rel.exists { case (k, v) => headers.get(k).contains(v) }
    else
      rel.forall { case (k, v) => headers.get(k).contains(v) }
  }

  /** RabbitMQ topic-exchange match: `.`-separated levels, `*` matches
    * exactly one level, `#` matches zero or more (anywhere in the
    * binding, per the AMQP grammar — unlike MQTT's last-level-only
    * `#`). */
  private[graft] def topicRouteMatches(binding: String, rkey: String): Boolean = {
    val b = binding.split("\\.", -1)
    val r = rkey.split("\\.", -1)
    // dp over (binding idx, rkey idx); small arrays — iterative
    val memo = Array.fill(b.length + 1, r.length + 1)(false)
    memo(b.length)(r.length) = true
    var i = b.length - 1
    while (i >= 0) {
      var j = r.length
      while (j >= 0) {
        memo(i)(j) = b(i) match {
          case "#" => memo(i + 1)(j) || (j < r.length && memo(i)(j + 1))
          case "*" => j < r.length && memo(i + 1)(j + 1)
          case lev => j < r.length && r(j) == lev && memo(i + 1)(j + 1)
        }
        j -= 1
      }
      i -= 1
    }
    memo(0)(0)
  }

  // ------------------------------------------------------------ wire

  private def readFully(in: java.io.InputStream, buf: Array[Byte]): Boolean = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) return false
      off += n
    }
    true
  }

  /** One frame: (type, channel, payload); None on EOF/oversize/bad end. */
  private def readFrame(in: java.io.InputStream, frameMax: Int): Option[(Int, Int, Array[Byte])] = {
    val head = new Array[Byte](7)
    if (!readFully(in, head)) return None
    val tpe = head(0) & 0xFF
    val ch = ((head(1) & 0xFF) << 8) | (head(2) & 0xFF)
    val size = ((head(3) & 0xFF).toLong << 24) | ((head(4) & 0xFF) << 16) |
      ((head(5) & 0xFF) << 8) | (head(6) & 0xFF)
    if (size < 0 || size > frameMax) return None // bound BEFORE allocation
    val payload = new Array[Byte](size.toInt)
    if (!readFully(in, payload)) return None
    val end = in.read()
    if (end != 0xCE) return None // frame-end octet (§4.2.3)
    Some((tpe, ch, payload))
  }

  private def writeFrame(out: java.io.OutputStream, tpe: Int, ch: Int,
                         payload: Array[Byte]): Unit = out.synchronized {
    out.write(tpe)
    out.write(ch >>> 8); out.write(ch & 0xFF)
    val n = payload.length
    out.write(n >>> 24); out.write((n >>> 16) & 0xFF); out.write((n >>> 8) & 0xFF); out.write(n & 0xFF)
    out.write(payload)
    out.write(0xCE)
    out.flush()
  }

  /** Little composable binary writers (big-endian, per spec). */
  private final class W {
    val b = new java.io.ByteArrayOutputStream()
    def u8(v: Int): W = { b.write(v & 0xFF); this }
    def u16(v: Int): W = { b.write((v >>> 8) & 0xFF); b.write(v & 0xFF); this }
    def u32(v: Long): W = { u16(((v >>> 16) & 0xFFFF).toInt); u16((v & 0xFFFF).toInt); this }
    def u64(v: Long): W = { u32(v >>> 32); u32(v & 0xFFFFFFFFL); this }
    def shortStr(s: String): W = {
      val u = s.getBytes(UTF_8); require(u.length < 256, "short string too long")
      u8(u.length); b.write(u); this
    }
    def longStr(s: String): W = { val u = s.getBytes(UTF_8); u32(u.length); b.write(u); this }
    def bytes(x: Array[Byte]): W = { b.write(x); this }
    /** AMQP field table, all values as long-strings ('S') — the form
      * every client emits for string headers; sorted for determinism. */
    def table(m: Map[String, String]): W = {
      val t = new W()
      m.toSeq.sortBy(_._1).foreach { case (k, v) =>
        t.shortStr(k); t.u8('S'); t.longStr(v)
      }
      val u = t.arr
      u32(u.length); b.write(u); this
    }
    def arr: Array[Byte] = b.toByteArray
  }
  private def method(classId: Int, methodId: Int)(body: W => W): Array[Byte] =
    body(new W().u16(classId).u16(methodId)).arr

  /** Cursor-based reader over a method payload. */
  private final class R(val a: Array[Byte]) {
    var p = 0
    def u8(): Int = { val v = a(p) & 0xFF; p += 1; v }
    def u16(): Int = { val v = ((a(p) & 0xFF) << 8) | (a(p + 1) & 0xFF); p += 2; v }
    def u32(): Long = { (u16().toLong << 16) | u16() }
    def u64(): Long = { (u32() << 32) | u32() }
    def shortStr(): String = { val n = u8(); val s = new String(a, p, n, UTF_8); p += n; s }
    def longStrSkip(): Unit = { val n = u32(); p += n.toInt } // field tables etc.
    /** AMQP field table → string-rendered map (the documented matching
      * subset: S strings, t bool, s/I/i/l/L/T integers (s = RabbitMQ's
      * signed short), f/d floats, b/B octets, V null; nested tables/
      * arrays/decimals are skipped opaquely, unknown value types abort
      * the remainder — the table slice is length-prefixed, so a
      * conservative skip never desyncs the frame). */
    def table(): Map[String, String] = {
      val len = u32().toInt
      val end = p + len
      val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
      while (p < end) {
        val k = shortStr()
        (u8().toChar: @scala.annotation.switch) match {
          case 'S' => val n = u32().toInt; m(k) = new String(a, p, n, UTF_8); p += n
          // RabbitMQ's field-table errata: 's' is a SIGNED 16-bit int
          // (the 0-9-1 grammar's short-string reading would desync the
          // table against every real RabbitMQ client)
          case 's' => m(k) = u16().toShort.toString
          case 't' => m(k) = if (u8() != 0) "true" else "false"
          case 'I' | 'i' => m(k) = u32().toInt.toString
          case 'l' | 'L' | 'T' => m(k) = u64().toString
          case 'd' => m(k) = java.lang.Double.longBitsToDouble(u64()).toString
          case 'f' => m(k) = java.lang.Float.intBitsToFloat(u32().toInt).toString
          case 'b' | 'B' => m(k) = u8().toString
          case 'V' => m(k) = ""
          case 'F' | 'A' | 'x' => val n = u32().toInt; p += n; m(k) = ""
          case 'D' => p += 5; m(k) = ""
          case 'U' | 'u' => m(k) = u16().toString
          case _ => p = end // unsizable unknown type: skip the rest
        }
      }
      p = end
      m.toMap
    }
  }

  // ------------------------------------------------------------ server

  private final class Consumer(val out: java.io.OutputStream, val channel: Int,
                               val tag: String)
  private final class QueueState {
    // (exchange, bindingKey, bindArguments) — args drive headers exchanges
    @volatile var bindings: Set[(String, String, Map[String, String])] = Set.empty
    val consumers = new java.util.concurrent.CopyOnWriteArrayList[Consumer]()
  }

  /** Start an AMQP 0-9-1 endpoint on `port`; every accepted
    * Basic.Publish spools as one JSON line `{"exchange":…,"rkey":…,
    * "payload":…}` read with `spark.read.json` / `readStream.json`.
    * Port 0 picks a free port (`listener.port`). */
  def listenAmqp(port: Int, spoolDir: String, batchSize: Int = 100,
                 flushMs: Long = 250L, suffix: String = ".jsonl",
                 frameMax: Int = 1 << 20,
                 maxConnections: Int = 64): AmqpListener = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    val server = new ServerSocket(port)
    val stop = new AtomicBoolean(false)
    val seq = new AtomicLong(0L)
    val active = new AtomicInteger(0)
    val queues = new ConcurrentHashMap[String, QueueState]()
    val exchanges = new ConcurrentHashMap[String, String]() // name → type
    val deliveryTag = new AtomicLong(0L)
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
          val t = new Thread(() => {
            try runSession(sock, queues, exchanges, deliveryTag, refuse, frameMax,
              rec => {
                val doFlush = batch.synchronized { batch += rec; batch.size >= batchSize }
                if (doFlush) flush()
              })
            catch {
              case _: java.io.IOException => ()
              case _: RuntimeException => () // malformed frame body → drop
            }
            finally {
              try sock.close() catch { case _: Throwable => () }
              if (!refuse) active.decrementAndGet()
              flush()
            }
          }, "graft-listen-amqp-conn")
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
    }, "graft-listen-amqp")
    accept.setDaemon(true)
    accept.start()
    new AmqpListener(server, stop, accept)
  }

  /** Deliver a message to a consumer: Basic.Deliver + content header +
    * one body frame, on the consumer's channel. */
  private def deliver(c: Consumer, tag: Long, exchange: String, rkey: String,
                      body: Array[Byte]): Unit = {
    writeFrame(c.out, 1, c.channel, method(60, 60) { w =>
      w.shortStr(c.tag).u64(tag).u8(0).shortStr(exchange).shortStr(rkey)
    })
    writeFrame(c.out, 2, c.channel,
      new W().u16(60).u16(0).u64(body.length).u16(0).arr)
    writeFrame(c.out, 3, c.channel, body)
  }

  private def runSession(sock: Socket,
                         queues: ConcurrentHashMap[String, QueueState],
                         exchanges: ConcurrentHashMap[String, String],
                         deliveryTag: AtomicLong,
                         refuse: Boolean, frameMax: Int,
                         emit: String => Unit): Unit = {
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)

    // ---- §4.2.2 protocol header: AMQP\x00\x00\x09\x01
    val hdr = new Array[Byte](8)
    if (!readFully(in, hdr)) return
    val want = Array[Byte]('A', 'M', 'Q', 'P', 0, 0, 9, 1)
    if (!java.util.Arrays.equals(hdr, want)) {
      out.write(want); out.flush() // answer with the supported version, close
      return
    }
    // Connection.Start (we offer PLAIN/en_US; client-properties table empty)
    writeFrame(out, 1, 0, method(10, 10) { w =>
      w.u8(0).u8(9).u32(0).longStr("PLAIN").longStr("en_US")
    })
    // Start-Ok: skip client-properties table, mechanism, response, locale
    val startOk = readFrame(in, frameMax).getOrElse(return)
    if (startOk._1 != 1) return
    if (refuse) {
      // capacity: Connection.Close 320 connection-forced (§1.4.2.8)
      writeFrame(out, 1, 0, method(10, 50) { w =>
        w.u16(320).shortStr("CONNECTION_FORCED - server unavailable").u16(0).u16(0)
      })
      return
    }
    // Tune / Tune-Ok / Open / Open-Ok
    writeFrame(out, 1, 0, method(10, 30)(w => w.u16(2047).u32(frameMax).u16(0)))
    val tuneOk = readFrame(in, frameMax).getOrElse(return)
    if (tuneOk._1 != 1) return
    val open = readFrame(in, frameMax).getOrElse(return)
    if (open._1 != 1) return
    writeFrame(out, 1, 0, method(10, 41)(w => w.shortStr("")))

    var confirmMode = false
    var confirmSeq = 0L
    val myConsumers = scala.collection.mutable.ArrayBuffer.empty[(String, Consumer)]
    // pending publish state PER CHANNEL (§2.2.7: a connection multiplexes
    // independent channels, and a conforming client — e.g. the standard
    // RabbitMQ libraries — may interleave content frames of different
    // channels' publishes; a single shared slot would reject them):
    // channel → (exchange, rkey, body-size, body buffer)
    final class PendingPub(val exchange: String, val rkey: String) {
      var size: Long = -1L // -1 = header not seen yet
      var headers: Map[String, String] = Map.empty // from the content header
      val body = new java.io.ByteArrayOutputStream()
    }
    val pending = scala.collection.mutable.Map.empty[Int, PendingPub]

    def route(exchange: String, rkey: String, headers: Map[String, String],
              body: Array[Byte]): Unit = {
      val hJson =
        if (headers.isEmpty) ""
        else headers.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${Ws.jsonStr(k)}:${Ws.jsonStr(v)}" }
          .mkString(""","headers":{""", ",", "}")
      emit(s"""{"exchange":${Ws.jsonStr(exchange)},"rkey":${Ws.jsonStr(rkey)}$hJson,""" +
        s""""payload":${Ws.jsonStr(new String(body, UTF_8))}}""")
      val tag = deliveryTag.incrementAndGet()
      queues.forEach { (qname, q) =>
        val matches =
          if (exchange.isEmpty) rkey == qname // default exchange (§2.1.2.4)
          else q.bindings.exists { case (ex, bkey, bargs) =>
            ex == exchange && (exchanges.getOrDefault(ex, "direct") match {
              case "topic"   => topicRouteMatches(bkey, rkey)
              case "fanout"  => true
              case "headers" => headersMatch(bargs, headers)
              case _         => bkey == rkey // direct
            })
          }
        if (matches) {
          val it = q.consumers.iterator()
          while (it.hasNext) {
            val c = it.next()
            try deliver(c, tag, exchange, rkey, body)
            catch { case _: java.io.IOException => () } // dead consumer
          }
        }
      }
    }

    var openConn = true
    // the detach below runs in a finally: the common abrupt-disconnect
    // exits (EOF, malformed frame, unsupported method) are early returns
    // from this loop, and leaving dead Consumer objects registered would
    // cost every later matching publish an IOException per dead consumer
    try {
    while (openConn) {
      readFrame(in, frameMax) match {
        case None => return
        case Some((8, _, _)) => () // heartbeat
        case Some((2, ch, payload)) => // content header for a pending publish
          val p = pending.getOrElse(ch, return)
          val r = new R(payload)
          r.u16(); r.u16() // class, weight
          p.size = r.u64()
          if (p.size > frameMax.toLong * 16) return // pathological
          // basic properties: bit15 content-type, bit14 content-encoding,
          // bit13 headers table — parse in declaration order up to the
          // headers (later properties don't affect routing)
          val flags = if (r.p + 2 <= payload.length) r.u16() else 0
          if ((flags & 0x8000) != 0) r.shortStr()
          if ((flags & 0x4000) != 0) r.shortStr()
          if ((flags & 0x2000) != 0) p.headers = r.table()
          if (p.size == 0) {
            route(p.exchange, p.rkey, p.headers, Array.emptyByteArray)
            if (confirmMode) {
              confirmSeq += 1
              writeFrame(out, 1, ch, method(60, 80)(w => w.u64(confirmSeq).u8(0)))
            }
            pending.remove(ch)
          }
        case Some((3, ch, payload)) => // content body (possibly fragmented)
          val p = pending.getOrElse(ch, return)
          if (p.size < 0) return // body before header — protocol error
          p.body.write(payload)
          if (p.body.size() >= p.size) {
            route(p.exchange, p.rkey, p.headers, p.body.toByteArray)
            if (confirmMode) {
              confirmSeq += 1
              writeFrame(out, 1, ch, method(60, 80)(w => w.u64(confirmSeq).u8(0)))
            }
            pending.remove(ch)
          }
        case Some((1, ch, payload)) =>
          val r = new R(payload)
          val classId = r.u16()
          val methodId = r.u16()
          (classId, methodId) match {
            case (20, 10) => // Channel.Open → Open-Ok
              writeFrame(out, 1, ch, method(20, 11)(w => w.longStr("")))
            case (20, 40) => // Channel.Close → Close-Ok
              writeFrame(out, 1, ch, method(20, 41)(w => w))
            case (40, 10) => // Exchange.Declare → Declare-Ok
              r.u16() // reserved
              val name = r.shortStr()
              val tpe = r.shortStr()
              exchanges.put(name, tpe)
              writeFrame(out, 1, ch, method(40, 11)(w => w))
            case (50, 10) => // Queue.Declare → Declare-Ok
              r.u16()
              val qname0 = r.shortStr()
              val qname = if (qname0.nonEmpty) qname0 else s"amq.gen-${deliveryTag.incrementAndGet()}"
              queues.computeIfAbsent(qname, _ => new QueueState())
              writeFrame(out, 1, ch, method(50, 11)(w => w.shortStr(qname).u32(0).u32(0)))
            case (50, 20) => // Queue.Bind → Bind-Ok
              r.u16()
              val qname = r.shortStr()
              val exchange = r.shortStr()
              val bkey = r.shortStr()
              r.u8() // no-wait
              // binding arguments (the headers-exchange match spec)
              val bargs = if (r.p + 4 <= payload.length) r.table()
                          else Map.empty[String, String]
              val q = queues.computeIfAbsent(qname, _ => new QueueState())
              q.bindings = q.bindings + ((exchange, bkey, bargs))
              writeFrame(out, 1, ch, method(50, 21)(w => w))
            case (60, 20) => // Basic.Consume → Consume-Ok
              r.u16()
              val qname = r.shortStr()
              val tag0 = r.shortStr()
              val tag = if (tag0.nonEmpty) tag0 else s"ctag-${deliveryTag.incrementAndGet()}"
              val q = queues.computeIfAbsent(qname, _ => new QueueState())
              val c = new Consumer(out, ch, tag)
              q.consumers.add(c)
              myConsumers += ((qname, c))
              writeFrame(out, 1, ch, method(60, 21)(w => w.shortStr(tag)))
            case (60, 40) => // Basic.Publish: header+body follow
              r.u16()
              val exchange = r.shortStr()
              val rkey = r.shortStr()
              pending(ch) = new PendingPub(exchange, rkey)
            case (60, 80) => () // Basic.Ack from a consumer — no-op (auto-ack model)
            case (85, 10) => // Confirm.Select → Select-Ok (publisher confirms)
              confirmMode = true
              writeFrame(out, 1, ch, method(85, 11)(w => w))
            case (10, 50) => // Connection.Close → Close-Ok, done
              writeFrame(out, 1, 0, method(10, 51)(w => w))
              openConn = false
            case _ => return // unsupported method → drop
          }
      }
    }
    } finally {
      // session end (clean OR abrupt): detach my consumers
      myConsumers.foreach { case (qname, c) =>
        val q = queues.get(qname)
        if (q != null) q.consumers.remove(c)
      }
    }
  }

  // ------------------------------------------------------------ client

  /** Handle for a running AMQP consumer client. */
  final class AmqpConsumer private[Amqp] (sock: Socket, thread: Thread) {
    def stop(): Unit = {
      try sock.close() catch { case _: Throwable => () } // unblocks the reader
      thread.join(5000)
    }
  }

  /** ConsumeAMQP in its NATIVE direction — a CLIENT of an external
    * broker (what NiFi's processor actually is): negotiate, declare
    * `queue`, bind it to `exchange` with `bindingKey` (skip the bind
    * for the default exchange), Basic.Consume, then spool every
    * Basic.Deliver as the same `{"exchange":…,"rkey":…,"payload":…}`
    * JSON lines [[listenAmqp]] spools — the downstream flow is
    * identical whichever side of the socket the broker is on. The
    * spec drives it against this file's own broker; against RabbitMQ
    * only host/port change. */
  def consumeAmqp(host: String, port: Int, queue: String, spoolDir: String,
                  exchange: String = "", bindingKey: String = "",
                  bindArgs: Map[String, String] = Map.empty,
                  batchSize: Int = 100, flushMs: Long = 250L,
                  suffix: String = ".jsonl", frameMax: Int = 1 << 20,
                  connectTimeoutMs: Int = 5000): AmqpConsumer = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port), connectTimeoutMs)
    sock.setSoTimeout(30000)
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    def expect(classId: Int, methodId: Int): R = {
      var f = readFrame(in, frameMax).getOrElse(sys.error("consumeAmqp: EOF"))
      while (f._1 == 8) f = readFrame(in, frameMax).getOrElse(sys.error("consumeAmqp: EOF"))
      require(f._1 == 1, s"consumeAmqp: expected method frame, got type ${f._1}")
      val r = new R(f._3)
      val (c, m) = (r.u16(), r.u16())
      require(c == classId && m == methodId, s"consumeAmqp: expected $classId.$methodId, got $c.$m")
      r
    }
    out.write(Array[Byte]('A', 'M', 'Q', 'P', 0, 0, 9, 1)); out.flush()
    expect(10, 10)
    writeFrame(out, 1, 0, method(10, 11) { w =>
      w.u32(0).shortStr("PLAIN").longStr("\u0000graft\u0000graft").shortStr("en_US")
    })
    expect(10, 30)
    writeFrame(out, 1, 0, method(10, 31)(w => w.u16(2047).u32(frameMax).u16(0)))
    writeFrame(out, 1, 0, method(10, 40)(w => w.shortStr("/").u8(0).u8(0)))
    expect(10, 41)
    writeFrame(out, 1, 1, method(20, 10)(w => w.shortStr("")))
    expect(20, 11)
    writeFrame(out, 1, 1, method(50, 10)(w => w.u16(0).shortStr(queue).u8(0).u32(0)))
    expect(50, 11)
    if (exchange.nonEmpty) {
      writeFrame(out, 1, 1, method(50, 20) { w =>
        w.u16(0).shortStr(queue).shortStr(exchange).shortStr(bindingKey).u8(0)
          .table(bindArgs) // headers-exchange match spec; {} otherwise
      })
      expect(50, 21)
    }
    writeFrame(out, 1, 1, method(60, 20)(w => w.u16(0).shortStr(queue).shortStr("").u8(0).u32(0)))
    expect(60, 21) // Consume-Ok — subscription live before we return

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

    val reader = new Thread(() => {
      try {
        sock.setSoTimeout(flushMs.toInt.max(1))
        var pendingEx: String = null
        var pendingRk: String = null
        var pendingSize = 0L
        val body = new java.io.ByteArrayOutputStream()
        var open = true
        while (open) {
          // first byte under the idle-flush timeout; once a frame is in
          // flight, switch to a generous timeout so a mid-frame tick
          // can't desync or kill the consumer
          val b0 =
            try in.read()
            catch { case _: java.net.SocketTimeoutException => flush(); -2 }
          val f: Option[(Int, Int, Array[Byte])] =
            if (b0 == -1) { open = false; None }
            else if (b0 == -2) None
            else {
              sock.setSoTimeout(30000)
              val rest = new Array[Byte](6)
              if (!readFully(in, rest)) { open = false; None }
              else {
                val ch = ((rest(0) & 0xFF) << 8) | (rest(1) & 0xFF)
                val size = ((rest(2) & 0xFF).toLong << 24) | ((rest(3) & 0xFF) << 16) |
                  ((rest(4) & 0xFF) << 8) | (rest(5) & 0xFF)
                if (size < 0 || size > frameMax) { open = false; None }
                else {
                  val payload = new Array[Byte](size.toInt)
                  if (!readFully(in, payload) || in.read() != 0xCE) { open = false; None }
                  else {
                    sock.setSoTimeout(flushMs.toInt.max(1))
                    Some((b0, ch, payload))
                  }
                }
              }
            }
          f.foreach {
            case (1, _, payload) =>
              val r = new R(payload)
              if ((r.u16(), r.u16()) == ((60, 60))) { // Basic.Deliver
                r.shortStr(); r.u64(); r.u8() // consumer-tag, delivery-tag, redelivered
                pendingEx = r.shortStr()
                pendingRk = r.shortStr()
                body.reset()
              }
            case (2, _, payload) =>
              val r = new R(payload)
              r.u16(); r.u16()
              pendingSize = r.u64()
              // a zero-size header has NO body frame (§4.2.6) — spool
              // the empty message now, or it would never be emitted and
              // the stale pendingEx/pendingRk would linger
              if (pendingSize == 0 && pendingRk != null) {
                val doFlush = batch.synchronized {
                  batch += s"""{"exchange":${Ws.jsonStr(pendingEx)},"rkey":${Ws.jsonStr(pendingRk)},""" +
                    s""""payload":${Ws.jsonStr("")}}"""
                  batch.size >= batchSize
                }
                if (doFlush) flush()
                pendingRk = null
              }
            case (3, _, payload) if pendingRk != null =>
              body.write(payload)
              if (body.size() >= pendingSize) {
                val doFlush = batch.synchronized {
                  batch += s"""{"exchange":${Ws.jsonStr(pendingEx)},"rkey":${Ws.jsonStr(pendingRk)},""" +
                    s""""payload":${Ws.jsonStr(new String(body.toByteArray, UTF_8))}}"""
                  batch.size >= batchSize
                }
                if (doFlush) flush()
                pendingRk = null
              }
            case _ => () // heartbeats etc.
          }
        }
      } catch { case _: java.io.IOException => () } // closed by stop()
      finally flush()
    }, "graft-consume-amqp")
    reader.setDaemon(true)
    reader.start()
    new AmqpConsumer(sock, reader)
  }

  /** PublishAMQP: publish one message per row, ONE connection per
    * PARTITION opened on the executor, publisher confirms awaited per
    * message (Confirm.Select + Basic.Ack — at-least-once, NiFi's
    * PublishAMQP guarantee). `rkeyCol` may be a column name or, when
    * absent, every row publishes to the literal `routingKey`. */
  def putAmqp(df: DataFrame, host: String, port: Int,
              payloadCol: String = "payload", rkeyCol: String = "rkey",
              routingKey: String = "", exchange: String = "",
              headers: Map[String, String] = Map.empty,
              connectTimeoutMs: Int = 5000): Unit = {
    val withKey =
      if (df.columns.contains(rkeyCol)) df.select(col(rkeyCol).cast("string"), col(payloadCol).cast("string"))
      else {
        require(routingKey.nonEmpty, s"putAmqp: no '$rkeyCol' column and no literal routingKey")
        df.select(lit(routingKey), col(payloadCol).cast("string"))
      }
    withKey.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val sock = new Socket()
        try {
          sock.connect(new InetSocketAddress(host, port), connectTimeoutMs)
          sock.setSoTimeout(30000)
          val in = new java.io.BufferedInputStream(sock.getInputStream)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          out.write(Array[Byte]('A', 'M', 'Q', 'P', 0, 0, 9, 1)); out.flush()
          def expect(classId: Int, methodId: Int): R = {
            var f = readFrame(in, 1 << 20).getOrElse(sys.error("putAmqp: EOF"))
            while (f._1 == 8) f = readFrame(in, 1 << 20).getOrElse(sys.error("putAmqp: EOF"))
            require(f._1 == 1, s"putAmqp: expected method frame, got type ${f._1}")
            val r = new R(f._3)
            val (c, m) = (r.u16(), r.u16())
            require(c == classId && m == methodId, s"putAmqp: expected $classId.$methodId, got $c.$m")
            r
          }
          expect(10, 10) // Start
          writeFrame(out, 1, 0, method(10, 11) { w =>
            w.u32(0).shortStr("PLAIN").longStr("\u0000graft\u0000graft").shortStr("en_US")
          })
          expect(10, 30) // Tune
          writeFrame(out, 1, 0, method(10, 31)(w => w.u16(2047).u32(1 << 20).u16(0)))
          writeFrame(out, 1, 0, method(10, 40)(w => w.shortStr("/").u8(0).u8(0)))
          expect(10, 41) // Open-Ok
          writeFrame(out, 1, 1, method(20, 10)(w => w.shortStr("")))
          expect(20, 11) // Channel.Open-Ok
          writeFrame(out, 1, 1, method(85, 10)(w => w.u8(0)))
          expect(85, 11) // Confirm.Select-Ok
          rows.foreach { r =>
            val rk = r.getString(0); val m = r.getString(1)
            require(rk != null && m != null, "putAmqp: null routing key/payload")
            val body = m.getBytes(UTF_8)
            writeFrame(out, 1, 1, method(60, 40) { w =>
              w.u16(0).shortStr(exchange).shortStr(rk).u8(0)
            })
            // property bit 13 = headers table present
            val hdr = new W().u16(60).u16(0).u64(body.length)
            if (headers.isEmpty) hdr.u16(0)
            else hdr.u16(0x2000).table(headers)
            writeFrame(out, 2, 1, hdr.arr)
            writeFrame(out, 3, 1, body)
            expect(60, 80) // publisher confirm
          }
          writeFrame(out, 1, 0, method(10, 50)(w => w.u16(200).shortStr("bye").u16(0).u16(0)))
          expect(10, 51) // Close-Ok
          ()
        } finally sock.close()
      }
    }
  }
}
