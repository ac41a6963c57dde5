package graft.streaming

import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

import org.apache.spark.sql.DataFrame

/** ListenWebSocket / PutWebSocket (NiFi's websocket edge), Spark-first
  * and JDK-only — the SMTP/FTP posture: the RFC 6455 wire protocol
  * implemented from the RFC text on raw sockets (HTTP/1.1 Upgrade
  * handshake with the Sec-WebSocket-Accept SHA-1 transform, masked
  * client frames, 7/16/64-bit payload lengths, fragmentation,
  * ping/pong, close), no websocket library on the server side.
  *
  * Ingress mirrors [[Net.listenTcp]]: each complete TEXT message spools
  * as one JSON line `{"session":…,"msg":…}` (atomic tmp+rename,
  * batched; the lock covers only the buffer swap), and a file stream
  * over the spool is the actual source — the flow binds to the
  * directory, not the socket. Single-receiver ingress like every
  * Listen* processor here; front with a distributed log at scale.
  *
  * Egress ([[putWebSocket]]) uses the JDK's own `java.net.http`
  * WebSocket CLIENT from executors, one connection per PARTITION —
  * connection count scales with parallelism, not rows. The spec
  * round-trips JDK-client → this server and putWebSocket → this
  * server, so both directions are exercised against a real peer. */
object Ws {

  /** Handle for a running WebSocket listener. */
  final class WsListener private[Ws] (server: ServerSocket,
                                      stopFlag: AtomicBoolean,
                                      thread: Thread) {
    def port: Int = server.getLocalPort
    def stop(): Unit = {
      stopFlag.set(true)
      try server.close() catch { case _: Throwable => () }
      thread.join(5000)
    }
  }

  /** RFC 6455 §1.3: base64(SHA-1(key + fixed GUID)). */
  private[graft] def acceptKey(key: String): String = {
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8))
    java.util.Base64.getEncoder.encodeToString(sha)
  }

  private[graft] def jsonStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** Start an RFC 6455 endpoint on `port`; complete TEXT messages spool
    * as JSON lines `{"session":"<id>","msg":<text>}` read with
    * `spark.read.json` / `readStream.json`. Binary frames and messages
    * past `maxMessageBytes` close the session with the protocol's 1003 /
    * 1009 status codes (NiFi ListenWebSocket is record-oriented text;
    * oversize must not OOM the listener — the ListenSMTP bound).
    * Sessions past `maxConnections` are refused with HTTP 503 before
    * any upgrade. Port 0 picks a free port. */
  def listenWebSocket(port: Int, spoolDir: String, batchSize: Int = 100,
                      flushMs: Long = 250L, suffix: String = ".jsonl",
                      maxMessageBytes: Long = 10L << 20,
                      maxConnections: Int = 64,
                      ssl: Option[javax.net.ssl.SSLContext] = None): WsListener = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    // `ssl` = wss:// (NiFi ListenWebSocket's SSL Context Service): the
    // handshake runs lazily on the session's first byte, so a
    // plaintext client dies in the record layer before the HTTP
    // upgrade parses — nothing spools (the r17 listener-family
    // plaintext-refusal contract). A JDK wss client connects with the
    // matching context (HttpClient.newBuilder().sslContext(...)).
    val server = ssl match {
      case Some(ctx) => ctx.getServerSocketFactory.createServerSocket(port)
      case None => new ServerSocket(port)
    }
    val stop = new AtomicBoolean(false)
    val seq = new AtomicLong(0L)
    val sessionSeq = new AtomicLong(0L)
    val active = new AtomicInteger(0)
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
          if (active.get() >= maxConnections) {
            try {
              val w = sock.getOutputStream
              w.write("HTTP/1.1 503 Service Unavailable\r\nConnection: close\r\n\r\n".getBytes(UTF_8))
              w.flush()
            } catch { case _: java.io.IOException => () }
            finally { try sock.close() catch { case _: Throwable => () } }
          } else {
            active.incrementAndGet()
            val session = new Thread(() => {
              try runSession(sock, sessionSeq.getAndIncrement(), maxMessageBytes,
                rec => {
                  val doFlush = batch.synchronized { batch += rec; batch.size >= batchSize }
                  if (doFlush) flush()
                })
              catch { case _: java.io.IOException => () } // peer reset
              finally {
                try sock.close() catch { case _: Throwable => () }
                active.decrementAndGet()
                flush()
              }
            }, "graft-listen-ws-conn")
            session.setDaemon(true)
            session.start()
          }
        } catch {
          case _: java.net.SocketTimeoutException => flush() // idle drain
          case _: java.net.SocketException if stop.get() =>
        }
      }
      flush()
    }, "graft-listen-ws")
    accept.setDaemon(true)
    accept.start()
    new WsListener(server, stop, accept)
  }

  /** One session: HTTP upgrade handshake, then the frame loop until a
    * close frame, EOF, or a protocol bound trips. */
  private def runSession(sock: java.net.Socket, sessionId: Long,
                         maxMessageBytes: Long, emit: String => Unit): Unit = {
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)

    // ---- handshake: read HTTP request head (bounded), find the key
    val head = new StringBuilder
    var c = in.read()
    while (c >= 0 && head.length < 16384) {
      head.append(c.toChar)
      c = if (head.endsWith("\r\n\r\n")) -2 else in.read()
    }
    val KeyRe = "(?i)Sec-WebSocket-Key:\\s*(\\S+)".r
    KeyRe.findFirstMatchIn(head.toString) match {
      case None =>
        out.write("HTTP/1.1 400 Bad Request\r\nConnection: close\r\n\r\n".getBytes(UTF_8))
        out.flush()
        return
      case Some(m) =>
        val resp = "HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          s"Sec-WebSocket-Accept: ${acceptKey(m.group(1))}\r\n\r\n"
        out.write(resp.getBytes(UTF_8)); out.flush()
    }

    def readFully(buf: Array[Byte]): Boolean = {
      var off = 0
      while (off < buf.length) {
        val n = in.read(buf, off, buf.length - off)
        if (n < 0) return false
        off += n
      }
      true
    }
    def sendFrame(opcode: Int, payload: Array[Byte]): Unit = {
      // server frames are unmasked (RFC 6455 §5.1)
      out.write(0x80 | opcode)
      if (payload.length < 126) out.write(payload.length)
      else if (payload.length < 65536) {
        out.write(126); out.write(payload.length >>> 8); out.write(payload.length & 0xFF)
      } else {
        out.write(127)
        var i = 7
        while (i >= 0) { out.write(((payload.length.toLong >>> (8 * i)) & 0xFF).toInt); i -= 1 }
      }
      out.write(payload); out.flush()
    }
    def closeWith(status: Int): Unit =
      sendFrame(0x8, Array(((status >>> 8) & 0xFF).toByte, (status & 0xFF).toByte))

    // ---- frame loop; text messages may be fragmented (opcode 0 cont.)
    val msg = new java.io.ByteArrayOutputStream()
    var inText = false
    var open = true
    while (open) {
      val b0 = in.read()
      if (b0 < 0) return
      val fin = (b0 & 0x80) != 0
      val opcode = b0 & 0x0F
      val b1 = in.read()
      if (b1 < 0) return
      val masked = (b1 & 0x80) != 0
      var len: Long = b1 & 0x7F
      if (len == 126) {
        val e = new Array[Byte](2)
        if (!readFully(e)) return
        len = ((e(0) & 0xFF) << 8) | (e(1) & 0xFF)
      } else if (len == 127) {
        val e = new Array[Byte](8)
        if (!readFully(e)) return
        len = e.foldLeft(0L)((a, x) => (a << 8) | (x & 0xFF))
        // §5.2: the 64-bit length MUST have MSB=0; a negative value
        // would bypass the size bound and blow up the array alloc
        if (len < 0) { closeWith(1002); return }
      }
      if (!masked) { closeWith(1002); return }       // client MUST mask (§5.1)
      val isControl = (opcode & 0x8) != 0
      if (isControl) {
        // §5.5: control frames are bounded at 125 bytes and must not
        // count against the fragmented-message accumulation (a ping
        // arriving mid-message near the cap is not an oversize message)
        if (len > 125) { closeWith(1002); return }
      } else if (len > Int.MaxValue || len > maxMessageBytes ||
                 msg.size() + len > maxMessageBytes) {
        closeWith(1009); return                       // message too big
      }
      val mask = new Array[Byte](4)
      if (!readFully(mask)) return
      val payload = new Array[Byte](len.toInt)
      if (!readFully(payload)) return
      var i = 0
      while (i < payload.length) { payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1 }
      opcode match {
        case 0x1 => // text
          msg.reset(); msg.write(payload); inText = true
          if (fin) {
            emit(s"""{"session":"s$sessionId","msg":${jsonStr(new String(msg.toByteArray, UTF_8))}}""")
            inText = false
          }
        case 0x0 => // continuation
          if (inText) {
            msg.write(payload)
            if (fin) {
              emit(s"""{"session":"s$sessionId","msg":${jsonStr(new String(msg.toByteArray, UTF_8))}}""")
              inText = false
            }
          }
        case 0x2 => closeWith(1003); open = false     // binary unsupported
        case 0x9 => sendFrame(0xA, payload)           // ping → pong
        case 0xA => ()                                // unsolicited pong
        case 0x8 =>                                   // close → echo + done
          sendFrame(0x8, payload.take(2)); open = false
        case _ => closeWith(1002); open = false
      }
    }
  }

  /** PutWebSocket: send one TEXT message per row, one JDK
    * `java.net.http` WebSocket client connection per PARTITION. The
    * column is cast to string up front. At-least-once on retry like
    * every Put* here. */
  def putWebSocket(df: DataFrame, uri: String, msgCol: String = "msg",
                   keystore: Option[(String, String)] = None): Unit = {
    import org.apache.spark.sql.functions.col
    df.select(col(msgCol).cast("string")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          // keystore (path, pass) strings → per-partition wss context
          val client = keystore match {
            case Some((ks, pass)) => java.net.http.HttpClient.newBuilder()
              .sslContext(ListenHttp.sslContext(ks, pass)).build()
            case None => java.net.http.HttpClient.newHttpClient()
          }
          val ws = client.newWebSocketBuilder()
            .buildAsync(java.net.URI.create(uri),
              new java.net.http.WebSocket.Listener {})
            .join()
          try rows.foreach { r =>
            val m = r.getString(0)
            require(m != null, "putWebSocket: null message")
            ws.sendText(m, true).join()
          } finally {
            try ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done").join()
            catch { case _: Throwable => () }
          }
        }
    }
  }
}
