package graft.streaming

import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.DataFrame

/** ListenSMTP / PutEmail (NiFi's email edge processors), Spark-first
  * and JDK-only — the same posture as the FTP/SFTP pair: a real wire
  * protocol (RFC 5321 command grammar, multiline DATA with
  * dot-stuffing per §4.5.2), no mail library.
  *
  * Ingress mirrors [[Net.listenTcp]]: the SMTP server thread spools
  * one JSON line per COMPLETED message (atomic tmp+rename, batched),
  * and a file stream over the spool directory is the actual source —
  * the flow binds to the directory, not the socket; exactly-once from
  * the spool onward. Single-receiver ingress like every Listen*
  * processor here — front with a distributed log at scale.
  *
  * Egress ([[putEmail]]) writes straight from executors, one SMTP
  * connection per PARTITION (not per row): connection count scales
  * with parallelism, not data volume.
  */
object Smtp {

  /** Handle for a running SMTP listener. */
  final class SmtpListener private[Smtp] (server: ServerSocket,
                                          stopFlag: AtomicBoolean,
                                          thread: Thread) {
    def port: Int = server.getLocalPort
    def stop(): Unit = {
      stopFlag.set(true)
      try server.close() catch { case _: Throwable => () }
      thread.join(5000)
    }
  }

  /** Bounded line read (the other half of the listener's memory
    * contract — `maxMessageBytes` bounds TOTAL buffering but
    * BufferedReader.readLine would still materialize one arbitrarily
    * long LINE before any check runs): reads up to `max` chars of one
    * CRLF/LF-terminated line; a longer line is TRUNCATED (the rest of
    * it is consumed and discarded) and flagged. Returns (line, truncated),
    * line == null at EOF. */
  private[streaming] def readLineBounded(in: java.io.Reader, max: Int): (String, Boolean) = {
    val b = new StringBuilder
    var truncated = false
    var c = in.read()
    if (c < 0) return (null, false)
    while (c >= 0 && c != '\n') {
      if (c != '\r') {
        if (b.length < max) b.append(c.toChar)
        else truncated = true // keep consuming to EOL, buffer no more
      }
      c = in.read()
    }
    (b.toString, truncated)
  }

  private def jsonStr(s: String): String = {
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

  /** ListenSMTP: accept RFC 5321 sessions on `port`, spool each
    * completed message as one JSON line
    * `{"mail_from":…,"rcpt_to":[…],"data":…}` (data = the raw message
    * with dot-unstuffing applied, CRLF normalized to \n). Read the
    * spool with `spark.read.json` / `readStream.json`. Port 0 picks a
    * free port.
    *
    * Resource bounds (NiFi's 'Max size of Socket Buffer' / 'Maximum
    * number of SMTP connection' analogs): a DATA payload past
    * `maxMessageBytes` is refused with 552 — the loop keeps consuming
    * (discarding) lines to the terminating dot so the session stays in
    * sync, but nothing past the cap is buffered, so one peer streaming
    * a huge message can't OOM the listener. Sessions past
    * `maxConnections` are greeted with 421 and closed, capping the
    * per-connection threads. */
  def listenSmtp(port: Int, spoolDir: String, batchSize: Int = 50,
                 flushMs: Long = 250L, hostname: String = "graft",
                 suffix: String = ".jsonl",
                 maxMessageBytes: Long = 10L << 20,
                 maxConnections: Int = 32,
                 ssl: Option[javax.net.ssl.SSLContext] = None): SmtpListener = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    // `ssl` = implicit-TLS SMTPS (NiFi ListenSMTP's 'SSL Context
    // Service' slot): the handshake runs lazily on the session's first
    // byte, so a plaintext client dies in the TLS record layer before
    // any SMTP command parses — its session catches IOException and
    // nothing spools (the listener-family plaintext-refusal gate).
    val server = ssl match {
      case Some(ctx) => ctx.getServerSocketFactory.createServerSocket(port)
      case None => new ServerSocket(port)
    }
    val stop = new AtomicBoolean(false)
    val seq = new AtomicLong(0L)
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val batch = new scala.collection.mutable.ArrayBuffer[String](batchSize)
    // same lock discipline as Net.listenTcp: the lock covers only the
    // buffer swap + name claim; file I/O happens outside it
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
            // over the session cap: greet with 421 and close (RFC 5321
            // §3.8 / §4.3.2) — no thread is spawned for the peer
            try {
              val w = new java.io.OutputStreamWriter(sock.getOutputStream, UTF_8)
              w.write(s"421 $hostname too many connections, try later\r\n"); w.flush()
            } catch { case _: java.io.IOException => () }
            finally { try sock.close() catch { case _: Throwable => () } }
          } else {
          active.incrementAndGet()
          val session = new Thread(() => {
            try {
              val in = new java.io.BufferedReader(
                new java.io.InputStreamReader(sock.getInputStream, UTF_8))
              val out = new java.io.PrintWriter(
                new java.io.OutputStreamWriter(sock.getOutputStream, UTF_8))
              def reply(s: String): Unit = { out.print(s + "\r\n"); out.flush() }
              reply(s"220 $hostname ESMTP graft")
              val dataLineMax = math.min(maxMessageBytes, 1L << 20).toInt
              var from: String = null
              var rcpts = List.empty[String]
              var lt = readLineBounded(in, 4096)
              var line = lt._1
              while (line != null && !stop.get()) {
                val u = line.toUpperCase(java.util.Locale.ROOT)
                if (lt._2) reply("500 line too long")
                else if (u.startsWith("EHLO") || u.startsWith("HELO")) reply(s"250 $hostname")
                else if (u.startsWith("MAIL FROM:")) {
                  from = line.substring(10).trim.stripPrefix("<").stripSuffix(">")
                  rcpts = Nil
                  reply("250 OK")
                } else if (u.startsWith("RCPT TO:")) {
                  if (from == null) reply("503 need MAIL first")
                  else {
                    rcpts ::= line.substring(8).trim.stripPrefix("<").stripSuffix(">")
                    reply("250 OK")
                  }
                } else if (u == "DATA") {
                  if (from == null || rcpts.isEmpty) reply("503 need MAIL and RCPT first")
                  else {
                    reply("354 End data with <CRLF>.<CRLF>")
                    val data = new StringBuilder
                    var oversize = false
                    var dlt = readLineBounded(in, dataLineMax)
                    var dl = dlt._1
                    while (dl != null && dl != ".") {
                      // dot-unstuffing (RFC 5321 §4.5.2)
                      val d = if (dl.startsWith("..")) dl.substring(1) else dl
                      if (!oversize &&
                          (dlt._2 || data.length + d.length + 1 > maxMessageBytes)) {
                        oversize = true      // stop buffering; keep consuming
                        data.setLength(0)    // release what we held
                      }
                      if (!oversize) data.append(d).append('\n')
                      dlt = readLineBounded(in, dataLineMax)
                      dl = dlt._1
                    }
                    if (dl == null) reply("451 connection lost in DATA")
                    else if (oversize) {
                      from = null; rcpts = Nil
                      reply("552 message exceeds fixed maximum message size")
                    } else {
                      val rec = s"""{"mail_from":${jsonStr(from)},"rcpt_to":[${
                        rcpts.reverse.map(jsonStr).mkString(",")}],"data":${
                        jsonStr(data.toString)}}"""
                      val doFlush = batch.synchronized {
                        batch += rec; batch.size >= batchSize
                      }
                      if (doFlush) flush()
                      from = null; rcpts = Nil
                      reply("250 OK queued")
                    }
                  }
                } else if (u == "RSET") { from = null; rcpts = Nil; reply("250 OK") }
                else if (u == "NOOP") reply("250 OK")
                else if (u == "QUIT") { reply("221 bye"); line = null }
                else reply("500 unrecognized command")
                if (line != null) { lt = readLineBounded(in, 4096); line = lt._1 }
              }
            } catch { case _: java.io.IOException => () } // peer reset
            finally { try sock.close() catch { case _: Throwable => () }
                      active.decrementAndGet()
                      flush() }
          }, "graft-listen-smtp-conn")
          session.setDaemon(true)
          session.start()
          }
        } catch {
          case _: java.net.SocketTimeoutException => flush() // idle drain
          case _: java.net.SocketException if stop.get() =>
        }
      }
      flush()
    }, "graft-listen-smtp")
    accept.setDaemon(true)
    accept.start()
    new SmtpListener(server, stop, accept)
  }

  /** PutEmail: send one message per row over SMTP, one connection per
    * partition. Columns: `toCol` (recipient address), `subjectCol`,
    * `bodyCol` (plain text; dot-stuffed for transport). An SMTP error
    * reply on any command fails the task (at-least-once on retry, like
    * every Put* here).
    *
    * Injection hardening: `from`, the recipient and the subject are
    * interpolated into SMTP commands / message headers, so CR/LF in
    * them would smuggle extra commands or headers — a recipient is
    * REJECTED if it contains CR/LF/`<`/`>` (bad addresses should fail
    * loudly, not be silently rewritten), and the subject has CR/LF
    * collapsed to spaces (a lossy-but-safe header fold). Only the body
    * is free-form (dot-stuffed). The three columns are cast to string
    * up front so non-string inputs can't ClassCastException
    * mid-partition. */
  def putEmail(df: DataFrame, host: String, port: Int, from: String,
               toCol: String = "to", subjectCol: String = "subject",
               bodyCol: String = "body",
               keystore: Option[(String, String)] = None): Unit = {
    require(!from.exists(c => c == '\r' || c == '\n' || c == '<' || c == '>'),
      s"from address must not contain CR/LF/angle brackets: '$from'")
    val cols = {
      import org.apache.spark.sql.functions.col
      df.select(col(toCol).cast("string"), col(subjectCol).cast("string"),
                col(bodyCol).cast("string"))
    }
    cols.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        // keystore (path, pass) strings → per-partition SMTPS context
        // (implicit TLS; the trust anchor is the same keystore — the
        // self-signed listener pattern used across the Put* family)
        val sock = keystore match {
          case Some((ks, pass)) =>
            ListenHttp.sslContext(ks, pass).getSocketFactory.createSocket(host, port)
          case None => new java.net.Socket(host, port)
        }
        try {
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(sock.getInputStream, UTF_8))
          val out = new java.io.PrintWriter(
            new java.io.OutputStreamWriter(sock.getOutputStream, UTF_8))
          def cmd(s: String, expect: String): Unit = {
            if (s != null) { out.print(s + "\r\n"); out.flush() }
            val r = in.readLine()
            require(r != null && r.startsWith(expect),
              s"SMTP: sent '${Option(s).getOrElse("<greeting>")}', got '$r', wanted $expect")
          }
          cmd(null, "220")
          cmd("EHLO graft", "250")
          rows.foreach { row =>
            val to = row.getString(0)
            require(to != null &&
              !to.exists(c => c == '\r' || c == '\n' || c == '<' || c == '>'),
              s"recipient must not be null or contain CR/LF/angle brackets: '$to'")
            val subject = Option(row.getString(1)).getOrElse("")
              .replaceAll("[\r\n]+", " ")
            val body = row.getString(2)
            cmd(s"MAIL FROM:<$from>", "250")
            cmd(s"RCPT TO:<$to>", "250")
            out.print("DATA\r\n"); out.flush()
            require(in.readLine().startsWith("354"), "SMTP: DATA not accepted")
            val msg = s"From: <$from>\nTo: <$to>\nSubject: $subject\n\n" +
              Option(body).getOrElse("")
            msg.split("\n", -1).foreach { l =>
              val stuffed = if (l.startsWith(".")) "." + l else l // §4.5.2
              out.print(stuffed + "\r\n")
            }
            out.print(".\r\n"); out.flush()
            require(in.readLine().startsWith("250"), "SMTP: message rejected")
          }
          out.print("QUIT\r\n"); out.flush()
        } finally { try sock.close() catch { case _: Throwable => () } }
      }
    }
  }
}
