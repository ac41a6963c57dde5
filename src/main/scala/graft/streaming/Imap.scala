package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** ConsumeIMAP (NiFi email bundle, `ConsumeIMAP`): retrieve messages
  * from an IMAP mailbox (RFC 3501 subset) and spool each as one file —
  * the protocol real mailboxes actually speak, next to the POP3 pull
  * form ([[Pop3.consumePop3]]). Hand-rolled on JDK sockets from the
  * RFC like every other wire edge here.
  *
  * Subset spoken (client side): tagged commands, LOGIN, SELECT,
  * `UID SEARCH UNSEEN|ALL`, `UID FETCH n (BODY.PEEK[])` with literal
  * (`{n}` byte-counted) framing, `UID STORE n +FLAGS.SILENT
  * (\Seen|\Deleted)`, EXPUNGE, LOGOUT.
  *
  * Idempotence & commit semantics (the ConsumePOP3 contract, in IMAP
  * vocabulary):
  *  - retain mode (`delete = false`, the NiFi default): fetch
  *    `UID SEARCH UNSEEN`, spool, then mark `\Seen` — the SERVER
  *    carries the cross-poll dedup state, so every poll ingests only
  *    new mail and a consumer restart costs nothing. PEEK fetches
  *    never set `\Seen` implicitly, so a pass that dies before the
  *    STORE leaves the message unseen → re-ingested next poll:
  *    at-least-once into the spool, with the atomic tmp+rename keeping
  *    partial messages invisible.
  *  - delete mode (`delete = true`): fetch ALL, spool, mark
  *    `\Deleted`, and EXPUNGE once at pass end — the commit point
  *    (the POP3-QUIT analog): a pass that dies mid-way leaves every
  *    message present because `\Deleted` is only a flag until EXPUNGE.
  *
  * Messages spool OCTET-PRESERVING — IMAP literals are byte-counted,
  * so the payload round-trips bit-exact (8-bit transparent, CRLF
  * preserved) — as `<millis>-<seq>-uid<uid>.eml`. Single-receiver
  * ingress; the downstream flow binds to the spool directory.
  */
object Imap {

  final class ImapPoller private[Imap] (stopFlag: AtomicBoolean, thread: Thread) {
    def stop(): Unit = {
      stopFlag.set(true)
      thread.interrupt()
      thread.join(5000)
    }
  }

  private val seq = new AtomicLong(0L)
  private val L1 = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Byte-level reader: IMAP mixes CRLF-framed lines with exact-count
    * literals, so line reads must not buffer past the CRLF the way a
    * BufferedReader would. */
  private final class Wire(in: java.io.InputStream) {
    private val bin = new java.io.BufferedInputStream(in)
    /** One line, CRLF (or bare LF) stripped; null at EOF. */
    def readLine(): String = {
      val sb = new java.lang.StringBuilder
      var c = bin.read()
      if (c < 0) return null
      while (c >= 0 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = bin.read()
      }
      sb.toString
    }
    /** Exactly `n` bytes (the literal payload). */
    def readFully(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = bin.read(buf, off, n - off)
        require(r >= 0, s"IMAP: stream ended inside a {$n} literal at $off")
        off += r
      }
      buf
    }
  }

  /** One drain pass. Returns the number of messages spooled. */
  def consumeImap(host: String, port: Int, user: String, pass: String,
                  spoolDir: String, folder: String = "INBOX",
                  delete: Boolean = false): Int = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    val sock = new java.net.Socket(host, port)
    try {
      sock.setSoTimeout(30000)
      val wire = new Wire(sock.getInputStream)
      val out = sock.getOutputStream
      var tagN = 0
      def send(cmd: String): String = {
        tagN += 1
        val tag = s"g$tagN"
        out.write(s"$tag $cmd\r\n".getBytes(L1)); out.flush()
        tag
      }
      /** Collect untagged lines until the tagged completion; literals
        * inside untagged responses are captured via `onLiteral`. */
      def finish(tag: String, ctx: String,
                 onLiteral: (String, Array[Byte]) => Unit = null): Seq[String] = {
        val untagged = scala.collection.mutable.ArrayBuffer.empty[String]
        var line = wire.readLine()
        while (line != null && !line.startsWith(tag + " ")) {
          val lit = "\\{(\\d+)\\}$".r.findFirstMatchIn(line)
          if (lit.isDefined) {
            val n = lit.get.group(1).toInt
            val bytes = wire.readFully(n)
            if (onLiteral != null) onLiteral(line, bytes)
            // the close-paren (and anything else) after the literal
            // arrives as a continuation line; drop it
            wire.readLine()
          }
          untagged += line
          line = wire.readLine()
        }
        require(line != null, s"IMAP $ctx: stream ended before $tag completion")
        require(line.startsWith(s"$tag OK"), s"IMAP $ctx: got '$line'")
        untagged.toSeq
      }
      // greeting is an untagged * OK line
      val greet = wire.readLine()
      require(greet != null && greet.startsWith("* OK"), s"IMAP greeting: got '$greet'")
      // RFC 3501 quoted strings: backslash-escape `\` and `"`; CR/LF
      // cannot appear in a quoted string at all — reject loudly rather
      // than send a command the server will misparse (pollImap's retry
      // loop would otherwise fail silently forever)
      def quoted(s: String): String = {
        require(!s.exists(c => c == '\r' || c == '\n'),
          "IMAP strings must not contain CR/LF")
        "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      }
      finish(send(s"LOGIN ${quoted(user)} ${quoted(pass)}"), "LOGIN")
      // the folder gets the same quoted()/CRLF-reject treatment as the
      // credentials: a space/quote/CRLF in an (EL-computed) mailbox name
      // must not misparse or inject a second command
      finish(send(s"SELECT ${quoted(folder)}"), "SELECT")
      val crit = if (delete) "ALL" else "UNSEEN"
      val uids = finish(send(s"UID SEARCH $crit"), "UID SEARCH")
        .find(_.toUpperCase(java.util.Locale.ROOT).startsWith("* SEARCH"))
        .map(_.split("\\s+").drop(2).filter(_.nonEmpty).map(_.toLong).toSeq)
        .getOrElse(Seq.empty)
      var spooled = 0
      for (uid <- uids) {
        var body: Array[Byte] = null
        finish(send(s"UID FETCH $uid (BODY.PEEK[])"), s"UID FETCH $uid",
          onLiteral = (_, bytes) => body = bytes)
        require(body != null, s"IMAP UID FETCH $uid: no literal in response")
        val name = s"${System.currentTimeMillis()}-${seq.getAndIncrement()}-uid$uid.eml"
        val tmp = dir.resolve(name + ".tmp")
        Files.write(tmp, body)
        Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
        spooled += 1
        // mark only AFTER the spool rename: a death above re-ingests
        // next poll (at-least-once), never loses
        val flag = if (delete) "\\Deleted" else "\\Seen"
        finish(send(s"UID STORE $uid +FLAGS.SILENT ($flag)"), s"UID STORE $uid")
      }
      if (delete && uids.nonEmpty)
        finish(send("EXPUNGE"), "EXPUNGE") // the commit point
      val tag = send("LOGOUT") // server sends * BYE then tagged OK
      finish(tag, "LOGOUT")
      spooled
    } finally { try sock.close() catch { case _: Throwable => () } }
  }

  /** Poll loop for flow wiring ([[Pop3.pollPop3]] contract): a drain
    * pass every `pollMs` until stop(); transient failures retry at the
    * next tick. */
  def pollImap(host: String, port: Int, user: String, pass: String,
               spoolDir: String, folder: String = "INBOX",
               pollMs: Long = 1000L, delete: Boolean = false): ImapPoller = {
    val stop = new AtomicBoolean(false)
    val t = new Thread(() => {
      while (!stop.get()) {
        try consumeImap(host, port, user, pass, spoolDir, folder, delete)
        catch {
          case _: InterruptedException => ()
          case _: Exception => () // transient server failure: retry next tick
        }
        try Thread.sleep(pollMs) catch { case _: InterruptedException => () }
      }
    }, "graft-imap-poll")
    t.setDaemon(true)
    t.start()
    new ImapPoller(stop, t)
  }
}
