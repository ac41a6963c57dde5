package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** ConsumePOP3 (NiFi email bundle, `ConsumePOP3`): retrieve messages
  * from a POP3 mailbox (RFC 1939) and spool each as one file — the
  * RETRIEVAL direction that completes the email family next to
  * [[Smtp.listenSmtp]] (receive), [[Smtp.putEmail]] (send) and the
  * ExtractEmailHeaders/Attachments record operators. Hand-rolled on
  * JDK sockets like every other wire edge here (no mail client
  * library exists offline; the protocol is 6 commands).
  *
  * POP3 is pull-only — no server push exists in the protocol — so the
  * consumer POLLS, exactly as NiFi schedules its processor:
  * [[consumePop3]] is one drain pass (connect, USER/PASS, STAT, RETR
  * each, optional DELE, QUIT), [[pollPop3]] wraps it in a stop()-able
  * poll thread for flow wiring. Per RFC 1939 §6 deletions only commit
  * at QUIT (UPDATE state), so a drain that dies mid-pass leaves the
  * mailbox intact — at-least-once into the spool, with the spool's
  * atomic tmp+rename keeping partial messages invisible (the Listen*
  * family contract). With `delete = false` the mailbox is retained
  * (the RFC's semantics) and a UIDL ledger keeps polls idempotent —
  * see [[consumePop3]]; NiFi's delete-after-ingest mode is
  * `delete = true`.
  *
  * Multiline responses un-stuff the leading `..` (RFC 1939 §3) and
  * terminate at the bare `.`; messages spool OCTET-PRESERVING (ISO-8859-1 framing — every byte value round-trips; bare LFs normalize to the protocol's own CRLF framing) as
  * `<millis>-<seq>-msg<n>.eml` with CRLF line ends preserved.
  * Single-receiver ingress — front with a distributed log at scale;
  * the downstream flow binds to the spool directory, not the socket.
  */
object Pop3 {

  final class Pop3Poller private[Pop3] (stopFlag: AtomicBoolean, thread: Thread) {
    def stop(): Unit = {
      stopFlag.set(true)
      thread.interrupt()
      thread.join(5000)
    }
  }

  private val seq = new AtomicLong(0L)

  /** One drain pass. Returns the number of messages spooled.
    *
    * Retain mode (`delete = false`) keeps a UIDL LEDGER (r16): POP3
    * has no server-side read state, so without one every poll re-RETRs
    * the whole mailbox — a 1 s poll over a 1000-message box floods the
    * spool with duplicates forever. The pass issues RFC 1939 §7 UIDL,
    * skips messages whose unique-id is already in the ledger, and
    * appends each new id only AFTER its spool rename (at-least-once —
    * a death between rename and append re-ingests once, never loses).
    * The ledger lives OUTSIDE the spool (default sibling file
    * `<spoolDir>.pop3-uidl`) so file-stream readers of the spool never
    * see it. A server without UIDL (-ERR) falls back to re-reading —
    * the pre-r16 behavior, now the documented legacy path only. */
  def consumePop3(host: String, port: Int, user: String, pass: String,
                  spoolDir: String, delete: Boolean = false,
                  statePath: String = null): Int = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    val ledger =
      if (delete) null
      else if (statePath != null) Paths.get(statePath)
      else dir.toAbsolutePath.normalize match {
        case d if d.getParent != null =>
          d.getParent.resolve(d.getFileName.toString + ".pop3-uidl")
        case d => d.resolve(".pop3-uidl") // filesystem root: nowhere else
      }
    val seen: scala.collection.mutable.Set[String] =
      if (ledger != null && Files.exists(ledger))
        scala.collection.mutable.Set.from(
          scala.jdk.CollectionConverters.ListHasAsScala(
            Files.readAllLines(ledger)).asScala.filter(_.nonEmpty))
      else scala.collection.mutable.Set.empty[String]
    val sock = new java.net.Socket(host, port)
    try {
      sock.setSoTimeout(30000)
      // ISO-8859-1 framing: byte <-> char is 1:1 in both directions, so
      // 8-bit message bodies spool octet-for-octet (UTF-8 decoding would
      // smash non-UTF-8 octets to U+FFFD); commands are ASCII either way
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream,
          java.nio.charset.StandardCharsets.ISO_8859_1))
      val out = sock.getOutputStream
      def send(s: String): Unit = { out.write((s + "\r\n").getBytes(UTF_8)); out.flush() }
      def ok(ctx: String): String = {
        val r = in.readLine()
        require(r != null && r.startsWith("+OK"), s"POP3 $ctx: got '$r'")
        r
      }
      ok("greeting")
      send(s"USER $user"); ok("USER")
      send(s"PASS $pass"); ok("PASS")
      send("STAT")
      val n = ok("STAT").split(" ")(1).toInt
      // retain mode: UIDL map (msg number → unique-id); -ERR → no map
      val uidOf: Map[Int, String] =
        if (ledger == null || n == 0) Map.empty
        else {
          send("UIDL")
          val r = in.readLine()
          if (r == null || !r.startsWith("+OK")) Map.empty
          else {
            val b = Map.newBuilder[Int, String]
            var l = in.readLine()
            while (l != null && l != ".") {
              l.split(" ", 2) match {
                case Array(num, uid) if num.forall(_.isDigit) => b += (num.toInt -> uid)
                case _ => ()
              }
              l = in.readLine()
            }
            b.result()
          }
        }
      var spooled = 0
      var i = 1
      while (i <= n) {
        if (uidOf.get(i).exists(seen.contains)) { i += 1 }
        else {
        send(s"RETR $i"); ok(s"RETR $i")
        val sb = new StringBuilder
        var line = in.readLine()
        while (line != null && line != ".") {
          // §3: the client strips the stuffed leading dot
          sb.append(if (line.startsWith("..")) line.substring(1) else line)
          sb.append("\r\n")
          line = in.readLine()
        }
        require(line != null, s"POP3 RETR $i: stream ended before terminator")
        val name = s"${System.currentTimeMillis()}-${seq.getAndIncrement()}-msg$i.eml"
        val tmp = dir.resolve(name + ".tmp")
        Files.write(tmp, sb.toString.getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1))
        Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
        spooled += 1
        if (delete) { send(s"DELE $i"); ok(s"DELE $i") }
        // ledger append strictly AFTER the spool rename (at-least-once)
        uidOf.get(i).foreach { u =>
          Files.writeString(ledger, u + "\n",
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.APPEND)
          seen += u
        }
        i += 1
        }
      }
      send("QUIT"); ok("QUIT") // UPDATE state: deletions commit here
      spooled
    } finally { try sock.close() catch { case _: Throwable => () } }
  }

  /** Poll loop for flow wiring: a drain pass every `pollMs` until
    * stop(). A failed pass (server briefly down) is retried at the
    * next tick rather than killing the poller — the accept-loop
    * robustness contract of the Listen* family. */
  def pollPop3(host: String, port: Int, user: String, pass: String,
               spoolDir: String, pollMs: Long = 1000L,
               delete: Boolean = false, statePath: String = null): Pop3Poller = {
    val stop = new AtomicBoolean(false)
    val t = new Thread(() => {
      while (!stop.get()) {
        try consumePop3(host, port, user, pass, spoolDir, delete, statePath)
        catch {
          case _: InterruptedException => ()
          case _: Exception => () // transient server failure: retry next tick
        }
        try Thread.sleep(pollMs) catch { case _: InterruptedException => () }
      }
    }, "graft-pop3-poll")
    t.setDaemon(true)
    t.start()
    new Pop3Poller(stop, t)
  }
}
