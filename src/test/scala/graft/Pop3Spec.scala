package graft

import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** Minimal in-process POP3 server (RFC 1939, JDK sockets) — test
  * infrastructure; the PRODUCT side is [[graft.streaming.Pop3]]'s
  * hand-rolled client. Session semantics per the RFC: message numbers
  * are fixed at session start, DELE only MARKS, deletions commit at
  * QUIT (UPDATE state), RSET unmarks; server byte-stuffs lines
  * starting with `.` on RETR. */
final class MiniPop3Server(user: String = "u", pass: String = "p",
                           supportUidl: Boolean = true) {
  private val mailbox = new java.util.ArrayList[String]() // message bodies (CRLF text)
  private val uids = new java.util.ArrayList[String]()    // §7 unique-ids, parallel
  private val uidSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private val control = new ServerSocket(0, 10, InetAddress.getLoopbackAddress)
  @volatile private var running = true
  def port: Int = control.getLocalPort
  def deliver(msg: String): Unit = mailbox.synchronized {
    mailbox.add(msg); uids.add(s"uid-${uidSeq.incrementAndGet()}"); ()
  }
  def messageCount: Int = mailbox.synchronized(mailbox.size)
  def stop(): Unit = { running = false; try control.close() catch { case _: Exception => () } }

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = control.accept()
        val t = new Thread(() => session(s), "minipop3-session")
        t.setDaemon(true); t.start()
      } catch { case _: Exception => () }
    }
  }, "minipop3-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def session(sock: Socket): Unit = {
    // latin-1 framing: a real 8BITMIME server ships raw octets — the
    // 1:1 byte<->char charset keeps high bytes intact on the wire
    val L1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(sock.getInputStream, L1))
    val out = sock.getOutputStream
    def reply(s: String): Unit = { out.write((s + "\r\n").getBytes(L1)); out.flush() }
    // session snapshot: numbering is stable for the whole session
    val (snapshot, snapUids) = mailbox.synchronized {
      (scala.collection.mutable.ArrayBuffer.from(
         scala.jdk.CollectionConverters.ListHasAsScala(mailbox).asScala),
       scala.collection.mutable.ArrayBuffer.from(
         scala.jdk.CollectionConverters.ListHasAsScala(uids).asScala))
    }
    val deleted = scala.collection.mutable.Set.empty[Int]
    var authedUser = false; var authed = false
    try {
      reply("+OK minipop3 ready")
      var line = in.readLine()
      while (line != null && running) {
        val (cmd, arg) = line.split(" ", 2) match {
          case Array(c, a) => (c.toUpperCase, a)
          case Array(c)    => (c.toUpperCase, "")
        }
        cmd match {
          case "USER" => authedUser = arg == user; reply("+OK send PASS")
          case "PASS" =>
            authed = authedUser && arg == pass
            reply(if (authed) "+OK mailbox open" else "-ERR auth failed")
          case _ if !authed => reply("-ERR log in first")
          case "STAT" =>
            val live = snapshot.indices.filterNot(deleted)
            reply(s"+OK ${live.size} ${live.map(i => snapshot(i).length).sum}")
          case "LIST" =>
            reply("+OK scan listing")
            snapshot.indices.filterNot(deleted).foreach(i =>
              reply(s"${i + 1} ${snapshot(i).length}"))
            reply(".")
          case "RETR" =>
            val i = arg.trim.toInt - 1
            if (i < 0 || i >= snapshot.length || deleted(i)) reply("-ERR no such message")
            else {
              reply("+OK message follows")
              snapshot(i).split("\r\n", -1).foreach { l =>
                reply(if (l.startsWith(".")) "." + l else l) // §3 stuffing
              }
              reply(".")
            }
          case "DELE" =>
            val i = arg.trim.toInt - 1
            if (i < 0 || i >= snapshot.length || deleted(i)) reply("-ERR no such message")
            else { deleted += i; reply("+OK marked") }
          case "UIDL" =>
            if (!supportUidl) reply("-ERR UIDL not supported")
            else {
              reply("+OK")
              snapshot.indices.filterNot(deleted).foreach(i =>
                reply(s"${i + 1} ${snapUids(i)}"))
              reply(".")
            }
          case "RSET" => deleted.clear(); reply("+OK")
          case "QUIT" =>
            // UPDATE state: commit marked deletions against the LIVE box
            mailbox.synchronized {
              deleted.toSeq.sorted.reverse.foreach { i =>
                val idx = mailbox.indexOf(snapshot(i))
                if (idx >= 0) mailbox.remove(idx)
              }
            }
            reply("+OK bye"); return
          case _ => reply("-ERR not implemented")
        }
        line = in.readLine()
      }
    } catch { case _: Exception => () }
    finally { try sock.close() catch { case _: Exception => () } }
  }
}

/** Live-wire gates for the POP3 retrieval edge. RETR numbering, dot
  * un-stuffing, QUIT-commit deletion semantics and the poll loop are
  * all driven against the independent in-spec server above. */
class Pop3Spec extends SparkSpec {
  import graft.streaming.Pop3

  private def spoolFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.list(dir)
    try {
      val it = s.iterator(); val b = Seq.newBuilder[java.nio.file.Path]
      while (it.hasNext) b += it.next()
      b.result().sortBy(_.getFileName.toString)
    } finally s.close()
  }

  test("drain retrieves every message verbatim, including dot-stuffed lines") {
    val srv = new MiniPop3Server()
    val spool = Files.createTempDirectory("graft_pop3")
    try {
      srv.deliver("Subject: one\r\n\r\nhello")
      srv.deliver("Subject: two\r\n\r\n.leading dot line\r\nbody") // stuffing round-trip
      val n = Pop3.consumePop3("127.0.0.1", srv.port, "u", "p", spool.toString)
      assert(n == 2)
      val files = spoolFiles(spool)
      assert(files.size == 2)
      assert(new String(Files.readAllBytes(files(0)), UTF_8)
        == "Subject: one\r\n\r\nhello\r\n")
      assert(new String(Files.readAllBytes(files(1)), UTF_8)
        == "Subject: two\r\n\r\n.leading dot line\r\nbody\r\n")
      assert(!files.exists(_.getFileName.toString.endsWith(".tmp")))
      // delete = false (default): the mailbox is retained (RFC retain mode)
      assert(srv.messageCount == 2)
    } finally { srv.stop() }
  }

  test("8-bit message bodies spool octet-for-octet (latin-1 framing)") {
    val srv = new MiniPop3Server()
    val spool = Files.createTempDirectory("graft_pop3_8bit")
    try {
      // every high byte value except CR/LF (protocol framing) — an
      // 8BITMIME body; UTF-8 framing would smash these to U+FFFD
      val body = (128 to 255).map(_.toChar).mkString
      srv.deliver(s"Subject: bits\r\n\r\n$body")
      assert(Pop3.consumePop3("127.0.0.1", srv.port, "u", "p", spool.toString) == 1)
      val got = Files.readAllBytes(spoolFiles(spool).head)
      val want = s"Subject: bits\r\n\r\n$body\r\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      assert(java.util.Arrays.equals(got, want), "octets must round-trip")
    } finally srv.stop()
  }

  test("retain mode is UIDL-idempotent: repeat polls spool nothing; new mail only; no-UIDL falls back (r16)") {
    val srv = new MiniPop3Server()
    val spool = Files.createTempDirectory("graft_pop3u")
    try {
      srv.deliver("m1")
      srv.deliver("m2")
      assert(Pop3.consumePop3("127.0.0.1", srv.port, "u", "p", spool.toString) == 2)
      // second poll: ledger skips everything — the duplicate-flood fix
      assert(Pop3.consumePop3("127.0.0.1", srv.port, "u", "p", spool.toString) == 0)
      assert(spoolFiles(spool).size == 2)
      // new delivery: only it spools
      srv.deliver("m3")
      assert(Pop3.consumePop3("127.0.0.1", srv.port, "u", "p", spool.toString) == 1)
      assert(spoolFiles(spool).size == 3)
      // the ledger lives OUTSIDE the spool dir (file-stream readers
      // must never see it)
      assert(!spoolFiles(spool).exists(_.getFileName.toString.contains("uidl")))
      assert(Files.exists(spool.toAbsolutePath.getParent
        .resolve(spool.getFileName.toString + ".pop3-uidl")))
      // a server without UIDL: the documented legacy re-read path
      val legacy = new MiniPop3Server(supportUidl = false)
      val spool2 = Files.createTempDirectory("graft_pop3nu")
      try {
        legacy.deliver("x")
        assert(Pop3.consumePop3("127.0.0.1", legacy.port, "u", "p", spool2.toString) == 1)
        assert(Pop3.consumePop3("127.0.0.1", legacy.port, "u", "p", spool2.toString) == 1)
        assert(spoolFiles(spool2).size == 2)
      } finally legacy.stop()
    } finally srv.stop()
  }

  test("delete mode commits at QUIT; bad credentials fail loudly") {
    val srv = new MiniPop3Server()
    val spool = Files.createTempDirectory("graft_pop3d")
    try {
      srv.deliver("a")
      srv.deliver("b")
      val n = Pop3.consumePop3("127.0.0.1", srv.port, "u", "p", spool.toString,
        delete = true)
      assert(n == 2)
      assert(srv.messageCount == 0) // committed in UPDATE state
      val err = intercept[IllegalArgumentException] {
        Pop3.consumePop3("127.0.0.1", srv.port, "u", "wrong", spool.toString)
      }
      assert(err.getMessage.contains("PASS"))
    } finally srv.stop()
  }

  test("poll loop ingests late arrivals and survives a server restart gap") {
    val srv = new MiniPop3Server()
    val spool = Files.createTempDirectory("graft_pop3p")
    val poller = Pop3.pollPop3("127.0.0.1", srv.port, "u", "p", spool.toString,
      pollMs = 50L, delete = true)
    try {
      srv.deliver("first")
      val t0 = System.currentTimeMillis()
      while (spoolFiles(spool).isEmpty && System.currentTimeMillis() - t0 < 5000)
        Thread.sleep(20)
      assert(spoolFiles(spool).size == 1)
      srv.deliver("second") // arrives AFTER the first drain
      val t1 = System.currentTimeMillis()
      while (spoolFiles(spool).size < 2 && System.currentTimeMillis() - t1 < 5000)
        Thread.sleep(20)
      assert(spoolFiles(spool).size == 2)
    } finally { poller.stop(); srv.stop() }
  }

  test("ConsumePOP3 wires as a flow listener") {
    val srv = new MiniPop3Server()
    val spool = Files.createTempDirectory("graft_pop3f")
    val flow = FlowCompiler.parse(
      s"""{"flowContents": {
         |  "processors": [
         |    {"identifier": "c", "type": "ConsumePOP3",
         |     "properties": {"Host": "127.0.0.1", "Port": "${srv.port}",
         |                    "Username": "u", "Password": "p",
         |                    "Poll Interval Ms": "50",
         |                    "Spool Directory": "${spool.toString}"}}],
         |  "outputPorts": [], "connections": []}}""".stripMargin)
    val ls = FlowCompiler.startListeners(flow)
    try {
      assert(ls.size == 1 && ls.head.tpe == "ConsumePOP3")
      srv.deliver("flow message")
      val t0 = System.currentTimeMillis()
      while (spoolFiles(spool).isEmpty && System.currentTimeMillis() - t0 < 5000)
        Thread.sleep(20)
      assert(new String(Files.readAllBytes(spoolFiles(spool).head), UTF_8)
        == "flow message\r\n")
    } finally { ls.foreach(_.stop()); srv.stop() }
  }
}
