package graft

import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Imap

/** Minimal in-process IMAP server (RFC 3501 subset, JDK sockets) —
  * test infrastructure; the PRODUCT side is [[graft.streaming.Imap]]'s
  * hand-rolled client. Semantics per the RFC: UIDs are assigned
  * monotonically and never reused (UIDNEXT), `\Deleted` is only a flag
  * until EXPUNGE removes the flagged messages, literals are
  * byte-counted (`{n}` + CRLF + exactly n octets — 8-bit transparent,
  * no dot-stuffing anywhere in the protocol). */
final class MiniImapServer(user: String = "u", pass: String = "p",
                           failExpunge: Boolean = false) {
  private val L1 = java.nio.charset.StandardCharsets.ISO_8859_1
  // (uid, flags, payload)
  private val box = scala.collection.mutable.ArrayBuffer.empty[
    (Long, scala.collection.mutable.Set[String], Array[Byte])]
  private var uidNext = 1L
  private val control = new ServerSocket(0, 10, InetAddress.getLoopbackAddress)
  @volatile private var running = true
  def port: Int = control.getLocalPort
  def deliver(msg: Array[Byte]): Long = box.synchronized {
    val uid = uidNext; uidNext += 1
    box += ((uid, scala.collection.mutable.Set.empty[String], msg))
    uid
  }
  def deliver(msg: String): Long = deliver(msg.getBytes(L1))
  def messageCount: Int = box.synchronized(box.size)
  def flagsOf(uid: Long): Set[String] =
    box.synchronized(box.find(_._1 == uid).map(_._2.toSet).getOrElse(Set.empty))
  def stop(): Unit = { running = false; try control.close() catch { case _: Exception => () } }

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = control.accept()
        val t = new Thread(() => session(s), "miniimap-session")
        t.setDaemon(true); t.start()
      } catch { case _: Exception => () }
    }
  }, "miniimap-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def session(sock: Socket): Unit = {
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(sock.getInputStream, L1))
    val out = sock.getOutputStream
    def reply(s: String): Unit = { out.write((s + "\r\n").getBytes(L1)); out.flush() }
    var authed = false
    var selected = false
    try {
      reply("* OK miniimap IMAP4rev1 ready")
      var line = in.readLine()
      while (line != null && running) {
        val parts = line.split(" ", 3)
        val tag = parts(0)
        val cmd = if (parts.length > 1) parts(1).toUpperCase else ""
        val arg = if (parts.length > 2) parts(2) else ""
        cmd match {
          case "LOGIN" =>
            val creds = "\"([^\"]*)\"\\s+\"([^\"]*)\"".r.findFirstMatchIn(arg)
            authed = creds.exists(m => m.group(1) == user && m.group(2) == pass)
            reply(if (authed) s"$tag OK LOGIN completed"
                  else s"$tag NO LOGIN failed")
          case "SELECT" if authed =>
            selected = true
            box.synchronized {
              reply(s"* ${box.size} EXISTS")
              reply(s"* OK [UIDVALIDITY 1] UIDs valid")
              reply(s"* OK [UIDNEXT $uidNext] predicted next UID")
            }
            reply(s"$tag OK [READ-WRITE] SELECT completed")
          case "UID" if authed && selected =>
            val sub = arg.split(" ", 2)
            sub(0).toUpperCase match {
              case "SEARCH" =>
                val crit = sub(1).trim.toUpperCase
                val hits = box.synchronized {
                  crit match {
                    case "ALL" => box.map(_._1).toSeq
                    case "UNSEEN" => box.filterNot(_._2.contains("\\Seen")).map(_._1).toSeq
                    case _ => Seq.empty
                  }
                }
                reply(("* SEARCH" +: hits.map(_.toString)).mkString(" "))
                reply(s"$tag OK SEARCH completed")
              case "FETCH" =>
                val m = "^(\\d+)\\s+\\((BODY\\.PEEK\\[\\]|BODY\\[\\])\\)$".r
                  .findFirstMatchIn(sub(1).trim)
                m match {
                  case Some(g) =>
                    val uid = g.group(1).toLong
                    val peek = g.group(2).startsWith("BODY.PEEK")
                    box.synchronized {
                      val idx = box.indexWhere(_._1 == uid)
                      if (idx >= 0) {
                        val (u, flags, bytes) = box(idx)
                        // RFC 3501 §6.4.5: BODY[] (without .PEEK) sets \Seen
                        if (!peek) flags += "\\Seen"
                        out.write(s"* ${idx + 1} FETCH (UID $u BODY[] {${bytes.length}}\r\n"
                          .getBytes(L1))
                        out.write(bytes)
                        out.write(")\r\n".getBytes(L1))
                        out.flush()
                      }
                    }
                    reply(s"$tag OK FETCH completed")
                  case None => reply(s"$tag BAD unsupported FETCH form")
                }
              case "STORE" =>
                val m = "^(\\d+)\\s+\\+FLAGS(?:\\.SILENT)?\\s+\\((\\\\\\w+)\\)$".r
                  .findFirstMatchIn(sub(1).trim)
                m match {
                  case Some(g) =>
                    box.synchronized {
                      box.find(_._1 == g.group(1).toLong).foreach(_._2 += g.group(2))
                    }
                    reply(s"$tag OK STORE completed")
                  case None => reply(s"$tag BAD unsupported STORE form")
                }
              case other => reply(s"$tag BAD UID $other unsupported")
            }
          case "EXPUNGE" if authed && selected =>
            if (failExpunge) reply(s"$tag NO EXPUNGE refused")
            else {
              box.synchronized {
                val victims = box.zipWithIndex
                  .filter(_._1._2.contains("\\Deleted")).map(_._2).reverse
                victims.foreach { i =>
                  reply(s"* ${i + 1} EXPUNGE")
                  box.remove(i)
                }
              }
              reply(s"$tag OK EXPUNGE completed")
            }
          case "LOGOUT" =>
            reply("* BYE miniimap terminating")
            reply(s"$tag OK LOGOUT completed")
            return
          case _ => reply(s"$tag BAD unsupported or bad state")
        }
        line = in.readLine()
      }
    } catch { case _: Exception => () }
    finally { try sock.close() catch { case _: Exception => () } }
  }
}

/** Live-wire gates for ConsumeIMAP (r15 verdict task 3): byte-exact
  * literal framing, server-side \Seen idempotence across polls, the
  * EXPUNGE commit point, UID monotonicity, and the flow vocabulary. */
class ImapSpec extends AnyFunSuite {
  private val L1 = java.nio.charset.StandardCharsets.ISO_8859_1

  private def spooledFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".eml"))
      .sortBy(_.getName).toSeq

  test("literal framing is byte-exact: 8-bit octets, CRLF, bare dots, {n}-lookalikes") {
    val srv = new MiniImapServer()
    try {
      val spool = Files.createTempDirectory("graft_imap_bytes").toString
      // hostile payload: leading dot (POP3 would stuff it), a {12}
      // literal-lookalike, a high byte, CRLF and a bare LF
      val msg = "Subject: caf\u00e9\r\n\r\n.leading dot\r\n{12} fake literal\nhigh:\u00ff\r\n"
      val uid = srv.deliver(msg)
      assert(Imap.consumeImap("127.0.0.1", srv.port, "u", "p", spool) == 1)
      val f = spooledFiles(spool)
      assert(f.size == 1 && f.head.getName.contains(s"uid$uid"))
      assert(new String(Files.readAllBytes(f.head.toPath), L1) == msg,
        "spooled bytes must equal the delivered message octet-for-octet")
    } finally srv.stop()
  }

  test("retain mode: \\Seen carries cross-poll dedup state on the SERVER; UIDs monotonic") {
    val srv = new MiniImapServer()
    try {
      val spool = Files.createTempDirectory("graft_imap_seen").toString
      (1 to 3).foreach(i => srv.deliver(s"msg $i\r\n"))
      assert(Imap.consumeImap("127.0.0.1", srv.port, "u", "p", spool) == 3)
      // second poll: nothing unseen, nothing spooled
      assert(Imap.consumeImap("127.0.0.1", srv.port, "u", "p", spool) == 0)
      assert(spooledFiles(spool).size == 3)
      // new delivery gets the next uid and is the only one re-ingested
      val u4 = srv.deliver("msg 4\r\n")
      assert(u4 == 4L, "UIDs must be monotonic, never reused")
      assert(Imap.consumeImap("127.0.0.1", srv.port, "u", "p", spool) == 1)
      val names = spooledFiles(spool).map(_.getName)
      assert(names.size == 4 && names.count(_.contains("uid4")) == 1)
      // the mailbox itself is untouched in retain mode
      assert(srv.messageCount == 4)
    } finally srv.stop()
  }

  test("delete mode: spool-all then EXPUNGE empties the mailbox") {
    val srv = new MiniImapServer()
    try {
      val spool = Files.createTempDirectory("graft_imap_del").toString
      (1 to 3).foreach(i => srv.deliver(s"purge me $i\r\n"))
      assert(Imap.consumeImap("127.0.0.1", srv.port, "u", "p", spool,
        delete = true) == 3)
      assert(spooledFiles(spool).size == 3)
      assert(srv.messageCount == 0, "EXPUNGE must remove the spooled messages")
    } finally srv.stop()
  }

  test("EXPUNGE is the commit point: a refused expunge leaves the mailbox intact, spool already safe") {
    val srv = new MiniImapServer(failExpunge = true)
    try {
      val spool = Files.createTempDirectory("graft_imap_commit").toString
      val u1 = srv.deliver("survives\r\n")
      intercept[IllegalArgumentException] {
        Imap.consumeImap("127.0.0.1", srv.port, "u", "p", spool, delete = true)
      }
      // \Deleted is only a flag until EXPUNGE: message still present
      assert(srv.messageCount == 1)
      assert(srv.flagsOf(u1).contains("\\Deleted"))
      // at-least-once: the spool rename happened before the marker
      assert(spooledFiles(spool).size == 1)
    } finally srv.stop()
  }

  test("bad credentials fail loudly; flow vocabulary polls into the spool") {
    val srv = new MiniImapServer(user = "mail", pass = "s3cret")
    try {
      val spool = Files.createTempDirectory("graft_imap_flow").toString
      intercept[IllegalArgumentException] {
        Imap.consumeImap("127.0.0.1", srv.port, "mail", "wrong", spool)
      }
      val flowJson =
        s"""{"flowContents": {"name": "imap-edge", "processors": [
           |  {"identifier": "p-imap", "name": "MailIn",
           |   "type": "org.apache.nifi.processors.standard.ConsumeIMAP",
           |   "properties": {"Host": "127.0.0.1", "Port": "${srv.port}",
           |     "Username": "mail", "Password": "s3cret",
           |     "Spool Directory": "$spool", "Poll Interval Ms": "100"}}
           |], "connections": []}}""".stripMargin
      val listeners = FlowCompiler.startListeners(FlowCompiler.parse(flowJson), Map.empty)
      assert(listeners.map(_.tpe) == Seq("ConsumeIMAP"))
      try {
        srv.deliver("flow delivery\r\n")
        val deadline = System.currentTimeMillis() + 20000
        while (spooledFiles(spool).isEmpty && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        val f = spooledFiles(spool)
        assert(f.nonEmpty, "poller must spool the delivered message")
        assert(new String(Files.readAllBytes(f.head.toPath), L1) == "flow delivery\r\n")
      } finally listeners.foreach(_.stop())
    } finally srv.stop()
  }
}
