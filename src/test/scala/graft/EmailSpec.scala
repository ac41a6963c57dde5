package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import graft.operators.Parse
import graft.streaming.{Smtp, Streams}

/** Live-wire gates for the email edge (ListenSMTP / PutEmail /
  * ExtractEmailAttachments): a real RFC 5321 session over a real
  * socket on both sides — the same posture as FtpSpec/SftpSpec. */
class EmailSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_email_$tag").toString

  test("listenSmtp: raw RFC 5321 session spools messages, dot-unstuffed") {
    val spool = freshDir("listen")
    val l = Smtp.listenSmtp(0, spool, batchSize = 1)
    try {
      val sock = new java.net.Socket("127.0.0.1", l.port)
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(sock.getInputStream, UTF_8))
      val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(sock.getOutputStream, UTF_8))
      def cmd(s: String, code: String): Unit = {
        if (s != null) { out.print(s + "\r\n"); out.flush() }
        val r = in.readLine(); assert(r != null && r.startsWith(code), s"'$s' -> '$r'")
      }
      cmd(null, "220")
      cmd("EHLO tester", "250")
      cmd("MAIL FROM:<a@x>", "250")
      cmd("RCPT TO:<b@y>", "250")
      cmd("RCPT TO:<c@z>", "250")
      out.print("DATA\r\n"); out.flush(); assert(in.readLine().startsWith("354"))
      out.print("Subject: hi\r\n\r\nline one\r\n..starts with dot\r\n.\r\n"); out.flush()
      assert(in.readLine().startsWith("250"))
      // pipelined second message on the same session
      cmd("MAIL FROM:<a2@x>", "250")
      cmd("RCPT TO:<b2@y>", "250")
      out.print("DATA\r\n"); out.flush(); assert(in.readLine().startsWith("354"))
      out.print("second\r\n.\r\n"); out.flush()
      assert(in.readLine().startsWith("250"))
      cmd("QUIT", "221")
      sock.close()

      // spool is JSON-lines; dot-unstuffing restored the literal dot line
      val got = spark.read.json(spool)
        .select(col("mail_from"), col("rcpt_to"), col("data"))
        .as[(String, Seq[String], String)].collect().sortBy(_._1)
      assert(got.length == 2)
      assert(got(0) == (("a2@x", Seq("b2@y"), "second\n")))
      assert(got(1)._2 == Seq("b@y", "c@z"))
      assert(got(1)._3 == "Subject: hi\n\nline one\n.starts with dot\n")
    } finally l.stop()
  }

  test("putEmail -> listenSmtp round-trip from executors, one conn per partition") {
    val spool = freshDir("put")
    val l = Smtp.listenSmtp(0, spool, batchSize = 1)
    try {
      val rows = Seq(
        ("u1@dest", "s1", "body one"),
        ("u2@dest", "s2", ".leading dot survives transport"),
        ("u3@dest", "s3", "multi\nline\n\nbody")
      ).toDF("to", "subject", "body").repartition(2)
      Smtp.putEmail(rows, "127.0.0.1", l.port, from = "graft@local")
      // listener flush is async on idle timeout — poll briefly
      val deadline = System.currentTimeMillis() + 5000
      def spooled() = spark.read.json(spool).count()
      while (spooled() < 3 && System.currentTimeMillis() < deadline) Thread.sleep(100)

      val got = spark.read.json(spool)
      assert(got.count() == 3)
      val parsed = Parse.extractEmailHeaders(got, "data", Seq("Subject", "To"))
        .select(col("email_subject"), col("email_to"), col("data"))
        .as[(String, String, String)].collect().sortBy(_._1)
      assert(parsed.map(_._1).toSeq == Seq("s1", "s2", "s3"))
      assert(parsed(0)._2 == "<u1@dest>")
      // dot-stuffing round-trip: the leading-dot body line is intact
      assert(parsed(1)._3.contains("\n.leading dot survives transport"))
      assert(parsed(2)._3.endsWith("multi\nline\n\nbody\n"))
      assert(got.select(col("mail_from")).distinct().as[String].collect().toSeq ==
        Seq("graft@local"))
    } finally l.stop()
  }

  test("flow vocabulary: ListenSMTP endpoint starts from flow JSON; PutEmail sink sends") {
    val spool = freshDir("flow") + "/spool"
    val flow = FlowCompiler.parse(
      s"""{"flowContents": {"name": "mailflow",
         |  "processors": [
         |    {"identifier": "ls", "name": "inbox", "type": "ListenSMTP",
         |     "properties": {"Listening Port": "0", "Spool Directory": "$spool"}},
         |    {"identifier": "pe", "name": "alert", "type": "PutEmail",
         |     "properties": {"SMTP Hostname": "127.0.0.1", "SMTP Port": "#{smtp.port}",
         |                    "From": "alerts@graft"}}],
         |  "inputPorts": [{"identifier": "i", "name": "alerts"}],
         |  "outputPorts": [{"identifier": "o", "name": "inbound"},
         |                  {"identifier": "o2", "name": "sent"}],
         |  "connections": [
         |    {"source": {"id": "ls"}, "destination": {"id": "o"}},
         |    {"source": {"id": "i"}, "destination": {"id": "pe"}},
         |    {"source": {"id": "pe"}, "destination": {"id": "o2"}}]}}""".stripMargin)
    val listeners = FlowCompiler.startListeners(flow, Map("smtp.port" -> "1"))
    assert(listeners.map(_.tpe) == Seq("ListenSMTP"))
    val port = listeners.head.port
    try {
      // the PutEmail leg posts INTO the flow's own ListenSMTP endpoint
      val outs = FlowCompiler.compile(spark, flow,
        Map("alerts" -> Seq(("ops@dest", "disk", "node7 at 91%")).toDF("to", "subject", "body")),
        Map("smtp.port" -> port.toString))
      assert(outs("sent").count() == 1) // sink executed on materialize
      val deadline = System.currentTimeMillis() + 5000
      while (spark.read.json(spool).count() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      // the inbound leg is a STREAMING source over the spool
      val inbound = outs("inbound")
      assert(inbound.isStreaming)
      val q = Streams.toMemorySink(inbound.select("mail_from", "data"), "smtp_flow_mem")
      try { q.processAllAvailable() } finally q.stop()
      val got = spark.table("smtp_flow_mem").as[(String, String)].collect()
      assert(got.length == 1)
      assert(got(0)._1 == "alerts@graft")
      assert(got(0)._2.contains("Subject: disk") && got(0)._2.contains("node7 at 91%"))
    } finally listeners.foreach(_.stop())
  }

  test("listenSmtp: DATA past maxMessageBytes gets 552 and the session stays usable") {
    val spool = freshDir("cap")
    val l = Smtp.listenSmtp(0, spool, batchSize = 1, maxMessageBytes = 64)
    try {
      val sock = new java.net.Socket("127.0.0.1", l.port)
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(sock.getInputStream, UTF_8))
      val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(sock.getOutputStream, UTF_8))
      def cmd(s: String, code: String): Unit = {
        if (s != null) { out.print(s + "\r\n"); out.flush() }
        val r = in.readLine(); assert(r != null && r.startsWith(code), s"'$s' -> '$r'")
      }
      cmd(null, "220")
      cmd("EHLO tester", "250")
      cmd("MAIL FROM:<big@x>", "250")
      cmd("RCPT TO:<b@y>", "250")
      out.print("DATA\r\n"); out.flush(); assert(in.readLine().startsWith("354"))
      // 40 lines x 10 chars >> the 64-byte cap: refused, NOT buffered
      (1 to 40).foreach(_ => out.print("0123456789\r\n"))
      out.print(".\r\n"); out.flush()
      assert(in.readLine().startsWith("552"))
      // the session is still in sync: a small message goes through
      cmd("MAIL FROM:<small@x>", "250")
      cmd("RCPT TO:<b@y>", "250")
      out.print("DATA\r\n"); out.flush(); assert(in.readLine().startsWith("354"))
      out.print("ok\r\n.\r\n"); out.flush()
      assert(in.readLine().startsWith("250"))
      cmd("QUIT", "221")
      sock.close()
      val got = spark.read.json(spool).select(col("mail_from")).as[String].collect()
      assert(got.toSeq == Seq("small@x"), "only the in-cap message may spool")
    } finally l.stop()
  }

  test("listenSmtp: one giant LINE can't buffer past the cap; long commands get 500") {
    val spool = freshDir("linecap")
    val l = Smtp.listenSmtp(0, spool, batchSize = 1, maxMessageBytes = 1024)
    try {
      val sock = new java.net.Socket("127.0.0.1", l.port)
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(sock.getInputStream, UTF_8))
      val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(sock.getOutputStream, UTF_8))
      def cmd(s: String, code: String): Unit = {
        if (s != null) { out.print(s + "\r\n"); out.flush() }
        val r = in.readLine(); assert(r != null && r.startsWith(code), s"'${Option(s).map(_.take(40))}' -> '$r'")
      }
      cmd(null, "220")
      // a 64 KiB command line: 500, session stays in sync
      cmd("X" * 65536, "500")
      cmd("EHLO tester", "250")
      cmd("MAIL FROM:<big@x>", "250")
      cmd("RCPT TO:<b@y>", "250")
      out.print("DATA\r\n"); out.flush(); assert(in.readLine().startsWith("354"))
      // ONE newline-less 8 MiB payload line against a 1 KiB cap: must be
      // refused (bounded reader truncates; nothing past the cap buffers)
      out.print("Y" * (8 << 20)); out.print("\r\n.\r\n"); out.flush()
      assert(in.readLine().startsWith("552"))
      cmd("QUIT", "221")
      sock.close()
      assert(new java.io.File(spool).listFiles() == null ||
        new java.io.File(spool).listFiles().isEmpty, "nothing may spool")
    } finally l.stop()
  }

  test("listenSmtp: connections past maxConnections are greeted with 421") {
    val spool = freshDir("conncap")
    val l = Smtp.listenSmtp(0, spool, maxConnections = 1)
    try {
      val first = new java.net.Socket("127.0.0.1", l.port)
      val in1 = new java.io.BufferedReader(new java.io.InputStreamReader(first.getInputStream, UTF_8))
      assert(in1.readLine().startsWith("220")) // session 1 holds its slot
      val second = new java.net.Socket("127.0.0.1", l.port)
      val in2 = new java.io.BufferedReader(new java.io.InputStreamReader(second.getInputStream, UTF_8))
      val greet2 = in2.readLine()
      assert(greet2 != null && greet2.startsWith("421"), s"expected 421, got '$greet2'")
      second.close()
      first.close()
      // slot frees once session 1 ends — next peer gets a normal greeting
      val deadline = System.currentTimeMillis() + 5000
      var greet3: String = null
      while ((greet3 == null || !greet3.startsWith("220")) &&
             System.currentTimeMillis() < deadline) {
        val s3 = new java.net.Socket("127.0.0.1", l.port)
        val in3 = new java.io.BufferedReader(new java.io.InputStreamReader(s3.getInputStream, UTF_8))
        greet3 = in3.readLine()
        s3.close()
        if (greet3 == null || !greet3.startsWith("220")) Thread.sleep(50)
      }
      assert(greet3 != null && greet3.startsWith("220"))
    } finally l.stop()
  }

  test("putEmail: CRLF in a recipient is rejected; CRLF in a subject is folded") {
    val spool = freshDir("inject")
    val l = Smtp.listenSmtp(0, spool, batchSize = 1)
    try {
      // header-injection subject arrives folded to one line
      Smtp.putEmail(
        Seq(("ok@dest", "hi\r\nBcc: evil@x", "body")).toDF("to", "subject", "body"),
        "127.0.0.1", l.port, from = "graft@local")
      val deadline = System.currentTimeMillis() + 5000
      while (spark.read.json(spool).count() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val data = spark.read.json(spool).select(col("data")).as[String].collect().head
      assert(data.contains("Subject: hi Bcc: evil@x"), "subject must fold, not inject")
      assert(!data.contains("\nBcc:"), "no injected header line")
      // a recipient smuggling SMTP commands fails the task loudly
      val bad = Seq(("a@x>\r\nMAIL FROM:<evil", "s", "b")).toDF("to", "subject", "body")
      val e = intercept[org.apache.spark.SparkException] {
        Smtp.putEmail(bad, "127.0.0.1", l.port, from = "graft@local")
      }
      assert(e.getMessage.contains("recipient") ||
        Option(e.getCause).exists(_.getMessage.contains("recipient")))
    } finally l.stop()
  }

  test("extractEmailAttachments: malformed QP is literal; mid-line boundary text survives") {
    val msg =
      s"""Content-Type: multipart/mixed; boundary="BN"
         |
         |--BN
         |Content-Disposition: attachment; filename="a.txt"
         |Content-Transfer-Encoding: quoted-printable
         |
         |bad escape =ZZ stays, trailing =
         |--BN
         |Content-Disposition: attachment; filename="b.txt"
         |
         |this line mentions --BN mid-line and must not split
         |--BN--""".stripMargin
    val atts = Parse.extractEmailAttachments(Seq((1L, msg)).toDF("id", "msg"), "msg")
      .select(col("attach_name"), col("attach_bytes")).collect()
      .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), UTF_8)).toMap
    assert(atts("a.txt") == "bad escape =ZZ stays, trailing =",
      "invalid QP escapes must pass through literally, not throw")
    assert(atts("b.txt") == "this line mentions --BN mid-line and must not split",
      "RFC 2046: only a line-leading dash-boundary delimits parts")
  }

  test("extractEmailAttachments: base64 + quoted-printable parts, inline body skipped") {
    val payload = Array[Byte](1, 2, 3, -128, 127, 0)
    val b64 = java.util.Base64.getEncoder.encodeToString(payload)
    val msg =
      s"""From: <a@x>
         |Content-Type: multipart/mixed; boundary="BNDRY"
         |
         |preamble ignored
         |--BNDRY
         |Content-Type: text/plain
         |
         |inline body, no filename -> skipped
         |--BNDRY
         |Content-Type: application/octet-stream; name="blob.bin"
         |Content-Disposition: attachment; filename="blob.bin"
         |Content-Transfer-Encoding: base64
         |
         |$b64
         |--BNDRY
         |Content-Type: text/csv
         |Content-Disposition: attachment; filename="t.csv"
         |Content-Transfer-Encoding: quoted-printable
         |
         |a,b=3Dc,caf=C3=A9
         |--BNDRY--
         |epilogue""".stripMargin
    val df = Seq((1L, msg), (2L, "Subject: not multipart\n\nplain")).toDF("id", "msg")
    val atts = Parse.extractEmailAttachments(df, "msg")
      .select(col("id"), col("attach_name"), col("attach_type"), col("attach_bytes"))
      .as[(Long, String, String, Array[Byte])].collect().sortBy(_._2)
    assert(atts.length == 2)
    assert(atts.forall(_._1 == 1L))
    val blob = atts.find(_._2 == "blob.bin").get
    assert(blob._3 == "application/octet-stream")
    assert(blob._4.toSeq == payload.toSeq)
    val csv = atts.find(_._2 == "t.csv").get
    assert(csv._3 == "text/csv")
    assert(new String(csv._4, UTF_8) == "a,b=c,café")
  }

  test("TLS: SMTPS putEmail -> listenSmtp round-trip; a plaintext client dies pre-banner, nothing spools") {
    val spool = freshDir("tls")
    val l = Smtp.listenSmtp(0, spool, batchSize = 1,
      ssl = Some(TestKeystore.sslContext))
    try {
      Smtp.putEmail(Seq(("u@dest", "tls subject", "secured body"))
          .toDF("to", "subject", "body"),
        "127.0.0.1", l.port, from = "graft@local",
        keystore = Some((TestKeystore.path, TestKeystore.password)))
      val deadline = System.currentTimeMillis() + 5000
      while (spark.read.json(spool).count() < 1 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      val got = spark.read.json(spool)
        .select(col("mail_from"), col("data")).as[(String, String)].collect()
      assert(got.length == 1)
      assert(got(0)._1 == "graft@local")
      assert(got(0)._2.contains("secured body"))
      // plaintext client: the 220 banner write triggers the handshake,
      // which dies on the peer's non-TLS bytes — session spools nothing
      val sock = new java.net.Socket("127.0.0.1", l.port)
      try {
        sock.setSoTimeout(5000)
        sock.getOutputStream.write("EHLO plain\r\n".getBytes(UTF_8))
        sock.getOutputStream.flush()
        // server closes without a parseable SMTP banner; reading to EOF
        // (or a reset) is the observable refusal
        val r = try sock.getInputStream.readAllBytes()
                catch { case _: java.io.IOException => Array.empty[Byte] }
        assert(!new String(r, UTF_8).startsWith("220"),
          "a plaintext session must not get the SMTP banner")
      } finally sock.close()
      assert(spark.read.json(spool).count() == 1, "plaintext must not spool")
    } finally l.stop()
  }
}
