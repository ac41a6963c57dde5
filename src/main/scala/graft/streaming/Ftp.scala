package graft.streaming

import java.io.{BufferedReader, InputStreamReader}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.Locale
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** ListenFTP (NiFi 1.12+, `org.apache.nifi.processors.standard.ListenFTP`):
  * an UPLOAD-ONLY FTP server — clients STOR files, each upload becomes
  * one flow payload; downloads, deletes and renames are refused, which
  * is NiFi's documented contract for this processor (it is an ingress
  * edge, not a file share). RFC 959 subset spoken: USER/PASS (blank
  * configured credentials = anonymous, NiFi's optional-login
  * behavior), SYST, FEAT, TYPE/MODE/STRU/NOOP, PWD/CWD/CDUP (virtual —
  * uploads flatten to their basename; NiFi ingests the file wherever
  * the client thinks it cd'd), PASV + EPSV data connections, STOR,
  * QUIT. Everything else answers 502/550.
  *
  * Spool contract (the Listen* family discipline — [[Net.listenTcp]],
  * [[Smtp]], [[Ws]]): each STOR streams to a `.tmp` in `spoolDir` and
  * lands by ATOMIC_MOVE under `<millis>-<seq>-<basename>` only after
  * the data connection closes cleanly — a consumer of the directory
  * never sees a partial upload, arrival order is recoverable from the
  * name, and the client's filename (NiFi's `filename` attribute)
  * survives as the suffix. The flow SOURCE is a binary file stream
  * over the spool, so ingestion is exactly-once from the spool onward
  * and survives restarts. Single-receiver ingress — front with a
  * distributed log at scale; the downstream flow binds to the
  * directory, not the socket.
  *
  * Robustness: the accept loop catches IOException unconditionally
  * and keeps accepting (a transient failure must not silently kill
  * the listener — the r15 ADVICE contract); per-session failures
  * close that session only; a STOR whose data connection dies
  * mid-transfer leaves nothing in the spool (the tmp is discarded).
  */
object Ftp {

  final class FtpListener(server: ServerSocket, stopFlag: AtomicBoolean) {
    def port: Int = server.getLocalPort
    def stop(): Unit = {
      stopFlag.set(true)
      try server.close() catch { case _: Exception => () }
    }
  }

  def listenFtp(port: Int, spoolDir: String,
                user: String = "", pass: String = "",
                ssl: Option[javax.net.ssl.SSLContext] = None): FtpListener = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    // `ssl` = implicit FTPS (NiFi ListenFTP's 'SSL Context Service'
    // slot): BOTH the control connection and every PASV/EPSV data
    // connection run under the same TLS context — uploads are never
    // cleartext when the listener is secured. A plaintext client dies
    // in the TLS record layer before USER parses (the listener-family
    // plaintext-refusal gate); its session catches IOException and
    // nothing spools.
    def serverSocket(p: Int, backlog: Int): ServerSocket = ssl match {
      case Some(ctx) => ctx.getServerSocketFactory
        .createServerSocket(p, backlog, InetAddress.getLoopbackAddress)
      case None => new ServerSocket(p, backlog, InetAddress.getLoopbackAddress)
    }
    val server = serverSocket(port, 50)
    val stop = new AtomicBoolean(false)
    val seq = new AtomicLong(0L)

    def session(sock: Socket): Unit = {
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
      val out = sock.getOutputStream
      def reply(s: String): Unit = { out.write((s + "\r\n").getBytes("UTF-8")); out.flush() }
      var cwd = "/"
      // anonymous access only when BOTH credentials are blank: a
      // configured Password with a blank Username must still demand a
      // login, not silently grant upload access (r16, ADVICE); and
      // credential checks are constant-time — a byte-compare early-out
      // leaks prefix length to a timing probe
      def ctEq(a: String, b: String): Boolean =
        java.security.MessageDigest.isEqual(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      var loggedIn = user.isEmpty && pass.isEmpty
      var userOk = user.isEmpty
      var dataSock: Option[ServerSocket] = None
      def openData(): Option[Socket] = dataSock match {
        case None => reply("425 use PASV first"); None
        case Some(ss) =>
          try {
            ss.setSoTimeout(30000) // a client that never dials must not
            val s = ss.accept()    // wedge the session thread forever
            Some(s)
          } catch {
            case _: java.net.SocketTimeoutException =>
              reply("425 data connection timeout"); None
          } finally {
            try ss.close() catch { case _: Exception => () }
            dataSock = None
          }
      }
      try {
        reply("220 graft ListenFTP (upload-only)")
        var line = in.readLine()
        while (line != null && !stop.get()) {
          val (cmd, arg) = line.split(" ", 2) match {
            case Array(c, a) => (c.toUpperCase(Locale.ROOT), a)
            case Array(c)    => (c.toUpperCase(Locale.ROOT), "")
          }
          cmd match {
            case "USER" =>
              userOk = user.isEmpty || ctEq(arg, user)
              reply("331 password required")
            case "PASS" =>
              loggedIn = userOk && (pass.isEmpty || ctEq(arg, pass))
              reply(if (loggedIn) "230 logged in" else "530 login incorrect")
            case "SYST" => reply("215 UNIX Type: L8")
            case "FEAT" => reply("211-features"); reply(" EPSV"); reply("211 end")
            case "TYPE" | "MODE" | "STRU" | "NOOP" => reply("200 ok")
            case "PWD" => reply(s"""257 "$cwd"""")
            case "CWD" => // virtual: track for PWD, uploads flatten anyway
              cwd = if (arg.startsWith("/")) arg
                    else Paths.get("/", cwd, arg).normalize().toString
              reply("250 ok")
            case "CDUP" =>
              cwd = Option(Paths.get(cwd).getParent).map(_.toString).getOrElse("/")
              reply("200 ok")
            case "PASV" =>
              if (!loggedIn) reply("530 log in first")
              else {
                dataSock.foreach(s => try s.close() catch { case _: Exception => () })
                val ss = serverSocket(0, 1)
                dataSock = Some(ss)
                val p = ss.getLocalPort
                reply(s"227 entering passive mode (127,0,0,1,${p / 256},${p % 256})")
              }
            case "EPSV" =>
              if (!loggedIn) reply("530 log in first")
              else {
                dataSock.foreach(s => try s.close() catch { case _: Exception => () })
                val ss = serverSocket(0, 1)
                dataSock = Some(ss)
                reply(s"229 entering extended passive mode (|||${ss.getLocalPort}|)")
              }
            case "STOR" =>
              if (!loggedIn) reply("530 log in first")
              else if (arg.trim.isEmpty) reply("501 filename required")
              else if (dataSock.isEmpty) reply("425 use PASV first")
              else {
                // basename only + conservative charset: a client cannot
                // place files outside the spool or forge the order prefix
                val base = Paths.get(arg.replace('\\', '/')).getFileName.toString
                  .replaceAll("[^A-Za-z0-9._-]", "_")
                reply("150 receiving")
                openData().foreach { data =>
                  val name = s"${System.currentTimeMillis()}-${seq.getAndIncrement()}-$base"
                  val tmp = dir.resolve(name + ".tmp")
                  try {
                    val os = Files.newOutputStream(tmp)
                    try data.getInputStream.transferTo(os) finally os.close()
                    Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
                    reply("226 stored")
                  } catch {
                    case _: java.io.IOException =>
                      try Files.deleteIfExists(tmp) catch { case _: Exception => () }
                      reply("451 transfer failed")
                  } finally { try data.close() catch { case _: Exception => () } }
                }
              }
            case "RETR" | "DELE" | "RMD" | "RNFR" | "RNTO" | "APPE" =>
              reply("550 upload-only server")
            case "LIST" | "NLST" =>
              // an EMPTY listing keeps STOR-before-LIST clients happy
              // without exposing the spool (uploads are not a share)
              if (!loggedIn) reply("530 log in first")
              else if (dataSock.isEmpty) reply("425 use PASV first")
              else {
                reply("150 listing")
                openData().foreach { d => try () finally d.close() }
                reply("226 done")
              }
            case "QUIT" => reply("221 bye"); return
            case _ => reply("502 not implemented")
          }
          line = in.readLine()
        }
      } catch { case _: java.io.IOException => () } // peer reset
      finally {
        dataSock.foreach(s => try s.close() catch { case _: Exception => () })
        try sock.close() catch { case _: Exception => () }
      }
    }

    val accept = new Thread(() => {
      while (!stop.get()) {
        try {
          val sock = server.accept()
          val t = new Thread(() => session(sock), "graft-listen-ftp-session")
          t.setDaemon(true)
          t.start()
        } catch {
          // transient accept failure must not kill the listener; the
          // stop-flag check alone decides loop exit (ADVICE r15)
          case _: java.io.IOException => if (!stop.get()) Thread.sleep(10)
        }
      }
    }, "graft-listen-ftp-accept")
    accept.setDaemon(true)
    accept.start()
    new FtpListener(server, stop)
  }
}
