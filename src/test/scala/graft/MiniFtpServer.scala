package graft

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.text.SimpleDateFormat
import java.util.Locale

/** Minimal in-process FTP server (JDK sockets only) — just enough of
  * RFC 959 for hadoop's `FTPFileSystem` + the shaded commons-net client
  * bundled in hadoop-client-runtime: USER/PASS login, SYST (commons-net
  * picks its LIST parser from this), TYPE/MODE, CWD/CDUP/PWD, PASV data
  * connections, LIST in unix `ls -l` format, RETR/STOR/APPE, DELE,
  * MKD/RMD, RNFR/RNTO (the tmp+rename atomic-state contract), SIZE,
  * NOOP, QUIT. One handler thread per control connection (hadoop opens
  * a fresh connection per FS operation; executors fetch in parallel).
  * Files live under a caller-supplied local root. Test infrastructure —
  * the PRODUCT side is the unmodified Hadoop FileSystem path. */
final class MiniFtpServer(root: Path, val user: String = "u", val pass: String = "p") {
  private val control = new ServerSocket(0, 50, InetAddress.getLoopbackAddress)
  @volatile private var running = true
  def port: Int = control.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = control.accept()
        val t = new Thread(() => handle(s), "miniftp-session")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => /* closed */ }
    }
  }, "miniftp-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = { running = false; try control.close() catch { case _: Exception => () } }

  private def resolve(cwd: String, arg: String): Path = {
    val virtual = if (arg.startsWith("/")) arg else s"$cwd/$arg".replaceAll("//+", "/")
    val norm = Paths.get("/", virtual).normalize().toString.drop(1) // strip leading /
    root.resolve(norm).normalize()
  }

  private def handle(sock: Socket): Unit = {
    val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
    val out = sock.getOutputStream
    def reply(s: String): Unit = { out.write((s + "\r\n").getBytes("UTF-8")); out.flush() }
    var cwd = "/"
    var renameFrom: Option[Path] = None
    var dataSock: Option[ServerSocket] = None
    def openData(): Socket = {
      val ss = dataSock.getOrElse(throw new IllegalStateException("no PASV before transfer"))
      val s = ss.accept()
      try ss.close() catch { case _: Exception => () }
      dataSock = None
      s
    }
    try {
      reply("220 miniftp ready")
      var line = in.readLine()
      while (line != null && running) {
        val (cmd, arg) = line.split(" ", 2) match {
          case Array(c, a) => (c.toUpperCase(Locale.ROOT), a)
          case Array(c)    => (c.toUpperCase(Locale.ROOT), "")
        }
        cmd match {
          case "USER" => reply(if (arg == user) "331 password required" else "530 unknown user")
          case "PASS" => reply(if (arg == pass) "230 logged in" else "530 bad password")
          case "SYST" => reply("215 UNIX Type: L8")
          case "TYPE" | "MODE" | "STRU" | "NOOP" => reply("200 ok")
          case "PWD"  => reply(s"""257 "$cwd"""")
          case "CWD" =>
            val target = resolve(cwd, arg)
            if (Files.isDirectory(target)) {
              cwd = ("/" + root.relativize(target).toString).replace('\\', '/')
              if (cwd == "/.") cwd = "/"
              reply("250 ok")
            } else reply("550 no such directory")
          case "CDUP" =>
            cwd = Option(Paths.get(cwd).getParent).map(_.toString).getOrElse("/")
            reply("200 ok")
          case "PASV" =>
            dataSock.foreach(s => try s.close() catch { case _: Exception => () })
            val ss = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
            dataSock = Some(ss)
            val p = ss.getLocalPort
            reply(s"227 entering passive mode (127,0,0,1,${p / 256},${p % 256})")
          case "LIST" =>
            // strip ls flags commons-net may prepend (-a etc.)
            val cleaned = arg.split(" ").filterNot(a => a.startsWith("-")).mkString(" ")
            val target = resolve(cwd, if (cleaned.isEmpty) "." else cleaned)
            if (!Files.exists(target)) reply("550 not found")
            else {
              reply("150 listing")
              val data = openData()
              try {
                val entries: Seq[Path] =
                  if (Files.isDirectory(target)) {
                    val st = Files.list(target)
                    try { import scala.jdk.CollectionConverters._; st.iterator().asScala.toSeq }
                    finally st.close()
                  } else Seq(target)
                val fmt = new SimpleDateFormat("MMM dd HH:mm", Locale.US)
                val sb = new StringBuilder
                entries.foreach { p =>
                  val d = Files.isDirectory(p)
                  val size = if (d) 0L else Files.size(p)
                  val ts = fmt.format(new java.util.Date(Files.getLastModifiedTime(p).toMillis))
                  sb.append(s"${if (d) 'd' else '-'}rw-r--r-- 1 $user $user " +
                    f"$size%10d $ts ${p.getFileName}\r\n")
                }
                data.getOutputStream.write(sb.toString.getBytes("UTF-8"))
                data.getOutputStream.flush()
              } finally data.close()
              reply("226 done")
            }
          case "RETR" =>
            val target = resolve(cwd, arg)
            if (!Files.isRegularFile(target)) reply("550 not found")
            else {
              reply("150 sending")
              val data = openData()
              try Files.copy(target, data.getOutputStream)
              finally data.close()
              reply("226 done")
            }
          case "STOR" | "APPE" =>
            val target = resolve(cwd, arg)
            Files.createDirectories(target.getParent)
            reply("150 receiving")
            val data = openData()
            try {
              if (cmd == "APPE" && Files.exists(target)) {
                val os = Files.newOutputStream(target,
                  java.nio.file.StandardOpenOption.APPEND)
                try data.getInputStream.transferTo(os) finally os.close()
              } else Files.copy(data.getInputStream, target,
                StandardCopyOption.REPLACE_EXISTING)
            } finally data.close()
            reply("226 stored")
          case "DELE" =>
            val target = resolve(cwd, arg)
            if (Files.isRegularFile(target)) { Files.delete(target); reply("250 deleted") }
            else reply("550 not found")
          case "MKD" =>
            Files.createDirectories(resolve(cwd, arg)); reply(s"""257 "$arg" created""")
          case "RMD" =>
            val target = resolve(cwd, arg)
            if (Files.isDirectory(target)) { Files.delete(target); reply("250 removed") }
            else reply("550 not found")
          case "RNFR" =>
            val target = resolve(cwd, arg)
            if (Files.exists(target)) { renameFrom = Some(target); reply("350 ready") }
            else reply("550 not found")
          case "RNTO" =>
            renameFrom match {
              case Some(from) =>
                val to = resolve(cwd, arg)
                Files.createDirectories(to.getParent)
                Files.move(from, to, StandardCopyOption.REPLACE_EXISTING,
                  StandardCopyOption.ATOMIC_MOVE)
                renameFrom = None
                reply("250 renamed")
              case None => reply("503 RNFR first")
            }
          case "SIZE" =>
            val target = resolve(cwd, arg)
            if (Files.isRegularFile(target)) reply(s"213 ${Files.size(target)}")
            else reply("550 not found")
          case "QUIT" => reply("221 bye"); sock.close(); return
          case _ => reply("502 not implemented")
        }
        line = in.readLine()
      }
    } catch { case _: Exception => () }
    finally {
      dataSock.foreach(s => try s.close() catch { case _: Exception => () })
      try sock.close() catch { case _: Exception => () }
    }
  }
}
