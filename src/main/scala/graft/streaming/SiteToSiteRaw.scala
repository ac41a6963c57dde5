package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

/** NiFi SITE-TO-SITE, RAW socket transport (r15 verdict "what's
  * missing" #4): the OTHER public S2S transport next to the HTTP form
  * in [[SiteToSite]] — the socket protocol a Remote Process Group
  * configured `Transport Protocol: RAW` speaks. Implemented from the
  * publicly documented protocol shape (NiFi Administration Guide
  * "Site-to-Site Protocol"; the client/server pair lives in
  * `nifi-site-to-site-client`'s `SocketClientProtocol` /
  * `SocketRemoteSiteListener`):
  *
  *   1. 4-byte magic `NiFi`, then resource negotiation: the client
  *      names `SocketFlowFileProtocol` + version (modified-UTF-8
  *      string + int32, java DataOutputStream framing); the server
  *      answers one byte — RESOURCE_OK(20), or
  *      DIFFERENT_RESOURCE_VERSION(21) + its int32 preference and the
  *      client re-negotiates, or ABORT(255).
  *   2. Handshake: client sends a communications id, a transit-URI
  *      prefix, then an int32-counted property list (name/value UTF
  *      pairs — `PORT_IDENTIFIER`, `REQUEST_EXPIRATION_MILLIS`,
  *      `GZIP`). Server answers in ResponseCode framing — the 3-byte
  *      `R` `C` <code>, plus a UTF message for message-carrying codes
  *      — PROPERTIES_OK(1), UNKNOWN_PORT(200, message),
  *      ILLEGAL_PROPERTY_VALUE(231, message).
  *   3. Codec negotiation (RequestType `NEGOTIATE_FLOWFILE_CODEC`):
  *      same single-byte resource negotiation for
  *      `StandardFlowFileCodec` v1 — int-length-prefixed attribute
  *      strings, int64 content length.
  *   4. Transfer. SEND_FLOWFILES: per FlowFile the codec record, then
  *      the client's CONTINUE_TRANSACTION(10) or
  *      FINISH_TRANSACTION(11); server answers
  *      CONFIRM_TRANSACTION(12) carrying its CRC32 of the codec
  *      bytes; client echoes CONFIRM_TRANSACTION("") on match (or
  *      BAD_CHECKSUM(19) — the transaction is discarded, nothing
  *      spools); server commits and sends TRANSACTION_FINISHED(13).
  *      RECEIVE_FLOWFILES mirrors it: server streams MORE_DATA(20) +
  *      codec record per file then NO_MORE_DATA(21), client sends
  *      CONFIRM_TRANSACTION with ITS CRC, server verifies and
  *      confirms, client closes with TRANSACTION_FINISHED — only then
  *      is the egress claim deleted (a died client returns the claim).
  *
  * Honesty note (the 48k′ discipline, applied to bytes): no NiFi
  * instance exists in this offline environment, so byte-level interop
  * of the RAW form is pinned by this repo's own client↔server spec
  * pair plus the protocol documentation — unlike the HTTP transport,
  * whose framing (FlowFile-Stream v3, `x-location-uri-intent`,
  * responseCode query contract) is additionally pinned by gpg-style
  * external fixtures. The ResponseCode numbering and which codes carry
  * messages follow the public enum; any deviation discovered against a
  * live NiFi is a constants-only fix — the state machine above is the
  * documented one.
  *
  * Spark-first split: identical to the HTTP listener — committed
  * ingress transactions spool one atomically-renamed JSONL file
  * (`{"attrs":{...},"content_b64":"..."}` per FlowFile, the same
  * schema, so ONE flow binding serves both transports); egress serves
  * the same `.ffv3` claim files [[SiteToSite.writeEgress]] produces.
  */
object SiteToSiteRaw {

  private val Magic = Array[Byte]('N', 'i', 'F', 'i')
  val ProtocolResource = "SocketFlowFileProtocol"
  val CodecResource = "StandardFlowFileCodec"
  val ProtocolVersion = 6 // negotiated down to what both sides speak

  // single-byte resource-negotiation responses
  private val ResourceOk = 20
  private val DifferentResourceVersion = 21
  private val ResourceAbort = 255

  /** ResponseCode wire values (the public enum's numbering). */
  object RC {
    val PropertiesOk = 1
    val ContinueTransaction = 10
    val FinishTransaction = 11
    val ConfirmTransaction = 12 // carries message (the checksum)
    val TransactionFinished = 13
    val CancelTransaction = 15
    val BadChecksum = 19
    val MoreData = 20
    val NoMoreData = 21
    val UnknownPort = 200       // carries message
    val PortNotInValidState = 201 // carries message
    val IllegalPropertyValue = 231 // carries message
    val Abort = 250             // carries message
    val withMessage: Set[Int] =
      Set(ConfirmTransaction, UnknownPort, PortNotInValidState,
        IllegalPropertyValue, Abort)
  }

  private def writeRc(out: DataOutputStream, code: Int, msg: String = ""): Unit = {
    out.write('R'); out.write('C'); out.write(code)
    if (RC.withMessage(code)) out.writeUTF(msg)
    out.flush()
  }
  /** (code, message). */
  private def readRc(in: DataInputStream, ctx: String): (Int, String) = {
    val r = in.read(); val c = in.read()
    require(r == 'R' && c == 'C', s"s2s-raw $ctx: bad ResponseCode framing ($r,$c)")
    val code = in.read()
    require(code >= 0, s"s2s-raw $ctx: EOF in ResponseCode")
    val msg = if (RC.withMessage(code)) in.readUTF() else ""
    (code, msg)
  }

  // --------------------------------------------- StandardFlowFileCodec

  private def writeCodecString(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    out.writeInt(b.length); out.write(b)
  }
  private def readCodecString(in: DataInputStream, max: Int = 1 << 24): String = {
    val n = in.readInt()
    require(n >= 0 && n <= max, s"s2s-raw codec: string length $n out of bounds")
    val b = new Array[Byte](n); in.readFully(b)
    new String(b, UTF_8)
  }

  /** One codec record: int32 attr count, (string, string) pairs with
    * int32 byte lengths, int64 content length, content. */
  private def writeFlowFile(out: DataOutputStream,
                            attrs: Map[String, String], content: Array[Byte]): Unit = {
    out.writeInt(attrs.size)
    attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
      writeCodecString(out, k); writeCodecString(out, v)
    }
    out.writeLong(content.length.toLong)
    out.write(content)
  }
  private def readFlowFile(in: DataInputStream,
                           maxBytes: Long): (Map[String, String], Array[Byte]) = {
    val n = in.readInt()
    require(n >= 0 && n <= (1 << 16), s"s2s-raw codec: $n attributes out of bounds")
    val attrs = (0 until n).map(_ => (readCodecString(in), readCodecString(in))).toMap
    val len = in.readLong()
    require(len >= 0 && len <= maxBytes, s"s2s-raw codec: content length $len out of bounds")
    val content = new Array[Byte](len.toInt); in.readFully(content)
    (attrs, content)
  }

  // ------------------------------------------------------------- server

  final class RawListener private[SiteToSiteRaw] (server: ServerSocket) {
    def port: Int = server.getLocalPort
    def stop(): Unit = { try server.close() catch { case _: Exception => () } }
  }

  /** Start the RAW endpoint: one input port (ingress → `spoolDir`) and,
    * when `egressDir` is set, one output port (id `<portId>-out`)
    * serving the `.ffv3` claim files. With `ssl` set the socket is an
    * SSLServerSocket (NiFi secures RAW S2S with the instance TLS
    * context): a plaintext client dies in the TLS record layer before
    * the `NiFi` magic is ever read — nothing spools (the ListenHTTP
    * startTls refusal gate, applied to the socket transport). */
  def listenRaw(port: Int, spoolDir: String, portName: String = "graft",
                portId: String = "graft-in-0", egressDir: Option[String] = None,
                maxBytes: Long = 1L << 30,
                ssl: Option[javax.net.ssl.SSLContext] = None): RawListener = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    egressDir.foreach(d => Files.createDirectories(Paths.get(d)))
    val server = ssl match {
      case Some(ctx) => ctx.getServerSocketFactory
        .createServerSocket(port, 50, InetAddress.getLoopbackAddress)
      case None => new ServerSocket(port, 50, InetAddress.getLoopbackAddress)
    }
    val seq = new AtomicLong(0L)
    val outPortId = s"$portId-out"

    def session(sock: Socket): Unit = {
      sock.setSoTimeout(30000)
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      try {
        val magic = new Array[Byte](4); in.readFully(magic)
        if (!java.util.Arrays.equals(magic, Magic)) return
        // protocol resource negotiation (re-negotiable)
        var version = -1
        while (version < 0) {
          val res = in.readUTF()
          if (res != ProtocolResource) { out.write(ResourceAbort); out.flush(); return }
          val v = in.readInt()
          if (v >= 1 && v <= ProtocolVersion) { out.write(ResourceOk); out.flush(); version = v }
          else { out.write(DifferentResourceVersion); out.writeInt(ProtocolVersion); out.flush() }
        }
        // handshake
        in.readUTF() // communications id
        in.readUTF() // transit URI prefix
        val nProps = in.readInt()
        require(nProps >= 0 && nProps <= 64, "s2s-raw: handshake property count out of bounds")
        val props = (0 until nProps).map(_ => (in.readUTF(), in.readUTF())).toMap
        if (props.get("GZIP").exists(_.equalsIgnoreCase("true"))) {
          writeRc(out, RC.IllegalPropertyValue, "GZIP compression not supported"); return
        }
        // RAW has no name→id discovery leg (the HTTP form resolves
        // names via /nifi-api/site-to-site), so the endpoint accepts
        // EITHER coordinate as PORT_IDENTIFIER — a flow authored with
        // the HTTP vocabulary (Port Name) works unchanged over RAW
        val pid = props.getOrElse("PORT_IDENTIFIER", "")
        val isIngress = pid == portId || pid == portName
        val isEgress = (pid == outPortId || pid == s"$portName.out") &&
          egressDir.isDefined
        if (!isIngress && !isEgress) {
          writeRc(out, RC.UnknownPort, s"unknown port $pid"); return
        }
        writeRc(out, RC.PropertiesOk)
        // request loop
        var open = true
        while (open) {
          val req = try in.readUTF() catch { case _: java.io.IOException => return }
          req match {
            case "NEGOTIATE_FLOWFILE_CODEC" =>
              val codec = in.readUTF(); val cv = in.readInt()
              if (codec != CodecResource) { out.write(ResourceAbort); out.flush(); return }
              else if (cv != 1) { out.write(DifferentResourceVersion); out.writeInt(1); out.flush() }
              else { out.write(ResourceOk); out.flush() }
            case "SEND_FLOWFILES" if isIngress =>
              val crc = new java.util.zip.CRC32()
              val cin = new DataInputStream(new java.util.zip.CheckedInputStream(in, crc))
              val files = scala.collection.mutable.ArrayBuffer.empty[(Map[String, String], Array[Byte])]
              var more = true
              while (more) {
                files += readFlowFile(cin, maxBytes)
                readRc(in, "send-loop")._1 match {
                  case RC.ContinueTransaction => ()
                  case RC.FinishTransaction => more = false
                  case other => sys.error(s"s2s-raw: unexpected code $other in send loop")
                }
              }
              writeRc(out, RC.ConfirmTransaction, crc.getValue.toString)
              readRc(in, "send-confirm")._1 match {
                case RC.ConfirmTransaction =>
                  spoolCommitted(dir, seq, files.toSeq)
                  writeRc(out, RC.TransactionFinished)
                case _ => () // BAD_CHECKSUM or cancel: discard, nothing spools
              }
            case "RECEIVE_FLOWFILES" if isEgress =>
              // claim the oldest pending egress file atomically
              val edir = Paths.get(egressDir.get)
              val cand = {
                val ls = Files.list(edir)
                try {
                  val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
                  val it = ls.iterator()
                  while (it.hasNext) {
                    val p = it.next()
                    if (p.getFileName.toString.endsWith(".ffv3")) buf += p
                  }
                  buf.sortBy(_.getFileName.toString).headOption
                } finally ls.close()
              }
              val claimed = cand.flatMap { p =>
                val c = p.resolveSibling(
                  p.getFileName.toString + s".claimed-${seq.getAndIncrement()}")
                try { Files.move(p, c, StandardCopyOption.ATOMIC_MOVE); Some((p, c)) }
                catch { case _: java.io.IOException => None } // raced
              }
              claimed match {
                case None => writeRc(out, RC.NoMoreData)
                case Some((orig, claim)) =>
                  // the claim must never strand: anything short of a
                  // client TRANSACTION_FINISHED — bad checksum, EOF,
                  // timeout, framing violation — returns it to the
                  // queue (a catch-all alone silently LOST the batch)
                  var settled = false
                  try {
                    val files = SiteToSite.unpackFlowFiles(Files.readAllBytes(claim))
                    if (files.isEmpty) {
                      // an empty claim serves nothing and would loop
                      // claim/restore forever — drop it, answer empty
                      Files.deleteIfExists(claim)
                      settled = true
                      writeRc(out, RC.NoMoreData)
                    } else {
                      val crc = new java.util.zip.CRC32()
                      val cout = new DataOutputStream(
                        new java.util.zip.CheckedOutputStream(out, crc))
                      files.foreach { case (attrs, content) =>
                        writeRc(out, RC.MoreData)
                        writeFlowFile(cout, attrs, content)
                        cout.flush()
                      }
                      writeRc(out, RC.NoMoreData)
                      val (code, msg) = readRc(in, "receive-confirm")
                      if (code == RC.ConfirmTransaction && msg == crc.getValue.toString) {
                        writeRc(out, RC.ConfirmTransaction)
                        readRc(in, "receive-finish")._1 match {
                          case RC.TransactionFinished =>
                            Files.deleteIfExists(claim)
                            settled = true
                          case _ => () // restored in finally
                        }
                      } else writeRc(out, RC.BadChecksum)
                    }
                  } finally {
                    if (!settled) {
                      try Files.move(claim, orig, StandardCopyOption.ATOMIC_MOVE)
                      catch { case _: java.io.IOException => () }
                    }
                  }
              }
            case "SHUTDOWN" => open = false
            case other =>
              writeRc(out, RC.Abort, s"request $other not valid for port $pid")
              open = false
          }
        }
      } catch { case _: Exception => () } // framing violation / EOF: drop
      finally { try sock.close() catch { case _: Exception => () } }
    }

    val acceptor = new Thread(() => {
      while (!server.isClosed) {
        try {
          val s = server.accept()
          val t = new Thread(() => session(s), "graft-s2s-raw-session")
          t.setDaemon(true); t.start()
        } catch {
          case _: java.io.IOException => () // closed or transient — loop decides
        }
      }
    }, "graft-s2s-raw-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    new RawListener(server)
  }

  /** TLS convenience keyed by the repo's keystore contract (PKCS12/JKS
    * path + password through [[ListenHttp.sslContext]] — the
    * [[SiteToSite.listenTls]] pattern on the socket transport). */
  def listenRawTls(port: Int, spoolDir: String, keystorePath: String,
                   keystorePass: String, portName: String = "graft",
                   portId: String = "graft-in-0",
                   egressDir: Option[String] = None,
                   maxBytes: Long = 1L << 30): RawListener =
    listenRaw(port, spoolDir, portName, portId, egressDir, maxBytes,
      ssl = Some(ListenHttp.sslContext(keystorePath, keystorePass)))

  /** Committed-transaction spool — the same JSONL schema as the HTTP
    * listener, so one flow binding serves both transports. */
  private def spoolCommitted(dir: java.nio.file.Path, seq: AtomicLong,
                             files: Seq[(Map[String, String], Array[Byte])]): Unit = {
    val lines = files.map { case (attrs, content) =>
      val a = attrs.toSeq.sortBy(_._1).map { case (k, v) =>
        s"${Ws.jsonStr(k)}:${Ws.jsonStr(v)}"
      }.mkString(",")
      s"""{"attrs":{$a},"content_b64":${Ws.jsonStr(
        java.util.Base64.getEncoder.encodeToString(content))}}"""
    }
    val name = s"${System.currentTimeMillis()}-${seq.getAndIncrement()}.jsonl"
    val tmp = dir.resolve(name + ".tmp")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(UTF_8))
    Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  // ------------------------------------------------------------- client

  private def connect(host: String, port: Int, portId: String,
                      requestVersion: Int = ProtocolVersion,
                      ssl: Option[javax.net.ssl.SSLContext] = None)
      : (Socket, DataInputStream, DataOutputStream) = {
    val sock = ssl match {
      case Some(ctx) => ctx.getSocketFactory.createSocket(host, port)
      case None => new Socket(host, port)
    }
    sock.setSoTimeout(30000)
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    try {
      out.write(Magic)
      var v = requestVersion
      var negotiated = false
      // Bounded: a peer that keeps answering DIFFERENT_RESOURCE_VERSION
      // without ever converging (e.g. re-offering >= our current offer)
      // must not spin connect() forever. Each round must strictly lower
      // the offer, and a handful of rounds is more than the version
      // space ever needs.
      var rounds = 0
      while (!negotiated) {
        rounds += 1
        require(rounds <= 5, "s2s-raw: version negotiation did not converge after 5 rounds")
        out.writeUTF(ProtocolResource); out.writeInt(v); out.flush()
        in.read() match {
          case ResourceOk => negotiated = true
          case DifferentResourceVersion =>
            val pref = in.readInt()
            require(pref >= 1, "s2s-raw: server offered no usable version")
            val next = math.min(pref, v)
            require(next < v,
              s"s2s-raw: peer rejected version $v but offered $pref (no lower version to fall back to)")
            v = next
          case other => sys.error(s"s2s-raw: resource negotiation failed ($other)")
        }
      }
      out.writeUTF(s"graft-${System.nanoTime()}") // communications id
      out.writeUTF(s"raw://$host:$port/")         // transit URI prefix
      val props = Seq("PORT_IDENTIFIER" -> portId,
        "REQUEST_EXPIRATION_MILLIS" -> "30000", "GZIP" -> "false")
      out.writeInt(props.size)
      props.foreach { case (k, x) => out.writeUTF(k); out.writeUTF(x) }
      out.flush()
      val (code, msg) = readRc(in, "handshake")
      require(code == RC.PropertiesOk, s"s2s-raw handshake refused: $code $msg")
      out.writeUTF("NEGOTIATE_FLOWFILE_CODEC")
      out.writeUTF(CodecResource); out.writeInt(1); out.flush()
      require(in.read() == ResourceOk, "s2s-raw: codec negotiation failed")
      (sock, in, out)
    } catch { case t: Throwable => try sock.close() catch { case _: Exception => () }; throw t }
  }

  /** Send FlowFiles over RAW; one transaction. Returns the count on a
    * confirmed commit; throws on checksum mismatch or refusal.
    * `tamperChecksum` exists for the BAD_CHECKSUM spec gate. */
  def sendRaw(host: String, port: Int, portId: String,
              files: Seq[(Map[String, String], Array[Byte])],
              requestVersion: Int = ProtocolVersion,
              tamperChecksum: Boolean = false,
              ssl: Option[javax.net.ssl.SSLContext] = None): Int = {
    require(files.nonEmpty, "s2s-raw send: empty transaction")
    val (sock, in, out) = connect(host, port, portId, requestVersion, ssl)
    try {
      out.writeUTF("SEND_FLOWFILES")
      val crc = new java.util.zip.CRC32()
      val cout = new DataOutputStream(new java.util.zip.CheckedOutputStream(out, crc))
      files.zipWithIndex.foreach { case ((attrs, content), i) =>
        writeFlowFile(cout, attrs, content)
        cout.flush()
        writeRc(out, if (i == files.size - 1) RC.FinishTransaction
                     else RC.ContinueTransaction)
      }
      val (code, serverSum) = readRc(in, "confirm")
      require(code == RC.ConfirmTransaction, s"s2s-raw: expected CONFIRM, got $code")
      val mySum = if (tamperChecksum) "0" else crc.getValue.toString
      if (serverSum != mySum) {
        writeRc(out, RC.BadChecksum)
        sys.error(s"s2s-raw: checksum mismatch (server $serverSum, client $mySum)")
      }
      writeRc(out, RC.ConfirmTransaction, "")
      val (fin, _) = readRc(in, "finished")
      require(fin == RC.TransactionFinished, s"s2s-raw: expected FINISHED, got $fin")
      out.writeUTF("SHUTDOWN"); out.flush()
      files.size
    } finally { try sock.close() catch { case _: Exception => () } }
  }

  /** Pull one transaction of FlowFiles over RAW (empty when the remote
    * output queue is empty). The claim is only deleted server-side
    * after this client's TRANSACTION_FINISHED. */
  def pullRaw(host: String, port: Int, portId: String,
              ssl: Option[javax.net.ssl.SSLContext] = None)
      : Seq[(Map[String, String], Array[Byte])] = {
    val (sock, in, out) = connect(host, port, portId, ssl = ssl)
    try {
      out.writeUTF("RECEIVE_FLOWFILES"); out.flush()
      val crc = new java.util.zip.CRC32()
      val cin = new DataInputStream(new java.util.zip.CheckedInputStream(in, crc))
      val files = scala.collection.mutable.ArrayBuffer.empty[(Map[String, String], Array[Byte])]
      var more = true
      while (more) {
        readRc(in, "receive-data")._1 match {
          case RC.MoreData => files += readFlowFile(cin, 1L << 30)
          case RC.NoMoreData => more = false
          case other => sys.error(s"s2s-raw: unexpected code $other receiving")
        }
      }
      if (files.nonEmpty) {
        writeRc(out, RC.ConfirmTransaction, crc.getValue.toString)
        val (code, _) = readRc(in, "receive-confirm")
        require(code == RC.ConfirmTransaction, s"s2s-raw: server rejected checksum ($code)")
        writeRc(out, RC.TransactionFinished)
      }
      out.writeUTF("SHUTDOWN"); out.flush()
      files.toSeq
    } finally { try sock.close() catch { case _: Exception => () } }
  }

  /** PutSiteToSite, RAW form: one transaction per partition (the
    * [[SiteToSite.putSiteToSite]] contract over the socket). The
    * keystore travels as (path, pass) strings — an SSLContext is not
    * serializable — and each partition builds its context once. */
  def putSiteToSiteRaw(df: org.apache.spark.sql.DataFrame, host: String, port: Int,
                       portId: String, contentCol: String = "content",
                       attrCols: Seq[String] = Seq.empty,
                       keystore: Option[(String, String)] = None): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = (contentCol +: attrCols).map(col)
    val attrNames = attrCols
    df.select(cols: _*).foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val ssl = keystore.map { case (ks, pass) => ListenHttp.sslContext(ks, pass) }
      val files = rows.map { r =>
        val content = r.get(0) match {
          case b: Array[Byte] => b
          case s: String => s.getBytes(UTF_8)
          case other => String.valueOf(other).getBytes(UTF_8)
        }
        val attrs = attrNames.zipWithIndex.map { case (n, i) =>
          n -> String.valueOf(r.get(i + 1))
        }.toMap
        (attrs, content)
      }.toSeq
      if (files.nonEmpty) sendRaw(host, port, portId, files, ssl = ssl)
      ()
    }
  }
}
