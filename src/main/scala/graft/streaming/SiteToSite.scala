package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** NiFi SITE-TO-SITE over HTTP — the NiFi-native wire protocol, server
  * side: a graft endpoint a real NiFi instance's Remote Process Group
  * can hand FlowFiles to (ingress, an INPUT port) and pull FlowFiles
  * from (egress, an OUTPUT port). Both the REST handshake and the
  * payload packaging are public protocol surface:
  *
  *   - HTTP transport endpoints (NiFi Administration Guide, "Site to
  *     Site Properties"; the client is `HttpClient` in
  *     nifi-site-to-site-client): `GET /nifi-api/site-to-site`
  *     (controller + port discovery), `GET /nifi-api/site-to-site/peers`,
  *     then per transaction `POST /nifi-api/data-transfer/
  *     {input|output}-ports/{portId}/transactions` (201 + Location +
  *     `x-location-uri-intent: transaction-url`), data transfer on the
  *     transaction's `/flow-files` resource (ingress POST → 202 with
  *     the server's CRC32 of the received bytes; egress GET → the
  *     packed stream), TTL extension via PUT on the transaction, and
  *     commit/cancel via DELETE with `responseCode=` 12
  *     (CONFIRM_TRANSACTION) / 15 (CANCEL_TRANSACTION) and, on
  *     ingress, `checksum=` the client's CRC32 — a mismatch discards
  *     the transaction with 400/BAD_CHECKSUM(19), matching NiFi's
  *     ResponseCode enum.
  *   - FlowFile-Stream v3 packaging (FlowFilePackagerV3, the format
  *     PackageFlowFile/MergeContent "FlowFile Stream, v3" speak): per
  *     record the 7-byte magic `NiFiFF3`, the attribute map (count,
  *     then length-prefixed UTF-8 key/value strings; lengths are 2
  *     bytes big-endian with `0xFFFF` escaping to 4 bytes), an 8-byte
  *     big-endian content length, then the content bytes.
  *
  * Spark-first split, same as every listener here: the endpoint spools
  * each COMMITTED transaction as one atomically-renamed JSONL file
  * (`{"attrs":{...},"content_b64":"..."}` per FlowFile) and the flow
  * binds a file stream to the directory — exactly-once from the spool
  * onward, uncommitted/cancelled/bad-checksum transactions never
  * surface. Transactions buffer to a tmp file (constant memory) with
  * the CRC computed while spooling. Single-receiver ingress like
  * [[ListenHttp]]; scale out behind a load balancer. */
object SiteToSite {

  // ------------------------------------------------- FlowFile-Stream v3

  private val Magic = "NiFiFF3".getBytes(UTF_8)

  private def writeFieldLength(out: java.io.OutputStream, n: Int): Unit =
    if (n < 0xFFFF) { out.write(n >>> 8); out.write(n) }
    else {
      out.write(0xFF); out.write(0xFF)
      out.write(n >>> 24); out.write(n >>> 16); out.write(n >>> 8); out.write(n)
    }

  private def writeString(out: java.io.OutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    writeFieldLength(out, b.length)
    out.write(b)
  }

  /** Pack FlowFiles into one FlowFile-Stream v3 payload. Attribute
    * order is sorted by key so the bytes are deterministic (the format
    * itself is order-insensitive). */
  def packFlowFiles(files: Seq[(Map[String, String], Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(1024)
    files.foreach { case (attrs, content) =>
      bos.write(Magic)
      writeFieldLength(bos, attrs.size)
      attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
        writeString(bos, k); writeString(bos, v)
      }
      var i = 56
      while (i >= 0) { bos.write(((content.length.toLong >>> i) & 0xFF).toInt); i -= 8 }
      bos.write(content)
    }
    bos.toByteArray
  }

  /** Unpack a FlowFile-Stream v3 payload. Throws on a bad magic or a
    * truncated record — a committed transaction must parse fully. */
  def unpackFlowFiles(bytes: Array[Byte]): Seq[(Map[String, String], Array[Byte])] = {
    var off = 0
    def u8(): Int = { val b = bytes(off) & 0xFF; off += 1; b }
    def fieldLength(): Int = {
      val two = (u8() << 8) | u8()
      if (two != 0xFFFF) two
      else (u8() << 24) | (u8() << 16) | (u8() << 8) | u8()
    }
    def str(): String = {
      val n = fieldLength()
      val s = new String(bytes, off, n, UTF_8); off += n; s
    }
    val out = Vector.newBuilder[(Map[String, String], Array[Byte])]
    while (off < bytes.length) {
      require(off + Magic.length <= bytes.length &&
        java.util.Arrays.equals(bytes, off, off + Magic.length, Magic, 0, Magic.length),
        s"flowfile-stream v3: bad magic at offset $off")
      off += Magic.length
      val nAttrs = fieldLength()
      val attrs = (0 until nAttrs).map(_ => (str(), str())).toMap
      var len = 0L
      var i = 0
      while (i < 8) { len = (len << 8) | u8(); i += 1 }
      require(off + len <= bytes.length, "flowfile-stream v3: truncated content")
      val content = java.util.Arrays.copyOfRange(bytes, off, off + len.toInt)
      off += len.toInt
      out += ((attrs, content))
    }
    out.result()
  }

  // ------------------------------------------------------------- server

  private final class Tx(val dir: String) { // "input" | "output"
    val crc = new java.util.zip.CRC32()
    var spool: Path = _            // ingress: received bytes
    var claimed: Path = _          // egress: the claimed outgoing file
    var claimedOrig: Path = _
    @volatile var deadline: Long = 0L
    @volatile var busy: Boolean = false // transfer in flight — reap must not touch
  }

  final class S2sListener private[SiteToSite] (server: HttpServer, val portId: String) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  private def jsonStr(s: String): String = Ws.jsonStr(s)

  /** Start the site-to-site HTTP endpoint. `portName`/`portId` appear
    * in the discovery document as one RUNNING input port (and, when
    * `egressDir` is given, one output port named `portName.out` with
    * id `portId-out`): a NiFi Remote Process Group pointed at
    * `http://host:port` discovers them and transfers. Committed
    * ingress transactions land in `spoolDir` as one JSONL file each;
    * egress serves (and deletes on confirm) packed `.ffv3` files from
    * `egressDir` — produce them with [[packFlowFiles]] or
    * [[writeEgress]]. `ttlSeconds` is the transaction lifetime the
    * server advertises and enforces; PUT extends it. */
  def listen(port: Int, spoolDir: String, portName: String = "graft",
             portId: String = "graft-in-0", egressDir: Option[String] = None,
             ttlSeconds: Int = 30, maxBodyBytes: Long = 256L << 20): S2sListener =
    listenOn(HttpServer.create(new InetSocketAddress(port), 0),
      spoolDir, portName, portId, egressDir, ttlSeconds, maxBodyBytes)

  /** TLS form of [[listen]] (NiFi site-to-site runs HTTPS in any real
    * deployment): the same endpoint contract over an HttpsServer keyed
    * by a PKCS12/JKS keystore (reusing [[ListenHttp.sslContext]] — the
    * SSL Context Service analog). Plain-HTTP peers are refused in the
    * TLS handshake before any protocol state exists. Pass the matching
    * SSLContext to [[send]]/[[pull]] to transfer against it. */
  def listenTls(port: Int, spoolDir: String, keystorePath: String,
                keystorePass: String, portName: String = "graft",
                portId: String = "graft-in-0", egressDir: Option[String] = None,
                ttlSeconds: Int = 30, maxBodyBytes: Long = 256L << 20): S2sListener = {
    val srv = com.sun.net.httpserver.HttpsServer.create(new InetSocketAddress(port), 0)
    srv.setHttpsConfigurator(new com.sun.net.httpserver.HttpsConfigurator(
      ListenHttp.sslContext(keystorePath, keystorePass)))
    listenOn(srv, spoolDir, portName, portId, egressDir, ttlSeconds, maxBodyBytes)
  }

  private def listenOn(server: HttpServer, spoolDir: String, portName: String,
                       portId: String, egressDir: Option[String],
                       ttlSeconds: Int, maxBodyBytes: Long): S2sListener = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    egressDir.foreach(d => Files.createDirectories(Paths.get(d)))
    val seq = new AtomicLong(0L)
    val txs = new ConcurrentHashMap[String, Tx]()
    val outPortId = s"$portId-out"

    def reap(): Unit = {
      val now = System.currentTimeMillis()
      txs.forEach { (id, tx) =>
        // an upload slower than the TTL must not be reaped mid-POST —
        // the busy flag covers the body read; the deadline re-arms after
        if (!tx.busy && tx.deadline < now) {
          txs.remove(id)
          if (tx.spool != null) { try Files.deleteIfExists(tx.spool) catch { case _: Throwable => () } }
          if (tx.claimed != null && tx.claimedOrig != null) {
            // give an unconfirmed egress claim back to the queue
            try Files.move(tx.claimed, tx.claimedOrig, StandardCopyOption.ATOMIC_MOVE)
            catch { case _: Throwable => () }
          }
        }
      }
    }

    def respondJson(ex: HttpExchange, status: Int, body: String): Unit = {
      val b = body.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, b.length.toLong)
      ex.getResponseBody.write(b)
    }
    def txResult(ex: HttpExchange, status: Int, code: Int, message: String,
                 sent: Int = 0): Unit =
      respondJson(ex, status,
        s"""{"responseCode":$code,"message":${jsonStr(message)},"flowFileSent":$sent}""")
    def query(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getQuery).map(_.split("&").flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
          case _           => None
        }
      }.toMap).getOrElse(Map.empty)

    // ---- discovery: controller + ports (+ peers)
    server.createContext("/nifi-api/site-to-site", (ex: HttpExchange) => {
      try {
        if (ex.getRequestMethod != "GET") ex.sendResponseHeaders(405, -1L)
        else if (ex.getRequestURI.getPath.endsWith("/peers")) {
          val host = Option(ex.getRequestHeaders.getFirst("Host")).getOrElse("localhost")
            .split(":")(0)
          respondJson(ex, 200,
            s"""{"peers":[{"hostname":${jsonStr(host)},"port":${server.getAddress.getPort},""" +
              s""""secure":false,"flowFileCount":0}]}""")
        } else {
          val outPorts = egressDir.map { _ =>
            s"""{"id":${jsonStr(outPortId)},"name":${jsonStr(portName + ".out")},""" +
              s""""type":"OUTPUT_PORT","state":"RUNNING"}"""
          }.toSeq.mkString(",")
          respondJson(ex, 200,
            s"""{"controller":{"id":"graft","name":"graft","siteToSiteSecure":false,""" +
              s""""remoteSiteHttpListeningPort":${server.getAddress.getPort},""" +
              s""""inputPorts":[{"id":${jsonStr(portId)},"name":${jsonStr(portName)},""" +
              s""""type":"INPUT_PORT","state":"RUNNING"}],""" +
              s""""outputPorts":[$outPorts]}}""")
        }
      } finally ex.close()
    })

    // ---- data transfer (both directions share the path prefix)
    server.createContext("/nifi-api/data-transfer", (ex: HttpExchange) => {
      try {
        reap()
        ex.getResponseHeaders.set("x-nifi-site-to-site-protocol-version", "1")
        val path = ex.getRequestURI.getPath.stripPrefix("/nifi-api/data-transfer/")
        val parts = path.split("/").filter(_.nonEmpty)
        (ex.getRequestMethod, parts) match {
          // create transaction
          case ("POST", Array(kind @ ("input-ports" | "output-ports"), pid, "transactions")) =>
            val wantId = if (kind == "input-ports") portId else outPortId
            if (pid != wantId) { txResult(ex, 404, 19, s"unknown port $pid") }
            else if (kind == "output-ports" && egressDir.isEmpty) {
              txResult(ex, 404, 19, "no output port configured")
            } else {
              val tx = new Tx(if (kind == "input-ports") "input" else "output")
              tx.deadline = System.currentTimeMillis() + ttlSeconds * 1000L
              if (tx.dir == "output") {
                // claim the oldest pending egress file atomically
                val ls = Files.list(Paths.get(egressDir.get))
                val cand =
                  try {
                    val it = ls.iterator()
                    val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
                    while (it.hasNext) {
                      val p = it.next()
                      if (p.getFileName.toString.endsWith(".ffv3")) buf += p
                    }
                    buf.sortBy(_.getFileName.toString).headOption
                  } finally ls.close()
                val claimedOpt = cand.flatMap { p =>
                  val txId = s"tx-${System.currentTimeMillis()}-${seq.getAndIncrement()}"
                  val claimed = p.resolveSibling(p.getFileName.toString + s".claimed-$txId")
                  try {
                    Files.move(p, claimed, StandardCopyOption.ATOMIC_MOVE)
                    Some((txId, p, claimed))
                  } catch {
                    case _: java.io.IOException => None // raced another tx
                  }
                }
                claimedOpt match {
                  case None =>
                    // nothing to transfer: answer OK with no transaction
                    // URL and the client backs off
                    txResult(ex, 200, 13, "no data available")
                  case Some((txId, orig, claimed)) =>
                    tx.claimed = claimed
                    tx.claimedOrig = orig
                    txs.put(txId, tx)
                    val loc = s"/nifi-api/data-transfer/$kind/$pid/transactions/$txId"
                    ex.getResponseHeaders.set("Location", loc)
                    ex.getResponseHeaders.set("x-location-uri-intent", "transaction-url")
                    txResult(ex, 201, 1, "transaction created")
                }
              } else {
                val txId = s"tx-${System.currentTimeMillis()}-${seq.getAndIncrement()}"
                txs.put(txId, tx)
                val loc = s"/nifi-api/data-transfer/$kind/$pid/transactions/$txId"
                ex.getResponseHeaders.set("Location", loc)
                ex.getResponseHeaders.set("x-location-uri-intent", "transaction-url")
                txResult(ex, 201, 1, "transaction created")
              }
            }
          // ingress data: spool + CRC, answer 202 with the checksum
          case ("POST", Array("input-ports", pid, "transactions", txId, "flow-files")) =>
            val tx = txs.get(txId)
            if (pid != portId || tx == null || tx.dir != "input") {
              txResult(ex, 404, 19, s"unknown transaction $txId")
            } else {
              tx.busy = true
              if (tx.spool == null) tx.spool = dir.resolve(s".tx-$txId.part")
              val out = Files.newOutputStream(tx.spool,
                java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
              var total = Files.size(tx.spool)
              var overflow = false
              try {
                val in = ex.getRequestBody
                val buf = new Array[Byte](64 * 1024)
                var n = in.read(buf)
                while (n >= 0 && !overflow) {
                  total += n
                  if (total > maxBodyBytes) overflow = true
                  else { out.write(buf, 0, n); tx.crc.update(buf, 0, n); n = in.read(buf) }
                }
              } finally { out.close(); tx.busy = false }
              if (overflow) {
                txs.remove(txId); Files.deleteIfExists(tx.spool)
                ex.sendResponseHeaders(413, -1L)
              } else {
                tx.deadline = System.currentTimeMillis() + ttlSeconds * 1000L
                val checksum = tx.crc.getValue.toString.getBytes(UTF_8)
                ex.sendResponseHeaders(202, checksum.length.toLong)
                ex.getResponseBody.write(checksum)
              }
            }
          // egress data: stream the claimed file, remember its CRC
          case ("GET", Array("output-ports", pid, "transactions", txId, "flow-files")) =>
            val tx = txs.get(txId)
            if (pid != outPortId || tx == null || tx.dir != "output") {
              txResult(ex, 404, 19, s"unknown transaction $txId")
            } else {
              val body = Files.readAllBytes(tx.claimed)
              // reset per GET: a client that retries the read (network
              // blip) must still be able to confirm — the expected
              // checksum is the CRC of ONE copy, not of the concatenation
              tx.crc.reset()
              tx.crc.update(body)
              tx.deadline = System.currentTimeMillis() + ttlSeconds * 1000L
              ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
              ex.sendResponseHeaders(200, if (body.isEmpty) -1L else body.length.toLong)
              if (body.nonEmpty) ex.getResponseBody.write(body)
            }
          // TTL extension
          case ("PUT", Array(_, _, "transactions", txId)) =>
            val tx = txs.get(txId)
            if (tx == null) txResult(ex, 404, 19, s"unknown transaction $txId")
            else {
              tx.deadline = System.currentTimeMillis() + ttlSeconds * 1000L
              txResult(ex, 200, 1, "transaction extended")
            }
          // commit / cancel
          case ("DELETE", Array(kind, _, "transactions", txId)) =>
            val tx = txs.remove(txId)
            if (tx == null) txResult(ex, 404, 19, s"unknown transaction $txId")
            else {
              val q = query(ex)
              val code = q.getOrElse("responseCode", "12")
              val confirm = code == "12" || code == "CONFIRM_TRANSACTION"
              if (!confirm) { // CANCEL_TRANSACTION(15) or anything else
                if (tx.spool != null) Files.deleteIfExists(tx.spool)
                if (tx.claimed != null)
                  Files.move(tx.claimed, tx.claimedOrig, StandardCopyOption.ATOMIC_MOVE)
                txResult(ex, 200, 15, "transaction cancelled")
              } else if (tx.dir == "input") {
                val want = tx.crc.getValue.toString
                if (!q.get("checksum").contains(want)) {
                  if (tx.spool != null) Files.deleteIfExists(tx.spool)
                  txResult(ex, 400, 19, "checksum mismatch — transaction discarded")
                } else {
                  // commit: unpack and spool one JSONL file atomically
                  val packed =
                    if (tx.spool == null) Array.emptyByteArray
                    else Files.readAllBytes(tx.spool)
                  val files = unpackFlowFiles(packed)
                  val lines = files.map { case (attrs, content) =>
                    val a = attrs.toSeq.sortBy(_._1).map { case (k, v) =>
                      s"${jsonStr(k)}:${jsonStr(v)}"
                    }.mkString(",")
                    s"""{"attrs":{$a},"content_b64":${jsonStr(
                      java.util.Base64.getEncoder.encodeToString(content))}}"""
                  }
                  val name = s"${System.currentTimeMillis()}-${seq.getAndIncrement()}.jsonl"
                  val tmp = dir.resolve(name + ".tmp")
                  Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(UTF_8))
                  Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
                  if (tx.spool != null) Files.deleteIfExists(tx.spool)
                  txResult(ex, 200, 13, "transaction finished", files.size)
                }
              } else { // egress confirm: client echoes the server's CRC
                val want = tx.crc.getValue.toString
                if (!q.get("checksum").contains(want)) {
                  Files.move(tx.claimed, tx.claimedOrig, StandardCopyOption.ATOMIC_MOVE)
                  txResult(ex, 400, 19, "checksum mismatch — claim returned")
                } else {
                  Files.deleteIfExists(tx.claimed)
                  txResult(ex, 200, 13, "transaction finished")
                }
              }
            }
          case _ => ex.sendResponseHeaders(405, -1L)
        }
      } finally ex.close()
    })

    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(
      8, (r: Runnable) => { val t = new Thread(r, "graft-s2s"); t.setDaemon(true); t }))
    server.start()
    new S2sListener(server, portId)
  }

  // ------------------------------------------------------------- client

  private def http(method: String, url: String, body: Array[Byte] = null,
                   headers: Map[String, String] = Map.empty,
                   ssl: Option[javax.net.ssl.SSLContext] = None): (Int, Array[Byte], java.net.http.HttpHeaders) = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = (method match {
      case "GET"    => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, if (body == null)
        java.net.http.HttpRequest.BodyPublishers.noBody()
      else java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
    }).build()
    val cb = java.net.http.HttpClient.newBuilder()
    ssl.foreach(cb.sslContext)
    val resp = cb.build().send(req, java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    (resp.statusCode(), resp.body(), resp.headers())
  }

  /** Push FlowFiles into a site-to-site HTTP endpoint — the full
    * client-side handshake (discover → create transaction → POST the
    * packed stream → confirm with the server's checksum). Works
    * against this file's own [[listen]] and, by protocol, against a
    * real NiFi input port; returns the committed FlowFile count. */
  def send(baseUrl: String, portName: String,
           files: Seq[(Map[String, String], Array[Byte])],
           ssl: Option[javax.net.ssl.SSLContext] = None): Int = {
    val (ds, disco, _) = http("GET", s"$baseUrl/nifi-api/site-to-site", ssl = ssl)
    require(ds == 200, s"s2s discovery failed: $ds")
    val json = new String(disco, UTF_8)
    val portId = ("\"inputPorts\":\\[.*?\\{\"id\":\"([^\"]+)\",\"name\":\"" +
      java.util.regex.Pattern.quote(portName) + "\"").r
      .findFirstMatchIn(json).map(_.group(1))
      .getOrElse(sys.error(s"s2s: no input port named '$portName' in $json"))
    val (cs, _, ch) = http("POST",
      s"$baseUrl/nifi-api/data-transfer/input-ports/$portId/transactions",
      headers = Map("x-nifi-site-to-site-protocol-version" -> "1"), ssl = ssl)
    require(cs == 201, s"s2s create-transaction failed: $cs")
    val loc = ch.firstValue("Location").orElseThrow()
    val packed = packFlowFiles(files)
    val crc = new java.util.zip.CRC32()
    crc.update(packed)
    val (ps, serverSum, _) = http("POST", s"$baseUrl$loc/flow-files", packed,
      Map("Content-Type" -> "application/octet-stream"), ssl = ssl)
    require(ps == 202, s"s2s data POST failed: $ps")
    require(new String(serverSum, UTF_8) == crc.getValue.toString,
      s"s2s: server checksum ${new String(serverSum, UTF_8)} != client ${crc.getValue}")
    val (dsc, _, _) = http("DELETE",
      s"$baseUrl$loc?responseCode=12&checksum=${crc.getValue}", ssl = ssl)
    require(dsc == 200, s"s2s confirm failed: $dsc")
    files.size
  }

  /** Pull FlowFiles from a site-to-site HTTP OUTPUT port (the egress
    * direction): create a transaction, GET the packed stream, confirm
    * with its CRC32, unpack. Returns Nil when the port has no data. */
  def pull(baseUrl: String, portName: String,
           ssl: Option[javax.net.ssl.SSLContext] = None): Seq[(Map[String, String], Array[Byte])] = {
    val (ds, disco, _) = http("GET", s"$baseUrl/nifi-api/site-to-site", ssl = ssl)
    require(ds == 200, s"s2s discovery failed: $ds")
    val json = new String(disco, UTF_8)
    val portId = ("\"outputPorts\":\\[.*?\\{\"id\":\"([^\"]+)\",\"name\":\"" +
      java.util.regex.Pattern.quote(portName) + "\"").r
      .findFirstMatchIn(json).map(_.group(1))
      .getOrElse(sys.error(s"s2s: no output port named '$portName' in $json"))
    val (cs, _, ch) = http("POST",
      s"$baseUrl/nifi-api/data-transfer/output-ports/$portId/transactions",
      headers = Map("x-nifi-site-to-site-protocol-version" -> "1"), ssl = ssl)
    if (cs == 200) return Nil // no data available
    require(cs == 201, s"s2s create-transaction failed: $cs")
    val loc = ch.firstValue("Location").orElseThrow()
    val (gs, packed, _) = http("GET", s"$baseUrl$loc/flow-files", ssl = ssl)
    require(gs == 200, s"s2s data GET failed: $gs")
    val crc = new java.util.zip.CRC32()
    crc.update(packed)
    val (dsc, _, _) = http("DELETE",
      s"$baseUrl$loc?responseCode=12&checksum=${crc.getValue}", ssl = ssl)
    require(dsc == 200, s"s2s confirm failed: $dsc")
    unpackFlowFiles(packed)
  }

  /** Push a DataFrame into a REMOTE site-to-site endpoint from the
    * executors — the Remote-Process-Group egress direction as a sink:
    * one transaction per PARTITION (opened on the executor, the
    * [[graft.streaming.Net]] per-partition-connection posture), each
    * row one FlowFile with `attrCols` string-cast as attributes and
    * `contentCol` as the payload. A partition's FlowFiles pack into
    * one v3 stream in memory before the POST — size partitions
    * accordingly (the same bound a NiFi RPG batch has). Checksum
    * confirmation per transaction: a partition either commits whole or
    * fails loudly. */
  def putSiteToSite(df: org.apache.spark.sql.DataFrame, baseUrl: String, portName: String,
                    contentCol: String = "content", attrCols: Seq[String] = Nil,
                    keystore: Option[(String, String)] = None): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = attrCols.map(c => col(c).cast("string")) :+ col(contentCol).cast("binary")
    val names = attrCols
    df.select(cols: _*).foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val files = rows.map { r =>
        val attrs = names.zipWithIndex.map { case (c, i) =>
          c -> Option(r.getString(i)).getOrElse("")
        }.toMap
        val content = Option(r.getAs[Array[Byte]](names.length))
          .getOrElse(Array.emptyByteArray)
        (attrs, content)
      }.toVector
      if (files.nonEmpty) {
        // keystore (path, pass) travels as strings — SSLContext is not
        // serializable; each executor builds its own trust context
        val ssl = keystore.map { case (ks, pass) => ListenHttp.sslContext(ks, pass) }
        send(baseUrl, portName, files, ssl = ssl); ()
      }
    }
  }

  /** Queue FlowFiles for the egress port: one `.ffv3` packed file,
    * atomically renamed into `egressDir` (a pulling peer claims whole
    * files, oldest first). */
  private val egressSeq = new AtomicLong(0L)
  // fixed per-JVM token: two PROCESSES feeding one egress directory
  // must never collide on a name (ATOMIC_MOVE rename silently REPLACES
  // an existing target — a deterministic counter alone made first-write
  // collisions likely); per-writer ordering stays monotonic, cross-
  // writer same-millisecond order is arbitrary, which the queue allows
  private val egressToken =
    f"${java.util.concurrent.ThreadLocalRandom.current().nextInt(0x1000000)}%06x"

  def writeEgress(egressDir: String, files: Seq[(Map[String, String], Array[Byte])]): Unit = {
    require(files.nonEmpty, "writeEgress: empty batch — an empty claim file serves nothing")
    val dir = Paths.get(egressDir)
    Files.createDirectories(dir)
    // zero-padded millis + in-JVM monotonic counter: the egress queue
    // is served oldest-first BY FILENAME SORT, so same-millisecond
    // writes need a monotonic tiebreak and every numeric field a fixed
    // width (a bare nanoTime%1e6 suffix string-sorted "5" before "123"
    // — observed as a reordered queue under a fast writer)
    val name =
      f"${System.currentTimeMillis()}%013d-${egressSeq.getAndIncrement()}%06d-$egressToken.ffv3"
    val tmp = dir.resolve(name + ".tmp")
    Files.write(tmp, packFlowFiles(files))
    Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }
}
