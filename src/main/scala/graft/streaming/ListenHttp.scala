package graft.streaming

import java.net.InetSocketAddress
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, regexp_extract}

/** ListenHTTP (NiFi's push-ingestion endpoint), Spark-first: an
  * in-process HTTP server spools each POST body to a file in
  * `spoolDir`; a [[Streams.fileStream]] / [[Streams.binaryFileStream]]
  * over that directory turns the spool into a structured stream —
  * exactly-once from the spool onward, back-pressured by
  * `maxFilesPerTrigger`.
  *
  * Files appear ATOMICALLY (written to a `.tmp` sibling then renamed)
  * so the file source never reads a half-written body. One file per
  * request keeps the contract simple; batch upstream for tiny-record
  * workloads. Like Spark's socket source this is a single-receiver
  * ingress — at scale, terminate HTTP at a distributed log and swap
  * the source line; the downstream flow binds to the directory/stream,
  * not the server.
  */
object ListenHttp {

  /** Spool the request body to `tmp` in 64 KiB chunks; returns true on
    * overflow (> maxBodyBytes). On overflow the REST OF THE BODY IS
    * DRAINED (discarded, bounded at maxBodyBytes + 64 MiB extra) before
    * returning: com.sun's HttpServer closes an exchange with unread
    * input by resetting the TCP connection, so without the drain a
    * still-streaming client sees an IOException instead of the 413 we
    * are about to send. The bound keeps a malicious infinite stream
    * from pinning the handler thread forever — past it we give up and
    * accept the reset. */
  private def spoolBody(in: java.io.InputStream, tmp: Path, maxBodyBytes: Long): Boolean = {
    val out = Files.newOutputStream(tmp)
    var written = 0L
    var overflow = false
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0 && !overflow) {
        written += n
        if (written > maxBodyBytes) overflow = true
        else { out.write(buf, 0, n); n = in.read(buf) }
      }
      if (overflow) {
        val drainCap = maxBodyBytes + (64L << 20)
        var drained = written
        var m = in.read(buf)
        while (m >= 0 && drained < drainCap) { drained += m; m = in.read(buf) }
      }
    } finally out.close()
    overflow
  }

  /** Start the endpoint. POST /<path> with a body → one spool file
    * `<epochMs>-<seq><suffix>`; responds 200 with the filename.
    * Non-POST methods get 405; bodies over `maxBodyBytes` get 413 (the
    * partial spool is discarded and the remaining body drained so the
    * status actually reaches the client — see [[spoolBody]]). Request
    * bodies STREAM straight to the `.tmp` spool file in 64 KiB chunks —
    * constant memory per handler thread, so an oversized or malicious
    * POST can't OOM the ingest JVM. Returns the running server —
    * callers own its lifecycle (`stop(0)`). Port 0 picks a free port
    * (`server.getAddress.getPort`). */
  def start(port: Int, spoolDir: String, path: String = "/ingest",
            suffix: String = ".dat", handlerThreads: Int = 8,
            maxBodyBytes: Long = 256L << 20): HttpServer =
    startOn(HttpServer.create(new InetSocketAddress(port), 0),
      spoolDir, path, suffix, handlerThreads, maxBodyBytes)

  /** TLS form of [[start]] (NiFi runs its listeners HTTPS-always): same
    * ingest contract over `com.sun.net.httpserver.HttpsServer`, keyed
    * by a caller-supplied PKCS12/JKS keystore (NiFi's 'SSL Context
    * Service'). Plain-HTTP clients are refused at the TLS layer before
    * any handler runs. The spec generates a self-signed keystore with
    * the JDK's own keytool and drives a client that trusts it. */
  def startTls(port: Int, spoolDir: String, keystorePath: String,
               keystorePass: String, path: String = "/ingest",
               suffix: String = ".dat", handlerThreads: Int = 8,
               maxBodyBytes: Long = 256L << 20): com.sun.net.httpserver.HttpsServer = {
    val server = com.sun.net.httpserver.HttpsServer.create(new InetSocketAddress(port), 0)
    server.setHttpsConfigurator(
      new com.sun.net.httpserver.HttpsConfigurator(sslContext(keystorePath, keystorePass)))
    startOn(server, spoolDir, path, suffix, handlerThreads, maxBodyBytes)
      .asInstanceOf[com.sun.net.httpserver.HttpsServer]
  }

  /** SSLContext from a keystore file — shared by [[startTls]] and any
    * client that wants to trust the same self-signed cert (the spec's
    * truststore is the keystore). Store type inferred by extension
    * (.p12/.pfx → PKCS12, else JKS). */
  def sslContext(keystorePath: String, keystorePass: String): javax.net.ssl.SSLContext = {
    val storeType =
      if (keystorePath.endsWith(".p12") || keystorePath.endsWith(".pfx")) "PKCS12" else "JKS"
    val ks = java.security.KeyStore.getInstance(storeType)
    val in = Files.newInputStream(Paths.get(keystorePath))
    try ks.load(in, keystorePass.toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, keystorePass.toCharArray)
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)
    ctx
  }

  private def startOn(server: HttpServer, spoolDir: String, path: String,
                      suffix: String, handlerThreads: Int,
                      maxBodyBytes: Long): HttpServer = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    val seq = new AtomicLong(0L)
    server.createContext(path, (ex: HttpExchange) => {
      try {
        if (ex.getRequestMethod != "POST") {
          ex.sendResponseHeaders(405, -1L)
        } else {
          val name = s"${System.currentTimeMillis()}-${seq.getAndIncrement()}$suffix"
          val tmp: Path = dir.resolve(name + ".tmp")
          val overflow = spoolBody(ex.getRequestBody, tmp, maxBodyBytes)
          if (overflow) {
            Files.deleteIfExists(tmp)
            ex.sendResponseHeaders(413, -1L)
          } else {
            // rename is atomic on the same filesystem: the stream source
            // either sees the complete file or nothing
            Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
            val resp = name.getBytes("UTF-8")
            ex.sendResponseHeaders(200, resp.length.toLong)
            ex.getResponseBody.write(resp)
          }
        }
      } finally ex.close()
    })
    // concurrent request handling (the default executor serializes on
    // the dispatch thread); spool names stay unique via the AtomicLong.
    // Daemon threads: server.stop() has no executor hook, so the pool
    // must never pin the JVM
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(
      handlerThreads,
      (r: Runnable) => { val t = new Thread(r, "graft-listen-http"); t.setDaemon(true); t }))
    server.start()
    server
  }

  // --------------------------------------- HandleHttpRequest/Response

  /** HandleHttpRequest + HandleHttpResponse (NiFi's synchronous
    * request-reply pair): each POST spools with a correlation id (the
    * spool FILENAME), then the handler blocks until a flow deposits
    * `<id>.resp` in `replyDir` — written by [[writeReplies]] from any
    * batch or `foreachBatch` streaming leg — and answers 200 with that
    * body. No reply within `replyTimeoutMs` → 504.
    *
    * The reply channel is a directory, not driver memory, so the flow
    * side stays fully distributed (executors write reply files
    * directly; any shared filesystem works across JVMs). Synchronous
    * capacity = `handlerThreads` in-flight exchanges — an edge
    * request-reply ingress, same single-receiver contract as [[start]];
    * scale out by fronting with a load balancer over several
    * instances. */
  def startRequestReply(port: Int, spoolDir: String, replyDir: String,
                        path: String = "/exchange", suffix: String = ".dat",
                        handlerThreads: Int = 8, maxBodyBytes: Long = 256L << 20,
                        replyTimeoutMs: Long = 30000L, pollMs: Long = 25L): HttpServer = {
    val dir = Paths.get(spoolDir)
    val replies = Paths.get(replyDir)
    Files.createDirectories(dir)
    Files.createDirectories(replies)
    val seq = new AtomicLong(0L)
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext(path, (ex: HttpExchange) => {
      try {
        if (ex.getRequestMethod != "POST") {
          ex.sendResponseHeaders(405, -1L)
        } else {
          val id = s"${System.currentTimeMillis()}-${seq.getAndIncrement()}"
          val tmp: Path = dir.resolve(id + suffix + ".tmp")
          val overflow = spoolBody(ex.getRequestBody, tmp, maxBodyBytes)
          if (overflow) {
            Files.deleteIfExists(tmp)
            ex.sendResponseHeaders(413, -1L)
          } else {
            Files.move(tmp, dir.resolve(id + suffix), StandardCopyOption.ATOMIC_MOVE)
            // block this handler thread until the flow replies or the
            // deadline passes; .resp files appear atomically (tmp+rename
            // in writeReplies) so a read never sees a partial body
            val respFile = replies.resolve(id + ".resp")
            val deadline = System.currentTimeMillis() + replyTimeoutMs
            while (!Files.exists(respFile) && System.currentTimeMillis() < deadline)
              Thread.sleep(pollMs)
            if (Files.exists(respFile)) {
              val body = Files.readAllBytes(respFile)
              Files.deleteIfExists(respFile)
              ex.sendResponseHeaders(200, if (body.length == 0) -1L else body.length.toLong)
              if (body.length > 0) ex.getResponseBody.write(body)
            } else ex.sendResponseHeaders(504, -1L)
          }
        }
      } finally ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(
      handlerThreads,
      (r: Runnable) => { val t = new Thread(r, "graft-http-exchange"); t.setDaemon(true); t }))
    server.start()
    server
  }

  /** Correlation id column for a spooled request row: strips directory
    * and `suffix` from the file-source `path` column. */
  def correlationId(pathCol: org.apache.spark.sql.Column, suffix: String = ".dat"): org.apache.spark.sql.Column =
    regexp_extract(pathCol, "([^/]+)" + java.util.regex.Pattern.quote(suffix) + "$", 1)

  /** Flow-side reply leg: writes one `<id>.resp` per row into
    * `replyDir` (tmp + atomic rename), straight from executors — call
    * on a batch result or inside `foreachBatch`. `bodyCol` may be
    * string or binary. */
  def writeReplies(df: DataFrame, replyDir: String,
                   idCol: String = "id", bodyCol: String = "body"): Unit = {
    df.select(col(idCol).cast("string"), col(bodyCol).cast("binary"))
      .foreachPartition { rows: Iterator[Row] =>
        val d = Paths.get(replyDir)
        Files.createDirectories(d)
        rows.foreach { r =>
          val id = r.getString(0)
          require(id != null && id.nonEmpty && !id.contains('/'),
            s"bad correlation id '$id'")
          val tmp = d.resolve(id + ".resp.tmp")
          Files.write(tmp, r.getAs[Array[Byte]](1))
          Files.move(tmp, d.resolve(id + ".resp"), StandardCopyOption.ATOMIC_MOVE)
        }
      }
  }
}
