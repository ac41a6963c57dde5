package graft.streaming

import java.net.InetSocketAddress
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}

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

  /** Start the endpoint. POST /<path> with a body → one spool file
    * `<epochMs>-<seq><suffix>`; responds 200 with the filename.
    * Non-POST methods get 405; bodies over `maxBodyBytes` get 413 (the
    * partial spool is discarded). Request bodies STREAM straight to the
    * `.tmp` spool file in 64 KiB chunks — constant memory per handler
    * thread, so an oversized or malicious POST can't OOM the ingest
    * JVM. Returns the running server — callers own its lifecycle
    * (`stop(0)`). Port 0 picks a free port
    * (`server.getAddress.getPort`). */
  def start(port: Int, spoolDir: String, path: String = "/ingest",
            suffix: String = ".dat", handlerThreads: Int = 8,
            maxBodyBytes: Long = 256L << 20): HttpServer = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    val seq = new AtomicLong(0L)
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext(path, (ex: HttpExchange) => {
      try {
        if (ex.getRequestMethod != "POST") {
          ex.sendResponseHeaders(405, -1L)
        } else {
          val name = s"${System.currentTimeMillis()}-${seq.getAndIncrement()}$suffix"
          val tmp: Path = dir.resolve(name + ".tmp")
          val in = ex.getRequestBody
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
          } finally out.close()
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
}
