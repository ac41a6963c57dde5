package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** ListenUDP / PutTCP / PutUDP (NiFi's datagram + socket edge
  * processors), Spark-first.
  *
  * Ingress mirrors [[ListenHttp]]: a receiver thread spools datagrams
  * to files (atomic tmp+rename), a file stream over the spool directory
  * is the actual source — exactly-once from the spool onward, and the
  * flow binds to the directory, not the socket. Egress writes straight
  * from executors, one connection per PARTITION (not per row), so the
  * connection count scales with parallelism, not data volume.
  */
object Net {

  /** Handle for a running UDP listener. */
  final class UdpListener private[Net] (val socket: DatagramSocket,
                                        stopFlag: AtomicBoolean,
                                        thread: Thread) {
    def port: Int = socket.getLocalPort
    def stop(): Unit = {
      stopFlag.set(true)
      socket.close() // unblocks receive()
      thread.join(5000)
    }
  }

  /** ListenUDP: spool datagrams to `spoolDir`, BATCHED — one spool file
    * per `batchSize` datagrams (or on `flushMs` idle timeout), one line
    * per datagram (UTF-8 text payloads; newlines inside a datagram are
    * escaped to `\n`). Read the spool with
    * `spark.readStream.format("text")` / [[Streams.fileStream]].
    * Batching matters: UDP rates make one-file-per-datagram unreadable
    * for any file source. Single-receiver ingress like the socket
    * source — front with a distributed log at scale; the downstream
    * flow never changes. Port 0 picks a free port (`listener.port`). */
  def listenUdp(port: Int, spoolDir: String, batchSize: Int = 100,
                flushMs: Long = 250L, maxPacketBytes: Int = 64 * 1024,
                suffix: String = ".log"): UdpListener = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    val socket = new DatagramSocket(port)
    socket.setSoTimeout(flushMs.toInt.max(1))
    val stop = new AtomicBoolean(false)
    val seq = new AtomicLong(0L)
    val thread = new Thread(() => {
      val batch = new scala.collection.mutable.ArrayBuffer[String](batchSize)
      def flush(): Unit = if (batch.nonEmpty) {
        val name = s"${System.currentTimeMillis()}-${seq.getAndIncrement()}$suffix"
        val tmp = dir.resolve(name + ".tmp")
        Files.write(tmp, batch.mkString("", "\n", "\n").getBytes(UTF_8))
        Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
        batch.clear()
      }
      val buf = new Array[Byte](maxPacketBytes)
      while (!stop.get()) {
        val pkt = new DatagramPacket(buf, buf.length)
        try {
          socket.receive(pkt)
          val line = new String(pkt.getData, pkt.getOffset, pkt.getLength, UTF_8)
          // escape ALL line terminators Hadoop's reader recognizes —
          // \r\n, \n, and bare \r (a lone CR also splits lines there,
          // which would break the one-datagram-one-line spool invariant)
          batch += line.replace("\r\n", "\\n").replace("\n", "\\n").replace("\r", "\\n")
          if (batch.size >= batchSize) flush()
        } catch {
          case _: java.net.SocketTimeoutException => flush() // idle → drain
          case _: java.net.SocketException if stop.get() => // closed by stop()
        }
      }
      flush()
    }, "graft-listen-udp")
    thread.setDaemon(true)
    thread.start()
    new UdpListener(socket, stop, thread)
  }

  /** Handle for a running TCP listener. */
  final class TcpListener private[Net] (server: ServerSocket,
                                        stopFlag: AtomicBoolean,
                                        thread: Thread) {
    def port: Int = server.getLocalPort
    def stop(): Unit = {
      stopFlag.set(true)
      server.close() // unblocks accept()
      thread.join(5000)
    }
  }

  /** ListenTCP (NiFi's newline-delimited socket ingress), server side:
    * accepts connections on `port` and spools each received LINE into
    * batched files in `spoolDir` (atomic tmp+rename, same contract as
    * [[listenUdp]]) — the actual flow source is a text file stream over
    * the spool, so ingestion is exactly-once from the spool onward and
    * survives restarts, unlike Spark's in-memory socket source. One
    * reader thread per connection; the shared batch buffer flushes at
    * `batchSize` lines or `flushMs` idle. Port 0 picks a free port
    * (`listener.port`). Single-receiver ingress — front with a
    * distributed log at scale; the downstream flow binds to the
    * directory, not the socket. */
  def listenTcp(port: Int, spoolDir: String, batchSize: Int = 100,
                flushMs: Long = 250L, suffix: String = ".log",
                ssl: Option[javax.net.ssl.SSLContext] = None): TcpListener = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    // `ssl` = TLS ListenTCP / ListenSyslog-over-TLS (NiFi's 'SSL
    // Context Service' slot on both): the handshake runs lazily on the
    // session's first read, so a plaintext peer dies in the record
    // layer before a line parses — its reader thread catches
    // IOException and nothing spools (the r17 listener-family
    // plaintext-refusal contract).
    val server = ssl match {
      case Some(ctx) => ctx.getServerSocketFactory.createServerSocket(port)
      case None => new ServerSocket(port)
    }
    val stop = new AtomicBoolean(false)
    val seq = new AtomicLong(0L)
    val batch = new scala.collection.mutable.ArrayBuffer[String](batchSize)
    // The lock covers only the buffer swap + name claim (O(batch)
    // pointer copies); the spool write happens OUTSIDE it, so reader
    // threads keep appending while a flush is on disk I/O — r11's
    // version held the lock across Files.write, stalling every
    // connection for the duration of each spool write. Claiming the
    // (millis, seq) name inside the lock keeps file order = line
    // arrival order even when two flushes race to the write.
    def flush(): Unit = {
      val drained = batch.synchronized {
        if (batch.isEmpty) None
        else {
          val lines = batch.toArray
          batch.clear()
          Some((lines, s"${System.currentTimeMillis()}-${seq.getAndIncrement()}$suffix"))
        }
      }
      drained.foreach { case (lines, name) =>
        val tmp = dir.resolve(name + ".tmp")
        Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(UTF_8))
        Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      }
    }
    val accept = new Thread(() => {
      // periodic idle flush rides the accept loop's SoTimeout so a
      // trickle of lines isn't held hostage to batchSize
      server.setSoTimeout(flushMs.toInt.max(1))
      while (!stop.get()) {
        try {
          val sock = server.accept()
          val reader = new Thread(() => {
            try {
              val in = new java.io.BufferedReader(
                new java.io.InputStreamReader(sock.getInputStream, UTF_8))
              var line = in.readLine()
              while (line != null && !stop.get()) {
                val doFlush = batch.synchronized {
                  batch += line; batch.size >= batchSize
                }
                if (doFlush) flush()
                line = in.readLine()
              }
            } catch { case _: java.io.IOException => () } // peer reset
            finally { try sock.close() catch { case _: Throwable => () }
                      flush() } // connection end drains its tail
          }, "graft-listen-tcp-conn")
          reader.setDaemon(true)
          reader.start()
        } catch {
          case _: java.net.SocketTimeoutException => flush() // idle drain
          case _: java.net.SocketException if stop.get() => // closed by stop()
        }
      }
      flush()
    }, "graft-listen-tcp")
    accept.setDaemon(true)
    accept.start()
    new TcpListener(server, stop, accept)
  }

  /** PutTCP: write a string column over TCP, newline-delimited, ONE
    * connection per partition opened on the executor (never the
    * driver). Distributed fan-in: the receiver sees `numPartitions`
    * concurrent connections — size partitions accordingly or front
    * with a load balancer. */
  def putTcp(df: DataFrame, host: String, port: Int,
             valueCol: String = "value", connectTimeoutMs: Int = 5000): Unit =
    df.select(col(valueCol).cast("string")).foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val sock = new Socket()
        try {
          sock.connect(new InetSocketAddress(host, port), connectTimeoutMs)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream, 64 * 1024)
          rows.foreach { r =>
            out.write(r.getString(0).getBytes(UTF_8)); out.write('\n')
          }
          out.flush()
        } finally sock.close()
      }
    }

  /** PutUDP: one datagram per row from a shared per-partition socket.
    * Fire-and-forget semantics (UDP): no delivery guarantee — NiFi's
    * contract too. Rows longer than `maxPacketBytes` fail the task
    * rather than truncate silently. */
  def putUdp(df: DataFrame, host: String, port: Int,
             valueCol: String = "value", maxPacketBytes: Int = 64 * 1024): Unit =
    df.select(col(valueCol).cast("string")).foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val socket = new DatagramSocket()
        val target = new InetSocketAddress(host, port)
        try rows.foreach { r =>
          val bytes = r.getString(0).getBytes(UTF_8)
          require(bytes.length <= maxPacketBytes,
            s"row of ${bytes.length} B exceeds datagram limit $maxPacketBytes")
          socket.send(new DatagramPacket(bytes, bytes.length, target))
        } finally socket.close()
      }
    }
}
