package graft.tools

import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Ingress-ceiling receipt for the r14 AMQP edge — the
  * [[MqttThroughputProbe]] protocol applied to `Amqp.listenAmqp`:
  * `nConns` raw-socket 0-9-1 clients blast `nMsgs` total ~60 B
  * publishes (no confirms — the ceiling) at one listener; wall time
  * runs from first send to all messages durably spooled.
  *
  * Usage: `sbt "runMain graft.tools.AmqpThroughputProbe [nMsgs] [nConns] [out.json]"`
  */
object AmqpThroughputProbe {
  def main(args: Array[String]): Unit = {
    val nMsgs = if (args.length > 0) args(0).toInt else 500000
    val nConns = if (args.length > 1) args(1).toInt else 8
    val out = if (args.length > 2) args(2) else "tools/amqpprobe_r14.json"
    val spool = Files.createTempDirectory("graft_amqp_probe").toString
    val listener = graft.streaming.Amqp.listenAmqp(0, spool, batchSize = 5000)
    val perConn = nMsgs / nConns

    def w16(v: Int) = Array[Byte]((v >>> 8).toByte, (v & 0xFF).toByte)
    def w32(v: Long) = Array[Byte]((v >>> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def w64(v: Long) = w32(v >>> 32) ++ w32(v & 0xFFFFFFFFL)
    def ss(s: String) = { val u = s.getBytes(UTF_8); Array[Byte](u.length.toByte) ++ u }
    def ls(s: String) = { val u = s.getBytes(UTF_8); w32(u.length) ++ u }
    def frame(tpe: Int, ch: Int, p: Array[Byte]) =
      Array(tpe.toByte) ++ w16(ch) ++ w32(p.length) ++ p ++ Array(0xCE.toByte)

    val t0 = System.nanoTime()
    val threads = (0 until nConns).map { c =>
      val t = new Thread(() => {
        val sock = new Socket()
        sock.connect(new InetSocketAddress("127.0.0.1", listener.port), 5000)
        val os = new java.io.BufferedOutputStream(sock.getOutputStream, 256 * 1024)
        val is = sock.getInputStream
        def drainMethod(): Unit = { // read one server frame, discard
          val head = new Array[Byte](7)
          var off = 0
          while (off < 7) { val n = is.read(head, off, 7 - off); require(n > 0); off += n }
          val size = ((head(3) & 0xFF) << 24) | ((head(4) & 0xFF) << 16) |
            ((head(5) & 0xFF) << 8) | (head(6) & 0xFF)
          is.skipNBytes(size + 1L)
        }
        os.write(Array[Byte]('A', 'M', 'Q', 'P', 0, 0, 9, 1)); os.flush()
        drainMethod() // Start
        os.write(frame(1, 0, w16(10) ++ w16(11) ++ w32(0) ++ ss("PLAIN") ++ ls(" t t") ++ ss("en_US"))); os.flush()
        drainMethod() // Tune
        os.write(frame(1, 0, w16(10) ++ w16(31) ++ w16(2047) ++ w32(1 << 20) ++ w16(0)))
        os.write(frame(1, 0, w16(10) ++ w16(40) ++ ss("/") ++ Array[Byte](0, 0))); os.flush()
        drainMethod() // Open-Ok
        os.write(frame(1, 1, w16(20) ++ w16(10) ++ ss(""))); os.flush()
        drainMethod() // Channel.Open-Ok
        var i = 0
        while (i < perConn) {
          val body = s"conn$c msg$i payload-abcdefghijklmnopqrstuvwxyz-0123".getBytes(UTF_8)
          os.write(frame(1, 1, w16(60) ++ w16(40) ++ w16(0) ++ ss("") ++ ss(s"probe.$c") ++ Array[Byte](0)))
          os.write(frame(2, 1, w16(60) ++ w16(0) ++ w64(body.length) ++ w16(0)))
          os.write(frame(3, 1, body))
          i += 1
        }
        os.flush()
        sock.close()
      }, s"amqp-probe-$c")
      t.start(); t
    }
    threads.foreach(_.join())
    val sent = perConn.toLong * nConns
    def spooled(): Long =
      Files.list(Paths.get(spool)).iterator().asScala
        .filter(_.toString.endsWith(".jsonl"))
        .map(p => Files.readAllBytes(p).count(_ == '\n'.toByte).toLong).sum
    val deadline = System.currentTimeMillis() + 120000
    while (spooled() < sent && System.currentTimeMillis() < deadline) Thread.sleep(200)
    val wall = (System.nanoTime() - t0) / 1e9
    val landed = spooled()
    val json =
      f"""{"probe":"amqp_ingress_r14","msgs":$sent,"conns":$nConns,"landed":$landed,"wall_sec":$wall%.1f,"msgs_per_min":${(landed / wall * 60).toLong}}"""
    Files.write(Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    listener.stop()
  }
}
