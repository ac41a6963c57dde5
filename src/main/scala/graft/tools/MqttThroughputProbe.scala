package graft.tools

import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Ingress-ceiling receipt for the r14 MQTT edge — the
  * [[WsThroughputProbe]] protocol applied to `Mqtt.listenMqtt`:
  * `nConns` raw-socket MQTT 3.1.1 clients blast `nMsgs` total ~60 B
  * QoS-0 publishes at one listener; wall time runs from first send to
  * all messages durably spooled (tmp+rename only). Same
  * single-receiver calibration contract as every Listen* here: the
  * distributed path is the spool directory the flow binds to.
  *
  * Usage: `sbt "runMain graft.tools.MqttThroughputProbe [nMsgs] [nConns] [out.json]"`
  */
object MqttThroughputProbe {
  def main(args: Array[String]): Unit = {
    val nMsgs = if (args.length > 0) args(0).toInt else 500000
    val nConns = if (args.length > 1) args(1).toInt else 8
    val out = if (args.length > 2) args(2) else "tools/mqttprobe_r14.json"
    val spool = Files.createTempDirectory("graft_mqtt_probe").toString
    val listener = graft.streaming.Mqtt.listenMqtt(0, spool, batchSize = 5000)
    val perConn = nMsgs / nConns

    def rl(len: Int): Array[Byte] = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var x = len
      do { var d = x % 128; x /= 128; if (x > 0) d |= 0x80; b += d.toByte } while (x > 0)
      b.toArray
    }
    def str(s: String): Array[Byte] = {
      val u = s.getBytes(UTF_8)
      Array[Byte]((u.length >>> 8).toByte, (u.length & 0xFF).toByte) ++ u
    }

    val t0 = System.nanoTime()
    val threads = (0 until nConns).map { c =>
      val t = new Thread(() => {
        val sock = new Socket()
        sock.connect(new InetSocketAddress("127.0.0.1", listener.port), 5000)
        sock.setTcpNoDelay(false)
        val os = new java.io.BufferedOutputStream(sock.getOutputStream, 256 * 1024)
        val is = sock.getInputStream
        val connBody = str("MQTT") ++ Array[Byte](4, 2, 0, 60) ++ str(s"probe-$c")
        os.write(0x10); os.write(rl(connBody.length)); os.write(connBody); os.flush()
        val ack = new Array[Byte](4); var got = 0
        while (got < 4) { val n = is.read(ack, got, 4 - got); require(n > 0); got += n }
        require(ack(0) == 0x20.toByte && ack(3) == 0, "CONNECT refused")
        var i = 0
        while (i < perConn) {
          val body = str(s"probe/$c") ++
            s"msg$i payload-abcdefghijklmnopqrstuvwxyz-0123456789".getBytes(UTF_8)
          os.write(0x30); os.write(rl(body.length)); os.write(body)
          i += 1
        }
        os.write(0xE0); os.write(0)
        os.flush()
        sock.close()
      }, s"mqtt-probe-$c")
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
      f"""{"probe":"mqtt_ingress_r14","msgs":$sent,"conns":$nConns,"landed":$landed,"wall_sec":$wall%.1f,"msgs_per_min":${(landed / wall * 60).toLong}}"""
    Files.write(Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    listener.stop()
  }
}
