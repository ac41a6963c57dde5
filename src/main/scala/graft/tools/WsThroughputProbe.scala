package graft.tools

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Ingress-ceiling receipt for the r13 websocket edge — the
  * [[ListenThroughputProbe]] protocol applied to `Ws.listenWebSocket`:
  * `nConns` JDK websocket clients blast `nMsgs` total ~60 B text
  * messages at one listener; wall time runs from first send to all
  * messages durably spooled (tmp+rename only). Same single-receiver
  * calibration contract as every Listen* here: the distributed path is
  * the spool directory the flow binds to.
  *
  * Usage: `sbt "runMain graft.tools.WsThroughputProbe [nMsgs] [nConns] [out.json]"`
  */
object WsThroughputProbe {
  def main(args: Array[String]): Unit = {
    val nMsgs = if (args.length > 0) args(0).toInt else 500000
    val nConns = if (args.length > 1) args(1).toInt else 8
    val out = if (args.length > 2) args(2) else "tools/wsprobe_r13.json"
    val spool = Files.createTempDirectory("graft_ws_probe").toString
    val listener = graft.streaming.Ws.listenWebSocket(0, spool, batchSize = 5000)
    val perConn = nMsgs / nConns
    val t0 = System.nanoTime()
    val threads = (0 until nConns).map { c =>
      val t = new Thread(() => {
        val ws = HttpClient.newHttpClient().newWebSocketBuilder()
          .buildAsync(URI.create(s"ws://127.0.0.1:${listener.port}/"),
            new WebSocket.Listener {})
          .join()
        var i = 0
        while (i < perConn) {
          // sendText is async; chain joins every 1024 msgs to bound the
          // client-side outstanding queue without serializing each send
          val f = ws.sendText(s"conn$c msg$i payload-abcdefghijklmnopqrstuvwxyz-0123456789", true)
          if (i % 1024 == 1023) f.join()
          i += 1
        }
        ws.sendClose(WebSocket.NORMAL_CLOSURE, "done").join()
      }, s"ws-probe-$c")
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
      f"""{"probe":"ws_ingress_r13","msgs":$sent,"conns":$nConns,"landed":$landed,"wall_sec":$wall%.1f,"msgs_per_min":${(landed / wall * 60).toLong}}"""
    Files.write(Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    listener.stop()
  }
}
