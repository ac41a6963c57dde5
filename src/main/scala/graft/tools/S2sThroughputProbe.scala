package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Ingress-ceiling receipt for the site-to-site edge (r15 verdict task
  * 6) — the [[AmqpThroughputProbe]] single-receiver calibration
  * contract applied to BOTH transports: `nConns` client threads each
  * push `perConn` FlowFiles (~60 B payloads, batched `batch` per
  * transaction — site-to-site is transactional, so the unit of wire
  * cost is the transaction, not the message) at one listener; wall
  * runs from first send to all FlowFiles durably spooled.
  *
  * Usage: `sbt "runMain graft.tools.S2sThroughputProbe [nFlowFiles] [nConns] [batch] [out.json]"`
  */
object S2sThroughputProbe {
  def main(args: Array[String]): Unit = {
    val nMsgs = if (args.length > 0) args(0).toInt else 200000
    val nConns = if (args.length > 1) args(1).toInt else 8
    val batch = if (args.length > 2) args(2).toInt else 500
    val out = if (args.length > 3) args(3) else "tools/s2sprobe_r16.json"
    val perConn = nMsgs / nConns

    def spooledLines(spool: String): Long = {
      val st = Files.list(Paths.get(spool))
      try st.iterator().asScala
        .filter(_.toString.endsWith(".jsonl"))
        .map(p => Files.readAllBytes(p).count(_ == '\n'.toByte).toLong).sum
      finally st.close() // polled every 100 ms — must not leak an fd per call
    }

    def run(tag: String)(mkSend: Int => (Seq[(Map[String, String], Array[Byte])] => Int),
                         spool: String): String = {
      val t0 = System.nanoTime()
      val threads = (0 until nConns).map { c =>
        val send = mkSend(c)
        val t = new Thread(() => {
          var i = 0
          while (i < perConn) {
            val n = math.min(batch, perConn - i)
            val files = (0 until n).map { j =>
              (Map("c" -> c.toString, "i" -> (i + j).toString),
                s"conn$c msg${i + j} payload-abcdefghijklmnopqrstuvwxyz".getBytes("UTF-8"))
            }
            send(files)
            i += n
          }
        }, s"s2s-probe-$tag-$c")
        t.start(); t
      }
      threads.foreach(_.join())
      val sent = perConn.toLong * nConns
      val deadline = System.currentTimeMillis() + 120000
      while (spooledLines(spool) < sent && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val wall = (System.nanoTime() - t0) / 1e9
      val landed = spooledLines(spool)
      f""""$tag":{"landed":$landed,"wall_sec":$wall%.1f,"msgs_per_min":${(landed / wall * 60).toLong}}"""
    }

    // HTTP transport
    val spoolH = Files.createTempDirectory("graft_s2s_probe_http").toString
    val lh = graft.streaming.SiteToSite.listen(0, spoolH, portName = "probe", portId = "probe-0")
    val httpJson =
      try run("http")(_ => files =>
        graft.streaming.SiteToSite.send(s"http://127.0.0.1:${lh.port}", "probe", files), spoolH)
      finally lh.stop()

    // RAW transport
    val spoolR = Files.createTempDirectory("graft_s2s_probe_raw").toString
    val lr = graft.streaming.SiteToSiteRaw.listenRaw(0, spoolR, portId = "probe-0")
    val rawJson =
      try run("raw")(_ => files =>
        graft.streaming.SiteToSiteRaw.sendRaw("127.0.0.1", lr.port, "probe-0", files), spoolR)
      finally lr.stop()

    val json =
      s"""{"probe":"s2s_ingress_r16","flowfiles":${perConn.toLong * nConns},""" +
        s""""conns":$nConns,"batch":$batch,$httpJson,$rawJson}"""
    Files.write(Paths.get(out), json.getBytes("UTF-8"))
    println(json)
  }
}
