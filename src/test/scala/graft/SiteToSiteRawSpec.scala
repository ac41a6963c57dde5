package graft

import java.nio.file.Files
import graft.streaming.{SiteToSite, SiteToSiteRaw}

/** Live-wire gates for the RAW socket site-to-site transport (r15
  * verdict task 5): both directions over a real socket, version
  * re-negotiation, UNKNOWN_PORT refusal, the BAD_CHECKSUM discard
  * contract, claim return on unconfirmed egress, and the flow
  * vocabulary (`Transport Protocol: RAW`). The client↔server pair pins
  * the documented protocol shape; see the SiteToSiteRaw scaladoc's
  * honesty note on offline interop limits. */
class SiteToSiteRawSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_s2sraw_$tag").toString

  private def spooled(spool: String): Seq[(String, String)] = {
    val files = new java.io.File(spool).listFiles()
      .filter(_.getName.endsWith(".jsonl"))
    files.flatMap { f =>
      new String(Files.readAllBytes(f.toPath), "UTF-8").linesIterator
    }.map { line =>
      val df = spark.read.json(Seq(line).toDS)
      val r = df.selectExpr("attrs.k", "content_b64").collect()(0)
      (r.getString(0), new String(java.util.Base64.getDecoder.decode(r.getString(1)), "ISO-8859-1"))
    }.toSeq.sortBy(_._1)
  }

  test("ingress: send over RAW → committed JSONL spool, binary-exact; version re-negotiation") {
    val spool = freshDir("in")
    val l = SiteToSiteRaw.listenRaw(0, spool, portId = "in-0")
    try {
      val hostile = (0 until 256).map(_.toByte).toArray // every octet
      val n = SiteToSiteRaw.sendRaw("127.0.0.1", l.port, "in-0", Seq(
        (Map("k" -> "a"), "payload one".getBytes("UTF-8")),
        (Map("k" -> "b"), hostile)))
      assert(n == 2)
      val rows = spooled(spool)
      assert(rows.map(_._1) == Seq("a", "b"))
      assert(rows(0)._2 == "payload one")
      assert(rows(1)._2.getBytes("ISO-8859-1").toSeq == hostile.toSeq,
        "content must round-trip octet-for-octet")
      // a client opening at a too-new version re-negotiates down
      assert(SiteToSiteRaw.sendRaw("127.0.0.1", l.port, "in-0",
        Seq((Map("k" -> "c"), "renegotiated".getBytes("UTF-8"))),
        requestVersion = 99) == 1)
      assert(spooled(spool).map(_._1) == Seq("a", "b", "c"))
    } finally l.stop()
  }

  test("UNKNOWN_PORT refusal; BAD_CHECKSUM discards the transaction") {
    val spool = freshDir("bad")
    val l = SiteToSiteRaw.listenRaw(0, spool, portId = "in-0")
    try {
      val wrongPort = intercept[IllegalArgumentException] {
        SiteToSiteRaw.sendRaw("127.0.0.1", l.port, "nope",
          Seq((Map.empty[String, String], "x".getBytes("UTF-8"))))
      }
      assert(wrongPort.getMessage.contains("200"), s"got: ${wrongPort.getMessage}")
      intercept[RuntimeException] {
        SiteToSiteRaw.sendRaw("127.0.0.1", l.port, "in-0",
          Seq((Map("k" -> "t"), "tampered".getBytes("UTF-8"))),
          tamperChecksum = true)
      }
      assert(spooled(spool).isEmpty,
        "a BAD_CHECKSUM transaction must never reach the spool")
    } finally l.stop()
  }

  test("egress: pull over RAW serves and deletes the claim; queue drains in order") {
    val spool = freshDir("eg_spool")
    val egress = freshDir("eg_out")
    val l = SiteToSiteRaw.listenRaw(0, spool, portId = "in-0", egressDir = Some(egress))
    try {
      SiteToSite.writeEgress(egress, Seq(
        (Map("seq" -> "1"), "first batch".getBytes("UTF-8"))))
      SiteToSite.writeEgress(egress, Seq(
        (Map("seq" -> "2"), "second batch".getBytes("UTF-8"))))
      val got1 = SiteToSiteRaw.pullRaw("127.0.0.1", l.port, "in-0-out")
      assert(got1.map(f => (f._1("seq"), new String(f._2, "UTF-8"))) ==
        Seq(("1", "first batch")))
      val got2 = SiteToSiteRaw.pullRaw("127.0.0.1", l.port, "in-0-out")
      assert(got2.map(f => new String(f._2, "UTF-8")) == Seq("second batch"))
      assert(SiteToSiteRaw.pullRaw("127.0.0.1", l.port, "in-0-out").isEmpty,
        "drained queue must answer NO_MORE_DATA")
      assert(!new java.io.File(egress).listFiles().exists(_.getName.contains("claimed")),
        "confirmed claims must be deleted, not left behind")
    } finally l.stop()
  }

  test("flow vocabulary: Transport Protocol RAW on both the listener and the sink") {
    val spool = freshDir("flow")
    val flowJson =
      s"""{"flowContents": {"name": "s2s-raw-edge", "processors": [
         |  {"identifier": "p-l", "name": "RawIn",
         |   "type": "org.apache.nifi.processors.standard.ListenSiteToSite",
         |   "properties": {"Listening Port": "0", "Spool Directory": "$spool",
         |     "Port Id": "in-0", "Transport Protocol": "RAW"}}
         |], "connections": []}}""".stripMargin
    val listeners = FlowCompiler.startListeners(FlowCompiler.parse(flowJson), Map.empty)
    assert(listeners.map(_.tpe) == Seq("ListenSiteToSite"))
    try {
      // PutSiteToSite RAW as a compiled sink node feeding the listener
      val sinkFlow =
        s"""{"flowContents": {"name": "s2s-raw-put",
           |  "inputPorts": [{"identifier": "ip", "name": "rows"}],
           |  "outputPorts": [{"identifier": "op", "name": "sent"}],
           |  "processors": [
           |  {"identifier": "p-put", "name": "RawOut",
           |   "type": "org.apache.nifi.processors.standard.PutSiteToSite",
           |   "properties": {"Remote URL": "raw://127.0.0.1:${listeners.head.port}",
           |     "Port Name": "in-0", "Transport Protocol": "RAW",
           |     "Content Column": "content", "Attribute Columns": "tag"}}
           |],
           |"connections": [
           |  {"source": {"id": "ip"}, "destination": {"id": "p-put"}},
           |  {"source": {"id": "p-put"}, "destination": {"id": "op"}}
           |]}}""".stripMargin
      val rows = Seq(("r1", "alpha"), ("r2", "beta")).toDF("tag", "content")
      val sent = FlowCompiler.compile(spark, sinkFlow, Map("rows" -> rows))("sent")
      assert(sent.count() == 2)
      val files = new java.io.File(spool).listFiles().filter(_.getName.endsWith(".jsonl"))
      assert(files.nonEmpty, "sink transactions must land in the RAW listener's spool")
      val all = spark.read.json(files.map(_.getPath): _*)
        .selectExpr("attrs.tag",
          "cast(unbase64(content_b64) as string) AS content")
        .as[(String, String)].collect().sortBy(_._1)
      assert(all.toSeq == Seq(("r1", "alpha"), ("r2", "beta")))
    } finally listeners.foreach(_.stop())
  }

  test("TLS: both directions transfer under SSL; a plaintext client dies pre-magic, nothing spools") {
    val spool = freshDir("tls")
    val egress = freshDir("tlseg")
    val l = SiteToSiteRaw.listenRawTls(0, spool, TestKeystore.path,
      TestKeystore.password, portId = "in-0", egressDir = Some(egress))
    try {
      val ssl = Some(TestKeystore.sslContext)
      // ingress over TLS
      assert(SiteToSiteRaw.sendRaw("127.0.0.1", l.port, "in-0",
        Seq((Map("k" -> "a"), "over tls".getBytes("UTF-8"))), ssl = ssl) == 1)
      assert(spooled(spool) == Seq(("a", "over tls")))
      // egress over TLS: claim served and deleted on TRANSACTION_FINISHED
      SiteToSite.writeEgress(egress,
        Seq((Map("k" -> "e"), "tls egress".getBytes("UTF-8"))))
      val got = SiteToSiteRaw.pullRaw("127.0.0.1", l.port, "in-0-out", ssl = ssl)
      assert(got.map(t => new String(t._2, "UTF-8")) == Seq("tls egress"))
      // a plaintext client dies in the TLS record layer before the
      // NiFi magic is read — the send throws and nothing new spools
      intercept[Exception] {
        SiteToSiteRaw.sendRaw("127.0.0.1", l.port, "in-0",
          Seq((Map("k" -> "z"), "plaintext".getBytes("UTF-8"))))
      }
      assert(spooled(spool) == Seq(("a", "over tls")), "plaintext must not spool")
      // and a TLS client refuses a PLAINTEXT listener (no server cert)
      val plain = SiteToSiteRaw.listenRaw(0, freshDir("plain"), portId = "in-0")
      try intercept[Exception] {
        SiteToSiteRaw.sendRaw("127.0.0.1", plain.port, "in-0",
          Seq((Map("k" -> "y"), "x".getBytes("UTF-8"))), ssl = ssl)
      } finally plain.stop()
    } finally l.stop()
  }

  test("TLS flow vocabulary: Keystore Path on the RAW listener node; executor sink sends under TLS") {
    val spool = freshDir("tlsflow")
    val flowJson =
      s"""{"flowContents": {"name": "s2s-raw-tls-edge", "processors": [
         |  {"identifier": "p-l", "name": "RawTlsIn",
         |   "type": "org.apache.nifi.processors.standard.ListenSiteToSite",
         |   "properties": {"Listening Port": "0", "Spool Directory": "$spool",
         |     "Port Id": "in-0", "Transport Protocol": "RAW",
         |     "Keystore Path": "${TestKeystore.path}",
         |     "Keystore Password": "${TestKeystore.password}"}}
         |], "connections": []}}""".stripMargin
    val listeners = FlowCompiler.startListeners(FlowCompiler.parse(flowJson), Map.empty)
    try {
      val sinkFlow =
        s"""{"flowContents": {"name": "s2s-raw-tls-put",
           |  "inputPorts": [{"identifier": "ip", "name": "rows"}],
           |  "outputPorts": [{"identifier": "op", "name": "sent"}],
           |  "processors": [
           |  {"identifier": "p-put", "name": "RawTlsOut",
           |   "type": "org.apache.nifi.processors.standard.PutSiteToSite",
           |   "properties": {"Remote URL": "raw://127.0.0.1:${listeners.head.port}",
           |     "Port Name": "in-0", "Transport Protocol": "RAW",
           |     "Content Column": "content", "Attribute Columns": "tag",
           |     "Keystore Path": "${TestKeystore.path}",
           |     "Keystore Password": "${TestKeystore.password}"}}
           |],
           |"connections": [
           |  {"source": {"id": "ip"}, "destination": {"id": "p-put"}},
           |  {"source": {"id": "p-put"}, "destination": {"id": "op"}}
           |]}}""".stripMargin
      val rows = Seq(("t1", "secured")).toDF("tag", "content")
      assert(FlowCompiler.compile(spark, sinkFlow, Map("rows" -> rows))("sent").count() == 1)
      val files = new java.io.File(spool).listFiles().filter(_.getName.endsWith(".jsonl"))
      assert(files.nonEmpty, "TLS sink transactions must land in the TLS listener's spool")
      val all = spark.read.json(files.map(_.getPath): _*)
        .selectExpr("attrs.tag", "cast(unbase64(content_b64) as string) AS content")
        .as[(String, String)].collect()
      assert(all.toSeq == Seq(("t1", "secured")))
    } finally listeners.foreach(_.stop())
  }
}
