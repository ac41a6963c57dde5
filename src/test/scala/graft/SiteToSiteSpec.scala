package graft

import org.apache.spark.sql.functions._

import graft.streaming.SiteToSite

/** Live gates for the NiFi site-to-site HTTP endpoint (SURVEY 48ac):
  * the real REST handshake driven over real sockets by the client in
  * the same object (which speaks the published protocol, so a real
  * NiFi RPG is a drop-in peer), FlowFile-Stream v3 byte-exactness, the
  * checksum/cancel/TTL failure paths that must NOT spool, and the
  * egress (output-port) pull direction. */
class SiteToSiteSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("FlowFile-Stream v3 packs and unpacks byte-exactly (incl. 2-byte length escape, empty content, empty attrs)") {
    val big = "x" * 70000 // attribute value past the 0xFFFF length escape
    val binary = (0 until 256).map(_.toByte).toArray
    val files = Seq(
      (Map("filename" -> "a.txt", "path" -> "/in"), "alpha".getBytes("UTF-8")),
      (Map("blob" -> big), binary),
      (Map.empty[String, String], Array.emptyByteArray)
    )
    val packed = SiteToSite.packFlowFiles(files)
    // magic leads every record
    assert(new String(packed, 0, 7, "UTF-8") === "NiFiFF3")
    val back = SiteToSite.unpackFlowFiles(packed)
    assert(back.size === 3)
    back.zip(files).foreach { case ((ba, bc), (fa, fc)) =>
      assert(ba === fa)
      assert(java.util.Arrays.equals(bc, fc))
    }
    // packing is deterministic (sorted attribute order)
    assert(java.util.Arrays.equals(packed, SiteToSite.packFlowFiles(files)))
    // garbage is rejected, not silently decoded
    intercept[Exception] { SiteToSite.unpackFlowFiles("not a flowfile".getBytes("UTF-8")) }
  }

  test("ingress: discovery + full transaction handshake spools committed FlowFiles; Spark reads them back") {
    val spool = tmpDir("graft_s2s_spool")
    val l = SiteToSite.listen(0, spool, portName = "docs-in")
    try {
      val base = s"http://localhost:${l.port}"
      val binary = Array[Byte](0, 1, -1, 127, -128)
      val n = SiteToSite.send(base, "docs-in", Seq(
        (Map("filename" -> "d1", "lang" -> "en"), "hello flowfile".getBytes("UTF-8")),
        (Map("filename" -> "d2"), binary)))
      assert(n === 2)
      // one committed JSONL spool file; attributes and content byte-exact
      val rows = spark.read.json(spool)
        .select(col("attrs.filename"), unbase64(col("content_b64")).as("content"))
        .collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1))).toMap
      assert(rows.keySet === Set("d1", "d2"))
      assert(new String(rows("d1"), "UTF-8") === "hello flowfile")
      assert(java.util.Arrays.equals(rows("d2"), binary))
      // a second transaction lands a second file — serve-many endpoint
      SiteToSite.send(base, "docs-in", Seq((Map("filename" -> "d3"), "x".getBytes("UTF-8"))))
      assert(spark.read.json(spool).count() === 3)
    } finally l.stop()
  }

  test("ingress failure paths never spool: bad checksum 400, cancel, unknown transaction 404") {
    val spool = tmpDir("graft_s2s_fail")
    val l = SiteToSite.listen(0, spool, portName = "g")
    try {
      val base = s"http://localhost:${l.port}"
      val client = java.net.http.HttpClient.newHttpClient()
      def req(method: String, url: String, body: Array[Byte] = null): java.net.http.HttpResponse[String] = {
        val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        val r = (method match {
          case "GET"    => b.GET()
          case "DELETE" => b.DELETE()
          case m => b.method(m, if (body == null)
            java.net.http.HttpRequest.BodyPublishers.noBody()
          else java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
        }).build()
        client.send(r, java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      // discovery shows the port RUNNING
      val disco = req("GET", s"$base/nifi-api/site-to-site").body()
      assert(disco.contains("\"graft-in-0\"") && disco.contains("RUNNING"))
      val peers = req("GET", s"$base/nifi-api/site-to-site/peers").body()
      assert(peers.contains(s"\"port\":${l.port}"))
      val packed = SiteToSite.packFlowFiles(Seq((Map("a" -> "b"), "data".getBytes("UTF-8"))))
      def openTx(): String = {
        val resp = req("POST", s"$base/nifi-api/data-transfer/input-ports/graft-in-0/transactions")
        assert(resp.statusCode() === 201)
        assert(resp.headers().firstValue("x-location-uri-intent").orElse("") === "transaction-url")
        resp.headers().firstValue("Location").orElseThrow()
      }
      // bad checksum → 400, nothing spooled
      val tx1 = openTx()
      assert(req("POST", s"$base$tx1/flow-files", packed).statusCode() === 202)
      assert(req("DELETE", s"$base$tx1?responseCode=12&checksum=12345").statusCode() === 400)
      // cancel → 200, nothing spooled
      val tx2 = openTx()
      assert(req("POST", s"$base$tx2/flow-files", packed).statusCode() === 202)
      assert(req("DELETE", s"$base$tx2?responseCode=15").statusCode() === 200)
      // unknown transaction → 404; TTL PUT on a live one → 200
      assert(req("DELETE", s"$base/nifi-api/data-transfer/input-ports/graft-in-0/transactions/tx-nope?responseCode=12&checksum=0")
        .statusCode() === 404)
      val tx3 = openTx()
      assert(req("PUT", s"$base$tx3").statusCode() === 200)
      assert(req("DELETE", s"$base$tx3?responseCode=15").statusCode() === 200)
      // wrong port id → 404
      assert(req("POST", s"$base/nifi-api/data-transfer/input-ports/other/transactions")
        .statusCode() === 404)
      // nothing ever spooled
      val spooled = new java.io.File(spool).listFiles().filterNot(_.getName.startsWith("."))
      assert(spooled.isEmpty, s"failure paths must not spool: ${spooled.map(_.getName).toSeq}")
    } finally l.stop()
  }

  test("egress: queued FlowFiles are pulled transactionally; confirm consumes, no-data pull is empty") {
    val spool = tmpDir("graft_s2s_espool")
    val egress = tmpDir("graft_s2s_eq")
    val l = SiteToSite.listen(0, spool, portName = "g", egressDir = Some(egress))
    try {
      val base = s"http://localhost:${l.port}"
      // empty queue → graceful no-data
      assert(SiteToSite.pull(base, "g.out") === Nil)
      val files = Seq(
        (Map("filename" -> "out1"), "payload one".getBytes("UTF-8")),
        (Map("filename" -> "out2"), Array[Byte](9, 8, 7)))
      SiteToSite.writeEgress(egress, files)
      val got = SiteToSite.pull(base, "g.out")
      assert(got.map(_._1) === files.map(_._1))
      got.zip(files).foreach { case ((_, gc), (_, fc)) =>
        assert(java.util.Arrays.equals(gc, fc)) }
      // confirmed pull consumed the file; queue is empty again
      assert(SiteToSite.pull(base, "g.out") === Nil)
      assert(new java.io.File(egress).listFiles().isEmpty)
      // a RETRIED flow-files GET must still confirm (the server's
      // expected checksum is the CRC of one copy, not the concatenation)
      SiteToSite.writeEgress(egress, Seq((Map("f" -> "retry"), "abc".getBytes("UTF-8"))))
      val client = java.net.http.HttpClient.newHttpClient()
      def req2(method: String, url: String): java.net.http.HttpResponse[Array[Byte]] = {
        val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        val r = (method match {
          case "GET" => b.GET(); case "DELETE" => b.DELETE()
          case m => b.method(m, java.net.http.HttpRequest.BodyPublishers.noBody())
        }).build()
        client.send(r, java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      }
      val create = req2("POST", s"$base/nifi-api/data-transfer/output-ports/graft-in-0-out/transactions")
      assert(create.statusCode() === 201)
      val loc = create.headers().firstValue("Location").orElseThrow()
      val g1 = req2("GET", s"$base$loc/flow-files")
      val g2 = req2("GET", s"$base$loc/flow-files") // retry
      assert(java.util.Arrays.equals(g1.body(), g2.body()))
      val crc = new java.util.zip.CRC32(); crc.update(g2.body())
      assert(req2("DELETE", s"$base$loc?responseCode=12&checksum=${crc.getValue}")
        .statusCode() === 200, "confirm after a retried GET must succeed")
      assert(new java.io.File(egress).listFiles().isEmpty)
    } finally l.stop()
  }

  test("PutSiteToSite sink: a compiled flow hands its rows to a remote endpoint, one transaction per partition") {
    val spool = tmpDir("graft_s2s_put")
    val l = SiteToSite.listen(0, spool, portName = "remote-in")
    try {
      val json =
        s"""{"flowContents": {"name": "rpg-egress",
          |  "processors": [
          |    {"identifier": "p", "type": "PutSiteToSite",
          |     "properties": {"Remote URL": "http://localhost:${l.port}",
          |       "Port Name": "remote-in", "Content Column": "content",
          |       "Attribute Columns": "filename,lang"}}],
          |  "inputPorts": [{"identifier": "i", "name": "docs"}],
          |  "outputPorts": [{"identifier": "o", "name": "sent"}],
          |  "connections": [
          |    {"source": {"id": "i"}, "destination": {"id": "p"}},
          |    {"source": {"id": "p"}, "destination": {"id": "o"}}]}}""".stripMargin
      val in = Seq(
        ("a.txt", "en", "alpha".getBytes("UTF-8")),
        ("b.txt", "de", "beta".getBytes("UTF-8")),
        ("c.txt", "fr", Array[Byte](1, 2, -3))
      ).toDF("filename", "lang", "content")
      // compiling EXECUTES the transfer; output = the sent rows
      val sent = graft.FlowCompiler.compile(spark, json, Map("docs" -> in))("sent")
      assert(sent.count() === 3)
      val rows = spark.read.json(spool)
        .select(col("attrs.filename"), col("attrs.lang"),
          unbase64(col("content_b64")).as("content"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getAs[Array[Byte]](2).toSeq)).toSet
      assert(rows === Set(
        ("a.txt", "en", "alpha".getBytes("UTF-8").toSeq),
        ("b.txt", "de", "beta".getBytes("UTF-8").toSeq),
        ("c.txt", "fr", Seq[Byte](1, 2, -3))),
        "all rows must arrive with attributes and byte-exact content")
    } finally l.stop()
  }

  test("TLS endpoint: HTTPS handshake transfers; plain HTTP dies in the TLS layer, nothing spools") {
    val spool = tmpDir("graft_s2s_tls")
    val ksPath = java.nio.file.Files.createTempDirectory("graft_s2s_ks")
      .resolve("s2s.p12").toString
    val keytool = new ProcessBuilder(
      s"${System.getProperty("java.home")}/bin/keytool", "-genkeypair",
      "-alias", "graft", "-keyalg", "RSA", "-keysize", "2048",
      "-dname", "CN=localhost", "-validity", "1",
      "-ext", "san=ip:127.0.0.1,dns:localhost",
      "-storetype", "PKCS12", "-keystore", ksPath, "-storepass", "graftpass")
      .redirectErrorStream(true).start()
    assert(keytool.waitFor() === 0, "keytool must generate the keystore")
    val l = SiteToSite.listenTls(0, spool, ksPath, "graftpass", portName = "tls-in")
    try {
      val ssl = Some(graft.streaming.ListenHttp.sslContext(ksPath, "graftpass"))
      val n = SiteToSite.send(s"https://127.0.0.1:${l.port}", "tls-in",
        Seq((Map("filename" -> "t1"), "over tls".getBytes("UTF-8"))), ssl = ssl)
      assert(n === 1)
      val rows = spark.read.json(spool)
        .select(col("attrs.filename")).as[String].collect()
      assert(rows === Array("t1"))
      // a plain-HTTP client dies in the handshake — no handler runs
      intercept[java.io.IOException] {
        SiteToSite.send(s"http://127.0.0.1:${l.port}", "tls-in",
          Seq((Map.empty[String, String], "plaintext".getBytes("UTF-8"))))
      }
      assert(spark.read.json(spool).count() === 1, "plain HTTP must not spool")
    } finally l.stop()
    // the TLS form serves egress too — pull() with the trust context
    val spool2 = tmpDir("graft_s2s_tls2")
    val egress = tmpDir("graft_s2s_tls_eq")
    val l2 = SiteToSite.listenTls(0, spool2, ksPath, "graftpass",
      portName = "tls-in", egressDir = Some(egress))
    try {
      val ssl = Some(graft.streaming.ListenHttp.sslContext(ksPath, "graftpass"))
      SiteToSite.writeEgress(egress, Seq((Map("f" -> "e1"), "tls egress".getBytes("UTF-8"))))
      val got = SiteToSite.pull(s"https://127.0.0.1:${l2.port}", "tls-in.out", ssl = ssl)
      assert(got.map(t => new String(t._2, "UTF-8")) === Seq("tls egress"))
    } finally l2.stop()
  }

  test("committed s2s_edge flow starts the endpoint and a stream reads the spool") {
    val spool = tmpDir("graft_s2s_flow")
    val json = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/flows/s2s_edge.json"), "UTF-8").mkString
      .replace("__SPOOL__", spool)
    val flow = graft.FlowCompiler.parse(json)
    val listeners = graft.FlowCompiler.startListeners(flow)
    try {
      val l = listeners.find(_.tpe == "ListenSiteToSite").get
      SiteToSite.send(s"http://localhost:${l.port}", "edge-in",
        Seq((Map("filename" -> "f1"), "from a flow".getBytes("UTF-8"))))
      val rows = spark.read.json(spool)
        .select(col("attrs.filename")).as[String].collect()
      assert(rows === Array("f1"))
    } finally listeners.foreach(_.stop())
  }
}
