package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.streaming.{ListenHttp, Streams}

/** ListenHTTP → spool dir → file stream: posted JSON bodies become
  * streaming rows; non-POST is rejected; files appear atomically. */
class ListenHttpSpec extends SparkSpec {
  import spark.implicits._

  test("posted bodies flow through the file stream as records") {
    val spool = Files.createTempDirectory("graft_listen_http").toString
    val server = ListenHttp.start(0, spool, suffix = ".json")
    try {
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()
      def post(body: String) = {
        val r = client.send(
          HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/ingest"))
            .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
        assert(r.statusCode() === 200)
        r.body()
      }
      val names = Seq(
        post("""{"user":"a","n":1}"""),
        post("""{"user":"b","n":2}"""),
        post("""{"user":"a","n":3}"""))
      assert(names.distinct.size === 3, "spool filenames must be unique")
      // GET must be rejected, and must not create spool files
      val getResp = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/ingest")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(getResp.statusCode() === 405)
      assert(new java.io.File(spool).listFiles().count(_.getName.endsWith(".json")) === 3)
      // consume the spool as a stream (the downstream half of ListenHTTP)
      val schema = StructType(Seq(
        StructField("user", StringType), StructField("n", org.apache.spark.sql.types.LongType)))
      val stream = Streams.fileStream(spark, spool, schema, format = "json")
      val q = Streams.toMemorySink(stream, "listen_http_rows")
      q.processAllAvailable(); q.stop()
      val rows = spark.table("listen_http_rows").as[(String, Long)].collect().toSet
      assert(rows === Set(("a", 1L), ("b", 2L), ("a", 3L)))
    } finally server.stop(0)
  }

  test("bodies stream to the spool at constant memory; oversize gets 413") {
    val spool = Files.createTempDirectory("graft_listen_http_big").toString
    // 1 MiB cap: a 4 MiB POST must be refused with 413 and leave no
    // spool file (not even a .tmp); an 800 KiB POST streams through
    val server = ListenHttp.start(0, spool, suffix = ".bin", maxBodyBytes = 1L << 20)
    try {
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()
      def post(body: Array[Byte]) = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/ingest"))
          .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      val big = Array.fill[Byte](4 << 20)(7)
      assert(post(big).statusCode() === 413)
      assert(new java.io.File(spool).listFiles().isEmpty,
        "oversize POST must not leave spool or tmp files")
      val ok = Array.fill[Byte](800 << 10)(9)
      val r = post(ok)
      assert(r.statusCode() === 200)
      val f = new java.io.File(spool, r.body())
      assert(f.length() === ok.length.toLong)
    } finally server.stop(0)
  }

  test("TLS endpoint: HTTPS POSTs spool; plain HTTP is refused at the TLS layer") {
    val spool = Files.createTempDirectory("graft_listen_https").toString
    val ksDir = Files.createTempDirectory("graft_ks")
    val ksPath = ksDir.resolve("listen.p12").toString
    // the JDK's own keytool generates the self-signed keystore — the
    // same operational step a NiFi SSL Context Service needs
    val keytool = new ProcessBuilder(
      s"${System.getProperty("java.home")}/bin/keytool", "-genkeypair",
      "-alias", "graft", "-keyalg", "RSA", "-keysize", "2048",
      "-dname", "CN=localhost", "-validity", "1",
      "-ext", "san=ip:127.0.0.1,dns:localhost",
      "-storetype", "PKCS12", "-keystore", ksPath, "-storepass", "graftpass")
      .redirectErrorStream(true).start()
    assert(keytool.waitFor() === 0, "keytool must generate the keystore")
    val server = ListenHttp.startTls(0, spool, ksPath, "graftpass", suffix = ".json")
    try {
      val port = server.getAddress.getPort
      // client trusts the same self-signed cert (keystore as truststore)
      val client = HttpClient.newBuilder()
        .sslContext(ListenHttp.sslContext(ksPath, "graftpass")).build()
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"https://127.0.0.1:$port/ingest"))
          .POST(HttpRequest.BodyPublishers.ofString("""{"user":"tls","n":9}""")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() === 200)
      assert(new java.io.File(spool, r.body()).exists())
      // plain HTTP against the TLS port dies in the handshake — no
      // handler runs, nothing spools
      intercept[java.io.IOException] {
        HttpClient.newHttpClient().send(
          HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/ingest"))
            .POST(HttpRequest.BodyPublishers.ofString("plaintext")).build(),
          HttpResponse.BodyHandlers.ofString())
      }
      assert(new java.io.File(spool).listFiles().count(_.getName.endsWith(".json")) === 1)
    } finally server.stop(0)
  }

  test("request-reply: live POSTs block until the streaming flow answers them") {
    val spool = Files.createTempDirectory("graft_hhr_spool").toString
    val replies = Files.createTempDirectory("graft_hhr_reply").toString
    val server = ListenHttp.startRequestReply(0, spool, replies,
      replyTimeoutMs = 30000, pollMs = 10)
    try {
      val port = server.getAddress.getPort
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      def post(body: String) = Future {
        val client = HttpClient.newHttpClient()
        val r = client.send(
          HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/exchange"))
            .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), r.body())
      }
      val futures = Seq(post("alpha"), post("beta"), post("gamma"))
      // wait until all three requests are spooled, then run the flow:
      // binary file stream -> uppercase transform -> reply files
      val spoolDir = new java.io.File(spool)
      val deadline = System.currentTimeMillis() + 15000
      while (spoolDir.listFiles().count(_.getName.endsWith(".dat")) < 3 &&
             System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(spoolDir.listFiles().count(_.getName.endsWith(".dat")) === 3)
      val q = Streams.binaryFileStream(spark, spool)
        .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          ListenHttp.writeReplies(
            batch.select(
              ListenHttp.correlationId(col("path")).as("id"),
              upper(col("content").cast("string")).as("body")),
            replies)
        }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(30000); q.stop()
      val got = Await.result(scala.concurrent.Future.sequence(futures), 30.seconds).toSet
      assert(got === Set((200, "ALPHA"), (200, "BETA"), (200, "GAMMA")))
    } finally server.stop(0)
  }

  test("request-reply: no reply within the deadline answers 504") {
    val spool = Files.createTempDirectory("graft_hhr_spool2").toString
    val replies = Files.createTempDirectory("graft_hhr_reply2").toString
    val server = ListenHttp.startRequestReply(0, spool, replies,
      replyTimeoutMs = 300, pollMs = 10)
    try {
      val port = server.getAddress.getPort
      val r = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/exchange"))
          .POST(HttpRequest.BodyPublishers.ofString("never answered")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() === 504)
      // the request itself is still durably spooled for async processing
      assert(new java.io.File(spool).listFiles().count(_.getName.endsWith(".dat")) === 1)
    } finally server.stop(0)
  }

  test("concurrent posts land as distinct complete spool files") {
    val spool = Files.createTempDirectory("graft_listen_http_c").toString
    val server = ListenHttp.start(0, spool, suffix = ".txt")
    try {
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val posts = (0 until 40).map { i =>
        Future {
          client.send(
            HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/ingest"))
              .POST(HttpRequest.BodyPublishers.ofString(s"payload-$i")).build(),
            HttpResponse.BodyHandlers.ofString()).statusCode()
        }
      }
      assert(Await.result(Future.sequence(posts), 30.seconds).forall(_ == 200))
      val files = new java.io.File(spool).listFiles().filter(_.getName.endsWith(".txt"))
      assert(files.length === 40, "every concurrent post must spool exactly one file")
      val bodies = files.map(f => new String(Files.readAllBytes(f.toPath), "UTF-8")).toSet
      assert(bodies === (0 until 40).map(i => s"payload-$i").toSet)
    } finally server.stop(0)
  }
}
