package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.operators.Http

/** InvokeHTTP against a local in-process HTTP server: happy path,
  * POST echo, retry-on-500, 404 pass-through, and the failure route
  * (unreachable host, malformed URL, null URL). */
class HttpSpec extends SparkSpec {
  import spark.implicits._

  private def withServer(test: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val flakyHits = new AtomicInteger(0)
    server.createContext("/ok", (ex: HttpExchange) => {
      val id = ex.getRequestURI.getPath.stripPrefix("/ok/")
      respond(ex, 200, s"hello $id")
    })
    server.createContext("/echo", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      respond(ex, 200, s"echo:$body")
    })
    server.createContext("/flaky", (ex: HttpExchange) => {
      // first hit 500, subsequent hits 200 — exercises the retry path
      if (flakyHits.getAndIncrement() == 0) respond(ex, 500, "boom")
      else respond(ex, 200, "recovered")
    })
    server.createContext("/missing", (ex: HttpExchange) => respond(ex, 404, "nope"))
    server.setExecutor(null)
    server.start()
    try test(server, server.getAddress.getPort)
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("GET enrichment: bodies land per-row, 404 is a status not an error") {
    withServer { (_, port) =>
      val df = Seq(1, 2, 3).toDF("id")
        .withColumn("url",
          when(col("id") === 3, lit(s"http://127.0.0.1:$port/missing"))
            .otherwise(concat(lit(s"http://127.0.0.1:$port/ok/"), col("id"))))
      // single partition: deterministic against the single-threaded server
      val out = Http.invokeHttp(df.coalesce(1), "url", concurrency = 2)
        .select("id", "http_status", "http_body", "http_error")
        .collect().sortBy(_.getInt(0))
      assert(out(0).toSeq === Seq(1, 200, "hello 1", null))
      assert(out(1).toSeq === Seq(2, 200, "hello 2", null))
      assert(out(2).toSeq === Seq(3, 404, "nope", null))
    }
  }

  test("POST sends the body column") {
    withServer { (_, port) =>
      val df = Seq(("a", "payload-a"), ("b", "payload-b")).toDF("k", "body")
        .withColumn("url", lit(s"http://127.0.0.1:$port/echo"))
      val out = Http.invokeHttp(df.coalesce(1), "url", method = "POST",
          bodyCol = Some("body"))
        .select("k", "http_status", "http_body")
        .as[(String, Int, String)].collect().sortBy(_._1)
      assert(out === Array(("a", 200, "echo:payload-a"), ("b", 200, "echo:payload-b")))
    }
  }

  test("500 is retried and succeeds on the second attempt") {
    withServer { (_, port) =>
      val df = Seq(1).toDF("id")
        .withColumn("url", lit(s"http://127.0.0.1:$port/flaky"))
      val out = Http.invokeHttp(df.coalesce(1), "url",
          maxRetries = 2, retryBackoffMs = 50)
        .select("http_status", "http_body", "http_error").head
      assert(out.toSeq === Seq(200, "recovered", null))
    }
  }

  test("streaming enrichment: consume -> invokeHttp -> sink (NiFi's top flow)") {
    withServer { (_, port) =>
      implicit val sqlCtx = spark.sqlContext
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      ms.addData(1L, 2L)
      val stream = ms.toDF.toDF("id")
        .withColumn("url", concat(lit(s"http://127.0.0.1:$port/ok/"), col("id")))
      val enriched = Http.invokeHttp(stream, "url", concurrency = 2)
        .select("id", "http_status", "http_body")
      assert(enriched.isStreaming)
      val q = graft.streaming.Streams.toMemorySink(enriched, "http_enrich")
      q.processAllAvailable(); q.stop()
      val rows = spark.table("http_enrich").as[(Long, Int, String)].collect().toSet
      assert(rows === Set((1L, 200, "hello 1"), (2L, 200, "hello 2")))
    }
  }

  test("non-string url/body columns are rejected at plan time, not mid-job") {
    val df = Seq((1, 2L)).toDF("id", "url")
    val err = intercept[IllegalArgumentException] {
      Http.invokeHttp(df, "url")
    }
    assert(err.getMessage.contains("must be string"))
    val err2 = intercept[IllegalArgumentException] {
      Http.invokeHttp(Seq((1, "http://x", 9)).toDF("id", "url", "b"),
        "url", method = "POST", bodyCol = Some("b"))
    }
    assert(err2.getMessage.contains("must be string"))
  }

  test("InvokeHTTP authored from a flow definition enriches through a compiled flow") {
    withServer { (_, port) =>
      val flow = FlowCompiler.parse(
        s"""{"flowContents": {
           |  "processors": [
           |    {"identifier": "u", "type": "UpdateAttribute",
           |     "properties": {"url": "http://127.0.0.1:$port/ok/$${id}"}},
           |    {"identifier": "h", "type": "org.apache.nifi.processors.standard.InvokeHTTP",
           |     "properties": {"URL Column": "url", "HTTP Method": "GET",
           |                    "X-Graft-Run": "flow"}}],
           |  "inputPorts": [{"identifier": "i", "name": "in"}],
           |  "outputPorts": [{"identifier": "o", "name": "out"}],
           |  "connections": [
           |    {"source": {"id": "i"}, "destination": {"id": "u"}},
           |    {"source": {"id": "u"}, "destination": {"id": "h"}},
           |    {"source": {"id": "h"}, "destination": {"id": "o"}}]}}""".stripMargin)
      val out = FlowCompiler.compile(spark, flow,
        Map("in" -> Seq(1, 2).toDF("id").coalesce(1)))("out")
        .select("id", "http_status", "http_body")
        .collect().sortBy(_.getInt(0))
      assert(out(0).toSeq === Seq(1, 200, "hello 1"))
      assert(out(1).toSeq === Seq(2, 200, "hello 2"))
    }
  }

  test("failure route: unreachable host, malformed and null urls") {
    // port 1 on localhost: connection refused fast
    val df = Seq(
      (1, "http://127.0.0.1:1/never"),
      (2, "not a url"),
      (3, null: String)).toDF("id", "url")
    val out = Http.invokeHttp(df.coalesce(1), "url",
        maxRetries = 1, retryBackoffMs = 10, connectTimeoutMs = 500)
      .select("id", "http_status", "http_error")
      .collect().sortBy(_.getInt(0))
    out.foreach { r =>
      assert(r.isNullAt(1), s"row ${r.getInt(0)} should have no status")
      assert(r.getString(2) != null && r.getString(2).nonEmpty,
        s"row ${r.getInt(0)} should carry an error")
    }
    // the failure-route filter NiFi flows use:
    val failures = Http.invokeHttp(df.coalesce(1), "url", maxRetries = 0)
      .filter(col("http_error").isNotNull).count()
    assert(failures === 3)
  }

  test("RestLookupService: LookupRecord enriches via per-distinct-key HTTP fetches") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new AtomicInteger(0)
    server.createContext("/dims", (ex: HttpExchange) => {
      hits.incrementAndGet()
      val k = ex.getRequestURI.getPath.stripPrefix("/dims/")
      respond(ex, 200, s"""{"label":"name-$k","tier":"t${k.length}"}""")
    })
    server.setExecutor(null)
    server.start()
    try {
      val port = server.getAddress.getPort
      val flow = FlowCompiler.parse(
        s"""{"flowContents": {"name": "restlookup",
           |  "controllerServices": [
           |    {"identifier": "svc", "name": "dims", "type": "RestLookupService",
           |     "properties": {"URL": "http://127.0.0.1:$port/dims/{key}",
           |                    "Lookup Value Columns": "label, tier"}}],
           |  "processors": [
           |    {"identifier": "lk", "name": "enrich", "type": "LookupRecord",
           |     "properties": {"Join Key": "k", "Record Lookup Service": "svc"}}],
           |  "inputPorts": [{"identifier": "i", "name": "stream"}],
           |  "outputPorts": [{"identifier": "o", "name": "enriched"}],
           |  "connections": [
           |    {"source": {"id": "i"}, "destination": {"id": "lk"}},
           |    {"source": {"id": "lk"}, "destination": {"id": "o"}}]}}""".stripMargin)
      // 6 rows, 3 distinct keys -> exactly 3 HTTP calls
      val in = Seq("a", "bb", "a", "ccc", "bb", "a").zipWithIndex
        .map { case (k, i) => (i, k) }.toDF("n", "k")
      val out = FlowCompiler.compile(spark, flow, Map("stream" -> in))("enriched")
      val got = out.select("n", "k", "label", "tier")
        .as[(Int, String, String, String)].collect().sortBy(_._1)
      assert(got.length == 6)
      assert(got(0) == ((0, "a", "name-a", "t1")))
      assert(got(3) == ((3, "ccc", "name-ccc", "t3")))
      assert(hits.get() == 3, s"expected one fetch per distinct key, got ${hits.get()}")
    } finally server.stop(0)
  }
}
