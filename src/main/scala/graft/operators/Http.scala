package graft.operators

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** InvokeHTTP (NiFi's HTTP enrichment processor), Spark-first: one
  * `java.net.http.HttpClient` per partition, requests fired in bounded
  * concurrent batches (async pipeline inside the batch, `concurrency`
  * in flight), transient failures retried with linear backoff.
  *
  * Appends three columns — `http_status` (int, null on transport
  * failure), `http_body` (string, null on transport failure),
  * `http_error` (string, null on any completed HTTP exchange). NiFi's
  * response/retry/no-retry relationships map to filters on these:
  * 2xx = response, `http_error IS NOT NULL` = failure route, 4xx/5xx
  * visible in `http_status`. A null/blank URL routes to failure.
  *
  * Scale posture: per-partition client (connection pooling amortized
  * across the partition), no driver involvement, no shuffle — the
  * operator is a narrow map. Partition count × `concurrency` bounds the
  * cluster-wide request rate; repartition upstream to tune it.
  * Retries: only 5xx and transport errors (4xx is a caller bug, not
  * transient).
  */
object Http {

  def invokeHttp(df: DataFrame, urlCol: String,
                 method: String = "GET",
                 bodyCol: Option[String] = None,
                 headers: Map[String, String] = Map.empty,
                 requestTimeoutMs: Int = 5000,
                 connectTimeoutMs: Int = 3000,
                 maxRetries: Int = 2,
                 retryBackoffMs: Int = 200,
                 concurrency: Int = 8): DataFrame = {
    require(Seq("GET", "POST", "PUT", "DELETE").contains(method.toUpperCase),
      s"unsupported method $method")
    require(concurrency >= 1, "concurrency must be >= 1")
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("http_status", IntegerType, nullable = true),
      StructField("http_body", StringType, nullable = true),
      StructField("http_error", StringType, nullable = true)))
    val urlIdx = inSchema.fieldIndex(urlCol)
    val bodyIdx = bodyCol.map(inSchema.fieldIndex)
    // fail fast at plan time: a non-string column would otherwise throw
    // ClassCastException mid-job inside tasks, failing the whole job
    // instead of landing rows in the http_error failure route
    require(inSchema(urlIdx).dataType == StringType,
      s"url column '$urlCol' must be string, got ${inSchema(urlIdx).dataType.catalogString}")
    bodyIdx.foreach(i => require(inSchema(i).dataType == StringType,
      s"body column '${bodyCol.get}' must be string, got ${inSchema(i).dataType.catalogString}"))
    val m = method.toUpperCase
    val hdrs = headers.toSeq

    df.mapPartitions { rows: Iterator[Row] =>
      if (rows.isEmpty) Iterator.empty
      else {
        val client = HttpClient.newBuilder()
          .connectTimeout(Duration.ofMillis(connectTimeoutMs.toLong))
          .followRedirects(HttpClient.Redirect.NORMAL)
          .build()

        def buildRequest(url: String, body: Option[String]): HttpRequest = {
          val b = HttpRequest.newBuilder(URI.create(url))
            .timeout(Duration.ofMillis(requestTimeoutMs.toLong))
          hdrs.foreach { case (k, v) => b.header(k, v) }
          val publisher = body match {
            case Some(s) => HttpRequest.BodyPublishers.ofString(s)
            case None => HttpRequest.BodyPublishers.noBody()
          }
          b.method(m, publisher).build()
        }

        // sync retry path — taken only after the async attempt failed
        // transiently, so the latency hit is the rare case
        def retrySync(req: HttpRequest): (Option[Int], Option[String], Option[String]) = {
          var attempt = 1 // attempt 0 was the async one
          var out: (Option[Int], Option[String], Option[String]) = (None, None, None)
          var done = false
          while (!done && attempt <= maxRetries) {
            Thread.sleep(retryBackoffMs.toLong * attempt)
            try {
              val r = client.send(req, HttpResponse.BodyHandlers.ofString())
              if (r.statusCode() >= 500 && attempt < maxRetries) ()
              else { out = (Some(r.statusCode()), Some(r.body()), None); done = true }
            } catch {
              case e: Exception =>
                if (attempt >= maxRetries) {
                  out = (None, None, Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
                  done = true
                }
            }
            attempt += 1
          }
          out
        }

        type InFlight = (java.util.concurrent.CompletableFuture[HttpResponse[String]],
                         HttpRequest)
        rows.grouped(concurrency).flatMap { batch =>
          // fire the whole batch async first (bounded concurrency =
          // batch size), then drain — Left carries a pre-dispatch error
          val dispatched: Seq[(Row, Either[String, InFlight])] = batch.map { row =>
            val url = if (row.isNullAt(urlIdx)) null else row.getString(urlIdx)
            if (url == null || url.trim.isEmpty) (row, Left("null or empty url"))
            else {
              val body = bodyIdx.flatMap(i => Option(row.getString(i)))
              try {
                val req = buildRequest(url, body)
                (row, Right((client.sendAsync(req, HttpResponse.BodyHandlers.ofString()), req)))
              } catch { // malformed URI etc.
                case e: Exception =>
                  (row, Left(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
              }
            }
          }
          dispatched.map {
            case (row, Left(err)) =>
              Row.fromSeq(row.toSeq ++ Seq(null, null, err))
            case (row, Right((future, req))) =>
              val (status, body, err) =
                try {
                  val r = future.join()
                  if (r.statusCode() >= 500 && maxRetries > 0) retrySync(req)
                  else (Some(r.statusCode()), Some(r.body()), None)
                } catch {
                  case e: Exception =>
                    if (maxRetries > 0) retrySync(req)
                    else (None, None,
                      Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
                }
              Row.fromSeq(row.toSeq ++
                Seq(status.orNull, body.orNull, err.orNull))
          }
        }
      }
    }(Encoders.row(outSchema))
  }
}
