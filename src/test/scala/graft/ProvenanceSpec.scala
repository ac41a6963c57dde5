package graft

import org.apache.spark.sql.functions._

class ProvenanceSpec extends SparkSpec {
  import spark.implicits._

  test("provenance listener records completed actions with plan digests") {
    val l = Provenance.enable(spark)
    try {
      val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      df.filter(col("id") > 0).count()
      df.select(upper(col("v"))).collect()
      // listener callbacks are async — poll until they land
      eventually {
        val log = Provenance.log(spark, l)
        val actions = log.select("action").as[String].collect()
        assert(actions.contains("count") && actions.contains("collect"),
          s"recorded actions: ${actions.mkString(",")}")
        val row = log.filter(col("action") === "count")
          .select("succeeded", "planDigest", "durationNs")
          .as[(Boolean, String, Long)].collect().head
        assert(row._1 && row._2.length == 32 && row._3 > 0)
      }
    } finally Provenance.disable(spark, l)
  }

  private def eventually[T](body: => T): T = {
    var last: Throwable = null
    for (_ <- 1 to 50) {
      try return body
      catch { case t: org.scalatest.exceptions.TestFailedException => last = t; Thread.sleep(100) }
    }
    throw last
  }
}
