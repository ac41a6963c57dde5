package graft

import org.apache.spark.sql.functions._

/** HLL approx distinct vs exact (SURVEY §2.3 #28f): the approximate
  * path must land within its documented error bound on real table data. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on events") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val rows = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
           approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .select("exact", "approx").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"approx $approx vs exact $exact")
    }
  }
}
