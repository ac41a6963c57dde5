package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Regression gate for the `events.ts` physical-encoding drift that broke
  * round 8: the testdata generator switched events.parquet from
  * TIMESTAMP(NANOS) (read as a nanos BIGINT under `nanosAsLong`) to
  * TIMESTAMP_MICROS with isAdjustedToUTC=0 (TIMESTAMP_NTZ). The loader
  * must branch on the schema it actually got, and both encodings must
  * yield the SAME timestamp values under session timeZone=UTC.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(dir: String, nanosAsLong: Boolean): Unit = {
    // 2024-03-01T00:00:00Z plus offsets, micro precision.
    val baseMicros = 1709251200000000L
    val rows = Seq(0L, 1L, 2L, 3L).map(i => (i, baseMicros + i * 1500000L))
    val df =
      if (nanosAsLong)
        // Physical int64 of epoch NANOS — what the old TIMESTAMP(NANOS)
        // files surface as under spark.sql.legacy.parquet.nanosAsLong.
        rows.map { case (id, us) => (id, us * 1000L) }.toDF("event_id", "ts")
      else
        rows.map { case (id, us) => (id, us) }
          .toDF("event_id", "us")
          .withColumn("ts", timestamp_micros($"us").cast("timestamp_ntz"))
          .select("event_id", "ts")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("events loader adapts to nanos-long and TIMESTAMP_NTZ encodings with equal values") {
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    val nanosDir  = Files.createTempDirectory("tables-nanos").toString
    val microsDir = Files.createTempDirectory("tables-micros").toString
    writeEvents(nanosDir, nanosAsLong = true)
    writeEvents(microsDir, nanosAsLong = false)

    val a = Tables.events(spark, nanosDir)
    val b = Tables.events(spark, microsDir)
    assert(a.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(b.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)

    val fmt = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy("event_id")
        .select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .as[String].collect().toSeq
    assert(fmt(a) == fmt(b))
    assert(fmt(a).head == "2024-03-01 00:00:00.000000")
  }

  test("registerAll's events view agrees with the DataFrame loader") {
    val d = "/root/testdata/sf0.001"
    if (new java.io.File(s"$d/events.parquet").exists) {
      Tables.registerAll(spark, d)
      val viewType = spark.table("events").schema("ts").dataType
      val dfType   = Tables.events(spark, d).schema("ts").dataType
      assert(viewType == org.apache.spark.sql.types.TimestampType)
      assert(viewType == dfType)
      val viaView = spark.sql("SELECT min(ts) AS m FROM events").collect().head
      val viaDf   = Tables.events(spark, d).agg(min($"ts").as("m")).collect().head
      assert(viaView == viaDf)
    }
  }

  test("events loader on the real sf0.001 testdata analyzes and is non-empty") {
    val d = "/root/testdata/sf0.001"
    if (new java.io.File(s"$d/events.parquet").exists) {
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
      assert(ev.limit(1).count() == 1)
    }
  }
}
