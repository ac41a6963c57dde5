package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.El
import graft.operators.{Records, Route}

/** End-to-end NiFi-flow-shaped pipeline, Spark-first — the shape a
  * reference user would port one of their flows into:
  *
  *   GetFile(events) → EvaluateJsonPath → UpdateAttribute(EL) →
  *   RouteOnAttribute → LookupRecord(customer⋈nation) →
  *   MergeContent(bin-pack) → PutFile(partitioned parquet)
  *
  * Run: `sbt "runMain graft.FlowDemo [sfDir] [outDir]"`. Everything is
  * one lazy Catalyst plan per route — no per-record processor hops.
  */
object FlowDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_flow_out"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // GetFile + EvaluateJsonPath + UpdateAttribute (EL-driven)
    val events = Records.jsonPath(Tables.events(spark, sfDir), "props", "k" -> "$.k")
    val enriched = Records.update(events,
      "k"         -> col("k").cast("long"),
      "day"       -> date_format(col("ts"), "yyyy-MM-dd"),
      "user_tag"  -> El.compile("u-${user_id:padLeft(4, '0')}"))

    // RouteOnAttribute (single pass, tagged)
    val routed = Route.tagged(enriched, Seq(
      "alerts"    -> (col("event_type") === "error"),
      "purchases" -> (col("event_type") === "purchase"),
      "traffic"   -> col("event_type").isin("click", "view")))

    // LookupRecord: broadcast enrichment of purchases with customer name
    val customers = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val purchases = Records.lookup(
      routed.filter(col("route") === "purchases"),
      customers, Seq("user_id" -> "c_custkey"))

    // MergeContent-style bin assignment + PutFile (partitioned)
    val binned = Records.binPack(purchases.withColumn("sz", length(col("props"))),
      Seq("day"), "event_id", "sz", 4096L)
    binned.write.mode("overwrite").partitionBy("day")
      .parquet(s"$outDir/purchases")
    routed.filter(col("route") === "alerts")
      .write.mode("overwrite").parquet(s"$outDir/alerts")

    val counts = routed.groupBy("route").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", ")
    println(s"[flow] routes: $counts")
    println(s"[flow] outputs under $outDir")
    spark.stop()
  }
}
