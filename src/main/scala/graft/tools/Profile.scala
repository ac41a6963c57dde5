package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Scratch profiling main for local iteration (not part of the driver
  * contract). Times the stages of the heaviest queries separately. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    val g = docs.select(col("source").as("block"), col("doc_id").as("id"),
        graft.plans.TextHashExpressions.hashedShingles(col("text"), 3).as("grams"))
      .withColumn("n_grams", size(col("grams")))
    time("gram arrays") { g.localCheckpoint(true).count() }
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", "source",
        n = 3, threshold = 0.55)
      .select(col("id_a"), col("id_b"))
    time("ngramJaccard pairs count") { println("  pairs=" + pairs.count()) }
    time("ngramJaccard 2nd run") { println("  pairs=" + pairs.count()) }
    val cached = pairs.localCheckpoint(true)
    time("clusters over cached pairs") { println("  labels=" + Dedup.clusters(cached, 50).count()) }
    time("full qDedupCluster") {
      println("  rows=" + graft.QueriesLlm.qDedupCluster(spark, sfDir).count())
    }
    spark.stop()
  }
}
