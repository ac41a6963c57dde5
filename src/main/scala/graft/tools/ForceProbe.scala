package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Forced-evaluation wall probe for NARROW map-only queries.
  *
  * [[graft.Bench]] times `df.count()`, which is the right consumer for
  * aggregating/joining queries but lets Catalyst prune a pure
  * projection down to a parquet row count — a 13-signal panel over 5M
  * docs "finishes" in 0.2 s without evaluating a single signal.
  * [[graft.Verify]] forces evaluation but through `coalesce(1)`, which
  * pulls the projection into the single output task and single-threads
  * the work it is trying to measure. This probe consumes every output
  * column through `xxhash64` into one aggregated checksum: nothing can
  * be pruned, the work stays distributed, and the returned digest
  * doubles as a cheap cross-run determinism check.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *   sbt "runMain graft.tools.ForceProbe q_a,q_b"` — one JSON line with
  * per-query median seconds (SPARK_GRAFT_BENCH_REPS, default 2).
  */
object ForceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    require(args.nonEmpty, "ForceProbe: pass a comma-separated query list")
    val only = args(0).split(",").map(_.trim).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // probe datasets are 100s of MB: at the default 128 MB split a
      // scan-bound panel runs on 4-26 of 32 threads and the wall ratio
      // measures task count, not work (observed: m300→m1000 read 1.3×
      // for 3.33× data). 4 MB splits saturate the pool at every probe
      // scale; a real 100 TB input never hits this — splits ≫ cores.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the page cache + JIT like Bench does
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.Tables.documents(spark, sfDir).count()
    val results = SparkEntry.queries.filter(q => only(q._1)).toSeq.sortBy(_._1)
      .map { case (name, fn) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          // consume EVERY column: hash each row's columns, XOR-fold the
          // hashes (bit_xor: order-independent, cannot overflow — ANSI
          // mode rejects a long sum of 2⁶³-scale hashes)
          df.select(xxhash64(df.columns.map(col): _*).as("h"))
            .agg(expr("bit_xor(h)")).collect()
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val med = times(times.size / 2)
        name -> med
      }
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val loadavg =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "" }
    println(s"""{"metric":"force_probe","reps":$reps,"sf":"$sfDir","loadavg":"$loadavg","queries":${
      results.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
