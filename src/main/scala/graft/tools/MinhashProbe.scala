package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** r11 adjudication probe for the q_dedup_minhash m300 step (VERDICT
  * r10 task 1): measures the terms that could make the banded LSH
  * super-linear — band-bucket population (sum of C(sz,2) candidate
  * pairs before the distinct), distinct candidate pairs, and final
  * output pairs — at each scale, so "pair growth" vs "config/spill
  * overhead" is decided by COUNTS, not wall-time inference.
  *
  * Usage: `sbt "runMain graft.tools.MinhashProbe <sfDir> [shingleN] [numHashes] [bands]"`
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val shingleN = if (args.length > 1) args(1).toInt else 5
    val numHashes = if (args.length > 2) args(2).toInt else 64
    val bands = if (args.length > 3) args(3).toInt else 8
    val rows = numHashes / bands
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val sig = docs.select(col("doc_id").as("id"),
      graft.plans.TextHashExpressions.minHashSig(col("text"), shingleN, numHashes).as("sig"))
      .localCheckpoint(true)
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * rows + 1, lit(rows)))))).as(Seq("band_id", "band_hash")))
    // bucket-population stats: the join output is sum over buckets of
    // C(sz, 2) — the quantity that would grow quadratically if planted
    // dups (or vocab saturation) pile docs into shared buckets
    val buckets = banded.groupBy("band_id", "band_hash").count()
    val stats = buckets.agg(
      count(lit(1)).as("n_buckets"),
      sum(col("count")).as("n_rows"),
      max(col("count")).as("max_bucket"),
      sum((col("count") * (col("count") - 1) / 2).cast("long")).as("joined_pairs"))
      .collect()(0)
    val candidates = banded.as("a").join(banded.as("b"), Seq("band_id", "band_hash"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val rawPairs = candidates.count()
    val distinctPairs = candidates.distinct().count()
    val outPairs = graft.operators.Dedup.minHashLsh(
      docs, "doc_id", "text", shingleN, numHashes, bands).count()
    val cappedPairs = graft.operators.Dedup.minHashLsh(
      docs, "doc_id", "text", shingleN, numHashes, bands, maxBucket = 256).count()
    println(s"""{"sf":"$sfDir","docs":$n,"buckets":${stats.getLong(0)},""" +
      s""""banded_rows":${stats.getLong(1)},"max_bucket":${stats.getLong(2)},""" +
      s""""joined_pairs":${stats.getLong(3)},"raw_pairs":$rawPairs,""" +
      s""""distinct_pairs":$distinctPairs,"out_pairs":$outPairs,""" +
      s""""capped_out_pairs":$cappedPairs}""")
    spark.stop()
  }
}
