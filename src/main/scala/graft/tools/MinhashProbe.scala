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
  * r12 (m1000 decade probe): adds the CAPPED-regime counts the r11 cap
  * fix made the quantity that matters — `capped_joined_pairs` =
  * Σ_{sz≤cap} C(sz,2) (the self-join's true output once oversized
  * buckets are shed), a bucket-size histogram (which size decade the
  * pair mass lives in), per-stage wall timings (signature / bucket
  * stats / capped LSH), and a `capped_only` mode so the decade probe
  * doesn't have to pay for the uncapped quadratic it already proved
  * at m300.
  *
  * Usage: `sbt "runMain graft.tools.MinhashProbe <sfDir> [shingleN]
  *   [numHashes] [bands] [capped_only] [maxBucket]"`
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val shingleN = if (args.length > 1) args(1).toInt else 5
    val numHashes = if (args.length > 2) args(2).toInt else 64
    val bands = if (args.length > 3) args(3).toInt else 8
    val cappedOnly = args.length > 4 && args(4) == "capped_only"
    val cap = if (args.length > 5) args(5).toInt else 256
    val rows = numHashes / bands
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val (sig, tSig) = timed {
      docs.select(col("doc_id").as("id"),
        graft.plans.TextHashExpressions.minHashSig(col("text"), shingleN, numHashes).as("sig"))
        .localCheckpoint(true) // eager — tSig covers the signature pass
    }
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * rows + 1, lit(rows)))))).as(Seq("band_id", "band_hash")))
    // bucket-population stats: the join output is sum over buckets of
    // C(sz, 2) — the quantity that would grow quadratically if planted
    // dups (or vocab saturation) pile docs into shared buckets. The
    // capped variant restricts to buckets the r11 cap KEEPS — the
    // self-join's true input in the q_dedup_minhash_capped form.
    val buckets = banded.groupBy("band_id", "band_hash").count()
      .localCheckpoint(true)
    val pairsOf = (col("count") * (col("count") - 1) / 2).cast("long")
    val (stats, tStats) = timed {
      buckets.agg(
        count(lit(1)).as("n_buckets"),
        sum(col("count")).as("n_rows"),
        max(col("count")).as("max_bucket"),
        sum(pairsOf).as("joined_pairs"),
        sum(when(col("count") <= cap, pairsOf).otherwise(lit(0L)))
          .as("capped_joined_pairs"),
        sum(when(col("count") > cap, col("count")).otherwise(lit(0L)))
          .as("rows_shed"))
        .collect()(0)
    }
    // size-decade histogram of the pair mass: where do the capped
    // join's pairs come from (2..4, 5..16, 17..64, 65..256, >256)?
    val hist = buckets.groupBy(
        when(col("count") > cap, lit(">cap"))
          .when(col("count") > 64, lit("65-256"))
          .when(col("count") > 16, lit("17-64"))
          .when(col("count") > 4, lit("5-16"))
          .otherwise(lit("2-4")).as("size_class"))
      .agg(count(lit(1)).as("buckets"), sum(pairsOf).as("pairs"))
      .collect().map(r => s""""${r.getString(0)}":[${r.getLong(1)},${r.getLong(2)}]""")
      .sorted.mkString("{", ",", "}")
    val uncapped =
      if (cappedOnly) ""
      else {
        val candidates = banded.as("a").join(banded.as("b"), Seq("band_id", "band_hash"))
          .filter(col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        val rawPairs = candidates.count()
        val distinctPairs = candidates.distinct().count()
        val outPairs = graft.operators.Dedup.minHashLsh(
          docs, "doc_id", "text", shingleN, numHashes, bands).count()
        s""""raw_pairs":$rawPairs,"distinct_pairs":$distinctPairs,"out_pairs":$outPairs,"""
      }
    val (cappedPairs, tCapped) = timed {
      graft.operators.Dedup.minHashLsh(
        docs, "doc_id", "text", shingleN, numHashes, bands, maxBucket = cap).count()
    }
    println(s"""{"sf":"$sfDir","docs":$n,"cap":$cap,"buckets":${stats.getLong(0)},""" +
      s""""banded_rows":${stats.getLong(1)},"max_bucket":${stats.getLong(2)},""" +
      s""""joined_pairs":${stats.getLong(3)},""" +
      s""""capped_joined_pairs":${stats.getLong(4)},"rows_shed":${stats.getLong(5)},""" +
      s""""pair_hist":$hist,$uncapped""" +
      s""""capped_out_pairs":$cappedPairs,""" +
      f""""t_sig":$tSig%.1f,"t_bucket_stats":$tStats%.1f,"t_capped_lsh":$tCapped%.1f}""")
    spark.stop()
  }
}
