package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Adjudication probe for the q_dsir_weights 13%-over-linear residual
  * (tools/NOTES_r12_newfam.md): decides by COUNTS and per-stage walls
  * whether anything in the DSIR pipeline grows faster than the data.
  *
  * Terms measured per scale:
  *  - `gram_rows`    — the unigram+bigram stream (linear in tokens by
  *                     construction; counted to prove the input term)
  *  - `db_rows`      — distinct (doc, bucket) count rows after the
  *                     first shuffle (sub-linear in grams: buckets
  *                     saturate at 4096 per doc)
  *  - `max_bucket_share` — the heaviest md5 bucket's share of the gram
  *                     stream (a hot bucket would make the model agg
  *                     or the broadcast-join probe skewed; md5
  *                     uniformity predicts ~1/4096 + noise)
  *  - stage walls    — t_db (grams → first count agg consumed),
  *                     t_full (the complete importanceWeights)
  *
  * Usage: `sbt "runMain graft.tools.DsirProbe <sfDir>"` — one JSON line.
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm the scan

    // replicate the operator's internal stream (Dsir.grams is private;
    // the same construction, kept in sync with Dsir.scala:41)
    val toks = docs.select(col("doc_id").as("_id"),
      (col("doc_id") % 10 === 0).as("_tgt"),
      graft.functions.TextAnalysis.wsTokens(lower(col("text"))).as("_toks"))
    val uni = toks.select(col("_id"), col("_tgt"), explode(col("_toks")).as("gram"))
    val bi = toks.select(col("_id"), col("_tgt"), explode(
      when(size(col("_toks")) >= 2, zip_with(
        slice(col("_toks"), lit(1), size(col("_toks")) - 1),
        slice(col("_toks"), lit(2), size(col("_toks")) - 1),
        (a, b) => concat(a, lit(" "), b)))
        .otherwise(typedLit(Seq.empty[String]))).as("gram"))
    val grams = uni.unionByName(bi)
      .withColumn("b", substring(md5(col("gram").cast("binary")), 1, 3))

    val gramRows = grams.count()
    val bucketTop = grams.groupBy("b").agg(count(lit(1)).as("n"))
      .agg(max("n").as("mx"), sum("n").as("tot")).collect().head
    val maxShare = bucketTop.getLong(0).toDouble / bucketTop.getLong(1)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (dbRows, tDb) = time {
      grams.groupBy("_id", "_tgt", "b").agg(count(lit(1)).as("c")).count()
    }
    spark.catalog.clearCache()
    val (fullRows, tFull) = time {
      graft.operators.Dsir.importanceWeights(
        docs, "doc_id", "text", col("doc_id") % 10 === 0).count()
    }
    val loadavg =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "" }
    def f(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"dsir_probe","sf":"$sfDir","loadavg":"$loadavg",""" +
      s""""gram_rows":$gramRows,"db_rows":$dbRows,"weight_rows":$fullRows,""" +
      s""""max_bucket_share":${f(maxShare)},"t_db_sec":${f(tDb)},"t_full_sec":${f(tFull)}}""")
    spark.stop()
  }
}
