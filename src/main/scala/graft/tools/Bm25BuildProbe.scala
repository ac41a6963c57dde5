package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r19 scratch probe: where do q_bm25_index's CPU-seconds go?
  * Replays the build phases and the serve phases separately. */
object Bm25BuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val nBuckets = 32
    val queries = Seq((0L, "hash join table"), (1L, "window agg stream"),
        (2L, "fast scan filter"), (3L, "vector merge sort column"))
      .toDF("query_id", "qtext")
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val toks = time("tokenize+persist+count") {
        val t = docs.select(col("doc_id").cast("long").as("doc_id"),
            graft.functions.TextAnalysis.wsTokens(col("text")).as("toks"))
          .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), col("toks"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        t.count(); t
      }
      val postings = toks
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
      time("postings write") {
        postings.repartition(col("bucket")).write.mode("overwrite")
          .option("compression", "zstd")
          .option("parquet.bloom.filter.enabled#term", "true")
          .option("parquet.bloom.filter.expected.ndv#term", "40000")
          .partitionBy("bucket").parquet("/tmp/bm25probe/postings")
      }
      val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
      time("dfs write") {
        dfs.repartition(col("bucket")).write.mode("overwrite")
          .option("compression", "zstd")
          .option("parquet.bloom.filter.enabled#term", "true")
          .option("parquet.bloom.filter.expected.ndv#term", "40000")
          .partitionBy("bucket").parquet("/tmp/bm25probe/dfs")
      }
      time("stats+docs+meta writes") {
        toks.agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))
          .coalesce(1).write.mode("overwrite").parquet("/tmp/bm25probe/stats")
        toks.select("doc_id", "dl").write.mode("overwrite")
          .option("parquet.bloom.filter.enabled#doc_id", "true")
          .option("parquet.bloom.filter.expected.ndv#doc_id", "10000")
          .parquet("/tmp/bm25probe/docs")
        Seq(nBuckets).toDF("n_buckets")
          .coalesce(1).write.mode("overwrite").parquet("/tmp/bm25probe/meta")
      }
      toks.unpersist(blocking = false)
      // ---- serve phases
      val qt = time("qt checkpoint") {
        queries.select(col("query_id"),
            explode(graft.functions.TextAnalysis.wsTokens(col("qtext"))).as("term"))
          .distinct()
          .localCheckpoint(true)
      }
      val terms = qt.select("term").distinct()
      val buckets = time("buckets collect") {
        terms.select(pmod(hash(col("term")), lit(nBuckets)).as("bucket"))
          .distinct().as[Int].collect().sorted
      }
      time("score+topk") {
        val bs = buckets.map(Integer.valueOf).toSeq
        val tf = spark.read.parquet("/tmp/bm25probe/postings")
          .filter(col("bucket").isin(bs: _*))
          .join(broadcast(terms), Seq("term"), "left_semi")
          .select("doc_id", "dl", "term", "tf")
        val dft = spark.read.parquet("/tmp/bm25probe/dfs")
          .filter(col("bucket").isin(bs: _*))
          .join(broadcast(terms), Seq("term"), "left_semi")
          .groupBy("term").agg(sum("df").as("df"))
        val stats = spark.read.parquet("/tmp/bm25probe/stats")
          .agg(sum("n").as("n"),
            (sum("sum_dl").cast("double") / sum("n")).as("avgdl"))
        val k1 = 1.2; val b = 0.75
        val wt = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
        val scored = tf
          .join(broadcast(dft), Seq("term"))
          .crossJoin(broadcast(stats))
          .withColumn("wt", wt)
          .join(broadcast(qt), Seq("term"))
          .groupBy("query_id", "doc_id")
          .agg((round(sum(col("wt")) * math.pow(10, 6)) / math.pow(10, 6)).as("score"),
            count(lit(1)).as("n_terms"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
        scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= 10)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
