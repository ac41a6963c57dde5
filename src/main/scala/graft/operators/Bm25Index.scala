package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextAnalysis

/** Persistent BM25 index (r15 — the [[Pq]] 35g / [[LshIndex]] 32c
  * treatment for LEXICAL retrieval, completing the persistent-index
  * family trio: vectors, near-dup signatures, and now the inverted
  * index): tokenize and weight the corpus ONCE, then any number of
  * query batches probe the postings without touching corpus text.
  * [[Retrieval.bm25TopK]] re-tokenizes and re-counts the corpus per
  * query batch — exactly the rebuild-per-serve shape the other two
  * indexes eliminated; at 100 TB the postings (one row per distinct
  * (doc, matched term)) are the resident index and raw documents are
  * never read at serve time.
  *
  * Layout under `path` (open parquet, any engine reads it):
  *   - `postings`: (term, doc_id, tf, dl) PARTITIONED BY `bucket` =
  *     pmod(hash(term), nBuckets), bloom filter on term — a query
  *     batch prunes to its terms' buckets from the path alone and the
  *     blooms skip non-matching row groups inside them;
  *   - `dfs`: (term, df, bucket), same partitioning — document
  *     frequencies, written PER INCREMENT and summed at read so
  *     appends never rewrite history;
  *   - `stats`: (n, sum_dl) rows, one per increment, summed at read —
  *     exact integers, so the corpus-level constants are
  *     append-additive with no read-modify-write;
  *   - `meta`: one row (n_buckets).
  *
  * The score arithmetic is OPERAND-SHAPE-IDENTICAL to
  * [[Retrieval.bm25TopK]] (same Robertson idf, same single avgdl
  * division, same 6-dp rounding), so serving from the layout
  * reproduces the inline ranking row-for-row — Bm25IndexSpec pins it,
  * and the catalog oracle replays the whole build→persist→search
  * round trip in SQL.
  *
  * Scale: build = one tokenize pass + one shuffle on term; serve
  * reads only the query terms' buckets (partition pruning) and
  * broadcasts the query-term dictionary (bounded by the query batch's
  * vocabulary — the [[Dsir]] model-broadcast contract; a 10⁶-query
  * offline batch should chunk its queries). Stop-word postings are
  * large but their idf weight is ~0 — the Lucene trade; cap them
  * upstream with [[Dedup]]-style df filters if the corpus demands.
  */
object Bm25Index {

  private def readMeta(spark: SparkSession, path: String): Int = {
    import spark.implicits._
    spark.read.parquet(s"$path/meta").select("n_buckets").as[Int].head()
  }

  /** (doc_id, dl, toks) — the one corpus tokenize pass. */
  private def tokenized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.wsTokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), col("toks"))

  /** One increment's postings/dfs/stats from a doc batch. */
  private def increment(docs: DataFrame, idCol: String, textCol: String,
                        nBuckets: Int): (DataFrame, DataFrame, DataFrame) = {
    val toks = tokenized(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val postings = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
    val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
    // zero-token docs carry no postings but still count in n/sum_dl
    val stats = toks.agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))
    (postings, dfs, stats)
  }

  private def writeIncrement(postings: DataFrame, dfs: DataFrame, stats: DataFrame,
                             path: String, append: Boolean): Unit = {
    val mode = if (append) "append" else "overwrite"
    def blo(w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]) =
      w.option("compression", "zstd")
        .option("parquet.bloom.filter.enabled#term", "true")
        .option("parquet.bloom.filter.expected.ndv#term", "1000000")
    blo(postings.repartition(col("bucket")).write.mode(mode))
      .partitionBy("bucket").parquet(s"$path/postings")
    blo(dfs.repartition(col("bucket")).write.mode(mode))
      .partitionBy("bucket").parquet(s"$path/dfs")
    stats.coalesce(1).write.mode(mode).parquet(s"$path/stats")
  }

  /** Build the index: one tokenize pass, one shuffle on term. Doc ids
    * must be unique across the corpus (the FAISS `add()` contract
    * [[Pq.buildIndex]] documents — re-ingesting an id double-counts;
    * delete first or dedup upstream). */
  def buildIndex(spark: SparkSession, docs: DataFrame, path: String,
                 idCol: String = "doc_id", textCol: String = "text",
                 nBuckets: Int = 64): Unit = {
    import spark.implicits._
    require(nBuckets >= 1, "nBuckets >= 1")
    val (postings, dfs, stats) = increment(docs, idCol, textCol, nBuckets)
    writeIncrement(postings, dfs, stats, path, append = false)
    Seq(nBuckets).toDF("n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Incremental ingest: postings/df/stat rows for the NEW docs only,
    * appended as new files in the touched buckets — existing files
    * untouched, df and corpus stats summed at read
    * ([[Pq.appendToIndex]] contract). */
  def appendToIndex(spark: SparkSession, path: String, docs: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val nBuckets = readMeta(spark, path)
    val (postings, dfs, stats) = increment(docs, idCol, textCol, nBuckets)
    writeIncrement(postings, dfs, stats, path, append = true)
  }

  /** Serve a query batch from the layout: read ONLY the query terms'
    * buckets, score with the stored tf/dl/df/stats. Output schema and
    * ranking are row-identical to [[Retrieval.bm25TopK]] on the same
    * corpus: (query_id, doc_id, score, n_terms, rk). */
  def searchIndex(spark: SparkSession, path: String, queries: DataFrame,
                  queryIdCol: String = "query_id", queryTextCol: String = "qtext",
                  k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    val nBuckets = readMeta(spark, path)
    val qt = queries.select(col(queryIdCol).as("query_id"),
        explode(TextAnalysis.wsTokens(col(queryTextCol))).as("term"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val terms = qt.select("term").distinct()
    // the probed buckets: bounded by the query batch's vocabulary —
    // collect is ≤ nBuckets ints, and the isin literal prunes the
    // partitioned read from the path alone
    val buckets: Array[Int] = terms
      .select(pmod(hash(col("term")), lit(nBuckets)).as("bucket"))
      .distinct().as[Int].collect().sorted
    if (buckets.isEmpty)
      return spark.emptyDataFrame
        .withColumn("query_id", lit(0L)).withColumn("doc_id", lit(0L))
        .withColumn("score", lit(0.0)).withColumn("n_terms", lit(0L))
        .withColumn("rk", lit(0L)).limit(0)
    val bs = buckets.map(Integer.valueOf).toSeq
    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(bs: _*))
      .join(broadcast(terms), Seq("term"), "left_semi")
      .select("doc_id", "dl", "term", "tf")
    val dft = spark.read.parquet(s"$path/dfs")
      .filter(col("bucket").isin(bs: _*))
      .join(broadcast(terms), Seq("term"), "left_semi")
      .groupBy("term").agg(sum("df").as("df")) // increments sum at read
    val stats = spark.read.parquet(s"$path/stats")
      .agg(sum("n").as("n"),
        (sum("sum_dl").cast("double") / sum("n")).as("avgdl"))
    // operand shapes mirror Retrieval.bm25TopK verbatim → identical doubles
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
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** Merge fragmented buckets after appends ([[LshIndex.compactIndex]]
    * contract): postings files concatenate; df increment rows for the
    * same term COLLAPSE to their sum (reads after compaction do less
    * summing); stats rows collapse to one. Returns compacted bucket
    * count. */
  def compactIndex(spark: SparkSession, path: String,
                   maxFilesPerBucket: Int = 8): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    def parquetFiles(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    def fragBuckets(sub: String): Array[Int] = {
      val root = new org.apache.hadoop.fs.Path(s"$path/$sub")
      if (!fs.exists(root)) Array.empty
      else fs.listStatus(root).iterator
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
        .filter(s => parquetFiles(s.getPath) > maxFilesPerBucket)
        .map(_.getPath.getName.stripPrefix("bucket=").toInt).toArray.sorted
    }
    def rewrite(sub: String, frag: Array[Int], collapse: DataFrame => DataFrame): Unit =
      if (frag.nonEmpty) {
        val touched = collapse(spark.read.parquet(s"$path/$sub")
          .filter(col("bucket").isin(frag.map(Integer.valueOf).toSeq: _*)))
        val tmp = s"$path/${sub}_tmp_compact"
        graft.sources.Io.writeParquetBloom(touched.repartition(col("bucket")), tmp,
          bloomCols = Seq("term"), ndv = 1000000L, partitionCols = Seq("bucket"))
        frag.foreach { bkt =>
          graft.sources.Io.swapDir(fs,
            new org.apache.hadoop.fs.Path(s"$path/$sub/bucket=$bkt"),
            new org.apache.hadoop.fs.Path(s"$tmp/bucket=$bkt"))
        }
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
    val fragP = fragBuckets("postings")
    rewrite("postings", fragP, identity)
    val fragD = fragBuckets("dfs")
    rewrite("dfs", fragD, d => d.groupBy("term", "bucket").agg(sum("df").as("df"))
      .select("term", "df", "bucket"))
    val statsDir = new org.apache.hadoop.fs.Path(s"$path/stats")
    if (fs.exists(statsDir) && parquetFiles(statsDir) > maxFilesPerBucket) {
      val merged = spark.read.parquet(s"$path/stats")
        .agg(sum("n").as("n"), sum("sum_dl").as("sum_dl"))
      val tmp = s"$path/stats_tmp_compact"
      merged.coalesce(1).write.parquet(tmp)
      graft.sources.Io.swapDir(fs, statsDir, new org.apache.hadoop.fs.Path(tmp))
    }
    fragP.length + fragD.length
  }
}
