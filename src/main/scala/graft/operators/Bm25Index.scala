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
  *   - `docs`: (doc_id, dl) with a doc_id bloom — one row per ingested
  *     doc (including zero-token docs, which have no postings but
  *     count in n/avgdl); carries delete accounting;
  *   - `deletes`: tombstoned doc_ids (present only after a delete) —
  *     the Lucene design: [[deleteFromIndex]] never rewrites postings,
  *     it appends tombstones + NEGATIVE df/stats increments (the same
  *     summed-at-read algebra appends use, so scores stay EXACTLY
  *     what a fresh build without the victims would produce);
  *     [[searchIndex]] anti-joins the tombstone set;
  *     [[compactIndex]] physically drops tombstoned rows and clears
  *     the set;
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

  /** Scale-adaptive bucket count (r19 — the [[Pq.autoCells]]
    * discipline: derive layout cardinality from corpus size, never pin
    * it; guide §2.2/§6): one bucket per ~500 docs keeps each bucket's
    * postings file in a sane size band as the corpus grows, the floor
    * of 8 keeps serve-time partition pruning meaningful on small
    * corpora, and the 4096 cap bounds directory/file count (and the
    * driver's listing cost) at the billion-doc end. Bucket count is
    * layout config — scores and rankings are bucket-invariant. */
  def autoBuckets(nDocs: Long): Int =
    math.max(8L, math.min(4096L, nDocs / 500L)).toInt

  /** (doc_id, dl, toks) — the one corpus tokenize pass. */
  private def tokenized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.wsTokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), col("toks"))

  /** One increment's postings/dfs/stats/docs from a doc batch; the
    * LAST element is the persisted tokenize handle — callers unpersist
    * it once the increment's writes have run (the [[LshIndex]] cache
    * hygiene; a cached frame left registered never auto-evicts). */
  private def increment(docs: DataFrame, idCol: String, textCol: String,
                        nBuckets: Int): (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
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
    (postings, dfs, stats, toks.select("doc_id", "dl"), toks)
  }

  /** Write one increment's four tables. Bloom NDVs are sized from the
    * increment itself (r19 — the [[Pq.buildIndex]] per-cell lesson): a
    * fixed 1M NDV allocates a ~1.2 MB bitmap PER FILE, which at one
    * file per bucket wrote ~25 MB of bloom for ~200 KB of dfs rows at
    * sf0.1 (measured) and scales with bucket count, not data. Distinct
    * terms per bucket file are bounded by the increment's total token
    * count / nBuckets; doc ids by the doc count. Oversizing 2× keeps
    * FPP at the design point; blooms are skip hints — row values are
    * unchanged. */
  private def writeIncrement(postings: DataFrame, dfs: () => DataFrame, stats: DataFrame,
                             docRows: DataFrame, path: String, append: Boolean,
                             termNdv: Long, docNdv: Long): Unit = {
    val mode = if (append) "append" else "overwrite"
    def blo(w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]) =
      w.option("compression", "zstd")
        .option("parquet.bloom.filter.enabled#term", "true")
        .option("parquet.bloom.filter.expected.ndv#term", termNdv.toString)
    blo(postings.repartition(col("bucket")).write.mode(mode))
      .partitionBy("bucket").parquet(s"$path/postings")
    // dfs is a thunk: the build path derives it from the postings just
    // written (read AFTER the write above lands), the append path from
    // its increment frame
    blo(dfs().repartition(col("bucket")).write.mode(mode))
      .partitionBy("bucket").parquet(s"$path/dfs")
    stats.coalesce(1).write.mode(mode).parquet(s"$path/stats")
    docRows.write.mode(mode)
      .option("parquet.bloom.filter.enabled#doc_id", "true")
      .option("parquet.bloom.filter.expected.ndv#doc_id", docNdv.toString)
      .parquet(s"$path/docs")
  }

  /** (docNdv, termNdv) for one increment, read from its stats row over
    * the persisted tokenize (one cheap cached action): docs ≤ 2n,
    * distinct terms per bucket file ≤ 2·Σdl/nBuckets. */
  private def incrementNdv(stats: DataFrame, nBuckets: Int): (Long, Long) = {
    val r = stats.head()
    val n = if (r.isNullAt(0)) 0L else r.getLong(0)
    val sumDl = if (r.isNullAt(1)) 0L else r.getLong(1)
    (math.max(1024L, 2L * n), math.max(1024L, 2L * sumDl / math.max(nBuckets, 1)))
  }

  private def deletesDir(path: String) = s"$path/deletes"

  private def hasDeletes(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(deletesDir(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
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
    // a REBUILD at a previously deleted-from path must not inherit its
    // tombstones — they would hide rebuilt docs with recycled ids
    val del = new org.apache.hadoop.fs.Path(deletesDir(path))
    val fs = del.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(del)) fs.delete(del, true)
    val (postings, _, stats, docRows, toks) = increment(docs, idCol, textCol, nBuckets)
    val (docNdv, termNdv) = incrementNdv(stats, nBuckets)
    // dfs from a read-back of the postings just written (r19): the
    // increment-frame form re-ran the explode + (doc,term) aggregation
    // a second time — at corpus scale a full extra pass. The read-back
    // scans ONLY the term column (+ the free bucket partition value)
    // of the freshly written files; df values are identical because
    // the rows are the very postings the first write produced.
    def dfsRB(): DataFrame = {
      val pDir = new org.apache.hadoop.fs.Path(s"$path/postings")
      val hasBuckets = fs.exists(pDir) &&
        fs.listStatus(pDir).exists(st =>
          st.isDirectory && st.getPath.getName.startsWith("bucket="))
      if (!hasBuckets)
        // empty corpus: no bucket dirs to infer a schema from
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("term", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("df", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.IntegerType))))
      else spark.read.parquet(s"$path/postings")
        .groupBy("term", "bucket").agg(count(lit(1)).as("df"))
        .select(col("term"), col("df"), col("bucket").cast("int").as("bucket"))
    }
    writeIncrement(postings, dfsRB _, stats, docRows, path, append = false,
      termNdv = termNdv, docNdv = docNdv)
    toks.unpersist(blocking = false)
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
    val (postings, dfs, stats, docRows, toks) = increment(docs, idCol, textCol, nBuckets)
    val (docNdv, termNdv) = incrementNdv(stats, nBuckets)
    // append keeps the increment-frame dfs: a read-back would see the
    // PRE-EXISTING postings of earlier increments, not just this batch
    writeIncrement(postings, () => dfs, stats, docRows, path, append = true,
      termNdv = termNdv, docNdv = docNdv)
    toks.unpersist(blocking = false)
  }

  /** Delete docs by id (one `doc_id` column) — the Lucene tombstone
    * design, because a doc's postings spread across EVERY bucket (the
    * layout is term-keyed, so there is no PQ-style owning-cell prune
    * for doc-keyed deletes): postings are NOT rewritten; instead one
    * read-only scan of the victims' postings produces NEGATIVE df
    * increments, the docs table produces a negative (n, Σdl) stats
    * increment (exact even for zero-token victims), and the ids land
    * in `deletes/`. Serving anti-joins the tombstones, so scores are
    * EXACTLY a fresh build without the victims; [[compactIndex]] does
    * the physical removal later. Already-tombstoned ids are excluded
    * first, so repeated deletes cannot double-count the negative
    * increments. Returns the number of docs newly deleted. */
  def deleteFromIndex(spark: SparkSession, path: String, ids: DataFrame): Long = {
    val nBuckets = readMeta(spark, path)
    var victims = ids.select(col("doc_id").cast("long").as("doc_id")).distinct()
    if (hasDeletes(spark, path)) {
      val already = spark.read.parquet(deletesDir(path))
      victims = victims.join(already, Seq("doc_id"), "left_anti")
    }
    // only ids the index actually holds delete (and count)
    val held = spark.read.parquet(s"$path/docs")
      .join(victims, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val removed = held.count()
    if (removed == 0L) { held.unpersist(blocking = false); return 0L }
    // negative stats increment (zero-token victims included via docs/)
    held.agg((-count(lit(1))).as("n"), (-sum(col("dl"))).as("sum_dl"))
      .coalesce(1).write.mode("append").parquet(s"$path/stats")
    // negative df increments: one read-only postings scan for victims
    spark.read.parquet(s"$path/postings")
      .join(held.select("doc_id"), "doc_id")
      .groupBy("term").agg((-count(lit(1))).as("df"))
      .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/dfs")
    held.select("doc_id").write.mode("append")
      .option("parquet.bloom.filter.enabled#doc_id", "true")
      .option("parquet.bloom.filter.expected.ndv#doc_id",
        math.max(1024L, 2L * removed).toString) // sized to this tombstone batch (r19)
      .parquet(deletesDir(path))
    held.unpersist(blocking = false)
    removed
  }

  /** Upsert: replace-or-insert by doc_id. Tombstones cannot coexist
    * with a re-added id (the serve anti-join is id-keyed, so it would
    * swallow the NEW rows too), so a replacing upsert must purge
    * between delete and append — the Lucene update-heavy reality;
    * pure inserts skip the purge. Cost is one compaction rewrite when
    * any id is replaced; batch upserts accordingly. */
  def upsertToIndex(spark: SparkSession, path: String, docs: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id")).distinct()
    // a PRE-EXISTING tombstone on an incoming id also forces the purge:
    // deleteFromIndex skips already-tombstoned ids (no double-counted
    // negatives), but appending under a live tombstone would hand the
    // new rows straight to the serve anti-join
    val resurrected =
      if (!hasDeletes(spark, path)) 0L
      else spark.read.parquet(deletesDir(path)).join(ids, "doc_id").count()
    val replaced = deleteFromIndex(spark, path, ids)
    if (replaced > 0 || resurrected > 0) compactIndex(spark, path)
    appendToIndex(spark, path, docs, idCol, textCol)
  }

  /** Serve a query batch from the layout: read ONLY the query terms'
    * buckets, score with the stored tf/dl/df/stats; tombstoned docs
    * are anti-joined out (broadcast-hinted only while the tombstone
    * layout is small — [[IndexCommon.tombstones]]). Output schema and
    * ranking are
    * row-identical to [[Retrieval.bm25TopK]] on the same corpus:
    * (query_id, doc_id, score, n_terms, rk). */
  def searchIndex(spark: SparkSession, path: String, queries: DataFrame,
                  queryIdCol: String = "query_id", queryTextCol: String = "qtext",
                  k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    val nBuckets = readMeta(spark, path)
    // localCheckpoint, not persist: materialized once for the buckets
    // collect + the final join, and the blocks auto-release when the
    // result frame is dropped (a registered cache would pin forever)
    val qt = queries.select(col(queryIdCol).as("query_id"),
        explode(TextAnalysis.wsTokens(col(queryTextCol))).as("term"))
      .distinct()
      .localCheckpoint(true)
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
    val tf0 = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(bs: _*))
      .join(broadcast(terms), Seq("term"), "left_semi")
      .select("doc_id", "dl", "term", "tf")
    val tf = if (!hasDeletes(spark, path)) tf0
      else tf0.join(IndexCommon.tombstones(spark, deletesDir(path)),
        Seq("doc_id"), "left_anti")
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
    * contract) and physically remove tombstoned docs: postings files
    * concatenate (minus victims); df increment rows for the same term
    * COLLAPSE to their sum and zero-sum terms drop; stats rows
    * collapse to one; the docs table sheds victims and the tombstone
    * set clears. When tombstones exist EVERY postings bucket rewrites
    * (a doc's terms live everywhere — this is the deferred cost the
    * tombstone design buys out of the delete path, Lucene's merge);
    * otherwise only past-threshold buckets do. Returns rewritten
    * bucket count. */
  def compactIndex(spark: SparkSession, path: String,
                   maxFilesPerBucket: Int = 8): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val purge = hasDeletes(spark, path)
    val tombSmall = purge && IndexCommon.tombstonesSmall(spark, deletesDir(path))
    val tomb = if (purge) Some(spark.read.parquet(deletesDir(path))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
      else None
    def parquetFiles(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    def allBuckets(sub: String, fragOnly: Boolean): Array[Int] = {
      val root = new org.apache.hadoop.fs.Path(s"$path/$sub")
      if (!fs.exists(root)) Array.empty
      else fs.listStatus(root).iterator
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
        .filter(s => !fragOnly || parquetFiles(s.getPath) > maxFilesPerBucket)
        .map(_.getPath.getName.stripPrefix("bucket=").toInt).toArray.sorted
    }
    def rewrite(sub: String, frag: Array[Int], collapse: DataFrame => DataFrame): Unit =
      if (frag.nonEmpty) {
        val touched = collapse(spark.read.parquet(s"$path/$sub")
          .filter(col("bucket").isin(frag.map(Integer.valueOf).toSeq: _*)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        // NDV sized to the rewritten rows per bucket (r19 — the
        // LshIndex compaction discipline), not a fixed 1M bitmap
        val ndv = math.max(1024L, 2L * touched.count() / frag.length)
        val tmp = s"$path/${sub}_tmp_compact"
        graft.sources.Io.writeParquetBloom(touched.repartition(col("bucket")), tmp,
          bloomCols = Seq("term"), ndv = ndv, partitionCols = Seq("bucket"))
        touched.unpersist(blocking = false)
        frag.foreach { bkt =>
          graft.sources.Io.swapDir(fs,
            new org.apache.hadoop.fs.Path(s"$path/$sub/bucket=$bkt"),
            new org.apache.hadoop.fs.Path(s"$tmp/bucket=$bkt"))
        }
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
    val fragP = allBuckets("postings", fragOnly = !purge)
    rewrite("postings", fragP, p => tomb match {
      case Some(t) => p.join(IndexCommon.hinted(t, tombSmall), Seq("doc_id"), "left_anti")
      case None => p
    })
    val fragD = allBuckets("dfs", fragOnly = !purge)
    rewrite("dfs", fragD, d => d.groupBy("term", "bucket").agg(sum("df").as("df"))
      .filter(col("df") =!= 0L) // fully-deleted terms vanish
      .select("term", "df", "bucket"))
    val statsDir = new org.apache.hadoop.fs.Path(s"$path/stats")
    if (fs.exists(statsDir) && (purge || parquetFiles(statsDir) > maxFilesPerBucket)) {
      val merged = spark.read.parquet(s"$path/stats")
        .agg(sum("n").as("n"), sum("sum_dl").as("sum_dl"))
      val tmp = s"$path/stats_tmp_compact"
      merged.coalesce(1).write.mode("overwrite").parquet(tmp) // crash-retry safe
      graft.sources.Io.swapDir(fs, statsDir, new org.apache.hadoop.fs.Path(tmp))
    }
    tomb.foreach { t =>
      val docsDir = new org.apache.hadoop.fs.Path(s"$path/docs")
      val kept = spark.read.parquet(docsDir.toString)
        .join(IndexCommon.hinted(t, tombSmall), Seq("doc_id"), "left_anti")
      val tmp = s"$path/docs_tmp_compact"
      kept.write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#doc_id", "true")
        .option("parquet.bloom.filter.expected.ndv#doc_id", "1000000")
        .parquet(tmp)
      graft.sources.Io.swapDir(fs, docsDir, new org.apache.hadoop.fs.Path(tmp))
      t.unpersist(blocking = false)
      fs.delete(new org.apache.hadoop.fs.Path(deletesDir(path)), true)
    }
    fragP.length + fragD.length
  }
}
