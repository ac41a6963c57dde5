package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent MinHash-LSH index (r15 — the [[Pq]] 35g treatment for
  * TEXT near-dup, the r14 verdict's stretch): the banded signature
  * tables are computed and persisted ONCE, then any number of query
  * batches — incoming crawl slices, dedup re-checks, DetectDuplicate
  * gates — probe them without re-shingling the corpus. At 100 TB the
  * signatures (numHashes ints, ~256 B/doc at 64 hashes) ARE the
  * resident index; raw text is never touched at serve time.
  *
  * Layout under `path` (open parquet, any engine can read it):
  *   - `bands`: (band_hash, id) PARTITIONED BY band_id, bloom filter
  *     on band_hash — the LSH bucket tables; a probe joins on
  *     (band_id, band_hash) and the blooms skip non-colliding row
  *     groups for point lookups;
  *   - `sigs`: (id, sig) with a bloom on id — the verify side: the
  *     candidate join fetches fixed-size signatures, never documents;
  *   - `meta`: one row (shingle_n, num_hashes, bands).
  *
  * The signature/banding arithmetic is byte-identical to
  * [[Dedup.minHashLsh]] (same native MinHashSignature expression, same
  * [[Dedup.bandHashes]] banding), so serving the corpus back through
  * the index reproduces the inline pair set EXACTLY — DedupLshIndexSpec
  * pins it, cap and all: the hot-bucket `maxBucket` knob counts INDEX
  * rows per bucket, which is the same population the inline window
  * counts when queries = corpus. */
object LshIndex {

  private def readMeta(spark: SparkSession, path: String): (Int, Int, Int) = {
    import spark.implicits._
    spark.read.parquet(s"$path/meta")
      .select("shingle_n", "num_hashes", "bands").as[(Int, Int, Int)].head()
  }

  private def signatures(df: DataFrame, idCol: String, textCol: String,
                         shingleN: Int, numHashes: Int): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      Dedup.minHashSig(col(textCol), shingleN, numHashes).as("sig"))

  /** Build the index: one pass computes signatures, one explode writes
    * the band tables. Vec ids must be unique (the FAISS `add()`
    * contract [[Pq.buildIndex]] documents). */
  def buildIndex(spark: SparkSession, docs: DataFrame, path: String,
                 idCol: String = "doc_id", textCol: String = "text",
                 shingleN: Int = 5, numHashes: Int = 64, bands: Int = 8): Unit = {
    import spark.implicits._
    require(numHashes % bands == 0, "numHashes must divide into bands")
    // a REBUILD at a previously deleted-from path must not inherit its
    // tombstones — they would hide rebuilt docs with recycled ids
    val del = new org.apache.hadoop.fs.Path(deletesDir(path))
    val delFs = del.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (delFs.exists(del)) delFs.delete(del, true)
    val rows = numHashes / bands
    val sig = signatures(docs, idCol, textCol, shingleN, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = sig.count()
    val ndv = math.max(1024L, 2L * n)
    graft.sources.Io.writeParquetBloom(sig, s"$path/sigs", Seq("id"), ndv = ndv)
    graft.sources.Io.writeParquetBloom(
      Dedup.bandHashes(sig, bands, rows).repartition(col("band_id")),
      s"$path/bands", Seq("band_hash"), ndv = ndv, partitionCols = Seq("band_id"))
    Seq((shingleN, numHashes, bands)).toDF("shingle_n", "num_hashes", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    sig.unpersist(blocking = false)
  }

  /** Incremental ingest: signature + band rows for the NEW docs only,
    * appended as new files — existing files untouched, the
    * [[Pq.appendToIndex]] contract. */
  def appendToIndex(spark: SparkSession, path: String, docs: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val (shingleN, numHashes, bands) = readMeta(spark, path)
    val rows = numHashes / bands
    val sig = signatures(docs, idCol, textCol, shingleN, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val n = sig.count()
    val ndv = math.max(1024L, 2L * n)
    sig.write.mode("append")
      .option("parquet.bloom.filter.enabled#id", "true")
      .option("parquet.bloom.filter.expected.ndv#id", ndv.toString)
      .parquet(s"$path/sigs")
    Dedup.bandHashes(sig, bands, rows).repartition(col("band_id"))
      .write.mode("append")
      .option("parquet.bloom.filter.enabled#band_hash", "true")
      .option("parquet.bloom.filter.expected.ndv#band_hash", ndv.toString)
      .partitionBy("band_id").parquet(s"$path/bands")
    sig.unpersist(blocking = false)
  }

  private def deletesDir(path: String) = s"$path/deletes"

  private def hasDeletes(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(deletesDir(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
  }

  /** Delete docs by id — the [[Bm25Index.deleteFromIndex]] tombstone
    * design, for the same reason: a doc's band rows live in EVERY
    * band partition (the layout is bucket-keyed, not doc-keyed), so
    * the delete path appends tombstones only and [[compactIndex]]
    * does the physical removal. Serving anti-joins tombstones BEFORE
    * the hot-bucket cap counts, so capped semantics equal a fresh
    * build without the victims. Already-tombstoned and absent ids are
    * no-ops; returns docs newly deleted. */
  def deleteFromIndex(spark: SparkSession, path: String, ids: DataFrame): Long = {
    require(ids.columns.length == 1, "deleteFromIndex: one id column expected")
    var victims = ids.select(col(ids.columns.head).cast("long").as("id")).distinct()
    if (hasDeletes(spark, path))
      victims = victims.join(spark.read.parquet(deletesDir(path)),
        Seq("id"), "left_anti")
    val held = spark.read.parquet(s"$path/sigs").select("id")
      .join(victims, "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val removed = held.count()
    if (removed > 0)
      held.write.mode("append")
        .option("parquet.bloom.filter.enabled#id", "true")
        .option("parquet.bloom.filter.expected.ndv#id",
          math.max(1024L, 2L * removed).toString) // sized to this batch (r19)
        .parquet(deletesDir(path))
    held.unpersist(blocking = false)
    removed
  }

  /** Upsert: replace-or-insert by id — [[Bm25Index.upsertToIndex]]
    * semantics: a replacing upsert purges between delete and append
    * (id-keyed tombstones would swallow the re-added rows); pure
    * inserts skip the purge. */
  def upsertToIndex(spark: SparkSession, path: String, docs: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val ids = docs.select(col(idCol).cast("long").as("id")).distinct()
    // a PRE-EXISTING tombstone on an incoming id also forces the purge:
    // deleteFromIndex skips already-tombstoned ids, but appending under
    // a live tombstone would hand the new rows to the serve anti-join
    val resurrected =
      if (!hasDeletes(spark, path)) 0L
      else spark.read.parquet(deletesDir(path)).join(ids, "id").count()
    val replaced = deleteFromIndex(spark, path, ids)
    if (replaced > 0 || resurrected > 0) compactIndex(spark, path)
    appendToIndex(spark, path, docs, idCol, textCol)
  }

  /** Probe the index with a query batch: signatures + band hashes for
    * the queries (one narrow pass — the corpus is NOT re-read), bucket
    * join against the persisted band tables, candidate dedup, then the
    * fixed-size signature verify against the persisted `sigs`. Output:
    * (query_id, id, est_jaccard) for matches ≥ `threshold`, self-pairs
    * excluded. `maxBucket` (0 = uncapped) skips buckets whose INDEX
    * population exceeds the cap — [[Dedup.minHashLsh]]'s hot-bucket
    * shed, counted over the same population when queries = corpus.
    * Everything shuffles on (band_id, band_hash) and id — no driver
    * materialization, no broadcast of either side. */
  def searchIndex(spark: SparkSession, path: String, queries: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text",
                  threshold: Double = 0.6, maxBucket: Int = 0): DataFrame = {
    val (shingleN, numHashes, bands) = readMeta(spark, path)
    val rows = numHashes / bands
    val qsig = signatures(queries, idCol, textCol, shingleN, numHashes)
      .localCheckpoint(true)
    val qband = Dedup.bandHashes(qsig, bands, rows)
      .withColumnRenamed("id", "query_id")
    // prune the index side to PROBED buckets before anything else: a
    // left-semi join on the bucket key keeps every index row of a
    // probed bucket (so the cap's population counts are exact) while
    // rows in never-probed buckets — the overwhelming bulk when the
    // query batch is small against a large index — never reach the
    // cap window or the candidate join
    val ibandAll0 = spark.read.parquet(s"$path/bands")
      .select(col("band_id"), col("band_hash"), col("id"))
      .join(qband.select("band_id", "band_hash").distinct(),
        Seq("band_id", "band_hash"), "left_semi")
    // tombstoned docs drop BEFORE the cap window so bucket populations
    // count live rows only — capped semantics stay "fresh build
    // without the victims"
    val ibandAll = if (!hasDeletes(spark, path)) ibandAll0
      else ibandAll0.join(IndexCommon.tombstones(spark, deletesDir(path)),
        Seq("id"), "left_anti")
    val iband =
      if (maxBucket <= 0) ibandAll
      else ibandAll
        .withColumn("graft_bucket_sz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("band_id", "band_hash")))
        .filter(col("graft_bucket_sz") <= maxBucket)
        .drop("graft_bucket_sz")
    val candidates = iband.join(qband, Seq("band_id", "band_hash"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"))
      .distinct()
    val isig = spark.read.parquet(s"$path/sigs")
      .select(col("id"), col("sig").as("sig_b"))
    candidates
      .join(qsig.select(col("id").as("query_id"), col("sig").as("sig_a")), "query_id")
      .join(isig, "id")
      .select(col("query_id"), col("id"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
                            (x, y) => when(x === y, 1).otherwise(0)),
                   lit(0), (acc, v) => acc + v)
          / lit(numHashes.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Compact fragmented layouts (the [[Pq.compactIndex]] treatment):
    * every [[appendToIndex]] adds one file per band partition (and one
    * to `sigs`), so a steady-append deployment accumulates files and
    * every probe pays per-file bloom checks. Band partitions holding
    * more than `maxFilesPerBand` parquet files rewrite to ONE file
    * each in one Spark job; a fragmented `sigs` side compacts the same
    * way. Row content untouched (spec pins search row-identity).
    * Returns the number of band partitions compacted. */
  def compactIndex(spark: SparkSession, path: String,
                   maxFilesPerBand: Int = 8): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(s"$path/bands")
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return 0
    // tombstones present → physical purge: EVERY band partition
    // rewrites (a doc's band rows live everywhere — the deferred cost
    // the tombstone delete buys out of the delete path)
    val purge = hasDeletes(spark, path)
    val tombSmall = purge && IndexCommon.tombstonesSmall(spark, deletesDir(path))
    val tomb = if (purge) Some(spark.read.parquet(deletesDir(path))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
      else None
    def dropTomb(df: DataFrame): DataFrame = tomb match {
      case Some(t) => df.join(IndexCommon.hinted(t, tombSmall), Seq("id"), "left_anti")
      case None => df
    }
    def parquetFiles(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val frag: Array[Int] = fs.listStatus(root).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("band_id="))
      .filter(s => purge || parquetFiles(s.getPath) > maxFilesPerBand)
      .map(_.getPath.getName.stripPrefix("band_id=").toInt).toArray.sorted
    if (frag.nonEmpty) {
      val touched = dropTomb(spark.read.parquet(s"$path/bands")
        .filter(col("band_id").isin(frag.map(Integer.valueOf).toSeq: _*)))
      val n = touched.count()
      val ndv = math.max(1024L, 2L * n / frag.length)
      val tmp = s"$path/bands_tmp_compact"
      graft.sources.Io.writeParquetBloom(touched.repartition(col("band_id")), tmp,
        bloomCols = Seq("band_hash"), ndv = ndv, partitionCols = Seq("band_id"))
      frag.foreach { b =>
        graft.sources.Io.swapDir(fs,
          new org.apache.hadoop.fs.Path(s"$path/bands/band_id=$b"),
          new org.apache.hadoop.fs.Path(s"$tmp/band_id=$b"))
      }
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
    // sigs side: one flat directory — rewrite whole if fragmented or purging
    val sigsDir = new org.apache.hadoop.fs.Path(s"$path/sigs")
    if (fs.exists(sigsDir) && (purge || parquetFiles(sigsDir) > maxFilesPerBand)) {
      val sigs = dropTomb(spark.read.parquet(s"$path/sigs"))
      val n = sigs.count()
      val tmp = s"$path/sigs_tmp_compact"
      graft.sources.Io.writeParquetBloom(sigs.coalesce(
          math.max(1, (n / 1000000L).toInt)), tmp,
        bloomCols = Seq("id"), ndv = math.max(1024L, 2L * n))
      graft.sources.Io.swapDir(fs, sigsDir, new org.apache.hadoop.fs.Path(tmp))
    }
    tomb.foreach { t =>
      t.unpersist(blocking = false)
      fs.delete(new org.apache.hadoop.fs.Path(deletesDir(path)), true)
    }
    frag.length
  }

  /** DetectDuplicate served from the layout: each query row flagged
    * with whether the index already holds a near-duplicate, plus the
    * best match. One index probe; non-duplicates survive with
    * is_duplicate = false. */
  def detectDuplicates(spark: SparkSession, path: String, queries: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       threshold: Double = 0.6, maxBucket: Int = 0): DataFrame = {
    val matches = searchIndex(spark, path, queries, idCol, textCol, threshold, maxBucket)
      .groupBy(col("query_id"))
      .agg(max(struct(col("est_jaccard"), col("id"))).as("best"))
      .select(col("query_id"), col("best.id").as("dup_of"),
        col("best.est_jaccard").as("dup_jaccard"))
    queries.join(matches, col(idCol) === col("query_id"), "left")
      .withColumn("is_duplicate", col("dup_of").isNotNull)
      .drop("query_id")
  }
}
