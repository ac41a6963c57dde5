package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Put/Fetch/RemoveDistributedMapCache (the NiFi cache-service family
  * that DetectDuplicate and Wait/Notify lean on), Spark-first: the
  * cache is a parquet GENERATION LOG on any Hadoop filesystem —
  * `put`/`remove` append a numbered generation, `fetch`/`entries`
  * resolve last-write-wins per key with one window over the (small)
  * cache and broadcast-join it onto the stream. No cache server to
  * operate; executors read the log directly, and the log is readable
  * from every JVM that can see the filesystem.
  *
  * Contract notes: generation numbering assumes a SINGLE writer per
  * cache path (NiFi's cache service serializes writes the same way —
  * one service instance owns the store). Removal is a tombstone
  * (null value) so history stays append-only; `compact` rewrites the
  * log to just the live entries when generations accumulate. Cache
  * size should be dimension-table-like (it is broadcast on fetch) —
  * for fact-scale state use a stream-stream join or
  * mapGroupsWithState instead. */
object MapCache {

  private def hasGens(fs: FileSystem, p: Path): Boolean =
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("gen="))

  /** Complete a crashed compact swap: if the live log is gone but the
    * aside survives (crash between rename-aside and rename-in), restore
    * it. WRITERS call this before mutating; readers never rename (they
    * fall back to the aside read-only, so a reader racing the
    * single-writer compactor stays safe). Protocol shared with the
    * stateful sources — [[graft.sources.AtomicSwap]], validity here =
    * "directory has generations". */
  private def recoverAside(fs: FileSystem, path: String): Unit =
    graft.sources.AtomicSwap.recover(fs, new Path(path), hasGens(fs, _), recursive = true)

  private def nextGen(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAside(fs, path)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).map(_.getPath.getName)
      .collect { case n if n.startsWith("gen=") => n.drop(4).toLong }
      .foldLeft(-1L)(math.max) + 1L
  }

  /** Put: write (key, value) rows as the next generation. Later
    * generations win on fetch; duplicate keys within one put are
    * resolved by max(value) for determinism (put distinct keys). */
  def put(df: DataFrame, path: String, keyCol: String, valueCol: String): Unit = {
    val spark = df.sparkSession
    val gen = nextGen(spark, path)
    df.select(col(keyCol).cast("string").as("key"),
              col(valueCol).cast("string").as("value"))
      .write.mode("append").parquet(s"$path/gen=$gen")
  }

  /** Put only the (key, value) rows whose live entry differs or is
    * absent — storage-idempotent: re-running the same put over the same
    * data appends NOTHING, so generations don't accumulate per run.
    * Costs one read of the (small-by-contract) log plus the append. */
  def putIfAbsent(df: DataFrame, path: String, keyCol: String, valueCol: String): Unit = {
    val spark = df.sparkSession
    val incoming = df.select(col(keyCol).cast("string").as("key"),
                             col(valueCol).cast("string").as("value"))
    val fresh = incoming.join(broadcast(entries(spark, path)),
      Seq("key", "value"), "left_anti").cache()
    try { if (fresh.limit(1).count() > 0) put(fresh, path, "key", "value") }
    finally fresh.unpersist(blocking = false)
  }

  /** Remove: tombstone the given keys (one-column DataFrame). */
  def remove(keys: DataFrame, path: String, keyCol: String): Unit =
    put(keys.select(col(keyCol), lit(null).cast("string").as("__v")),
        path, keyCol, "__v")

  /** Live entries: last-write-wins per key, tombstones dropped. The
    * log is small by contract, so the window sort is cheap; output is
    * (key, value). Ties within one generation break by max(value) —
    * the documented `put` contract — so repeated reads are
    * deterministic even for a sloppy duplicate-key put. Reads fall
    * back to the `.old` aside a crashed compact can leave, so a read
    * that RESOLVES mid-swap sees the old log instead of an empty
    * cache. (The fallback bridges the listing instant only: a job
    * whose scan was planned against gen files a LATER compact deletes
    * fails loudly with missing-file errors, never silently-empty —
    * quiesce readers around compact, the same single-writer window the
    * object doc states.) */
  def entries(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val readPath =
      graft.sources.AtomicSwap.resolve(fs, p, hasGens(fs, _)).map(_.toString)
    readPath match {
      case None => // empty cache: no generations anywhere
        import org.apache.spark.sql.types._
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("key", StringType), StructField("value", StringType))))
      case Some(base) =>
        val log = spark.read.option("basePath", base).parquet(s"$base/gen=*")
        val w = Window.partitionBy("key")
          .orderBy(col("gen").desc, col("value").desc_nulls_last)
        log.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1 && col("value").isNotNull)
          .select("key", "value")
    }
  }

  /** Fetch: enrich `df` with the cached value for `keyCol` (null when
    * absent or tombstoned). The resolved cache is broadcast — the
    * probe side never shuffles. */
  def fetch(df: DataFrame, path: String, keyCol: String,
            outCol: String = "cached"): DataFrame = {
    val cache = entries(df.sparkSession, path)
      .withColumnRenamed("key", "__ck").withColumnRenamed("value", outCol)
    df.join(broadcast(cache), col(keyCol).cast("string") === col("__ck"), "left")
      .drop("__ck")
  }

  /** Compact: rewrite the whole log as one fresh generation holding
    * only live entries (run when generations accumulate; single-writer
    * window applies). Swap order is write → rename the live log ASIDE →
    * rename the replacement in → delete the aside: at no instant is
    * there no readable log (a delete-then-rename swap has a window
    * where a crash loses the cache and readers see it as EMPTY —
    * indistinguishable from fresh, which would route every
    * detectDuplicate key as non-duplicate). A crash mid-swap is healed
    * by the next writer ([[recoverAside]]) and bridged by readers
    * ([[entries]] aside fallback). */
  def compact(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val tmp = new Path(path + ".compact.tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAside(fs, path)
    fs.delete(tmp, true)
    entries(spark, path).write.parquet(s"$tmp/gen=0")
    graft.sources.AtomicSwap.swapIn(fs, tmp, p, recursive = true)
  }
}
