package graft.operators

import org.apache.hadoop.fs.Path
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

  private def nextGen(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
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

  /** Remove: tombstone the given keys (one-column DataFrame). */
  def remove(keys: DataFrame, path: String, keyCol: String): Unit =
    put(keys.select(col(keyCol), lit(null).cast("string").as("__v")),
        path, keyCol, "__v")

  /** Live entries: last-write-wins per key, tombstones dropped. The
    * log is small by contract, so the window sort is cheap; output is
    * (key, value). */
  def entries(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasGens = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("gen="))
    if (!hasGens) { // empty cache: no generations yet
      import org.apache.spark.sql.types._
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("key", StringType), StructField("value", StringType))))
    }
    val log = spark.read.option("basePath", path).parquet(s"$path/gen=*")
    val w = Window.partitionBy("key").orderBy(col("gen").desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("value").isNotNull)
      .select("key", "value")
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
    * window applies). Write-then-swap: the replacement log is fully
    * written to a sibling temp dir BEFORE the old log is deleted, so a
    * failed compaction leaves the original cache intact. */
  def compact(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val tmp = new Path(path + ".compact.tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tmp, true)
    entries(spark, path).write.parquet(s"$tmp/gen=0")
    fs.delete(p, true)
    require(fs.rename(tmp, p), s"compact swap failed: could not rename $tmp to $p")
  }
}
