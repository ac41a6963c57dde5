package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Shared mechanics of the persistent index family
  * ([[Pq.buildIndex]] / [[LshIndex]] / [[Bm25Index]]). */
object IndexCommon {

  /** Tombstone tables ride every serving plan as the anti-join build
    * side. Between compactions the set is usually tiny — broadcasting
    * it is right — but nothing bounds it: a GDPR-wave deployment can
    * tombstone 10⁸ ids before anyone compacts, and a hard
    * `broadcast()` hint would then pull the whole set through the
    * driver (r15 verdict finding #2). The hint is therefore gated on
    * the tombstone layout's on-disk size: at or below the bound the
    * hint is kept; above it the hint is dropped and the anti-join
    * plans as a shuffle join (AQE may still choose broadcast if the
    * set compresses small at runtime). 16 MiB of snappy parquet ids is
    * several million longs — far beyond healthy between-compaction
    * churn, comfortably inside driver memory; the env override exists
    * for clusters whose drivers are sized differently. */
  private[operators] def tombstoneBroadcastBytes: Long =
    sys.props.get("graft.tomb.broadcast.bytes")
      .orElse(sys.env.get("GRAFT_TOMB_BROADCAST_BYTES"))
      .map(_.toLong).getOrElse(16L << 20)

  private[operators] def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
  }

  private[operators] def tombstonesSmall(spark: SparkSession, dir: String): Boolean =
    dirBytes(spark, dir) <= tombstoneBroadcastBytes

  /** The tombstone table at `dir`, broadcast-hinted only when small
    * (see [[TombstoneBroadcastBytes]]). */
  private[operators] def tombstones(spark: SparkSession, dir: String): DataFrame = {
    val t = spark.read.parquet(dir)
    if (tombstonesSmall(spark, dir)) broadcast(t) else t
  }

  /** Size-gated hint for an already-materialized tombstone frame (the
    * compaction paths persist the set once and reuse it across
    * sub-layout rewrites). */
  private[operators] def hinted(t: DataFrame, small: Boolean): DataFrame =
    if (small) broadcast(t) else t
}

/** The persistent-index family contract (r16, the r15 stretch): the
  * three indexes — IVF-PQ ([[Pq]]), MinHash-LSH ([[LshIndex]]) and
  * BM25 ([[Bm25Index]]) — share the lifecycle
  * build · serve · append · delete · upsert · compact, but each grew
  * its own signatures. This trait is the thin common surface the
  * shared spec matrix (IndexFamilySpec) drives, so every lifecycle
  * guarantee is pinned for ALL THREE by one grid and the next index
  * is honest by construction: implement the trait, join the matrix.
  *
  * `serve` is deliberately canonicalized to (query_id, match_id):
  * rich per-index outputs (scores, ranks, est_jaccard) stay on the
  * native signatures; the family contract is about WHICH documents a
  * lifecycle state serves, which is exactly what build/append/delete/
  * upsert/compact must and must not change. */
trait PersistentIndexOps {
  def name: String
  /** Column naming the document id in `docs`/`ids` frames. */
  def docIdCol: String
  def build(spark: SparkSession, path: String, docs: DataFrame): Unit
  def append(spark: SparkSession, path: String, docs: DataFrame): Unit
  /** Returns the number of docs newly deleted. */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Long
  def upsert(spark: SparkSession, path: String, docs: DataFrame): Unit
  /** Returns the number of partitions/buckets compacted. */
  def compact(spark: SparkSession, path: String): Int
  /** Canonical serve: (query_id: long, match_id: long). */
  def serve(spark: SparkSession, path: String, queries: DataFrame): DataFrame
}

/** [[Pq]] adapter: docs (vec_id, embedding); full-probe serve so the
  * family grid sees the layout's complete answer. */
object PqIndexOps extends PersistentIndexOps {
  import org.apache.spark.sql.functions.col
  val name = "ivf-pq"
  val docIdCol = "vec_id"
  private val NCells = 4
  def build(spark: SparkSession, path: String, docs: DataFrame): Unit =
    Pq.buildIndex(spark, docs, path, nCells = NCells, m = 8, kCodes = 16)
  def append(spark: SparkSession, path: String, docs: DataFrame): Unit =
    Pq.appendToIndex(spark, path, docs)
  def delete(spark: SparkSession, path: String, ids: DataFrame): Long =
    Pq.deleteFromIndexDf(spark, path, ids)
  def upsert(spark: SparkSession, path: String, docs: DataFrame): Unit =
    Pq.upsertToIndex(spark, path, docs)
  def compact(spark: SparkSession, path: String): Int =
    Pq.compactIndex(spark, path)
  def serve(spark: SparkSession, path: String, queries: DataFrame): DataFrame =
    Pq.searchIndex(spark, path, queries, k = 3, nProbe = NCells)
      .select(col("query_id").cast("long"), col("vec_id").cast("long").as("match_id"))
}

/** [[LshIndex]] adapter: docs (doc_id, text); serve = near-dup pairs
  * at the family threshold. */
object LshIndexOps extends PersistentIndexOps {
  import org.apache.spark.sql.functions.col
  val name = "minhash-lsh"
  val docIdCol = "doc_id"
  def build(spark: SparkSession, path: String, docs: DataFrame): Unit =
    LshIndex.buildIndex(spark, docs, path, shingleN = 3, numHashes = 64, bands = 16)
  def append(spark: SparkSession, path: String, docs: DataFrame): Unit =
    LshIndex.appendToIndex(spark, path, docs)
  def delete(spark: SparkSession, path: String, ids: DataFrame): Long =
    LshIndex.deleteFromIndex(spark, path, ids)
  def upsert(spark: SparkSession, path: String, docs: DataFrame): Unit =
    LshIndex.upsertToIndex(spark, path, docs)
  def compact(spark: SparkSession, path: String): Int =
    LshIndex.compactIndex(spark, path)
  def serve(spark: SparkSession, path: String, queries: DataFrame): DataFrame =
    LshIndex.searchIndex(spark, path, queries, threshold = 0.5)
      .select(col("query_id").cast("long"), col("id").cast("long").as("match_id"))
}

/** [[Bm25Index]] adapter: docs (doc_id, text); queries (query_id,
  * qtext). */
object Bm25IndexOps extends PersistentIndexOps {
  import org.apache.spark.sql.functions.col
  val name = "bm25"
  val docIdCol = "doc_id"
  def build(spark: SparkSession, path: String, docs: DataFrame): Unit =
    Bm25Index.buildIndex(spark, docs, path, nBuckets = 8)
  def append(spark: SparkSession, path: String, docs: DataFrame): Unit =
    Bm25Index.appendToIndex(spark, path, docs)
  def delete(spark: SparkSession, path: String, ids: DataFrame): Long =
    Bm25Index.deleteFromIndex(spark, path, ids)
  def upsert(spark: SparkSession, path: String, docs: DataFrame): Unit =
    Bm25Index.upsertToIndex(spark, path, docs)
  def compact(spark: SparkSession, path: String): Int =
    Bm25Index.compactIndex(spark, path)
  def serve(spark: SparkSession, path: String, queries: DataFrame): DataFrame =
    Bm25Index.searchIndex(spark, path, queries, k = 10)
      .select(col("query_id").cast("long"), col("doc_id").cast("long").as("match_id"))
}
