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
