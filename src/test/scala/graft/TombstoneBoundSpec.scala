package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
import graft.operators.{Bm25Index, LshIndex}

/** r15 verdict finding #2: LshIndex/Bm25Index serving broadcast the
  * tombstone table unboundedly between compactions — a GDPR-wave
  * deployment that deletes 10⁸ ids before compacting would blow the
  * broadcast through the driver. The fix gates the `broadcast()` hint
  * on the tombstone layout's on-disk size
  * ([[graft.operators.IndexCommon.tombstones]]). These gates pin:
  * (a) above the bound the anti-join carries NO broadcast hint,
  * (b) below the bound the hint is kept (the common fast path), and
  * (c) served rows are IDENTICAL on both paths — the gate changes the
  * physical join strategy, never the result. */
class TombstoneBoundSpec extends SparkSpec {
  import spark.implicits._

  private val ThresholdProp = "graft.tomb.broadcast.bytes"

  /** For every left-anti join in the optimized plan: does its build
    * (right) side carry a broadcast hint? Hints survive the optimizer
    * ON the Join node (EliminateResolvedHint moves them there), so this
    * reads the decision before AQE — exactly the thing the gate
    * controls (AQE may still pick broadcast at runtime for a small
    * shuffled side, which is the designed escape, not a hint). */
  private def antiJoinHints(df: DataFrame): Seq[Boolean] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftAnti =>
        j.hint.rightHint.exists(_.strategy.contains(BROADCAST))
    }

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill nearby"

  private def lshCorpus(ids: Range) = ids.map { i =>
    val text = i % 4 match {
      case 0 => base
      case 1 => base.replace("warm", s"w$i")
      case 2 => s"completely different content number $i about query engines"
      case _ => base.replace("quick", s"q${i % 7}")
    }
    (i.toLong, text)
  }.toDF("doc_id", "text")

  test("LSH index: oversized tombstone set drops the broadcast hint; rows identical either way") {
    val path = java.nio.file.Files.createTempDirectory("graft_lsh_tomb").toString
    val all = lshCorpus(0 until 80)
    LshIndex.buildIndex(spark, all, path, shingleN = 3, numHashes = 64, bands = 16)
    val victims = (0 until 80 by 3).map(_.toLong)
    assert(LshIndex.deleteFromIndex(spark, path, victims.toDF("id")) == victims.size)
    val queries = lshCorpus(0 until 80).filter(!col("doc_id").isin(victims: _*))

    def servedPairs(): Set[(Long, Long)] =
      LshIndex.searchIndex(spark, path, queries, threshold = 0.5)
        .filter(col("query_id") < col("id"))
        .select(col("query_id"), col("id")).as[(Long, Long)].collect().toSet

    // reference: a fresh build without the victims serves the same pairs
    val refPath = java.nio.file.Files.createTempDirectory("graft_lsh_tomb_ref").toString
    LshIndex.buildIndex(spark, queries, refPath, shingleN = 3, numHashes = 64, bands = 16)
    val refPairs = LshIndex.searchIndex(spark, refPath, queries, threshold = 0.5)
      .filter(col("query_id") < col("id"))
      .select(col("query_id"), col("id")).as[(Long, Long)].collect().toSet
    assert(refPairs.nonEmpty, "fixture must produce pairs")

    val plan = LshIndex.searchIndex(spark, path, queries, threshold = 0.5)
    try {
      // default bound (16 MiB): this tombstone set is tiny → hinted
      assert(antiJoinHints(plan) == Seq(true),
        "small tombstone set must keep the broadcast hint")
      val hinted = servedPairs()
      // force the "GDPR wave" regime: bound below the layout size
      System.setProperty(ThresholdProp, "1")
      val unhintedPlan = LshIndex.searchIndex(spark, path, queries, threshold = 0.5)
      assert(antiJoinHints(unhintedPlan) == Seq(false),
        "oversized tombstone set must NOT carry a broadcast hint")
      val unhinted = servedPairs()
      assert(hinted == refPairs && unhinted == refPairs,
        "gate must change join strategy only, never the served rows")
    } finally System.clearProperty(ThresholdProp)
  }

  test("BM25 index: oversized tombstone set drops the broadcast hint; ranking identical either way") {
    val docs = (0 until 60).map { i =>
      (i.toLong, s"hash join table scan ${"shuffle " * (i % 3)}partition ${i % 5}")
    }.toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_bm25_tomb").toString
    Bm25Index.buildIndex(spark, docs, path, nBuckets = 8)
    val victims = (0 until 60 by 4).map(_.toLong)
    assert(Bm25Index.deleteFromIndex(spark, path, victims.toDF("doc_id")) == victims.size)
    val queries = Seq((0L, "hash join partition"), (1L, "table scan shuffle"))
      .toDF("query_id", "qtext")

    def ranked(): Seq[(Long, Long, Double)] =
      Bm25Index.searchIndex(spark, path, queries, k = 10)
        .select(col("query_id"), col("doc_id"), round(col("score"), 9).as("score"))
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

    val ref = {
      val refPath = java.nio.file.Files.createTempDirectory("graft_bm25_tomb_ref").toString
      Bm25Index.buildIndex(spark, docs.filter(!col("doc_id").isin(victims: _*)),
        refPath, nBuckets = 8)
      Bm25Index.searchIndex(spark, refPath, queries, k = 10)
        .select(col("query_id"), col("doc_id"), round(col("score"), 9).as("score"))
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    }
    assert(ref.nonEmpty)

    try {
      val hintedPlan = Bm25Index.searchIndex(spark, path, queries, k = 10)
      assert(antiJoinHints(hintedPlan) == Seq(true))
      val hinted = ranked()
      System.setProperty(ThresholdProp, "1")
      val unhintedPlan = Bm25Index.searchIndex(spark, path, queries, k = 10)
      assert(antiJoinHints(unhintedPlan) == Seq(false))
      val unhinted = ranked()
      assert(hinted == ref && unhinted == ref,
        "gate must change join strategy only, never the ranking")
    } finally System.clearProperty(ThresholdProp)
  }
}
