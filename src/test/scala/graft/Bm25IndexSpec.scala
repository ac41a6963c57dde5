package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Bm25Index, Retrieval}

/** Persistent BM25 index vs the inline scorer: the layout must be
  * semantically TRANSPARENT — build→serve reproduces
  * [[Retrieval.bm25TopK]] row-for-row (ids, scores, ranks), across
  * appends and compaction, with the serve read pruned to the query
  * terms' buckets. */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  // deterministic corpus with a shared vocabulary, skewed term
  // frequencies, one empty doc (dl=0 must still count in n/avgdl)
  private val vocab = Array("hash", "join", "table", "scan", "filter", "vector",
    "merge", "sort", "column", "stream", "window", "agg", "index", "probe")
  private def corpus(ids: Range) = ids.map { i =>
    val r = new java.util.SplittableRandom(0xC0FFEE + i)
    val n = if (i % 37 == 0) 0 else 3 + r.nextInt(25)
    (i.toLong, (0 until n).map(_ => vocab(r.nextInt(vocab.length))).mkString(" "))
  }.toDF("doc_id", "text")

  private def queries = Seq(
    (0L, "hash join table"), (1L, "window agg stream"),
    (2L, "fast scan filter"), (3L, "vector merge sort column"))
    .toDF("query_id", "qtext")

  private def collectRanked(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "doc_id", "score", "n_terms", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSet

  test("searchIndex reproduces the inline scorer row-for-row") {
    val docs = corpus(0 until 300)
    val dir = Files.createTempDirectory("graft_bm25_idx").toString
    Bm25Index.buildIndex(spark, docs, dir, nBuckets = 16)
    val fromIndex = Bm25Index.searchIndex(spark, dir, queries, k = 10)
    val inline = Retrieval.bm25TopK(docs, "doc_id", "text", queries,
      "query_id", "qtext", k = 10)
    assert(collectRanked(fromIndex) == collectRanked(inline))
    assert(collectRanked(fromIndex).nonEmpty)
    // the serve read is pruned to the probed buckets from the path
    val plan = fromIndex.queryExecution.sparkPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(2000))
  }

  test("append increments compose: half+half == build-once; compaction is invisible") {
    val all = corpus(0 until 300)
    val dirOnce = Files.createTempDirectory("graft_bm25_once").toString
    val dirInc = Files.createTempDirectory("graft_bm25_inc").toString
    Bm25Index.buildIndex(spark, all, dirOnce, nBuckets = 8)
    Bm25Index.buildIndex(spark, corpus(0 until 150), dirInc, nBuckets = 8)
    Bm25Index.appendToIndex(spark, dirInc, corpus(150 until 300))
    val once = collectRanked(Bm25Index.searchIndex(spark, dirOnce, queries, k = 10))
    val inc = collectRanked(Bm25Index.searchIndex(spark, dirInc, queries, k = 10))
    assert(inc == once, "append must sum df/stats increments exactly")
    // fragment further, compact, ranking unchanged and df rows collapsed
    (0 until 4).foreach(i => Bm25Index.appendToIndex(spark, dirInc,
      corpus(300 + i * 10 until 300 + (i + 1) * 10)))
    val preCompact = collectRanked(Bm25Index.searchIndex(spark, dirInc, queries, k = 10))
    val dfRowsBefore = spark.read.parquet(s"$dirInc/dfs").count()
    val compacted = Bm25Index.compactIndex(spark, dirInc, maxFilesPerBucket = 2)
    assert(compacted > 0, "appends should have fragmented some buckets")
    val postCompact = collectRanked(Bm25Index.searchIndex(spark, dirInc, queries, k = 10))
    assert(postCompact == preCompact)
    assert(spark.read.parquet(s"$dirInc/dfs").count() < dfRowsBefore,
      "compaction should collapse per-increment df rows")
    // and the compacted layout still equals a fresh build over the union
    val dirAll = Files.createTempDirectory("graft_bm25_all").toString
    Bm25Index.buildIndex(spark, corpus(0 until 340), dirAll, nBuckets = 8)
    assert(postCompact == collectRanked(
      Bm25Index.searchIndex(spark, dirAll, queries, k = 10)))
  }

  test("tombstone delete: scores equal a fresh build without the victims; compaction purges") {
    val docs = corpus(0 until 300)
    val dir = Files.createTempDirectory("graft_bm25_del").toString
    Bm25Index.buildIndex(spark, docs, dir, nBuckets = 8)
    // victims include doc 0 — a ZERO-TOKEN doc (0 % 37 == 0), whose
    // n/avgdl contribution only the docs table can account for
    val victimIds = (0 until 300).filter(_ % 7 == 0).map(_.toLong)
    val removed = Bm25Index.deleteFromIndex(spark, dir,
      victimIds.toDF("doc_id"))
    assert(removed == victimIds.size)
    // serving now equals the inline scorer over the SURVIVING corpus
    val survivors = docs.filter(!col("doc_id").isin(victimIds.map(java.lang.Long.valueOf): _*))
    val inline = collectRanked(Retrieval.bm25TopK(survivors, "doc_id", "text",
      queries, "query_id", "qtext", k = 10))
    assert(collectRanked(Bm25Index.searchIndex(spark, dir, queries, k = 10)) == inline)
    // repeat delete is a no-op (no double-counted negative increments)
    assert(Bm25Index.deleteFromIndex(spark, dir, victimIds.toDF("doc_id")) == 0L)
    // absent ids are a no-op too
    assert(Bm25Index.deleteFromIndex(spark, dir, Seq(99999L).toDF("doc_id")) == 0L)
    // physical purge: tombstones clear, ranking unchanged, docs shed
    Bm25Index.compactIndex(spark, dir)
    assert(!Files.exists(java.nio.file.Path.of(dir, "deletes")) ||
      spark.read.parquet(s"$dir/deletes").count() == 0)
    assert(collectRanked(Bm25Index.searchIndex(spark, dir, queries, k = 10)) == inline)
    assert(spark.read.parquet(s"$dir/docs").count() == 300L - victimIds.size)
    // and appends keep working on the purged layout
    Bm25Index.appendToIndex(spark, dir, corpus(300 until 320))
    val after = collectRanked(Bm25Index.searchIndex(spark, dir, queries, k = 10))
    val dirRef = Files.createTempDirectory("graft_bm25_del_ref").toString
    Bm25Index.buildIndex(spark,
      survivors.union(corpus(300 until 320)), dirRef, nBuckets = 8)
    assert(after == collectRanked(Bm25Index.searchIndex(spark, dirRef, queries, k = 10)))
  }

  test("upsert replaces by id; pure inserts skip the purge") {
    val docs = corpus(0 until 120)
    val dir = Files.createTempDirectory("graft_bm25_ups").toString
    Bm25Index.buildIndex(spark, docs, dir, nBuckets = 8)
    // replace docs 1-3 with new text + insert brand-new 500-501
    val batch = Seq(
      (1L, "hash hash hash join join table"), (2L, "window stream agg"),
      (3L, ""), // replacement may even be empty (dl 0)
      (500L, "vector merge sort"), (501L, "scan filter probe"))
      .toDF("doc_id", "text")
    Bm25Index.upsertToIndex(spark, dir, batch)
    val want = {
      val ref = Files.createTempDirectory("graft_bm25_ups_ref").toString
      val refCorpus = docs.filter(!col("doc_id").isin(1L, 2L, 3L)).union(batch)
      Bm25Index.buildIndex(spark, refCorpus, ref, nBuckets = 8)
      collectRanked(Bm25Index.searchIndex(spark, ref, queries, k = 10))
    }
    assert(collectRanked(Bm25Index.searchIndex(spark, dir, queries, k = 10)) == want)
    assert(spark.read.parquet(s"$dir/docs").count() == 122L) // 120 - 3 + 5
    // a second, insert-only upsert leaves no tombstone residue
    Bm25Index.upsertToIndex(spark, dir,
      Seq((600L, "index probe")).toDF("doc_id", "text"))
    assert(!Files.exists(java.nio.file.Path.of(dir, "deletes")))
  }

  test("upsert resurrects a previously deleted id; rebuild clears stale tombstones") {
    val docs = corpus(0 until 80)
    val dir = Files.createTempDirectory("graft_bm25_resur").toString
    Bm25Index.buildIndex(spark, docs, dir, nBuckets = 4)
    // delete id 10, then UPSERT it back with new text: the stale
    // tombstone must not swallow the re-added rows (the r15
    // review-found hole: removed=0 skipped the purge)
    assert(Bm25Index.deleteFromIndex(spark, dir, Seq(10L).toDF("doc_id")) == 1L)
    Bm25Index.upsertToIndex(spark, dir,
      Seq((10L, "hash join table hash join")).toDF("doc_id", "text"))
    val got = Bm25Index.searchIndex(spark, dir,
        Seq((0L, "hash join table")).toDF("query_id", "qtext"), k = 80)
      .select("doc_id").as[Long].collect().toSet
    assert(got.contains(10L), "resurrected doc must serve")
    // stats stayed exact: equal to a fresh build over the same state
    val ref = Files.createTempDirectory("graft_bm25_resur_ref").toString
    Bm25Index.buildIndex(spark,
      docs.filter(col("doc_id") =!= 10L)
        .union(Seq((10L, "hash join table hash join")).toDF("doc_id", "text")),
      ref, nBuckets = 4)
    assert(collectRanked(Bm25Index.searchIndex(spark, dir, queries, k = 10)) ==
      collectRanked(Bm25Index.searchIndex(spark, ref, queries, k = 10)))
    // REBUILD at the same path after a delete: no inherited tombstones
    assert(Bm25Index.deleteFromIndex(spark, dir, Seq(11L).toDF("doc_id")) == 1L)
    Bm25Index.buildIndex(spark, docs, dir, nBuckets = 4)
    val rebuilt = Bm25Index.searchIndex(spark, dir,
        Seq((0L, "hash join table")).toDF("query_id", "qtext"), k = 80)
      .select("doc_id").as[Long].collect().toSet
    // doc 11 is back (fresh build must not hide recycled ids)
    val fresh = Files.createTempDirectory("graft_bm25_resur_f").toString
    Bm25Index.buildIndex(spark, docs, fresh, nBuckets = 4)
    val freshSet = Bm25Index.searchIndex(spark, fresh,
        Seq((0L, "hash join table")).toDF("query_id", "qtext"), k = 80)
      .select("doc_id").as[Long].collect().toSet
    assert(rebuilt == freshSet)
  }

  test("streaming ingest gate: micro-batches append to the layout and later batches retrieve them") {
    // the 35g/32c stream-serving idiom for lexical retrieval: doc
    // batches arrive as a file stream, each micro-batch appends to the
    // SAME persisted layout; a search after the stream drains ranks
    // streamed docs exactly as a fresh batch build over the union would
    val path = java.nio.file.Files.createTempDirectory("graft_bm25_stream_idx").toString
    Bm25Index.buildIndex(spark, corpus(0 until 100), path, nBuckets = 8)
    val inDir = java.nio.file.Files.createTempDirectory("graft_bm25_stream_in").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = graft.streaming.Streams.fileStream(spark, inDir, schema)
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) Bm25Index.appendToIndex(spark, path, batch)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_bm25_stream_ck").toString)
      .start()
    try {
      val extra = corpus(100 until 160).collect().map(r => (r.getLong(0), r.getString(1)))
      extra.grouped(30).zipWithIndex.foreach { case (rows, i) =>
        val lines = rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
        java.nio.file.Files.writeString(java.nio.file.Path.of(inDir, s"b$i.json"),
          lines.mkString("", "\n", "\n"))
        query.processAllAvailable()
      }
    } finally query.stop()
    val streamed = collectRanked(Bm25Index.searchIndex(spark, path, queries, k = 10))
    val dirAll = java.nio.file.Files.createTempDirectory("graft_bm25_stream_all").toString
    Bm25Index.buildIndex(spark, corpus(0 until 160), dirAll, nBuckets = 8)
    assert(streamed == collectRanked(Bm25Index.searchIndex(spark, dirAll, queries, k = 10)))
  }

  test("no matching terms yields an empty result; empty docs count in the stats") {
    val docs = corpus(0 until 50)
    val dir = Files.createTempDirectory("graft_bm25_neg").toString
    Bm25Index.buildIndex(spark, docs, dir, nBuckets = 4)
    val none = Bm25Index.searchIndex(spark, dir,
      Seq((9L, "zzz qqq")).toDF("query_id", "qtext"), k = 5)
    assert(none.count() == 0)
    // stats include the zero-token docs (i % 37 == 0 rows)
    val n = spark.read.parquet(s"$dir/stats").agg(sum("n")).as[Long].head()
    assert(n == 50)
  }
}
