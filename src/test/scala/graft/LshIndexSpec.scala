package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, LshIndex}

/** Gates for the persistent MinHash-LSH index (SURVEY 32c): exact
  * pair-set parity with the inline [[Dedup.minHashLsh]] (same
  * signature + banding expressions), incremental append, the
  * DetectDuplicate-at-scale serve path, and hot-bucket cap parity. */
class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill nearby"

  private def corpus = Seq(
    (0L, base),
    (1L, base.replace("warm", "cold")),                 // near-dup of 0
    (2L, base),                                         // exact dup of 0
    (3L, "completely different content about distributed query engines and shuffle plans"),
    (4L, "yet another unrelated string with its own vocabulary entirely"),
    (5L, base.replace("quick", "swift").replace("lazy", "idle")) // farther variant
  ).toDF("doc_id", "text")

  test("index-served pairs are EXACTLY the inline minHashLsh pairs (values included)") {
    val path = java.nio.file.Files.createTempDirectory("graft_lsh_idx").toString
    LshIndex.buildIndex(spark, corpus, path, shingleN = 3, numHashes = 64, bands = 16)
    // layout really is band-partitioned with a sigs side
    assert(new java.io.File(s"$path/bands").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("band_id=")))
    assert(new java.io.File(s"$path/sigs").exists())
    val inline = Dedup.minHashLsh(corpus, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.6)
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val served = LshIndex.searchIndex(spark, path, corpus, threshold = 0.6)
      .filter(col("query_id") < col("id"))
      .select(col("query_id"), col("id"), col("est_jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(served === inline, "index-served pairs must equal the inline LSH pairs")
    assert(inline.nonEmpty, "fixture must produce pairs")
    // the cap semantics match too (when queries = corpus the window
    // population is identical): a cap of 1 sheds every bucket the
    // exact-dup pair saturates
    val inlineCapped = Dedup.minHashLsh(corpus, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.6, maxBucket = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val servedCapped = LshIndex.searchIndex(spark, path, corpus,
        threshold = 0.6, maxBucket = 1)
      .filter(col("query_id") < col("id"))
      .select(col("query_id"), col("id")).as[(Long, Long)].collect().toSet
    assert(servedCapped === inlineCapped, "hot-bucket cap must match inline semantics")
  }

  test("append + DetectDuplicate-at-scale: new batch probes the layout without re-reading the corpus") {
    val path = java.nio.file.Files.createTempDirectory("graft_lsh_dd").toString
    LshIndex.buildIndex(spark, corpus, path, shingleN = 3, numHashes = 64, bands = 16)
    // an incoming batch: one near-dup of an indexed doc, one novel doc
    val incoming = Seq(
      (100L, base.replace("nearby", "close")),
      (101L, "entirely novel prose that matches nothing in the index at all")
    ).toDF("doc_id", "text")
    val flags = LshIndex.detectDuplicates(spark, path, incoming, threshold = 0.5)
      .select(col("doc_id"), col("is_duplicate"), col("dup_of"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(flags(100L)._1 === true, "near-dup of an indexed doc must flag")
    assert(Set(0L, 2L).contains(flags(100L)._2), s"best match should be doc 0/2, got ${flags(100L)._2}")
    assert(flags(101L) === ((false, -1L)), "novel doc must pass")
    // determinism (pre-append): a rebuilt index serves identical rows
    val path2 = java.nio.file.Files.createTempDirectory("graft_lsh_dd2").toString
    LshIndex.buildIndex(spark, corpus, path2, shingleN = 3, numHashes = 64, bands = 16)
    val a = LshIndex.searchIndex(spark, path, corpus, threshold = 0.6)
    val b = LshIndex.searchIndex(spark, path2, corpus, threshold = 0.6)
    assert(a.collect().map(_.toSeq).toSet === b.collect().map(_.toSeq).toSet)
    // append the incoming batch; a later twin of 101 now flags against it
    LshIndex.appendToIndex(spark, path, incoming)
    assert(spark.read.parquet(s"$path/sigs").count() === 8)
    val later = Seq((200L, "entirely novel prose that matches nothing in the index at ALL"))
      .toDF("doc_id", "text")
    val hit = LshIndex.searchIndex(spark, path, later, threshold = 0.5)
      .select("id").as[Long].collect().toSet
    assert(hit.contains(101L), "appended doc must be servable as an index side")
  }

  test("compactIndex: appends fragment bands and sigs; compaction rewrites to one file, search row-identical") {
    val path = java.nio.file.Files.createTempDirectory("graft_lsh_compact").toString
    LshIndex.buildIndex(spark, corpus, path, shingleN = 3, numHashes = 64, bands = 16)
    (0 until 4).foreach { b =>
      val extra = Seq(((500 + b).toLong, s"filler document number $b with some distinct words"))
        .toDF("doc_id", "text")
      LshIndex.appendToIndex(spark, path, extra)
    }
    val before = LshIndex.searchIndex(spark, path, corpus, threshold = 0.6)
      .collect().map(_.toSeq).toSet
    val compacted = LshIndex.compactIndex(spark, path, maxFilesPerBand = 1)
    assert(compacted === 16, s"all 16 band partitions were fragmented, compacted $compacted")
    new java.io.File(s"$path/bands").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("band_id=")).foreach { d =>
        assert(d.listFiles().count(_.getName.endsWith(".parquet")) <= 1,
          s"${d.getName} still fragmented")
      }
    assert(new java.io.File(s"$path/sigs").listFiles()
      .count(_.getName.endsWith(".parquet")) <= 1, "sigs still fragmented")
    assert(spark.read.parquet(s"$path/sigs").count() === 10, "compaction must not drop rows")
    val after = LshIndex.searchIndex(spark, path, corpus, threshold = 0.6)
      .collect().map(_.toSeq).toSet
    assert(after === before, "search must be row-identical across compaction")
  }

  test("tombstone delete: served pairs equal a fresh build without victims; compaction purges") {
    val path = java.nio.file.Files.createTempDirectory("graft_lsh_del").toString
    LshIndex.buildIndex(spark, corpus, path, shingleN = 3, numHashes = 64, bands = 16)
    // delete the exact dup (2) — the near-dup pair (0,1) must survive
    assert(LshIndex.deleteFromIndex(spark, path, Seq(2L).toDF("doc_id")) == 1L)
    // repeat + absent ids are no-ops
    assert(LshIndex.deleteFromIndex(spark, path, Seq(2L).toDF("doc_id")) == 0L)
    assert(LshIndex.deleteFromIndex(spark, path, Seq(777L).toDF("doc_id")) == 0L)
    def servedPairs(threshold: Double, cap: Int = 0) =
      LshIndex.searchIndex(spark, path, corpus.filter(col("doc_id") =!= 2),
          threshold = threshold, maxBucket = cap)
        .filter(col("query_id") < col("id"))
        .select(col("query_id"), col("id"), col("est_jaccard"))
        .as[(Long, Long, Double)].collect().toSet
    val survivors = corpus.filter(col("doc_id") =!= 2)
    def freshPairs(threshold: Double, cap: Int = 0) = {
      val p = java.nio.file.Files.createTempDirectory("graft_lsh_del_ref").toString
      LshIndex.buildIndex(spark, survivors, p, shingleN = 3, numHashes = 64, bands = 16)
      LshIndex.searchIndex(spark, p, survivors, threshold = threshold, maxBucket = cap)
        .filter(col("query_id") < col("id"))
        .select(col("query_id"), col("id"), col("est_jaccard"))
        .as[(Long, Long, Double)].collect().toSet
    }
    assert(servedPairs(0.6) == freshPairs(0.6))
    assert(servedPairs(0.6).exists { case (a, b, _) => a == 0L && b == 1L })
    // capped semantics count LIVE rows only: with doc 2 tombstoned the
    // (0,1,2)-saturated buckets drop to 2 live rows, so cap=2 keeps
    // the near-dup pair exactly as a fresh 5-doc build would
    assert(servedPairs(0.6, cap = 2) == freshPairs(0.6, cap = 2))
    // physical purge: bands/sigs shed the victim, tombstones clear,
    // pairs unchanged, appends keep working
    LshIndex.compactIndex(spark, path, maxFilesPerBand = 1)
    assert(!new java.io.File(s"$path/deletes").exists())
    assert(spark.read.parquet(s"$path/sigs").filter(col("id") === 2).count() == 0)
    assert(servedPairs(0.6) == freshPairs(0.6))
    LshIndex.appendToIndex(spark, path,
      Seq((9L, base.replace("dog", "hound"))).toDF("doc_id", "text"))
    val after = LshIndex.searchIndex(spark, path,
        Seq((9L, base.replace("dog", "hound"))).toDF("doc_id", "text"), threshold = 0.6)
      .filter(col("id") === 0L)
    assert(after.count() >= 1, "appended doc must match doc 0 post-purge")
  }

  test("upsert replaces a doc's text; the old signature no longer matches") {
    val path = java.nio.file.Files.createTempDirectory("graft_lsh_ups").toString
    LshIndex.buildIndex(spark, corpus, path, shingleN = 3, numHashes = 64, bands = 16)
    // replace doc 1 (the near-dup of 0) with unrelated text
    LshIndex.upsertToIndex(spark, path,
      Seq((1L, "totally replaced content that resembles nothing else at all"))
        .toDF("doc_id", "text"))
    val served = LshIndex.searchIndex(spark, path, corpus.filter(col("doc_id") === 0),
        threshold = 0.6)
      .select("id").as[Long].collect().toSet
    assert(!served.contains(1L), "old signature of the replaced doc must be gone")
    assert(served.contains(2L), "untouched exact dup still matches")
    assert(spark.read.parquet(s"$path/sigs").filter(col("id") === 1).count() == 1)
  }

  test("upsert resurrects a previously deleted id; rebuild clears stale tombstones") {
    val path = java.nio.file.Files.createTempDirectory("graft_lsh_resur").toString
    LshIndex.buildIndex(spark, corpus, path, shingleN = 3, numHashes = 64, bands = 16)
    // delete doc 2, then upsert it back: stale tombstone must not
    // swallow the re-added signature
    assert(LshIndex.deleteFromIndex(spark, path, Seq(2L).toDF("doc_id")) == 1L)
    LshIndex.upsertToIndex(spark, path, Seq((2L, base)).toDF("doc_id", "text"))
    val served = LshIndex.searchIndex(spark, path, corpus.filter(col("doc_id") === 0),
        threshold = 0.6).select("id").as[Long].collect().toSet
    assert(served.contains(2L), "resurrected doc must match again")
    // rebuild after a delete: fresh layout, no inherited tombstones
    assert(LshIndex.deleteFromIndex(spark, path, Seq(1L).toDF("doc_id")) == 1L)
    LshIndex.buildIndex(spark, corpus, path, shingleN = 3, numHashes = 64, bands = 16)
    val after = LshIndex.searchIndex(spark, path, corpus.filter(col("doc_id") === 0),
        threshold = 0.6).select("id").as[Long].collect().toSet
    assert(after.contains(1L), "rebuild must not hide recycled ids")
  }

  test("streaming ingest-dedup gate: each micro-batch probes the persisted index via foreachBatch") {
    // the 35g stream-serving idiom for text: doc batches arrive as a
    // file stream, every micro-batch runs detectDuplicates against the
    // SAME persisted layout (no rebuild, no corpus re-shingle), dups
    // route out, novel docs append so LATER batches dedupe against them
    val path = java.nio.file.Files.createTempDirectory("graft_lsh_stream_idx").toString
    LshIndex.buildIndex(spark, corpus, path, shingleN = 3, numHashes = 64, bands = 16)
    val inDir = java.nio.file.Files.createTempDirectory("graft_lsh_stream_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_lsh_stream_out").toString + "/res"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = graft.streaming.Streams.fileStream(spark, inDir, schema)
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val flagged = LshIndex.detectDuplicates(spark, path, batch,
            threshold = 0.5).localCheckpoint(true)
          flagged.select("doc_id", "is_duplicate", "dup_of")
            .write.mode("append").parquet(outDir)
          val novel = flagged.filter(!col("is_duplicate")).select("doc_id", "text")
          if (!novel.isEmpty) LshIndex.appendToIndex(spark, path, novel)
        }
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_lsh_stream_ck").toString)
      .start()
    try {
      def drop(name: String, rows: Seq[(Long, String)]): Unit = {
        val lines = rows.map { case (id, t) =>
          // fixture texts are plain ASCII words — simple quoting suffices
          s"""{"doc_id":$id,"text":"$t"}"""
        }
        java.nio.file.Files.writeString(java.nio.file.Path.of(inDir, name),
          lines.mkString("", "\n", "\n"))
      }
      // batch 1: a near-dup of indexed doc 0 + a novel doc
      drop("b1.json", Seq(
        (300L, base.replace("nearby", "close")),
        (301L, "genuinely novel streaming prose with a vocabulary all of its own")))
      query.processAllAvailable()
      // batch 2: a twin of batch 1's NOVEL doc — must now flag as a dup
      // of 301 (which appended), proving cross-batch state lives in the
      // persisted layout, not in stream memory
      drop("b2.json", Seq(
        (400L, "genuinely novel streaming prose with a vocabulary all of its OWN")))
      query.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .collect().map(r => r.getLong(0) -> ((r.getBoolean(1),
          if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
      assert(got(300L)._1 === true, "near-dup of an indexed doc must flag in-stream")
      assert(Set(0L, 2L).contains(got(300L)._2))
      assert(got(301L) === ((false, -1L)), "novel doc passes its own batch")
      assert(got(400L)._1 === true, "twin of an earlier batch's novel doc must flag")
      assert(got(400L)._2 === 301L, s"dup_of must be the appended doc, got ${got(400L)._2}")
    } finally query.stop()
  }
}
