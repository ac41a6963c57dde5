package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup}
import graft.functions.VectorFunctions

class DedupAnnSpec extends SparkSpec {
  import spark.implicits._

  private val baseText =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill nearby"

  /** corpus with a planted near-dup (one word changed) + distinct docs */
  private def docs = Seq(
    (0L, baseText, "s0"),
    (1L, baseText.replace("warm", "cold"), "s0"), // near-dup of 0
    (2L, baseText, "s1"),                         // exact dup of 0, other block
    (3L, "completely different content about distributed query engines and shuffle plans", "s0"),
    (4L, "yet another unrelated string with its own vocabulary entirely", "s1")
  ).toDF("doc_id", "text", "source")

  test("Dedup.exact keeps one canonical row per content") {
    val kept = Dedup.exact(docs, "text", "doc_id")
    assert(kept.count() == 4) // 0 and 2 collapse
    assert(kept.filter(col("text") === baseText).select("doc_id").as[Long].collect() === Array(0L))
  }

  test("MinHash LSH finds planted near-dup and exact dup, not unrelated") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "missed planted near-dup")
    assert(pairs.contains((0L, 2L)), "missed exact dup")
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((3L, 4L)), "false positive")
  }

  test("SimHash pairs: hamming 0 for exact dup, small for near-dup") {
    // longer docs: simhash bit votes need enough tokens to be stable
    // under a single-token edit
    val longBase = Array.fill(5)(baseText).mkString(" ")
    val longDocs = Seq(
      (0L, longBase, "s0"),
      (1L, longBase.replace("warm", "cold"), "s0"),   // 5 of ~85 tokens differ
      (2L, longBase, "s1"),                           // exact dup of 0
      (3L, "completely different content about distributed query engines and shuffle plans " * 5, "s0")
    ).toDF("doc_id", "text", "source")
    val sigs = Dedup.simHash(longDocs, "doc_id", "text")
    val byId = sigs.select("id", "simhash").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(byId(a) ^ byId(b))
    assert(ham(0L, 2L) == 0, "exact dup must have hamming 0")
    assert(ham(0L, 1L) < ham(0L, 3L), "near-dup must be closer than unrelated")
    val pairs = Dedup.simHashPairs(sigs, maxHamming = math.max(3, ham(0L, 1L)))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)), "exact dup pair missed")
    if (ham(0L, 1L) <= 3)
      assert(pairs.contains((0L, 1L)), "hamming<=3 pair must be found (pigeonhole)")
    assert(!pairs.contains((0L, 3L)), "unrelated docs flagged")
  }

  test("ngramJaccard respects blocking and threshold") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", "source", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "near-dup in same block missed")
    assert(!pairs.contains((0L, 2L)), "cross-block pair must not appear")
  }

  test("ngramJaccard maxGramDf drops boilerplate grams from the gram space") {
    // every doc shares one boilerplate sentence; only 0/1 share real
    // content. Uncapped, the boilerplate alone pushes unrelated pairs
    // over the threshold; capped, similarity is measured on the
    // discriminative grams and only the true near-dup survives.
    val boiler = "subscribe to our newsletter today for the latest updates " +
      "offers and exclusive member only discounts delivered straight to your " +
      "inbox every single week without fail terms and conditions may apply"
    val docs = Seq(
      (0L, s"$boiler quantum qubits explained", "s0"),
      (1L, s"$boiler quantum qubits explored", "s0"),
      (2L, s"$boiler drought garden plants", "s0"),
      (3L, s"$boiler skating finals results", "s0")
    ).toDF("doc_id", "text", "source")
    val uncapped = Dedup.ngramJaccard(docs, "doc_id", "text", "source",
        n = 3, threshold = 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((2L, 3L)),
      "boilerplate should push unrelated docs over 0.45 uncapped (test setup)")
    // cap = 3: the shared-by-all-4 boilerplate grams drop, doc-specific
    // grams (df <= 2) stay
    val capped = Dedup.ngramJaccard(docs, "doc_id", "text", "source",
        n = 3, threshold = 0.45, maxGramDf = Some(3))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((0L, 1L)), "true near-dup must survive the cap")
    assert(!capped.contains((2L, 3L)), "boilerplate-only pair must drop under the cap")
    // a cap above every gram's df reproduces the exact result
    val loose = Dedup.ngramJaccard(docs, "doc_id", "text", "source",
        n = 3, threshold = 0.45, maxGramDf = Some(1000))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(loose === uncapped, "a non-binding cap must equal the exact form")
  }

  test("embeddingCosine finds the planted duplicate vector") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.5f), 1),
      (1L, Array(0.99f, 0.01f, 0.5f), 1),  // near-dup of 0
      (2L, Array(-1.0f, 0.2f, 0.0f), 1),
      (3L, Array(1.0f, 0.0f, 0.5f), 2)     // same as 0, other block
    ).toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingCosine(vecs, "vec_id", "embedding", "label", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("embeddingCosineIvf: planted near-dups recalled at least as well as the label-blocked form") {
    // 40 spread-out random vectors + 3 planted near-identical pairs.
    // The label-blocked form with a SHARED label sees every pair; the
    // IVF form must not lose a planted near-dup to cell boundaries
    // (multi-probe assignment carries boundary vectors into both cells).
    val rnd = new scala.util.Random(42)
    val base = (0 until 40).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat), 1)
    }
    val planted = Seq(100L -> 0L, 101L -> 7L, 102L -> 23L).map { case (nid, src) =>
      val v = base(src.toInt)._2.clone()
      v(0) = v(0) + 0.01f
      (nid, v, 1)
    }
    val vecs = (base ++ planted).toDF("vec_id", "embedding", "label")
    val labelPairs = Dedup.embeddingCosine(vecs, "vec_id", "embedding", "label", 0.995)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val ivfPairs = Dedup.embeddingCosineIvf(spark, vecs, "vec_id", "embedding", 0.995,
        nCells = 8, nProbe = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val plantedPairs = Set((0L, 100L), (7L, 101L), (23L, 102L))
    assert(plantedPairs.subsetOf(labelPairs), "setup: label form must see planted dups")
    assert(plantedPairs.subsetOf(ivfPairs),
      s"IVF blocking lost planted near-dups: ${plantedPairs -- ivfPairs}")
    assert((labelPairs -- ivfPairs).isEmpty || ivfPairs.size >= plantedPairs.size,
      "IVF recall must cover the planted set")
  }

  test("hierarchical assignment (nCells > 64) still recalls planted near-dups") {
    // 600 spread vectors + planted near-identical pairs, 128 cells →
    // the two-level anchor scan; identical vectors share every cell
    // choice under any deterministic assignment, so the planted pairs
    // must survive the hierarchy
    val rnd = new scala.util.Random(7)
    val base = (0 until 600).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat), 1)
    }
    val planted = Seq(900L -> 3L, 901L -> 77L, 902L -> 311L, 903L -> 555L).map {
      case (nid, src) =>
        val v = base(src.toInt)._2.clone(); v(1) = v(1) + 0.01f
        (nid, v, 1)
    }
    val vecs = (base ++ planted).toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingCosineIvf(spark, vecs, "vec_id", "embedding", 0.995,
        nCells = 128, nProbe = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val plantedPairs = Set((3L, 900L), (77L, 901L), (311L, 902L), (555L, 903L))
    assert(plantedPairs.subsetOf(pairs),
      s"hierarchical assignment lost planted pairs: ${plantedPairs -- pairs}")
    // deterministic: a second run returns the same set
    val again = Dedup.embeddingCosineIvf(spark, vecs, "vec_id", "embedding", 0.995,
        nCells = 128, nProbe = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(again === pairs)
  }

  test("3-level assignment: flat-assignment recall matches the 2-level form (r13 ≥1e9 escape)") {
    // The two hierarchies prune DIFFERENTLY, so row-identity between
    // them is not a theorem (each is an approximation of the flat
    // scan); the honest pin is each form's recall of the FLAT exact
    // cell choices, plus determinism. The 3-level form must not lose
    // ground to the 2-level form beyond a small measured epsilon.
    val rnd = new scala.util.Random(11)
    val base = (0 until 700).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }
    val vecs = base.toDF("vec_id", "embedding")
    for (nCells <- Seq(128, 256); probes <- Seq(1, 2)) {
      val init = vecs
        .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(nCells)
        .as[(Long, Array[Float])].collect().sortBy(_._1)
        .zipWithIndex.map { case ((_, v), i) => (i, v) }
      val bc = spark.sparkContext.broadcast(init)
      // flat exact: per row, the true top-`probes` cells by (cos desc, ci)
      val flat: Set[(Long, Int)] = base.flatMap { case (id, vec) =>
        init.map { case (ci, cv) => (ci, graft.operators.Ann.cosJvm(vec, cv)) }
          .sortBy { case (ci, s) => (-s, ci) }.take(probes)
          .map { case (ci, _) => (id, ci) }
      }.toSet
      val two = graft.operators.Ann.assignCells(spark, vecs, bc, probes)
        .collect().map { case (id, _, c) => (id, c) }.toSet
      val three = graft.operators.Ann.assignCells3(spark, vecs, bc, probes)
        .collect().map { case (id, _, c) => (id, c) }.toSet
      val r2 = (two & flat).size.toDouble / flat.size
      val r3 = (three & flat).size.toDouble / flat.size
      info(f"nCells=$nCells probes=$probes: flat-recall 2-level $r2%.3f, 3-level $r3%.3f")
      assert(r3 >= r2 - 0.05,
        f"nCells=$nCells probes=$probes: 3-level recall $r3%.3f fell >5pp below 2-level $r2%.3f")
      assert(r3 >= 0.60, f"3-level flat-recall $r3%.3f degenerate")
      // determinism: a second run is identical
      val again = graft.operators.Ann.assignCells3(spark, vecs, bc, probes)
        .collect().map { case (id, _, c) => (id, c) }.toSet
      assert(again === three)
    }
  }

  test("ivfTopK at assignLevels=3: planted twin still at rank 1, deterministic") {
    import graft.operators.Ann
    val rnd = new scala.util.Random(37)
    val base = (0 until 600).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }
    val corpus = (base :+ ((901L, base(311)._2.clone()))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id").isin(311L, 9L))
    val got = Ann.ivfTopK(spark, corpus, queries, k = 5,
      nCells = 128, nProbe = 4, assignLevels = 3)
    val twin = got.filter(col("query_id") === 311L).orderBy("rk")
      .select("vec_id").as[Long].collect()
    assert(twin.head === 901L, s"twin not at rank 1 under 3-level routing: ${twin.toSeq}")
    val again = Ann.ivfTopK(spark, corpus, queries, k = 5,
      nCells = 128, nProbe = 4, assignLevels = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(again === got.select("query_id", "vec_id").as[(Long, Long)].collect().toSet)
  }

  test("PQ: identical vectors share codes; ADC top-k + rerank recall exact neighbors") {
    import graft.operators.{Ann, Pq}
    val rnd = new scala.util.Random(23)
    val base = (0 until 500).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    // planted EXACT duplicate: identical vector → identical int8 codes
    // → identical PQ codes → maximal ADC score for its twin's query
    val corpus = (base :+ ((900L, base(123)._2.clone()))).toDF("vec_id", "embedding")
    val codes = Pq.encode(corpus, "vec_id", "embedding")
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(900L) === codes(123L), "identical vectors must share PQ codes")
    assert(codes.values.map(_.size).toSet === Set(8), "m=8 codes per vector")
    // ADC alone must put the planted twin at rank 1 for query 123
    val queries = corpus.filter(col("vec_id").isin(123L, 7L, 42L))
    val adc = Pq.adcTopK(spark, corpus, queries, k = 10)
      .filter(col("query_id") === 123L).orderBy("rk")
      .select("vec_id").as[Long].collect()
    assert(adc.head === 900L, s"twin not at ADC rank 1: ${adc.take(3).toSeq}")
    // shortlist+refine: recall@10 vs exact brute force, a calibrated floor
    val exact = Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rr = Pq.adcTopK(spark, corpus, queries, k = 10, rerankFactor = 8)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (rr & exact).size.toDouble / exact.size
    info(f"PQ rerank recall@10 = $recall%.3f")
    assert(recall >= 0.5, f"PQ rerank recall@10 $recall%.3f below floor")
    // determinism
    val again = Pq.adcTopK(spark, corpus, queries, k = 10, rerankFactor = 8)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(again === rr)
  }

  test("IVF-PQ composite: planted twin recalled at rank 1; recall floor vs exact; deterministic") {
    import graft.operators.{Ann, Pq}
    val rnd = new scala.util.Random(29)
    val base = (0 until 500).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    val corpus = (base :+ ((900L, base(217)._2.clone()))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id").isin(217L, 5L, 77L))
    val got = Pq.ivfAdcTopK(spark, corpus, queries, k = 10,
      nCells = 16, nProbe = 6, rerankFactor = 6)
    // identical twin: same cell assignment, identical PQ codes, exact
    // rerank cos = 1.0 → rank 1 for query 217
    val twin = got.filter(col("query_id") === 217L).orderBy("rk")
      .select("vec_id", "cos_sim").as[(Long, Double)].collect()
    assert(twin.head === ((900L, 1.0)), s"twin not at rank 1: ${twin.take(3).toSeq}")
    val exact = Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val mine = got.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (mine & exact).size.toDouble / exact.size
    info(f"IVF-PQ recall@10 = $recall%.3f (nProbe 6/16, rerank 6x)")
    assert(recall >= 0.3, f"IVF-PQ recall $recall%.3f degenerate")
    val again = Pq.ivfAdcTopK(spark, corpus, queries, k = 10,
      nCells = 16, nProbe = 6, rerankFactor = 6)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(again === mine)
  }

  test("persistent PQ index: searchIndex ≡ inline IVF-PQ row-identically; full probe ≡ flat ADC") {
    import graft.operators.Pq
    val rnd = new scala.util.Random(31)
    val base = (0 until 500).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    val corpus = (base :+ ((900L, base(217)._2.clone()))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id").isin(217L, 5L, 77L))
    val path = java.nio.file.Files.createTempDirectory("graft_pq_index").toString
    Pq.buildIndex(spark, corpus, path, nCells = 16, m = 8, kCodes = 16)
    // the layout is really cell-partitioned (inverted lists = partition dirs)
    val cellDirs = new java.io.File(s"$path/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "codes must be partitioned by cell")
    // partial probe + rerank: ROW-identical to the inline composite
    val served = Pq.searchIndex(spark, path, queries, k = 10, nProbe = 6,
        rerankFactor = 6, rerankCorpus = Some(corpus))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val inline = Pq.ivfAdcTopK(spark, corpus, queries, k = 10,
        nCells = 16, nProbe = 6, rerankFactor = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(served === inline, "index-served results must equal inline IVF-PQ")
    // full probe, no rerank: equals the flat ADC scan (the q_pq_index
    // oracle config — the SQL oracle replays the whole persisted path)
    val full = Pq.searchIndex(spark, path, queries, k = 10, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val flat = Pq.adcTopK(spark, corpus, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(full === flat, "full-probe index search must equal flat ADC")
    // a second, different batch serves from the SAME files — no rebuild
    val q2 = corpus.filter(col("vec_id").isin(11L, 300L))
    assert(Pq.searchIndex(spark, path, q2, k = 5, nProbe = 6).count() === 10)
  }

  test("searchIndex broadcastQueries=false: row-identical to the broadcast path (ADC and rerank)") {
    import graft.operators.Pq
    val rnd = new scala.util.Random(67)
    val base = (0 until 400).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    val corpus = (base :+ ((900L, base(114)._2.clone()))).toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_pq_dist").toString
    Pq.buildIndex(spark, corpus, path, nCells = 16, m = 8, kCodes = 16)
    // a LARGE query batch (every 3rd corpus vector — the bulk offline
    // re-ranking shape the distributed path exists for)
    val queries = corpus.filter(col("vec_id") % 3 === 0)
    // pure-ADC form: integer scores, so equality is bit-exact
    val bcast = Pq.searchIndex(spark, path, queries, k = 8, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val dist = Pq.searchIndex(spark, path, queries, k = 8, nProbe = 6,
        broadcastQueries = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(dist === bcast, "distributed ADC search must be row-identical to broadcast")
    // rerank form: the shuffled query join must also match
    val bcastR = Pq.searchIndex(spark, path, queries, k = 5, nProbe = 6,
        rerankFactor = 4, rerankCorpus = Some(corpus))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val distR = Pq.searchIndex(spark, path, queries, k = 5, nProbe = 6,
        rerankFactor = 4, rerankCorpus = Some(corpus), broadcastQueries = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(distR === bcastR, "distributed rerank search must be row-identical to broadcast")
    // the planted twin survives the plumbing end-to-end
    val twin = distR.filter { case (q, v, _, rk) => q == 114L && rk == 1L }
    assert(twin.map(_._2) === Set(900L), s"twin not at rank 1 on distributed path: $twin")
  }

  test("persisted index serves a STREAM of query batches (foreachBatch ingest gate)") {
    import graft.operators.Pq
    val rnd = new scala.util.Random(61)
    val corpus = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_pq_stream_idx").toString
    Pq.buildIndex(spark, corpus, path, nCells = 8, m = 8, kCodes = 16)
    // query batches arrive as a file stream; each micro-batch serves
    // from the SAME persisted index via foreachBatch — the Spark-first
    // idiom for an ingest-time ANN gate (no rebuild, no corpus pass)
    val qDir = java.nio.file.Files.createTempDirectory("graft_pq_stream_q").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_pq_stream_out").toString + "/res"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    val stream = graft.streaming.Streams.fileStream(spark, qDir, schema)
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          Pq.searchIndex(spark, path, batch, k = 5, nProbe = 8)
            .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_pq_stream_ck").toString)
      .start()
    try {
      def dropBatch(name: String, ids: Seq[Int]): Unit = {
        val lines = ids.map { i =>
          val v = corpus.filter(col("vec_id") === i).select("embedding")
            .as[Array[Float]].head()
          s"""{"vec_id":$i,"embedding":[${v.mkString(",")}]}"""
        }
        java.nio.file.Files.writeString(java.nio.file.Path.of(qDir, name),
          lines.mkString("", "\n", "\n"))
      }
      dropBatch("b1.json", Seq(3, 17))
      query.processAllAvailable()
      dropBatch("b2.json", Seq(42))
      query.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .select("query_id", "vec_id", "adc", "rk")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = Pq.searchIndex(spark, path,
          corpus.filter(col("vec_id").isin(3L, 17L, 42L)), k = 5, nProbe = 8)
        .select("query_id", "vec_id", "adc", "rk")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === want, "stream-served results must equal batch-served")
    } finally query.stop()
  }

  test("appendToIndex: new vectors quantize into the stored model; planted twin found, old rows intact") {
    import graft.operators.Pq
    val rnd = new scala.util.Random(53)
    val base = (0 until 300).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    val corpus = base.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_pq_append").toString
    Pq.buildIndex(spark, corpus, path, nCells = 16, m = 8, kCodes = 16)
    val before = spark.read.parquet(s"$path/codes").count()
    assert(before === 300)
    // append a fresh batch containing an exact twin of vector 42
    val extra = ((1000 until 1020).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    } :+ ((2000L, base(42)._2.clone()))).toDF("vec_id", "embedding")
    Pq.appendToIndex(spark, path, extra)
    assert(spark.read.parquet(s"$path/codes").count() === 321, "old rows must survive the append")
    // the twin shares vector 42's codes AND cell (same model), so a
    // full-probe ADC search from 42 must rank it at the top
    val served = Pq.searchIndex(spark, path,
        corpus.filter(col("vec_id") === 42), k = 3, nProbe = 16)
      .select("vec_id", "rk").as[(Long, Long)].collect().toMap
    assert(served(2000L) === 1, s"appended twin must rank first, got $served")
    // appended NON-twin vectors are servable as queries too
    val q2 = extra.filter(col("vec_id") === 1000)
    assert(Pq.searchIndex(spark, path, q2, k = 5, nProbe = 16).count() === 5)
    // ---- deleteFromIndex: remove the twin + two base vectors; only the
    // touched cell partitions rewrite, searches stop returning them
    val removed = Pq.deleteFromIndex(spark, path, Seq(2000L, 7L, 150L))
    assert(removed === 3)
    assert(spark.read.parquet(s"$path/codes").count() === 318)
    val after = Pq.searchIndex(spark, path,
        corpus.filter(col("vec_id") === 42), k = 3, nProbe = 16)
      .select("vec_id").as[Long].collect().toSet
    assert(!after.contains(2000L), "deleted twin must not be served")
    // deleting ids that are not in the index is a no-op
    assert(Pq.deleteFromIndex(spark, path, Seq(999999L)) === 0)
    assert(spark.read.parquet(s"$path/codes").count() === 318)
  }

  test("residual IVF-PQ (layout v2): higher code-space fidelity than raw on clustered data; append/search/delete all dispatch on the flag") {
    import graft.operators.{Ann, Pq}
    // the configuration residual encoding exists for: clustered data —
    // raw codes are dominated by the cluster center, so the codebook
    // spends its entries on cluster identity; residuals spend them on
    // the within-cluster offsets. The invariant PQ quantization can
    // honestly own on per-vector-scaled int8 codes is FIDELITY TO THE
    // EXACT CODE-SPACE RANKING (dot(qc, c(x)) with no quantization) —
    // float-cosine recall is additionally capped by the per-vector
    // scale normalization itself, which the exact rerank (the
    // production config, gated below) exists to recover.
    val rnd = new scala.util.Random(83)
    val centers = (0 until 16).map(_ => Array.fill(64)((rnd.nextGaussian() * 10).toFloat))
    val corpus = (0 until 480).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.zipWithIndex.map { case (x, _) => x + (rnd.nextGaussian() * 4.0).toFloat })
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 32)
    val exact = Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // the exact code-space top-10 per query (the ranking ADC approximates),
    // computed driver-side with the same quantization arithmetic
    def codesOf(v: Array[Float]): Array[Double] = {
      val maxAbs = v.map(x => math.abs(x.toDouble)).max
      val scale = if (maxAbs == 0.0) 1.0 else maxAbs / 127.0
      v.map(x => math.floor(x / scale + 0.5))
    }
    val allRows = corpus.select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1).map { case (id, v) => (id, codesOf(v)) }
    def intDot(a: Array[Double], b: Array[Double]): Long = {
      var d = 0L; var i = 0
      while (i < a.length) { d += a(i).toLong * b(i).toLong; i += 1 }
      d
    }
    val ceiling = (0 until 32).flatMap { q =>
      val qc = allRows(q)._2
      allRows.filter(_._1 != q).map { case (id, c) => (q.toLong, id, intDot(qc, c)) }
        .sortBy { case (_, id, s) => (-s, id) }.take(10)
        .map { case (qq, id, _) => (qq, id) }
    }.toSet
    def fidelityOf(residual: Boolean): (Double, Double, Set[(Long, Long, Long, Long)]) = {
      val path = java.nio.file.Files.createTempDirectory(
        s"graft_pq_res_$residual").toString
      Pq.buildIndex(spark, corpus, path, nCells = 16, m = 16, kCodes = 64,
        residual = residual, trainIters = 5, lloydIters = 5)
      if (residual)
        assert(new java.io.File(s"$path/centcodes").exists(),
          "residual layout must persist centroid codes")
      // FULL probe isolates the quantization error from IVF pruning
      val got = Pq.searchIndex(spark, path, queries, k = 10, nProbe = 16)
      val rows = got.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val mine = rows.map { case (q, v, _, _) => (q, v) }
      // end-to-end production config: ADC shortlist + exact rerank
      val rr = Pq.searchIndex(spark, path, queries, k = 10, nProbe = 16,
          rerankFactor = 4, rerankCorpus = Some(corpus))
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      ((mine & ceiling).size.toDouble / ceiling.size,
        (rr & exact).size.toDouble / exact.size, rows)
    }
    val (rawFid, rawEnd, _) = fidelityOf(residual = false)
    val (resFid, resEnd, resRows) = fidelityOf(residual = true)
    info(f"code-space fidelity@10: raw $rawFid%.3f vs residual $resFid%.3f; " +
      f"rerank-x4 recall: raw $rawEnd%.3f vs residual $resEnd%.3f")
    assert(resFid >= rawFid + 0.05,
      f"residual must approximate the exact code ranking better: $resFid%.3f vs $rawFid%.3f")
    assert(resFid >= 0.85, f"residual fidelity floor: $resFid%.3f")
    assert(resEnd >= 0.95 && rawEnd >= 0.95,
      f"rerank-x4 must saturate recall on this fixture: raw $rawEnd%.3f res $resEnd%.3f")
    // the distributed query path speaks the residual layout too —
    // row-identical to the broadcast path
    val path2 = java.nio.file.Files.createTempDirectory("graft_pq_res2").toString
    Pq.buildIndex(spark, corpus, path2, nCells = 16, m = 8, kCodes = 16, residual = true)
    val bcast = Pq.searchIndex(spark, path2, queries, k = 10, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val dist = Pq.searchIndex(spark, path2, queries, k = 10, nProbe = 6,
        broadcastQueries = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(dist === bcast, "distributed residual search must equal broadcast")
    // append quantizes into the stored residual model: a planted twin
    // of vector 3 ranks first for query 3 at full probe
    Pq.appendToIndex(spark, path2,
      corpus.filter(col("vec_id") === 3).select(lit(9000L).as("vec_id"), col("embedding")))
    val served = Pq.searchIndex(spark, path2,
        corpus.filter(col("vec_id") === 3), k = 3, nProbe = 16)
      .select("vec_id", "rk").as[(Long, Long)].collect().toMap
    assert(served(9000L) === 1, s"appended twin must rank first on residual index, got $served")
    // bulk delete works unchanged on the v2 layout (codes schema is shared)
    assert(Pq.deleteFromIndexDf(spark, path2,
      Seq(9000L).toDF("vec_id")) === 1L)
    // determinism: a rebuild at the SAME config (incl. trained codebook
    // and Lloyd-refined cells) serves identical rows
    val path3 = java.nio.file.Files.createTempDirectory("graft_pq_res3").toString
    Pq.buildIndex(spark, corpus, path3, nCells = 16, m = 16, kCodes = 64,
      residual = true, trainIters = 5, lloydIters = 5)
    val again = Pq.searchIndex(spark, path3, queries, k = 10, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(again === resRows, "residual build must be deterministic")
  }

  test("deleteFromIndexDf + compactIndex: bulk anti-join delete, fragmented cells compact, search row-identical") {
    import graft.operators.Pq
    val rnd = new scala.util.Random(71)
    val corpus = (0 until 400).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_pq_bulk").toString
    Pq.buildIndex(spark, corpus, path, nCells = 8, m = 8, kCodes = 16)
    // fragment the layout: 5 appends → up to 6 files per touched cell
    (0 until 5).foreach { b =>
      val extra = (0 until 20).map { j =>
        ((1000 + b * 100 + j).toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
      }.toDF("vec_id", "embedding")
      Pq.appendToIndex(spark, path, extra)
    }
    assert(spark.read.parquet(s"$path/codes").count() === 500)
    val queries = corpus.filter(col("vec_id") < 5)
    val preCompact = Pq.searchIndex(spark, path, queries, k = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // compact: every cell back to one file; search results unchanged
    val compacted = Pq.compactIndex(spark, path, maxFilesPerCell = 1)
    assert(compacted > 0, "appends must have fragmented at least one cell")
    val cellDirs = new java.io.File(s"$path/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    cellDirs.foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files <= 1, s"${d.getName} still has $files files after compaction")
    }
    assert(spark.read.parquet(s"$path/codes").count() === 500, "compaction must not drop rows")
    val postCompact = Pq.searchIndex(spark, path, queries, k = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(postCompact === preCompact, "search must be row-identical across compaction")
    // bulk delete: a DataFrame of 120 victim ids (every appended batch's
    // even ids + some base ids), one anti-join job
    val victims = spark.range(0, 1500).select(col("id").as("vec_id"))
      .filter(col("vec_id") % 2 === 0 && (col("vec_id") >= 1000 || col("vec_id") < 40))
    val expectedVictims = ((0 until 40 by 2) ++
      (0 until 5).flatMap(b => (0 until 20).map(j => 1000 + b * 100 + j)).filter(_ % 2 == 0)).size
    val removed = Pq.deleteFromIndexDf(spark, path, victims)
    assert(removed === expectedVictims, s"removed $removed, expected $expectedVictims")
    assert(spark.read.parquet(s"$path/codes").count() === 500 - expectedVictims)
    val after = Pq.searchIndex(spark, path, queries, k = 8, nProbe = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(after.forall(v => !(v % 2 == 0 && (v >= 1000 || v < 40))),
      "deleted ids must not be served")
    // deleting ids absent from the index is a no-op
    assert(Pq.deleteFromIndexDf(spark, path,
      spark.range(900000, 900010).select(col("id").as("vec_id"))) === 0L)
    // a delete that EMPTIES every touched cell still succeeds (the
    // rewrite contains zero parquet files — the count must not try to
    // schema-infer the empty tmp dir) and the emptied cells serve as
    // zero rows
    val allIds = spark.read.parquet(s"$path/codes").select(col("vec_id"))
    val total = allIds.count()
    assert(Pq.deleteFromIndexDf(spark, path, allIds) === total)
    assert(spark.read.parquet(s"$path/codes").count() === 0L)
  }

  test("upsertToIndex replaces by vec_id: no duplicates, the new vector is what serves") {
    import graft.operators.Pq
    val rnd = new scala.util.Random(83)
    val corpus = (0 until 200).map { i =>
      (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_pq_ups").toString
    Pq.buildIndex(spark, corpus, path, nCells = 4, m = 8, kCodes = 16)
    // replace ids 5-9 with NEW vectors (exact copies of id 0's vector,
    // so their replacement is detectable: they must now serve as 0's
    // nearest neighbors), plus a brand-new id 900
    val v0 = corpus.filter(col("vec_id") === 0)
      .select("embedding").as[Array[Float]].head()
    val batch = ((5 to 9).map(i => (i.toLong, v0)) :+ (900L, v0))
      .toDF("vec_id", "embedding")
    Pq.upsertToIndex(spark, path, batch)
    // no duplicate ids anywhere in the layout
    val codes = spark.read.parquet(s"$path/codes")
    assert(codes.count() === 201) // 200 + 1 new
    assert(codes.groupBy("vec_id").count().filter(col("count") > 1).count() === 0)
    // the replaced ids now rank at the top for query 0 (exact twins)
    val got = Pq.searchIndex(spark, path, corpus.filter(col("vec_id") === 0),
        k = 7, nProbe = 4).select("vec_id").as[Long].collect().toSet
    assert(Set(5L, 6L, 7L, 8L, 9L, 900L).subsetOf(got), got.toString)
  }

  test("OPQ-lite permutation: deterministic, dot-preserving, recall >= plain PQ on anisotropic data") {
    import graft.operators.Pq
    // anisotropic corpus: the signal lives in 8 dims that plain PQ's
    // contiguous split packs into ONE subspace (quantization error
    // concentrates there); the rest is low-amplitude noise — the
    // configuration OPQ's variance balancing exists for
    val rnd = new scala.util.Random(41)
    val corpus = (0 until 400).map { i =>
      val v = new Array[Float](64)
      (0 until 8).foreach(j => v(j) = (rnd.nextGaussian() * 10).toFloat)
      (8 until 64).foreach(j => v(j) = rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 8)
    val perm1 = Pq.variancePerm(corpus, "vec_id", "embedding", m = 8)
    val perm2 = Pq.variancePerm(corpus.repartition(7), "vec_id", "embedding", m = 8)
    assert(perm1.toSeq === perm2.toSeq, "permutation must be layout-deterministic")
    assert(perm1.sorted.toSeq === (0 until 64), "must be a permutation")
    // each subspace gets exactly one of the 8 high-variance dims
    val highPerSub = perm1.grouped(8).map(_.count(_ < 8)).toSeq
    assert(highPerSub === Seq.fill(8)(1), s"variance not balanced: $highPerSub")
    // permutation preserves exact cosine (dot products + norms)
    val exactPlain = graft.operators.Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val exactPerm = graft.operators.Ann.bruteForceTopK(
        Pq.permute(corpus, "embedding", perm1),
        Pq.permute(queries, "embedding", perm1), 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(exactPerm === exactPlain, "permutation must preserve cosine ranking")
    // ADC recall@10 against exact ground truth: balanced >= plain
    def recall(res: org.apache.spark.sql.DataFrame): Double = {
      val got = res.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      got.intersect(exactPlain).size.toDouble / exactPlain.size
    }
    val rPlain = recall(Pq.adcTopK(spark, corpus, queries, k = 10))
    val rOpq = recall(Pq.adcTopKOpq(spark, corpus, queries, k = 10))
    info(f"ADC recall@10: plain=$rPlain%.3f opq-lite=$rOpq%.3f")
    // everything here is deterministic (fixed seed, hash-picked
    // codebook), so a real margin can be pinned: measured 0.275 plain
    // vs 0.600 balanced at this config
    assert(rOpq >= rPlain + 0.2,
      f"OPQ-lite recall $rOpq%.3f must beat plain $rPlain%.3f by the pinned margin")
    // r15: the permutation persists INSIDE the index layout — the same
    // anisotropic margin holds for index-served full-probe ADC, append
    // quantizes through the stored perm, and the distributed query
    // path permutes identically
    import graft.operators.Pq
    def servedRecall(opq: Boolean): Double = {
      val path = java.nio.file.Files.createTempDirectory(s"graft_pq_opq_$opq").toString
      Pq.buildIndex(spark, corpus, path, nCells = 16, m = 8, kCodes = 16, opq = opq)
      if (opq) assert(new java.io.File(s"$path/perm").exists(), "opq layout must persist the perm")
      recall(Pq.searchIndex(spark, path, queries, k = 10, nProbe = 16))
    }
    val sPlain = servedRecall(opq = false)
    val sOpq = servedRecall(opq = true)
    info(f"index-served ADC recall@10: plain=$sPlain%.3f opq=$sOpq%.3f")
    assert(sOpq >= sPlain + 0.2,
      f"persisted OPQ recall $sOpq%.3f must beat plain $sPlain%.3f by the pinned margin")
    val path = java.nio.file.Files.createTempDirectory("graft_pq_opq_full").toString
    Pq.buildIndex(spark, corpus, path, nCells = 16, m = 8, kCodes = 16, opq = true)
    val bcast = Pq.searchIndex(spark, path, queries, k = 10, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val dist = Pq.searchIndex(spark, path, queries, k = 10, nProbe = 6,
        broadcastQueries = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(dist === bcast, "distributed search must be row-identical on an OPQ layout")
    // append through the stored perm: a planted twin of vector 5 ranks
    // first for query 5 at full probe (identical vectors permute
    // identically, so codes and cell match)
    Pq.appendToIndex(spark, path,
      corpus.filter(col("vec_id") === 5).select(lit(7000L).as("vec_id"), col("embedding")))
    val served = Pq.searchIndex(spark, path,
        corpus.filter(col("vec_id") === 5), k = 3, nProbe = 16)
      .select("vec_id", "rk").as[(Long, Long)].collect().toMap
    assert(served(7000L) === 1, s"appended twin must rank first on OPQ layout, got $served")
    // OPQ COMPOSES with residual encoding (layout v2 + perm): the full
    // FAISS OPQ+IVF-PQ stack — perm applied first, centroids/residuals/
    // codebook all live in permuted space; planted twin + path identity
    val pathRC = java.nio.file.Files.createTempDirectory("graft_pq_opq_res").toString
    Pq.buildIndex(spark, corpus, pathRC, nCells = 16, m = 8, kCodes = 16,
      opq = true, residual = true, trainIters = 3, lloydIters = 2)
    val bcastRC = Pq.searchIndex(spark, pathRC, queries, k = 10, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val distRC = Pq.searchIndex(spark, pathRC, queries, k = 10, nProbe = 16,
        broadcastQueries = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(distRC === bcastRC, "distributed ≡ broadcast on an OPQ+residual layout")
    Pq.appendToIndex(spark, pathRC,
      corpus.filter(col("vec_id") === 6).select(lit(7001L).as("vec_id"), col("embedding")))
    val servedRC = Pq.searchIndex(spark, pathRC,
        corpus.filter(col("vec_id") === 6), k = 3, nProbe = 16)
      .select("vec_id", "rk").as[(Long, Long)].collect().toMap
    assert(servedRC(7001L) === 1,
      s"appended twin must rank first on OPQ+residual layout, got $servedRC")
  }

  test("distributed centroid assignment equals the in-JVM hierarchical path (incl. Lloyd)") {
    // 600 spread vectors + planted dups at nCells=128: forcing
    // maxBroadcastCells past nCells keeps the old driver-collected
    // hierarchical scan; the default routes to the DataFrame-resident
    // assignment. Same anchors, same probe counts, same tie-breaks,
    // same double math — the PAIR SETS must be identical, with and
    // without Lloyd refinement.
    val rnd = new scala.util.Random(7)
    val base = (0 until 600).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat), 1)
    }
    val planted = Seq(900L -> 3L, 901L -> 77L, 902L -> 311L, 903L -> 555L).map {
      case (nid, src) =>
        val v = base(src.toInt)._2.clone(); v(1) = v(1) + 0.01f
        (nid, v, 1)
    }
    val vecs = (base ++ planted).toDF("vec_id", "embedding", "label")
    for (lloyd <- Seq(0, 1)) {
      val inJvm = Dedup.embeddingCosineIvf(spark, vecs, "vec_id", "embedding", 0.995,
          nCells = 128, nProbe = 2, lloydIters = lloyd, maxBroadcastCells = 1024)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val dist = Dedup.embeddingCosineIvf(spark, vecs, "vec_id", "embedding", 0.995,
          nCells = 128, nProbe = 2, lloydIters = lloyd)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(dist === inJvm,
        s"lloyd=$lloyd: driver-only=${(inJvm -- dist).size} distributed-only=${(dist -- inJvm).size}")
    }
  }

  test("distributed assignment needs no broadcast join: identical pairs with autoBroadcast off") {
    // With autoBroadcastJoinThreshold = -1 the planner cannot choose a
    // broadcast join anywhere, so this proves the distributed path has
    // no structural broadcast dependency (the only remaining
    // BroadcastExchange would be an explicit hint — assert none) and
    // returns the same pairs fully shuffle-joined.
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 400).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat), 1)
    }.toDF("vec_id", "embedding", "label")
    val withBc = Dedup.embeddingCosineIvf(spark, vecs, "vec_id", "embedding", 0.9,
        nCells = 100, nProbe = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Dedup.embeddingCosineIvf(spark, vecs, "vec_id", "embedding", 0.9,
          nCells = 100, nProbe = 2)
      val noBc = df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(noBc === withBc)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"distributed IVF path must not hint a full-table broadcast:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("embeddingCosineIvf at the pinned query config equals the exact global pair set (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    if (new java.io.File(s"$d/embeddings.parquet").exists) {
      val emb = Tables.embeddings(spark, d)
      val v = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      val exact = v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          graft.functions.VectorFunctions.cosine(col("a.v"), col("b.v")).as("cos_sim"))
        .filter(col("cos_sim") >= 0.35)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val ivf = Dedup.embeddingCosineIvf(spark, emb, "vec_id", "embedding", 0.35,
          nCells = 16, nProbe = 6)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // q_embed_neardup_ivf / q_semantic_dedup_ivf share the EXACT
      // global oracle; that only holds while this equality holds.
      assert(ivf === exact,
        s"missed=${(exact -- ivf).size} spurious=${(ivf -- exact).size}")
    }
  }

  test("clusters: connected components over pairs, min-id representative") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L)).toDF("id_a", "id_b")
    val labels = Dedup.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L && labels(9L) == 1L)
    assert(labels(5L) == 5L && labels(6L) == 5L)
  }

  test("dropNearDuplicates keeps singletons and one representative per cluster") {
    val all = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicates(all, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 4L, 5L))
  }

  private def randVecs(n: Int, dim: Int, seedBase: Int) = {
    (0 until n).map { i =>
      val r = new scala.util.Random(seedBase + i)
      (i.toLong, Array.fill(dim)(r.nextFloat() - 0.5f), i % 4)
    }.toDF("vec_id", "embedding", "label")
  }

  test("partitioned brute-force top-k equals declarative brute-force") {
    val corpus = randVecs(300, 16, 7)
    val queries = corpus.filter(col("vec_id") < 5)
    val a = Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id", "rk").as[(Long, Long, Long)].collect().toSet
    val b = Ann.bruteForceTopKPartitioned(spark, corpus, queries, 10)
      .select("query_id", "vec_id", "rk").as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("LSH top-k achieves nontrivial recall vs exact") {
    val corpus = randVecs(300, 16, 11)
    val queries = corpus.filter(col("vec_id") < 5)
    val exact = Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Ann.lshTopK(corpus, queries, 10, bits = 4, tables = 8)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("native cosine expression equals HOF formulation and SQL registration works") {
    val df = randVecs(50, 8, 3).select(col("vec_id"), col("embedding"))
    val joined = df.as("a").crossJoin(df.as("b"))
      .select(
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("native"),
        VectorFunctions.cosineHof(col("a.embedding"), col("b.embedding")).as("hof"))
    val diffs = joined.select(max(abs(col("native") - col("hof")))).as[Double].collect()(0)
    assert(diffs < 1e-12)
    // SQL via GraftExtensions
    df.createOrReplaceTempView("vt")
    val viaSql = spark.sql(
      "SELECT max(graft_cosine(a.embedding, a.embedding)) FROM vt a")
      .as[Double].collect()(0)
    assert(math.abs(viaSql - 1.0) < 1e-12)
  }

  test("simHashPairs is complete for maxHamming > 3 (derived bands)") {
    // hand-built signatures at known hamming distances
    val sigs = Seq(
      (0L, 0L),
      (1L, 0x1FL),              // hamming 5 from 0
      (2L, 0x7FL),              // hamming 7 from 0, 2 from 1
      (3L, -1L),                // hamming 64 from 0
      (4L, 0L)                  // hamming 0 from 0
    ).toDF("id", "simhash")
    val all = (for {
      a <- 0L to 4L; b <- 0L to 4L if a < b
    } yield (a, b)).toSet
    def brute(maxH: Int) = {
      val byId = Map(0L -> 0L, 1L -> 0x1FL, 2L -> 0x7FL, 3L -> -1L, 4L -> 0L)
      all.filter { case (a, b) => java.lang.Long.bitCount(byId(a) ^ byId(b)) <= maxH }
    }
    for (maxH <- Seq(0, 3, 5, 7, 11)) {
      val got = Dedup.simHashPairs(sigs, maxH)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got === brute(maxH), s"maxHamming=$maxH")
    }
    intercept[IllegalArgumentException](Dedup.simHashPairs(sigs, 64))
  }

  test("brute-force top-k skips zero-norm embeddings in both paths") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 0.0f)), // zero-norm: undefined cosine
      (3L, Array(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0L)
    val a = Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id", "rk").as[(Long, Long, Long)].collect().toSet
    val b = Ann.bruteForceTopKPartitioned(spark, corpus, queries, 10)
      .select("query_id", "vec_id", "rk").as[(Long, Long, Long)].collect().toSet
    assert(a === b)
    assert(!a.exists(_._2 == 2L), "zero-norm vector must be excluded")
    assert(a.map(_._2) === Set(1L, 3L))
  }
}
