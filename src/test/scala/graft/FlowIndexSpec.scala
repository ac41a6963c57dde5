package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bm25Index, LshIndex, Pq, Retrieval}
import graft.plans.TextHashExpressions

/** Gates for the r17 GenAI vector-store flow vocabulary: the committed
  * RAG flow (flows/rag_index.json) must produce ROW-IDENTICAL output to
  * the direct operator API (the q_lsh_index parity discipline), the
  * hashing-trick embedding must be deterministic and unit-norm, the
  * LSH-backed DetectDuplicate mode must route exactly like
  * [[LshIndex.detectDuplicates]], and QueryBM25Index must serve the
  * [[Bm25Index.searchIndex]] doubles verbatim. */
class FlowIndexSpec extends SparkSpec {
  import spark.implicits._

  // 12 docs, 40 tokens each, disjoint vocabularies — chunk size 32 /
  // overlap 8 gives 2 chunks per doc; a query built from a doc's
  // leading tokens shares vocabulary ONLY with that doc's chunks, so
  // rank-1 self-retrieval is exact, not probabilistic.
  private def docs = (0L until 12L).map { i =>
    (i, (0 until 40).map(j => s"w${i}x$j").mkString(" "))
  }.toDF("doc_id", "text")

  // each question is EXACTLY its doc's chunk-0 text: the query vector
  // equals that chunk's vector, so exact rerank puts it at cosine 1.0 —
  // rank-1 self-retrieval is guaranteed, not probabilistic (hash-slot
  // collisions at dim 16 make partial-overlap cosines noisy)
  private def questions = (0L until 12L).map { i =>
    (i, (0 until 32).map(j => s"w${i}x$j").mkString(" "))
  }.toDF("query_id", "qtext")

  private def ragFlowJson: String = {
    val in = getClass.getResourceAsStream("/flows/rag_index.json")
    require(in != null, "rag_index.json missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("ComputeTextEmbedding stand-in: deterministic, unit-norm, zero for empty") {
    val df = Seq("a b c", "a b c", "", "   ").toDF("t")
      .select(TextHashExpressions.hashedTextEmbedding(col("t"), 16).as("v"))
    val rows = df.as[Array[Float]].collect()
    assert(rows(0).toSeq == rows(1).toSeq, "same text must embed identically")
    val n0 = math.sqrt(rows(0).map(x => x.toDouble * x).sum)
    assert(math.abs(n0 - 1.0) < 1e-5, s"non-empty text embeds to unit norm, got $n0")
    assert(rows(2).forall(_ == 0f) && rows(3).forall(_ == 0f),
      "empty/whitespace text embeds to the zero vector")
    assert(rows(0).length == 16)
  }

  test("RAG flow output is ROW-IDENTICAL to the direct operator API") {
    val flowPath = java.nio.file.Files.createTempDirectory("graft_ragflow").toString
    val hits = FlowCompiler.compile(spark, ragFlowJson,
      Map("docs" -> docs, "questions" -> questions),
      Map("index_dir" -> flowPath))("hits")
    val got = hits.select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk"))
      .as[(Long, Long, Double, Long)].collect().toSet

    // the direct path, parameter-for-parameter the flow's properties
    val directPath = java.nio.file.Files.createTempDirectory("graft_ragdirect").toString
    val vecs = Retrieval.chunkTokens(docs, "doc_id", "text", chunkLen = 32, stride = 24)
      .select((col("doc_id") * 1048576 + col("chunk_id")).as("vec_id"), col("chunk_text"))
      .withColumn("embedding",
        TextHashExpressions.hashedTextEmbedding(col("chunk_text"), 16))
      .select("vec_id", "embedding")
    // nCells/nProbe = what the flow's auto sizing derives for this
    // corpus: 24 chunks -> max(16, 24/125) = 16 cells, <=40 cells -> 6
    Pq.buildIndex(spark, vecs, directPath, nCells = 16, m = 4, kCodes = 16,
      lloydIters = 1)
    val qVecs = questions
      .select(col("query_id").as("vec_id"),
        TextHashExpressions.hashedTextEmbedding(col("qtext"), 16).as("embedding"))
    val direct = Pq.searchIndex(spark, directPath, qVecs, k = 5, nProbe = 6,
        rerankFactor = 3, rerankCorpus = Some(vecs))
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk"))
      .as[(Long, Long, Double, Long)].collect().toSet

    assert(got.nonEmpty, "flow must retrieve hits")
    assert(got === direct, "flow output must equal the direct API output row-for-row")
  }

  test("auto index sizing (r18): Cells=auto scales cells with the corpus; Probes=auto serves") {
    import org.apache.spark.sql.functions.col
    // a STATIC cell count is a quadratic trap at scale (the m100
    // finding: 8 pinned cells over a 1.2M-vector corpus scores half
    // the corpus per query) — auto must derive max(16, n/125)
    def flowFor(dir: String): String =
      s"""{"flowContents": {"name": "auto",
         |  "inputPorts": [{"identifier": "c", "name": "corpus"},
         |                 {"identifier": "q", "name": "questions"}],
         |  "outputPorts": [{"identifier": "o", "name": "hits"}],
         |  "processors": [
         |    {"identifier": "put", "name": "store", "type": "PutVectorIndex",
         |     "properties": {"Index Directory": "$dir", "Cells": "auto",
         |       "Subspaces": "4", "Lloyd Iterations": "1"}},
         |    {"identifier": "get", "name": "serve", "type": "QueryVectorIndex",
         |     "properties": {"Index Directory": "$dir", "Top K": "3",
         |       "Probes": "auto", "Corpus Source": "store"}}],
         |  "connections": [
         |    {"source": {"id": "c"}, "destination": {"id": "put"}},
         |    {"source": {"id": "q"}, "destination": {"id": "get"}},
         |    {"source": {"id": "put"}, "destination": {"id": "get"}},
         |    {"source": {"id": "get"}, "destination": {"id": "o"}}]}}""".stripMargin
    def corpus(n: Int) = (0L until n.toLong).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 7.0 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus(3)
    // large corpus: 4000 vectors -> 32 cells (n/125), auto probes = 6
    // (<= 40 cells); hits still serve
    val big = java.nio.file.Files.createTempDirectory("graft_auto_big").toString
    val hits = FlowCompiler.compile(spark, flowFor(big),
      Map("corpus" -> corpus(4000), "questions" -> queries))("hits")
    assert(hits.count() > 0)
    assert(spark.read.parquet(s"$big/centroids").count() === 32L,
      "Cells=auto must derive max(16, 4000/125) = 32")
    // small corpus: the 16-cell floor
    val small = java.nio.file.Files.createTempDirectory("graft_auto_small").toString
    FlowCompiler.compile(spark, flowFor(small),
      Map("corpus" -> corpus(100), "questions" -> queries))("hits").count()
    assert(spark.read.parquet(s"$small/centroids").count() === 16L,
      "Cells=auto floors at 16")
    // the sizing contract at scales a spec can't build: n/125 below the
    // 250k crossover, the 4·sqrt(n) assignment-cost cap above it
    assert(Pq.autoCells(4000) === 32)
    assert(Pq.autoCells(250000) === 2000, "crossover: n/125 == 4*sqrt(n)")
    assert(Pq.autoCells(1200000) === 4380, "1.2M vectors cap at 4*sqrt(n)")
    assert(Pq.autoCells(1000000000L) === 126488, "1B vectors: sqrt scaling holds")
  }

  test("vector-index metadata Filter (r18): pushdown before ADC; filtered == post-filter of unfiltered") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("graft_pqfilter").toString
    // 64 vectors in 2 labeled halves; embeddings made distinctive per id
    val vecs = (0L until 64L).map { i =>
      val base = Array.tabulate(8)(j => math.sin(i * 7.0 + j).toFloat)
      (i, base, if (i % 2 == 0) "even" else "odd")
    }.toDF("vec_id", "embedding", "parity")
    Pq.buildIndex(spark, vecs.select("vec_id", "embedding"), dir,
      nCells = 4, m = 4, kCodes = 16, lloydIters = 1,
      metadata = Some(vecs.select("vec_id", "parity")))
    val queries = vecs.filter(col("vec_id") < 4).select("vec_id", "embedding")
      .withColumnRenamed("vec_id", "query_id")
      .select(col("query_id").as("vec_id"), col("embedding"))
    // ALL cells probed so blocking can't differ between the two runs
    val unfiltered = Pq.searchIndex(spark, dir, queries, k = 64, nProbe = 4)
      .select("query_id", "vec_id", "rk").as[(Long, Long, Long)].collect()
    val filtered = Pq.searchIndex(spark, dir, queries, k = 5, nProbe = 4,
        filter = Some(col("parity") === lit("even")))
      .select("query_id", "vec_id", "rk").as[(Long, Long, Long)].collect()
    assert(filtered.nonEmpty && filtered.forall(_._2 % 2 == 0),
      "no dropped row is served")
    // equal recall: filtered top-5 == the unfiltered FULL ranking,
    // post-filtered to even ids, re-ranked, first 5 — per query
    val expected = unfiltered.groupBy(_._1).map { case (q, rows) =>
      q -> rows.sortBy(_._3).map(_._2).filter(_ % 2 == 0).take(5).toSeq
    }
    val got = filtered.groupBy(_._1).map { case (q, rows) =>
      q -> rows.sortBy(_._3).map(_._2).toSeq
    }
    assert(got === expected, "filtered serving == post-filter of the full ranking")
    // the predicate reaches the parquet scan (pushdown, not post-join)
    val plan = Pq.searchIndex(spark, dir, queries, k = 5, nProbe = 4,
        filter = Some(col("parity") === lit("even")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("parity"),
      s"metadata filter must push into the codes scan; got:\n${plan.take(2000)}")
    // filtered rerank path: the shortlist itself never holds dropped rows
    val rr = Pq.searchIndex(spark, dir, queries, k = 3, nProbe = 4,
        rerankFactor = 2, rerankCorpus = Some(vecs.select("vec_id", "embedding")),
        filter = Some(col("parity") === lit("odd")))
      .select("vec_id").as[Long].collect()
    assert(rr.nonEmpty && rr.forall(_ % 2 == 1))
    // flow vocabulary: Metadata Columns + Filter round-trip end-to-end
    val flowDir = java.nio.file.Files.createTempDirectory("graft_pqflowfil").toString
    val flow =
      s"""{"flowContents": {"name": "filt",
         |  "inputPorts": [{"identifier": "c", "name": "corpus"},
         |                 {"identifier": "q", "name": "questions"}],
         |  "outputPorts": [{"identifier": "o", "name": "hits"}],
         |  "processors": [
         |    {"identifier": "put", "name": "store", "type": "PutVectorIndex",
         |     "properties": {"Index Directory": "$flowDir", "Cells": "4",
         |       "Subspaces": "4", "Lloyd Iterations": "1",
         |       "Metadata Columns": "parity"}},
         |    {"identifier": "get", "name": "serve", "type": "QueryVectorIndex",
         |     "properties": {"Index Directory": "$flowDir", "Top K": "5",
         |       "Probes": "4", "Filter": "parity = 'even'",
         |       "Corpus Source": "store"}}],
         |  "connections": [
         |    {"source": {"id": "c"}, "destination": {"id": "put"}},
         |    {"source": {"id": "q"}, "destination": {"id": "get"}},
         |    {"source": {"id": "put"}, "destination": {"id": "get"}},
         |    {"source": {"id": "get"}, "destination": {"id": "o"}}]}}""".stripMargin
    val hits = FlowCompiler.compile(spark, flow,
      Map("corpus" -> vecs, "questions" -> queries))("hits")
      .select("vec_id").as[Long].collect()
    assert(hits.nonEmpty && hits.forall(_ % 2 == 0),
      "flow Filter property drops odd rows before serving")
    // a malformed Filter rejects at flow-compile time
    intercept[Exception] {
      FlowCompiler.compile(spark, flow.replace("parity = 'even'", "parity ==== x("),
        Map("corpus" -> vecs, "questions" -> queries))
    }
  }

  test("Profile: ann serves a RECALL FLOOR on clustered data with held-OUT queries (r19)") {
    import org.apache.spark.sql.functions.col
    // the probe's shape, scaled for a spec: clustered corpus (the
    // shape real embedding corpora have — tools/NOTES_r18_recall.md),
    // queries drawn NEAR the centers but NOT in the corpus — generic
    // question-answering, not self-retrieval. The neardup defaults
    // measured recall@5 ≈ 0.01 here; the ann profile's config
    // (residual 8-bit, deep rerank) measured 1.000 at 1% coverage.
    val dim = 16
    val centers = (0 until 100).map { c =>
      val r = new scala.util.Random(9000 + c)
      val v = Array.fill(dim)(r.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    def near(c: Int, seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      centers(c).map(x => x + (r.nextGaussian() * 0.15).toFloat)
    }
    val corpus = (0L until 8000L).map { i =>
      (i, near((i % 100).toInt, 31000 + i.toInt))
    }.toDF("vec_id", "embedding")
    val heldOut = (0L until 24L).map { q =>
      // fresh seeds: NOT corpus rows; ids offset past the corpus range
      // (serving excludes a candidate whose vec_id equals the query id)
      (1000000L + q, near((q % 100).toInt, 777000 + q.toInt))
    }.toDF("vec_id", "embedding")
    val exact = graft.operators.Ann.bruteForceTopK(corpus, heldOut, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_annprofile").toString
    val flow =
      s"""{"flowContents": {"name": "annserve",
         |  "inputPorts": [{"identifier": "c", "name": "corpus"},
         |                 {"identifier": "q", "name": "questions"}],
         |  "outputPorts": [{"identifier": "o", "name": "hits"}],
         |  "processors": [
         |    {"identifier": "put", "name": "store", "type": "PutVectorIndex",
         |     "properties": {"Index Directory": "$dir", "Profile": "ann"}},
         |    {"identifier": "get", "name": "serve", "type": "QueryVectorIndex",
         |     "properties": {"Index Directory": "$dir", "Profile": "ann",
         |       "Top K": "5", "Corpus Source": "store"}}],
         |  "connections": [
         |    {"source": {"id": "c"}, "destination": {"id": "put"}},
         |    {"source": {"id": "q"}, "destination": {"id": "get"}},
         |    {"source": {"id": "put"}, "destination": {"id": "get"}},
         |    {"source": {"id": "get"}, "destination": {"id": "o"}}]}}""".stripMargin
    val hits = FlowCompiler.compile(spark, flow,
      Map("corpus" -> corpus, "questions" -> heldOut))("hits")
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect hits).size.toDouble / exact.size
    info(f"ann-profile held-out recall@5 = $recall%.3f over ${exact.size} exact pairs")
    assert(recall >= 0.9,
      f"RECALL FLOOR: ann profile must reach >= 0.9 held-out recall@5 on " +
        f"clustered data, got $recall%.3f — the profile's residual/rerank " +
        "defaults regressed (see tools/NOTES_r18_recall.md)")
    // the profile's knobs are what built the layout: residual flag set
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    assert(meta.getAs[Int]("residual") === 1, "ann profile must build residual encoding")
    assert(meta.getAs[Int]("k_codes") === 256, "ann profile must build 8-bit codebooks")
    // an unknown profile value rejects at flow-compile time
    intercept[Exception] {
      FlowCompiler.compile(spark, flow.replace("\"Profile\": \"ann\"", "\"Profile\": \"hnsw\""),
        Map("corpus" -> corpus, "questions" -> heldOut))
    }
  }

  test("appendToIndex enforces the layout column contract (r19, ADVICE): metadata mismatch fails at append time") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("graft_pqappendmeta").toString
    val vecs = (0L until 32L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 3.0 + j).toFloat), if (i % 2 == 0) "even" else "odd")
    }.toDF("vec_id", "embedding", "parity")
    Pq.buildIndex(spark, vecs.select("vec_id", "embedding"), dir,
      nCells = 4, m = 4, kCodes = 16, lloydIters = 1,
      metadata = Some(vecs.select("vec_id", "parity")))
    val extra = (100L until 108L).map { i =>
      (i, Array.tabulate(8)(j => math.cos(i * 3.0 + j).toFloat))
    }.toDF("vec_id", "embedding")
    // appending WITHOUT the layout's metadata would write rows whose
    // parity reads back NULL — every serve-time Filter silently drops
    // them. It must throw, naming the missing column.
    val e1 = intercept[IllegalArgumentException] { Pq.appendToIndex(spark, dir, extra) }
    assert(e1.getMessage.contains("parity") && e1.getMessage.contains("missing"),
      s"append must name the missing metadata column: ${e1.getMessage}")
    // different metadata columns: rejected too, naming the extra
    val e2 = intercept[IllegalArgumentException] {
      Pq.appendToIndex(spark, dir, extra,
        metadata = Some(extra.select(col("vec_id"), lit("x").as("lang"))))
    }
    assert(e2.getMessage.contains("lang") && e2.getMessage.contains("parity"))
    // the MATCHING column set appends cleanly and serves through a Filter
    // (query under a FRESH id — serving excludes the query's own vec_id)
    Pq.appendToIndex(spark, dir, extra,
      metadata = Some(extra.select(col("vec_id"), lit("even").as("parity"))))
    val served = Pq.searchIndex(spark, dir,
        extra.filter(col("vec_id") === 100L)
          .select(lit(999L).as("vec_id"), col("embedding")),
        k = 40, nProbe = 4,
        filter = Some(col("parity") === lit("even")))
      .select("vec_id").as[Long].collect().toSet
    assert(served.contains(100L), "appended row with matching metadata must serve through the filter")
    // upsert inherits the gate (it delegates to append)
    intercept[IllegalArgumentException] { Pq.upsertToIndex(spark, dir, extra) }
    // and a metadata-LESS index rejects an append that brings metadata
    val dir2 = java.nio.file.Files.createTempDirectory("graft_pqappendnometa").toString
    Pq.buildIndex(spark, vecs.select("vec_id", "embedding"), dir2,
      nCells = 4, m = 4, kCodes = 16, lloydIters = 1)
    val e3 = intercept[IllegalArgumentException] {
      Pq.appendToIndex(spark, dir2, extra,
        metadata = Some(extra.select(col("vec_id"), lit("x").as("lang"))))
    }
    assert(e3.getMessage.contains("unexpected") && e3.getMessage.contains("lang"))
  }

  test("q_flow_index dir naming: hashCode-colliding sf paths get DISTINCT indexes (r18)") {
    import java.nio.file._
    // "Aa"/"BB" collide under String.hashCode (31-linear), so with a
    // shared prefix the FULL paths collide too — exactly the case the
    // old `d.hashCode`-keyed naming would have merged into one index
    val base = Paths.get("/root/testdata/sf0.001")
    assume(Files.exists(base), "driver testdata present")
    val tmp = Files.createTempDirectory("graft_fidirs")
    val a = tmp.resolve("Aa"); val b = tmp.resolve("BB")
    Files.createSymbolicLink(a, base)
    Files.createSymbolicLink(b, base)
    assert(a.toString.hashCode == b.toString.hashCode, "collision by construction")
    def indexDir(d: String) = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_q_flow_index_" + d.replaceAll("[^A-Za-z0-9._-]", "_"))
    assert(indexDir(a.toString) != indexDir(b.toString),
      "sanitized-path naming separates colliding dirs")
    assert(QueriesLlm.qFlowIndex(spark, a.toString).count() > 0)
    assert(Files.exists(indexDir(a.toString)),
      "the query builds its index under the sanitized-path dir")
  }

  test("RAG flow self-retrieval: every question's rank-1 hit is a chunk of its own doc") {
    val path = java.nio.file.Files.createTempDirectory("graft_ragself").toString
    val hits = FlowCompiler.compile(spark, ragFlowJson,
      Map("docs" -> docs, "questions" -> questions),
      Map("index_dir" -> path))("hits")
    val top1 = hits.filter(col("rk") === 1)
      .select(col("query_id"), (col("vec_id") / 1048576).cast("long").as("hit_doc"))
      .as[(Long, Long)].collect()
    assert(top1.length == 12, "every question retrieves")
    assert(top1.forall { case (q, d) => q == d },
      "disjoint vocabularies: rank-1 must be the question's own doc")
  }

  test("QueryVectorIndex validation: 2 inputs need Corpus Source; Rerank needs the corpus edge") {
    val bad = ragFlowJson.replace("\"Corpus Source\": \"ChunkStore\"",
      "\"Corpus Source Removed\": \"x\"")
    assert(bad != ragFlowJson, "fixture replace must hit")
    val e = intercept[Exception] {
      FlowCompiler.compile(spark, bad,
        Map("docs" -> docs, "questions" -> questions),
        Map("index_dir" ->
          java.nio.file.Files.createTempDirectory("graft_ragbad").toString))("hits")
        .count()
    }
    assert(e.getMessage.contains("Corpus Source"))
  }

  test("DetectDuplicate Index Directory mode routes exactly like LshIndex.detectDuplicates") {
    val base = "the quick brown fox jumps over the lazy dog while the cat watches from the windowsill"
    val corpus = Seq((0L, base), (1L, "totally different content about spark plans"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (100L, base.replace("windowsill", "ledge")), // near-dup of 0
      (101L, "novel text with its own words entirely")
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_ddidx").toString
    // PutLshIndex is exercised through the compiler; DetectDuplicate's
    // index mode probes the same layout. Build via a one-node flow
    // (source = the corpus input port), then gate the incoming batch.
    val buildFlow = s"""{"flowContents": {"name": "build",
      "inputPorts": [{"identifier": "in-c", "name": "corpus"}],
      "outputPorts": [{"identifier": "out-c", "name": "indexed"}],
      "processors": [
        {"identifier": "p-build", "name": "CorpusIndex",
         "type": "org.apache.nifi.processors.standard.PutLshIndex",
         "properties": {"Index Directory": "$path", "Shingle Size": "3",
                        "Num Hashes": "64", "Bands": "16", "Mode": "build"}}],
      "connections": [
        {"source": {"id": "in-c"}, "destination": {"id": "p-build"}},
        {"source": {"id": "p-build"}, "destination": {"id": "out-c"}}]}}"""
    val indexed = FlowCompiler.compile(spark, buildFlow, Map("corpus" -> corpus))("indexed")
    assert(indexed.count() == 2, "PutLshIndex passes the indexed FlowFiles through")

    val gateFlow = s"""{"flowContents": {"name": "gate",
      "inputPorts": [{"identifier": "in-b", "name": "batch"}],
      "outputPorts": [{"identifier": "out-dup", "name": "dups"},
                      {"identifier": "out-new", "name": "novel"}],
      "processors": [
        {"identifier": "p-dd", "name": "NearDupGate",
         "type": "org.apache.nifi.processors.standard.DetectDuplicate",
         "properties": {"Index Directory": "$path",
                        "Similarity Threshold": "0.6"}}],
      "connections": [
        {"source": {"id": "in-b"}, "destination": {"id": "p-dd"}},
        {"source": {"id": "p-dd"}, "destination": {"id": "out-dup"},
         "selectedRelationships": ["duplicate"]},
        {"source": {"id": "p-dd"}, "destination": {"id": "out-new"},
         "selectedRelationships": ["non-duplicate"]}]}}"""
    val out = FlowCompiler.compile(spark, gateFlow, Map("batch" -> incoming))
    val dups = out("dups").select("doc_id").as[Long].collect().toSet
    val novel = out("novel").select("doc_id").as[Long].collect().toSet
    assert(dups == Set(100L) && novel == Set(101L),
      s"near-dup routes duplicate, novel routes non-duplicate (got dups=$dups novel=$novel)")
    // route split equals the direct API's is_duplicate flags
    val directFlags = LshIndex.detectDuplicates(spark, path, incoming, threshold = 0.6)
      .select(col("doc_id"), col("is_duplicate")).as[(Long, Boolean)].collect().toMap
    assert(directFlags(100L) && !directFlags(101L))
    val best = out("dups").select("dup_of").as[Long].collect()
    assert(best.sameElements(Array(0L)), "best match rides along")
  }

  test("PutBM25Index + QueryBM25Index serve the direct searchIndex doubles verbatim") {
    val corpus = Seq(
      (1L, "spark shuffle partitions and broadcast joins"),
      (2L, "broadcast variables in spark"),
      (3L, "entirely unrelated cooking recipe with butter and flour")
    ).toDF("doc_id", "text")
    val queries = Seq((10L, "spark broadcast"), (11L, "butter recipe")).toDF("query_id", "qtext")
    val path = java.nio.file.Files.createTempDirectory("graft_bm25flow").toString
    // compile is demand-driven from the output ports in JSON order, so
    // the `indexed` port (the Put leg) lists FIRST: building the layout
    // must precede the query node's compile-time meta read
    val flow = s"""{"flowContents": {"name": "lex",
      "inputPorts": [{"identifier": "in-c", "name": "corpus"},
                     {"identifier": "in-q", "name": "queries"}],
      "outputPorts": [{"identifier": "out-i", "name": "indexed"},
                      {"identifier": "out-h", "name": "hits"}],
      "processors": [
        {"identifier": "p-put", "name": "LexIndex",
         "type": "org.apache.nifi.processors.standard.PutBM25Index",
         "properties": {"Index Directory": "$path", "Buckets": "8", "Mode": "build"}},
        {"identifier": "p-q", "name": "LexQuery",
         "type": "org.apache.nifi.processors.standard.QueryBM25Index",
         "properties": {"Index Directory": "$path", "Top K": "2"}}],
      "connections": [
        {"source": {"id": "in-c"}, "destination": {"id": "p-put"}},
        {"source": {"id": "p-put"}, "destination": {"id": "out-i"}},
        {"source": {"id": "in-q"}, "destination": {"id": "p-q"}},
        {"source": {"id": "p-q"}, "destination": {"id": "out-h"}}]}}"""
    val out = FlowCompiler.compile(spark, flow,
      Map("corpus" -> corpus, "queries" -> queries))
    assert(out("indexed").count() == 3, "PutBM25Index passes the indexed docs through")
    val got = out("hits").select("query_id", "doc_id", "score", "rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    val direct = Bm25Index.searchIndex(spark, path, queries, k = 2)
      .select("query_id", "doc_id", "score", "rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got.nonEmpty && got === direct)
  }
}
