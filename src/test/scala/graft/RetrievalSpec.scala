package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cluster, Retrieval}

/** Retrieval/clustering family (r10): BM25 against a hand-computed
  * reference, chunking reconstruction properties, RRF fusion edge
  * cases, and k-means pinned to an in-JVM reference on real
  * embeddings — edges the DuckDB oracles don't isolate. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bm25TopK: matches a hand-computed score on a 3-doc corpus") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "durian durian durian durian")).toDF("doc_id", "text")
    val qs = Seq((0L, "apple")).toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", qs, "query_id", "qtext", k = 10)
      .orderBy("rk").select("doc_id", "score", "n_terms", "rk")
      .as[(Long, Double, Long, Long)].collect().toSeq
    // N=3, df(apple)=2, idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    // avgdl = (3+2+4)/3 = 3.0
    val idf = math.log(1.6)
    def w(tf: Long, dl: Long): Double = {
      val raw = idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 3.0))
      math.round(raw * 1e6) / 1e6
    }
    // doc1: tf=2, dl=3 → higher than doc2: tf=1, dl=2; doc3 absent
    assert(out === Seq((1L, w(2, 3), 1L, 1L), (2L, w(1, 2), 1L, 2L)))
  }

  test("bm25TopK: multi-term query sums per-term weights; k bounds output") {
    val docs = Seq(
      (1L, "x y"), (2L, "x"), (3L, "y"), (4L, "z")).toDF("doc_id", "text")
    val qs = Seq((7L, "x y")).toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", qs, "query_id", "qtext", k = 2)
    val rows = out.select("doc_id", "n_terms", "rk").as[(Long, Long, Long)].collect().toSeq
    // doc1 matches both terms → rank 1; only k=2 rows emitted
    assert(rows.size === 2 && rows.head === ((1L, 2L, 1L)))
  }

  test("chunkTokens: windows cover the token stream exactly; short tail kept") {
    val docs = Seq((1L, (1 to 95).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Retrieval.chunkTokens(docs, "doc_id", "text", chunkLen = 40, stride = 30)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_text", "n_chunk_tokens")
      .as[(Long, String, Long)].collect().toSeq
    assert(chunks.map(_._1) === Seq(0L, 1L, 2L, 3L))
    assert(chunks.map(_._3) === Seq(40L, 40L, 35L, 5L))
    // stride-prefix reconstruction: first `stride` tokens of each chunk,
    // plus the final chunk's tail, rebuild the original token stream
    val rebuilt = chunks.init.map(_._2.split(" ").take(30).mkString(" ")) :+
      chunks.last._2
    assert(rebuilt.mkString(" ") === (1 to 95).map(i => s"t$i").mkString(" "))
    // overlap: chunk n's tokens 31..40 == chunk n+1's tokens 1..10
    val c0 = chunks(0)._2.split(" "); val c1 = chunks(1)._2.split(" ")
    assert(c0.drop(30).toSeq === c1.take(10).toSeq)
  }

  test("chunkTokens: empty doc yields one empty chunk; doc shorter than a window") {
    val docs = Seq((1L, ""), (2L, "a b c")).toDF("doc_id", "text")
    val chunks = Retrieval.chunkTokens(docs, "doc_id", "text", chunkLen = 40, stride = 30)
      .select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")
      .as[(Long, Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(chunks === Seq((1L, 0L, "", 0L), (2L, 0L, "a b c", 3L)))
  }

  test("ChunkDocument flow processor maps Chunk Size/Overlap onto chunkTokens (r16)") {
    import spark.implicits._
    val docs = Seq((1L, ("tok " * 95).trim), (2L, "short text only"))
      .toDF("doc_id", "text")
    val flowJson =
      """{"flowContents": {"name": "rag-chunk",
        |  "inputPorts": [{"identifier": "ip", "name": "docs"}],
        |  "outputPorts": [{"identifier": "op", "name": "chunks"}],
        |  "processors": [{"identifier": "p-c", "name": "Chunker",
        |    "type": "org.apache.nifi.processors.genai.ChunkDocument",
        |    "properties": {"Chunk Size": "40", "Chunk Overlap": "10"}}],
        |  "connections": [
        |    {"source": {"id": "ip"}, "destination": {"id": "p-c"}},
        |    {"source": {"id": "p-c"}, "destination": {"id": "op"}}]}}""".stripMargin
    val got = FlowCompiler.compile(spark, flowJson, Map("docs" -> docs))("chunks")
      .select("doc_id", "chunk_id", "chunk_text").collect().map(_.toString).sorted
    val want = Retrieval.chunkTokens(docs, "doc_id", "text", chunkLen = 40, stride = 30)
      .select("doc_id", "chunk_id", "chunk_text").collect().map(_.toString).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("recursiveSplit (r17): the published RecursiveCharacterTextSplitter contract") {
    import Retrieval.recursiveSplit
    val seps = List("\n\n", "\n", " ", "")
    // greedy merge with overlap carryover: each next chunk re-opens
    // with the trailing split(s) totaling <= overlap
    assert(recursiveSplit("aaa bbb ccc ddd", List(" ", ""), 7, 3)
      === Seq("aaa bbb", "bbb ccc", "ccc ddd"))
    // zero overlap: disjoint chunks
    assert(recursiveSplit("aaa bbb ccc ddd", List(" ", ""), 7, 0)
      === Seq("aaa bbb", "ccc ddd"))
    // paragraph separator tried first; fits-whole stays whole
    assert(recursiveSplit("p1a p1b\n\np2", seps, 8, 0) === Seq("p1a p1b", "p2"))
    // an unsplittable over-size word falls through to the "" separator
    // (character slices)
    assert(recursiveSplit("abcdefghij", List(" ", ""), 4, 0)
      === Seq("abcd", "efgh", "ij"))
    // recursion: an oversize paragraph re-splits by the NEXT separator
    assert(recursiveSplit("w1 w2 w3 w4 w5\n\nok", seps, 6, 0)
      === Seq("w1 w2", "w3 w4", "w5", "ok"))
    // empty text -> no chunks; whitespace-only merged chunks drop
    assert(recursiveSplit("", seps, 10, 0) === Seq.empty)
    // invalid config throws at construction
    intercept[IllegalArgumentException] { recursiveSplit("x", seps, 4, 4) }
  }

  test("ChunkDocument 'Recursively Split by Character' strategy (r17): flow == direct API") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "para one\n\npara two is rather longer than one"),
      (3L, "")).toDF("doc_id", "text")
    val flowJson =
      """{"flowContents": {"name": "rag-chunk-rec",
        |  "inputPorts": [{"identifier": "ip", "name": "docs"}],
        |  "outputPorts": [{"identifier": "op", "name": "chunks"}],
        |  "processors": [{"identifier": "p-c", "name": "Chunker",
        |    "type": "org.apache.nifi.processors.genai.ChunkDocument",
        |    "properties": {"Chunking Strategy": "Recursively Split by Character",
        |      "Separator": "\\n\\n, ,",
        |      "Chunk Size": "12", "Chunk Overlap": "5"}}],
        |  "connections": [
        |    {"source": {"id": "ip"}, "destination": {"id": "p-c"}},
        |    {"source": {"id": "p-c"}, "destination": {"id": "op"}}]}}""".stripMargin
    val got = FlowCompiler.compile(spark, flowJson, Map("docs" -> docs))("chunks")
      .select("doc_id", "chunk_id", "chunk_text").collect().map(_.toString).sorted
    val want = Retrieval.chunkRecursive(docs, "doc_id", "text",
        chunkSize = 12, overlap = 5, separators = Seq("\n\n", " ", ""))
      .select("doc_id", "chunk_id", "chunk_text").collect().map(_.toString).sorted
    assert(got.toSeq == want.toSeq)
    // every doc_id survives (empty doc keeps one empty chunk); chunks
    // respect the size bound
    val rows = Retrieval.chunkRecursive(docs, "doc_id", "text", 12, 5)
    assert(rows.select("doc_id").distinct().count() === 3L)
    assert(rows.filter(length(col("chunk_text")) > 12).count() === 0L)
  }

  test("rrfFuse: both-sides, one-side docs and ranking order") {
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("query_id", "doc_id", "rk")
    val b = Seq((0L, 11L, 1L), (0L, 12L, 2L)).toDF("query_id", "doc_id", "rk")
    val out = Retrieval.rrfFuse(a, b, k = 10).orderBy("rk")
      .select("doc_id", "rrf_score", "rk").as[(Long, Double, Long)].collect().toSeq
    def r(x: Double) = math.round(x * 1e9) / 1e9
    // doc11 in both lists wins; 10 vs 12 tie on score broken by doc_id
    assert(out === Seq(
      (11L, r(1.0 / 62 + 1.0 / 61), 1L),
      (10L, r(1.0 / 61), 2L),
      (12L, r(1.0 / 62), 3L)))
  }

  test("kmeansAssign: equals an in-JVM Lloyd reference on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val got = Cluster.kmeansAssign(emb, "vec_id", "embedding", k = 8, iters = 2)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap

    // Reference: same quantization, seeds, and tie-breaks, scalar JVM code.
    val vecs = emb.select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    def codes(v: Array[Float]): Array[Long] = {
      val maxAbs = v.map(x => math.abs(x.toDouble)).max
      val scale = if (maxAbs == 0.0) 1.0 else maxAbs / 127.0
      v.map(x => math.floor(x / scale + 0.5).toLong)
    }
    val q = vecs.map { case (id, v) => id -> codes(v) }
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    var cents: Seq[(Long, Array[Long])] = q.take(8).toSeq
    def assign(): Map[Long, Long] = q.map { case (id, c) =>
      id -> cents.map { case (cid, cv) => (cid, cos(c, cv)) }
        .minBy { case (cid, s) => (-s, cid) }._1
    }.toMap
    var ref = assign()
    cents = ref.groupBy(_._2).map { case (cid, members) =>
      val sums = new Array[Long](64)
      members.keys.foreach { id =>
        val c = q.find(_._1 == id).get._2
        var i = 0; while (i < 64) { sums(i) += c(i); i += 1 }
      }
      cid -> sums
    }.toSeq
    ref = assign()
    assert(got === ref)
    // sanity: more than one cluster survives on real data
    assert(got.values.toSet.size > 1)
  }

  test("balancedSample: caps dense clusters, keeps rare ones whole, partition-invariant") {
    val assigned = ((1L to 100L).map(i => (i, 0L)) ++ Seq((200L, 1L), (201L, 1L)))
      .toDF("vec_id", "cluster")
    val kept = Cluster.balancedSample(assigned, "vec_id", "cluster", perCluster = 10, seed = "t")
      .select("vec_id", "cluster").as[(Long, Long)].collect().toSeq.sorted
    assert(kept.count(_._2 == 0L) === 10)       // dense cluster capped
    assert(kept.filter(_._2 == 1L).map(_._1) === Seq(200L, 201L)) // rare survives whole
    // seeded order ⇒ identical keep set under a different partitioning
    val again = Cluster.balancedSample(assigned.repartition(7), "vec_id", "cluster", 10, "t")
      .select("vec_id", "cluster").as[(Long, Long)].collect().toSeq.sorted
    assert(again === kept)
    // a different seed picks a different dense-cluster subset
    val other = Cluster.balancedSample(assigned, "vec_id", "cluster", 10, "u")
      .select("vec_id", "cluster").as[(Long, Long)].collect().toSeq.sorted
    assert(other !== kept)
  }

  test("chunkTokens composes with a streaming source (narrow, stateless)") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val chunks = Retrieval.chunkTokens(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", chunkLen = 5, stride = 3)
    val q = chunks.writeStream.format("memory")
      .queryName("chunks_stream").outputMode("append").start()
    try {
      ms.addData((1L, (1 to 8).map(i => s"w$i").mkString(" ")))
      q.processAllAvailable()
      val rows = spark.table("chunks_stream")
        .select("chunk_id", "chunk_text").as[(Long, String)].collect().toSeq.sortBy(_._1)
      assert(rows === Seq((0L, "w1 w2 w3 w4 w5"), (1L, "w4 w5 w6 w7 w8"), (2L, "w7 w8")))
    } finally q.stop()
  }

  test("dHash64: monotone gradient hashes to all ones; identical/noisy/garbage payloads behave") {
    import graft.operators.Multimodal
    // strictly increasing red channel → every adjacent compare is '1'
    val grad = Multimodal.dHash64(Multimodal.synthBlockPng((i, _) => i * 20, 40, 200))
    assert(grad === Some("1" * 64))
    // identical payloads → identical hash; one flipped cell → <=2 bits differ
    val base = Multimodal.synthBlockPng((i, j) => (i * 11 + j * 7) % 256, 10, 20)
    val noisy = Multimodal.synthBlockPng((i, j) =>
      ((i * 11 + j * 7) % 256) + (if (i == 4 && j == 3) 90 else 0), 10, 20)
    val hb = Multimodal.dHash64(base).get
    val hn = Multimodal.dHash64(noisy).get
    val ham = hb.zip(hn).count { case (a, b) => a != b }
    assert(ham >= 1 && ham <= 2, s"noise cell must flip 1-2 bits, got $ham")
    // garbage and too-small images are dropped, not thrown
    assert(Multimodal.dHash64("not an image".getBytes) === None)
    assert(Multimodal.dHash64(Multimodal.synthPng(4, 4, 10, 10, 10)) === None)
  }

  test("imageNearDupPairs: identical pair found at hamming 0, distinct patterns not paired") {
    import graft.operators.Multimodal
    val imgs = Seq(
      (1L, Multimodal.synthBlockPng((i, j) => (i * 11 + j * 7) % 256, 10, 20)),
      (2L, Multimodal.synthBlockPng((i, j) => (i * 11 + j * 7) % 256, 10, 20)),
      (3L, Multimodal.synthBlockPng((i, j) => (255 - i * 23 - j * 5) % 256, 10, 20)),
      (4L, "garbage".getBytes)).toDF("id", "payload")
    val pairs = Multimodal.imageNearDupPairs(spark, imgs, "id", "payload")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L, 0L)))
  }

  test("audioEnvelopeHash64: ramp hashes to all ones; noise/garbage/short edges behave") {
    import graft.operators.Multimodal
    // strictly increasing amplitudes → all '1'
    val ramp = Multimodal.audioEnvelopeHash64(
      Multimodal.synthWavSegments((0 until 65).map(_ * 30), framesPerSeg = 4))
    assert(ramp === Some("1" * 64))
    // identical payloads agree; one changed segment flips <=2 bits
    val base = (0 until 65).map(i => (i * 37) % 1000)
    val hb = Multimodal.audioEnvelopeHash64(Multimodal.synthWavSegments(base, 4)).get
    val hn = Multimodal.audioEnvelopeHash64(Multimodal.synthWavSegments(
      base.updated(20, base(20) + 500), 4)).get
    val ham = hb.zip(hn).count { case (a, b) => a != b }
    assert(ham >= 1 && ham <= 2, s"one changed segment must flip 1-2 bits, got $ham")
    // garbage and too-short audio drop, not throw
    assert(Multimodal.audioEnvelopeHash64("not audio".getBytes) === None)
    assert(Multimodal.audioEnvelopeHash64(
      Multimodal.synthWavSquare(8000, 10, 1000)) === None) // < 65 frames
    // pair finding: identical pair at hamming 0 through the shared banding
    val pairs = Multimodal.audioNearDupPairs(spark,
      Seq((1L, Multimodal.synthWavSegments(base, 4)),
          (2L, Multimodal.synthWavSegments(base, 4)),
          (3L, "junk".getBytes)).toDF("id", "payload"), "id", "payload")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L, 0L)))
  }

  test("videoFrameHash64: gray ramp hashes to all ones; noise/garbage/short edges behave") {
    import graft.operators.Multimodal
    val ramp = Multimodal.videoFrameHash64(
      Multimodal.synthGif(4, 4, (0 until 65).map(i => i * 3)))
    assert(ramp === Some("1" * 64))
    val base = (0 until 65).map(i => (i * 31) % 200)
    val hb = Multimodal.videoFrameHash64(Multimodal.synthGif(4, 4, base)).get
    // base(24)=144, base(25)=175, base(26)=6 — dropping frame 25 to 100
    // flips the (24→25) compare while (25→26) keeps its sign
    val hn = Multimodal.videoFrameHash64(Multimodal.synthGif(4, 4,
      base.updated(25, 100))).get
    val ham = hb.zip(hn).count { case (a, b) => a != b }
    assert(ham >= 1 && ham <= 2, s"one changed frame must flip 1-2 bits, got $ham")
    assert(Multimodal.videoFrameHash64("not a gif".getBytes) === None)
    assert(Multimodal.videoFrameHash64(
      Multimodal.synthGif(4, 4, Seq(10, 20, 30))) === None) // < 65 frames
    val pairs = Multimodal.videoNearDupPairs(spark,
      Seq((1L, Multimodal.synthGif(4, 4, base)),
          (2L, Multimodal.synthGif(4, 4, base)),
          (3L, "junk".getBytes)).toDF("id", "payload"), "id", "payload")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L, 0L)))
  }

  test("Quantize8Codes native expr equals the HOF quantize8 codes bit-for-bit") {
    import graft.functions.VectorFunctions
    val emb = Tables.embeddings(spark, sf)
    val both = emb.select(
      graft.plans.Quantize8Codes(col("embedding")).as("native"),
      VectorFunctions.quantize8(col("embedding")).getField("codes")
        .cast("array<double>").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    // zero-vector edge: scale 1 → zero codes
    val z = Seq(Tuple1(Array.fill(4)(0f))).toDF("v")
      .select(graft.plans.Quantize8Codes(col("v"))).as[Array[Double]].head()
    assert(z.toSeq === Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("kmeansAssign: k larger than corpus degrades to per-point clusters") {
    val tiny = Tables.embeddings(spark, sf).filter(col("vec_id") < 3)
    val out = Cluster.kmeansAssign(tiny, "vec_id", "embedding", k = 8, iters = 2)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    // every point is its own seed → assigned to itself (cos=1 is max;
    // ties to an identical other vector would break to the smaller cid)
    assert(out === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("chunkTokens: null text behaves like an empty doc (doc_id survives)") {
    val docs = Seq((1L, null: String), (2L, "a b")).toDF("doc_id", "text")
    val chunks = Retrieval.chunkTokens(docs, "doc_id", "text", chunkLen = 4, stride = 2)
      .select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")
      .as[(Long, Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(chunks === Seq((1L, 0L, "", 0L), (2L, 0L, "a b", 2L)))
  }

  test("kmeansAssign: a zero-vector (degenerate) centroid captures nothing") {
    // Seed id 0 is the all-zero vector → its centroid has zero norm and
    // every cosine against it is 0/0 = NaN. Unguarded, NaN sorts above
    // every real sim in the argmax struct and cluster 0 swallows the
    // corpus; the nanvl(-2) guard must send every nonzero row to the
    // live centroid instead.
    val pts = Seq(
      (0L, Array(0f, 0f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f, 0f)),
      (3L, Array(0.8f, 0.2f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Cluster.kmeansAssign(pts, "vec_id", "embedding", k = 2, iters = 2)
      .select("vec_id", "cluster", "sim").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // nonzero rows all land on centroid 1 with a real (non-NaN) sim
    for (id <- Seq(1L, 2L, 3L)) {
      assert(out(id)._1 === 1L, s"vec $id captured by the zero centroid")
      assert(!out(id)._2.isNaN && out(id)._2 > 0.9)
    }
    // the zero vector itself gets the guard sim (-2), ties to cluster 0
    assert(out(0L)._1 === 0L && out(0L)._2 === -2.0)
  }
}
