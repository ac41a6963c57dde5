package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup}

/** Calibrated recall gates for the approximate (no-oracle) operators.
  * These are the regression tripwires the DuckDB oracle can't provide:
  * each asserts a RELATIONSHIP (monotone recall in the probe knob,
  * exactness at the exhaustive setting, signature-vs-true agreement)
  * that breaks if the native hash expressions or the banding/bucketing
  * logic regress — not just "found the planted pair". */
class RecallGateSpec extends SparkSpec {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seedBase: Int) = {
    (0 until n).map { i =>
      val r = new scala.util.Random(seedBase + i)
      (i.toLong, Array.fill(dim)(r.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
  }

  private def recallOf(exact: Set[(Long, Long)], approx: Set[(Long, Long)]): Double =
    if (exact.isEmpty) 1.0 else (exact intersect approx).size.toDouble / exact.size

  test("IVF: recall is monotone in nProbe and exact at nProbe = nCells") {
    val corpus = randVecs(400, 16, 101)
    val queries = corpus.filter(col("vec_id") < 8)
    val exact = Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val nCells = 16
    val recalls = Seq(1, 2, 4, 8, nCells).map { nProbe =>
      val approx = Ann.ivfTopK(spark, corpus, queries, 10,
          nCells = nCells, nProbe = nProbe)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      nProbe -> recallOf(exact, approx)
    }
    // candidate sets are supersets as nProbe grows -> recall can't drop
    recalls.sliding(2).foreach { case Seq((p1, r1), (p2, r2)) =>
      assert(r2 >= r1, s"recall dropped from nProbe=$p1 ($r1) to nProbe=$p2 ($r2)")
    }
    // probing every cell IS brute force — anything below 1.0 means the
    // cell assignment or the probe-side routing lost vectors
    assert(recalls.last._2 === 1.0,
      s"nProbe=nCells must be exact, got ${recalls.last._2}")
    // probing must matter: the curve is a curve, not a constant — if
    // recall at nProbe=1 were already 1.0 the gate couldn't detect a
    // broken router, so keep the corpus spread wide enough that it isn't
    assert(recalls.head._2 < 1.0,
      "nProbe=1 unexpectedly exact; corpus no longer exercises the probe path")
  }

  test("IVF on GenSf embeddings: recall@10 clears the calibrated floor at nProbe=4") {
    // the exact GenSf embedding population (pure function of row id —
    // same vectors the scale sweeps run on), regenerated in-test so the
    // gate doesn't depend on generated tmpdata being present
    val corpus = (0L until 2000L).map { i =>
      val r = GenSf.rng("emb", i)
      val v = Array.fill(64)(r.nextGaussian().toFloat)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i, v.map(_ / norm))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 16)
    val exact = Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallAt(probe: Int): Double = recallOf(exact,
      Ann.ivfTopK(spark, corpus, queries, 10,
          nCells = 16, nProbe = probe, lloydIters = 2)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet)
    // Calibrated floors from tools.RecallCurve (2026-08, this exact
    // deterministic population): probe=4 → 0.550, probe=12 → 0.994.
    // GenSf embeddings are unclustered unit gaussians — the ADVERSARIAL
    // case for IVF, where recall ≈ probed-cell fraction (real embedding
    // corpora cluster, which is the structure IVF exploits). The floors
    // sit a margin below measured; a drop means the centroid machinery
    // or the probe routing regressed, not data noise (no RNG anywhere).
    val r4 = recallAt(4)
    val r12 = recallAt(12)
    info(f"GenSf recall@10: probe=4 $r4%.3f (floor 0.50), probe=12 $r12%.3f (floor 0.95)")
    assert(r4 >= 0.50, f"recall@10 at probe=4 fell to $r4%.3f (calibrated 0.550)")
    assert(r12 >= 0.95, f"recall@10 at probe=12 fell to $r12%.3f (calibrated 0.994)")
  }

  test("LSH: recall is monotone in tables and clears 0.6 at 16 tables") {
    val corpus = randVecs(300, 16, 202)
    val queries = corpus.filter(col("vec_id") < 8)
    val exact = Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recalls = Seq(1, 2, 4, 8, 16).map { tables =>
      val approx = Ann.lshTopK(corpus, queries, 10, bits = 4, tables = tables)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      tables -> recallOf(exact, approx)
    }
    // table t's buckets are seeded by t, so more tables = superset
    // candidates = monotone recall; a drop means bucket domains collide
    recalls.sliding(2).foreach { case Seq((t1, r1), (t2, r2)) =>
      assert(r2 >= r1, s"recall dropped from tables=$t1 ($r1) to tables=$t2 ($r2)")
    }
    assert(recalls.last._2 >= 0.6, s"16-table recall too low: ${recalls.last._2}")
    assert(recalls.head._2 < recalls.last._2,
      "single-table recall already maximal; gate can't detect broken banding")
  }

  test("MinHash signatures estimate true Jaccard within 0.2 on real pairs") {
    // true char-3-shingle jaccard computed in-test, independent of the
    // native expression under test
    def shingles(s: String): Set[String] =
      (0 to s.length - 3).map(i => s.substring(i, i + 3)).toSet
    def trueJac(a: String, b: String): Double = {
      val (sa, sb) = (shingles(a), shingles(b))
      (sa intersect sb).size.toDouble / (sa union sb).size
    }
    val base = "the quick brown fox jumps over the lazy dog while the cat watches nearby"
    val variants = Seq(
      base,
      base.replace("lazy", "idle"),
      base.replace("quick brown", "slow grey"),
      "completely different text with nothing shared at all beyond spaces")
    val docs = variants.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val sigs = docs.select(col("id"),
        graft.plans.TextHashExpressions.minHashSig(col("text"), 3, 256).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    def est(a: Long, b: Long): Double =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / sigs(a).size
    for (a <- 0L to 3L; b <- 0L to 3L if a < b) {
      val t = trueJac(variants(a.toInt), variants(b.toInt))
      val e = est(a, b)
      // 256 hashes -> stderr ~ sqrt(t(1-t)/256) <= 0.031; 0.2 is ~6 sigma
      assert(math.abs(e - t) <= 0.2,
        s"pair ($a,$b): est $e vs true $t — signature expression drifted")
    }
  }

  test("minHashLsh banding: more bands never loses the qualifying pair") {
    val base = "the quick brown fox jumps over the lazy dog while the cat watches nearby"
    val docs = Seq(
      (0L, base), (1L, base.replace("lazy", "idle")),
      (2L, "unrelated content speaking of query engines and broadcast joins"))
      .toDF("doc_id", "text")
    // bands sweep at fixed signature length: narrower bands (more of
    // them) collide MORE easily — the planted pair must be found at
    // every banding that its estimated similarity supports
    for (bands <- Seq(8, 16, 32)) {
      val got = Dedup.minHashLsh(docs, "doc_id", "text",
          shingleN = 3, numHashes = 64, bands = bands, threshold = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got.contains((0L, 1L)), s"bands=$bands lost the near-dup pair")
      assert(!got.exists(p => p._1 == 2L || p._2 == 2L),
        s"bands=$bands produced a false positive above threshold")
    }
  }

  test("r11 hot-bucket cap: identical output below the cap, sheds only the " +
       "exact-dup mega-cluster above it") {
    // 1) small scale: no bucket reaches 256, so the capped form must be
    // ROW-IDENTICAL to the uncapped one (the q_dedup_minhash_capped
    // contract at driver SFs)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def pairs(capped: Boolean) = Dedup.minHashLsh(docs, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.6,
        maxBucket = if (capped) 256 else 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs(capped = true) === pairs(capped = false),
      "cap must be a no-op when no bucket reaches it")

    // 2) a 600-doc IDENTICAL cluster goes hot in EVERY band — the cap
    // sheds its n² pairs (exact dedup's job, measured-quadratic at
    // scale: tools/NOTES_r11_minhash.md) while a genuine near-dup pair
    // of distinctive docs is still found through its typical buckets
    val base = "the quick brown fox jumps over the lazy dog while the cat watches nearby"
    val cluster = (100L until 700L).map(i => (i, "boilerplate notice identical every time"))
    val synth = (Seq((0L, base), (1L, base.replace("lazy", "idle"))) ++ cluster)
      .toDF("doc_id", "text")
    val capped = Dedup.minHashLsh(synth, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 8, threshold = 0.5, maxBucket = 256)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((0L, 1L)), "cap lost the genuine near-dup pair")
    assert(!capped.exists(p => p._1 >= 100L || p._2 >= 100L),
      "identical mega-cluster pairs must be shed by the cap")
    val uncapped = Dedup.minHashLsh(synth, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.count(p => p._1 >= 100L) > 100000,
      "sanity: uncapped really does produce the n² cluster pairs")
  }
}
