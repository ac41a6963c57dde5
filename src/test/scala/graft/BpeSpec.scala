package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Calibration gate for the distributed BPE (no DuckDB oracle — merge
  * learning is an iterative argmax SQL can't express). The reference
  * is an INDEPENDENT single-threaded BPE implemented inside this spec
  * straight from Sennrich et al. 2016's pseudocode (word-freq dict,
  * count pairs, merge argmax with (freq desc, pair asc) tie-break),
  * so agreement means the distributed learner reproduces the
  * published algorithm, not itself. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference implementation (driver-side, straight pseudocode) ----
  private def refLearn(wordFreq: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toVector :+ Bpe.EndOfWord, f) }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), pf) = counts.toSeq.minBy { case ((l, r), pf) => (-pf, l, r) }
        out += ((l, r, pf))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          refMerge(syms, l, r)
        } { case (_, f) => f }(_ + _)
      }
    }
    out.result()
  }

  private def refMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += l + r; i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  // Sennrich §3.2's worked corpus (word: freq): low:5 lower:2 newest:6 widest:3
  private val sennrich = Seq(
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3))
  private def sennrichDocs = sennrich.flatMap { case (w, f) => Seq.fill(f)(w) }
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("learnMerges reproduces the independent reference on the Sennrich corpus") {
    val k = 10
    val got = Bpe.learnMerges(sennrichDocs, "text", k)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
    val want = refLearn(sennrich.map { case (w, f) => (w, f.toLong) }.toMap, k)
    assert(got.length == want.length)
    got.zip(want).foreach { case ((rk, gl, gr, gf), (wl, wr, wf)) =>
      assert((gl, gr, gf) == (wl, wr, wf), s"merge #$rk: got ($gl,$gr,$gf) want ($wl,$wr,$wf)")
    }
    // the canonical first merges: ("e","s") freq 9, then ("es","t") freq 9
    assert((got(0)._2, got(0)._3, got(0)._4) == ("e", "s", 9L))
    assert((got(1)._2, got(1)._3, got(1)._4) == ("es", "t", 9L))
  }

  test("learnMergesFast: incremental statistics reproduce the per-iteration recount exactly") {
    // the worked corpus first (same pin as the distributed form) —
    // INCLUDING early exhaustion past the last possible merge
    val k = 40
    val slow = Bpe.learnMerges(sennrichDocs, "text", k)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    val fast = Bpe.learnMergesFast(sennrichDocs, "text", k)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(fast === slow, "fast/slow merge sequences diverged on the worked corpus")
    assert(slow.length < k, "corpus should exhaust before 40 merges (early-stop path covered)")
    // tie-heavy random corpora: tiny alphabet forces repeated counts so
    // the (freq desc, pair asc) tie-break actually decides merges
    val rng = new scala.util.Random(13)
    (1 to 5).foreach { trial =>
      val words = (1 to 30).map(_ =>
        (1 to (1 + rng.nextInt(6))).map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
      val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val s = Bpe.learnMerges(docs, "text", 12)
        .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
      val f = Bpe.learnMergesFast(docs, "text", 12)
        .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
      assert(f === s, s"trial $trial: fast/slow diverged on corpus ${words.mkString(" ")}")
    }
  }

  test("greedy apply reconstructs words and matches training-state tokenization") {
    val k = 8
    val merges = Bpe.learnMerges(sennrichDocs, "text", k)
    val toks = Bpe.applyMerges(sennrichDocs, "text", merges)
      .select(col("text"), col("bpe_tokens")).as[(String, Seq[String])].collect()
    toks.foreach { case (w, ts) =>
      // reconstruction: concatenating tokens gives the word + sentinel
      assert(ts.mkString("") == w + Bpe.EndOfWord, s"$w -> $ts")
    }
    // training-state equivalence: greedily applying the ranked merges
    // reproduces the symbols the k-th training iteration ended with
    var state: Map[Vector[String], Long] = sennrich
      .map { case (w, f) => (w.map(_.toString).toVector :+ Bpe.EndOfWord, f.toLong) }.toMap
    refLearn(sennrich.map { case (w, f) => (w, f.toLong) }.toMap, k).foreach { case (l, r, _) =>
      state = state.groupMapReduce { case (syms, _) => refMerge(syms, l, r) } { case (_, f) => f }(_ + _)
    }
    val byWord = sennrich.map { case (w, _) =>
      w -> state.keys.find(_.mkString("") == w + Bpe.EndOfWord).get
    }.toMap
    toks.foreach { case (w, ts) =>
      assert(ts == byWord(w), s"greedy apply of $w gave $ts, training state has ${byWord(w)}")
    }
  }

  test("token count is monotone non-increasing in the number of merges") {
    val docs = sennrichDocs
    val counts = Seq(0, 2, 5, 9).map { k =>
      if (k == 0) {
        docs.select(sum(length(col("text")) + 1)).as[Long].head() // chars + sentinel
      } else {
        val m = Bpe.learnMerges(docs, "text", k)
        Bpe.applyMerges(docs, "text", m).agg(sum("bpe_n_tokens")).as[Long].head()
      }
    }
    counts.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"token count grew: $counts")
    }
  }

  test("per-thread memo never leaks across models") {
    // two models over disjoint corpora; interleave applies on the same
    // thread pool — results must match fresh single-model runs
    val d1 = Seq((1L, "aaab aaab aaab")).toDF("doc_id", "text")
    val d2 = Seq((1L, "aaab aaab aaab")).toDF("doc_id", "text")
    val m1 = Bpe.learnMerges(d1, "text", 1)  // merges (a,a)
    val m2 = Bpe.learnMerges(d2, "text", 3)  // merges deeper
    val t1 = Bpe.applyMerges(d1, "text", m1).select("bpe_n_tokens").as[Int].head()
    val t2 = Bpe.applyMerges(d2, "text", m2).select("bpe_n_tokens").as[Int].head()
    val t1b = Bpe.applyMerges(d1, "text", m1).select("bpe_n_tokens").as[Int].head()
    assert(t1 == t1b, "same model re-applied must be identical")
    assert(t2 < t1, "deeper model must merge further on this corpus")
  }

  test("null/empty text tokenizes to empty, multi-word docs concatenate word streams") {
    val docs = Seq((1L, "low newest"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val m = Bpe.learnMerges(sennrichDocs, "text", 5)
    val got = Bpe.applyMerges(docs, "text", m)
      .select(col("doc_id"), col("bpe_tokens")).as[(Long, Seq[String])]
      .collect().toMap
    assert(got(2L).isEmpty && got(3L).isEmpty)
    assert(got(1L).mkString("") == "low" + Bpe.EndOfWord + "newest" + Bpe.EndOfWord)
  }
}
