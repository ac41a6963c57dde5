package graft

import org.apache.spark.sql.functions._
import graft.operators.UnigramLm

/** Calibration gates for the unigram-LM tokenizer (no DuckDB oracle —
  * EM training and Viterbi segmentation are iterative argmax SQL can't
  * express). The decisive gate is VITERBI OPTIMALITY: the segmentation
  * must reach the brute-force-enumerated maximum log-probability for
  * random words under random piece tables. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    "low low low low low lower lower newest newest newest newest newest newest widest widest widest")
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("training is deterministic; frequent whole words become single pieces") {
    val m1 = UnigramLm.train(corpus, "text", vocabSize = 40)
      .as[(String, Double)].collect().toSeq
    val m2 = UnigramLm.train(corpus, "text", vocabSize = 40)
      .as[(String, Double)].collect().toSeq
    assert(m1 === m2, "training must be bit-deterministic")
    val pieces = m1.map(_._1).toSet
    // at vocab 40 over this tiny corpus every full word survives pruning
    assert(Set("low", "lower", "newest", "widest").subsetOf(pieces))
    val toks = UnigramLm.tokenize(corpus, "text", UnigramLm.train(corpus, "text", 40))
      .select("ulm_tokens").as[Seq[String]].head()
    // the Viterbi LM segments each frequent word as itself
    assert(toks.count(_ == "newest") === 6)
    assert(toks.count(_ == "low") === 5)
  }

  test("tokenization reconstructs the input and uses only vocabulary pieces") {
    val model = UnigramLm.train(corpus, "text", vocabSize = 25)
    val vocab = model.select("piece").as[String].collect().toSet
    val docs = Seq((1L, "lowest newlow widestlow")).toDF("doc_id", "text")
    val toks = UnigramLm.tokenize(docs, "text", model)
      .select("ulm_tokens").as[Seq[String]].head()
    assert(toks.mkString === "lowestnewlowwidestlow", "pieces must concatenate back")
    assert(toks.forall(vocab.contains), s"out-of-vocab piece in $toks")
  }

  test("viterbi reaches the brute-force optimum on random words and piece tables") {
    val rnd = new scala.util.Random(31)
    def allSegs(w: String, maxLen: Int): Iterator[List[String]] =
      if (w.isEmpty) Iterator(Nil)
      else (1 to math.min(maxLen, w.length)).iterator.flatMap { l =>
        allSegs(w.drop(l), maxLen).map(w.take(l) :: _)
      }
    (1 to 40).foreach { trial =>
      val w = (1 to (3 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val lp = new java.util.HashMap[String, java.lang.Double]()
      // random table over this word's substrings; every char covered
      w.distinct.foreach(c => lp.put(c.toString, -1.0 - rnd.nextDouble() * 3))
      (0 until w.length).foreach { i =>
        ((i + 2) to math.min(w.length, i + 4)).foreach { j =>
          if (rnd.nextBoolean()) lp.put(w.substring(i, j), -0.5 - rnd.nextDouble() * 4)
        }
      }
      def segScore(seg: List[String]): Double =
        seg.map(p => Option(lp.get(p)).map(_.doubleValue()).getOrElse(Double.NegativeInfinity)).sum
      val bestBrute = allSegs(w, 6).map(segScore).max
      val got = segScore(UnigramLm.viterbi(w, lp, 6).toList)
      assert(math.abs(got - bestBrute) < 1e-9,
        s"trial $trial '$w': viterbi $got vs brute $bestBrute")
    }
  }

  test("characters outside the vocabulary fall back to per-char pieces, still reconstruct") {
    val model = UnigramLm.train(corpus, "text", vocabSize = 25)
    val docs = Seq((1L, "zqlow")).toDF("doc_id", "text")
    val toks = UnigramLm.tokenize(docs, "text", model)
      .select("ulm_tokens").as[Seq[String]].head()
    assert(toks.mkString === "zqlow")
    assert(toks.take(2) === Seq("z", "q"), "unseen chars must be per-char fallback pieces")
  }

  test("per-thread memo never leaks across models") {
    val big = UnigramLm.train(corpus, "text", vocabSize = 40)
    val tiny = UnigramLm.train(corpus, "text", vocabSize = 8) // chars only survive
    val docs = Seq((1L, "newest")).toDF("doc_id", "text")
    val n1 = UnigramLm.tokenize(docs, "text", big).select("ulm_n_tokens").as[Int].head()
    val n2 = UnigramLm.tokenize(docs, "text", tiny).select("ulm_n_tokens").as[Int].head()
    assert(n1 === 1, s"big vocab should keep 'newest' whole, got $n1 pieces")
    assert(n2 > 1, s"tiny vocab must split 'newest', got $n2 pieces")
  }
}
