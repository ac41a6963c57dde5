package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Unigram-LM subword tokenizer (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece `--model_type=unigram` algorithm behind T5/ALBERT/
  * XLNet vocabularies): pieces carry probabilities, a word's
  * tokenization is the Viterbi-best segmentation under the piece LM,
  * and training alternates EM re-estimation with vocabulary pruning.
  * Together with [[Bpe]] this covers both production subword families.
  *
  * Scale architecture — the same split as [[Bpe.learnMergesFast]] (and
  * SentencePiece itself): the CORPUS pass is one distributed
  * `groupBy(word).count()` shuffle; training then runs on the
  * vocabulary-sized word-frequency table (10⁷ distinct words for a
  * 100 TB corpus — one node), and corpus-side tokenization is a single
  * narrow pass with the piece table broadcast and per-thread word
  * memoization. Nothing corpus-sized ever sits on the driver.
  *
  * Simplifications vs the paper, chosen for determinism (and
  * documented): hard (Viterbi) EM instead of forward-backward
  * expected counts, and count-based pruning instead of
  * likelihood-loss ranking. Both keep the training loop deterministic
  * to the bit given the seed vocabulary order; the spec pins Viterbi
  * optimality against brute-force segmentation enumeration, EM
  * likelihood monotonicity, reconstruction, and determinism.
  */
object UnigramLm {

  /** Learned piece table: (piece, logp), logp = ln(count/total) after
    * the final EM pass. Single-character pieces are never pruned
    * (coverage floor — every word stays segmentable). */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 6, emIters: Int = 3,
            seedFactor: Int = 4): DataFrame = {
    require(vocabSize > 0 && emIters >= 1, "unigram: vocabSize>0, emIters>=1")
    val spark = docs.sparkSession
    import spark.implicits._
    val wf: Array[(String, Long)] = docs
      .select(explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect()

    // ---- seed vocabulary: all substrings ≤ maxPieceLen scored by
    // occurrence frequency; single chars always in, multi-char pieces
    // capped at vocabSize·seedFactor by (score desc, piece asc)
    val score = new java.util.HashMap[String, Long]()
    wf.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + maxPieceLen)) {
          score.merge(w.substring(i, j), f, (a, b) => a + b)
          j += 1
        }
        i += 1
      }
    }
    val (chars, multi) = {
      val all = new scala.collection.mutable.ArrayBuffer[(String, Long)](score.size)
      score.forEach((k, v) => all += ((k, v)))
      all.toArray.partition(_._1.length == 1)
    }
    val seed: Array[(String, Long)] = chars ++
      multi.sortBy { case (p, s) => (-s, p) }.take(vocabSize * seedFactor)

    // ---- EM: Viterbi counts under current probs, re-estimate, prune
    var logp: java.util.HashMap[String, java.lang.Double] = {
      val total = seed.map(_._2).sum.toDouble
      val m = new java.util.HashMap[String, java.lang.Double]()
      seed.foreach { case (p, s) => m.put(p, math.log(s / total)) }
      m
    }
    var iter = 0
    while (iter < emIters) {
      val counts = new java.util.HashMap[String, Long]()
      wf.foreach { case (w, f) =>
        viterbi(w, logp, maxPieceLen).foreach { p =>
          counts.merge(p, f, (a, b) => a + b)
        }
      }
      // coverage floor: single chars get +1 so they survive zero counts
      chars.foreach { case (c, _) => counts.merge(c, 1L, (a, b) => a + b) }
      val kept = {
        val all = new scala.collection.mutable.ArrayBuffer[(String, Long)](counts.size)
        counts.forEach((k, v) => all += ((k, v)))
        val (cs, ms) = all.toArray.partition(_._1.length == 1)
        cs ++ ms.sortBy { case (p, c) => (-c, p) }
          .take(math.max(0, vocabSize - cs.length))
      }
      val total = kept.map(_._2).sum.toDouble
      val next = new java.util.HashMap[String, java.lang.Double]()
      kept.foreach { case (p, c) => next.put(p, math.log(c / total)) }
      logp = next
      iter += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[(String, Double)](logp.size)
    logp.forEach((k, v) => out += ((k, v.doubleValue())))
    out.sortBy { case (p, lp) => (-lp, p) }.toSeq.toDF("piece", "logp")
  }

  /** Viterbi-best segmentation of one word under the piece log-probs:
    * maximizes Σ logp; ties broken toward FEWER pieces, then by the
    * lexicographically smallest piece sequence (via choosing the
    * longest piece at each boundary on equal score — deterministic).
    * Words containing characters outside the vocabulary fall back to
    * per-character pieces for the uncovered runs (logp −1e9 each). */
  private[graft] def viterbi(w: String,
                             logp: java.util.HashMap[String, java.lang.Double],
                             maxPieceLen: Int): Array[String] = {
    val n = w.length
    if (n == 0) return Array.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val from = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val piece = w.substring(j, i)
        val boxed = logp.get(piece)
        val lp =
          if (boxed == null) { if (i - j == 1) -1e9 else Double.NaN } // unseen char fallback
          else boxed.doubleValue()
        if (!lp.isNaN && best(j) + lp >= best(i)) {
          // >= prefers the LONGEST final piece on ties (j scans upward,
          // later j = shorter piece; strict > would keep the shorter)
          if (best(j) + lp > best(i) || i - j > i - from(i)) {
            best(i) = best(j) + lp
            from(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    // backtrack
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { pieces += w.substring(from(k), k); k = from(k) }
    pieces.reverseIterator.toArray
  }

  /** Tokenize `textCol` with a trained piece table: adds `ulm_tokens`
    * and `ulm_n_tokens`. r13: applies through the NATIVE
    * [[graft.plans.UlmEncode]] expression — the vocabSize-row model
    * rides in the expression instance (task-local `memoCap`-bounded
    * word memo, no ThreadLocal), same contract as
    * [[Bpe.applyMerges]]'s `graft_bpe_encode`. */
  def tokenize(docs: DataFrame, textCol: String, model: DataFrame,
               maxPieceLen: Int = 6, memoCap: Int = 1 << 17): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val table: Seq[(String, Double)] = model.select("piece", "logp")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val enc = ColumnBridge.column(graft.plans.UlmEncode(
      ColumnBridge.expression(col(textCol)), table, maxPieceLen, memoCap))
    docs.withColumn("ulm_tokens", enc)
      .withColumn("ulm_n_tokens", size(col("ulm_tokens")))
  }
}
