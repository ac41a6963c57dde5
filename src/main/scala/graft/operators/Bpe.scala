package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Distributed BPE merge learning + tokenization (Sennrich, Haddow &
  * Birch 2016, arXiv:1508.07909 — the algorithm behind GPT-2/RoBERTa
  * vocabularies; NiFi has no analog, this is §2.4 training-data
  * tooling in the brief's "token counting (whitespace + a BPE-ish
  * regex)" family, upgraded from a regex stand-in to the real
  * learned-merge procedure).
  *
  * Scale design. The classic observation (and the reason BPE training
  * is tractable at corpus scale) is that learning only needs the
  * WORD-FREQUENCY table, not the corpus: a 100 TB corpus has a
  * vocabulary of ~10⁷ distinct words, so after one distributed
  * `groupBy(word).count()` (map-side combined, one shuffle) every
  * merge iteration runs on a vocabulary-sized DataFrame. Per
  * iteration: a narrow pair-explode + one map-side-combined count agg
  * + a 1-ROW collect (the argmax pair) + a narrow typed map applying
  * the merge — cost O(|vocab| · avg_word_len) per iteration,
  * independent of corpus size. The driver holds only the merge table
  * (numMerges rows). Lineage is truncated every iteration with an
  * eager localCheckpoint, so the plan stays flat across hundreds of
  * merges.
  *
  * Corpus-side tokenization ([[applyMerges]]) is a single
  * mapPartitions pass with the (tiny) merge list broadcast: per word,
  * the standard greedy loop merges the LOWEST-RANK adjacent pair
  * until none applies, memoized per partition (corpora repeat words;
  * the memo is capped so executor memory is bounded on adversarial
  * vocabularies).
  *
  * Determinism: merge selection breaks frequency ties by (left,
  * right) lexicographic order; word-frequency counts are exact; the
  * greedy apply is rank-deterministic — so learned merges and
  * tokenizations are identical across runs and partitionings.
  */
object Bpe {
  /** End-of-word sentinel: a symbol that whitespace pre-tokenization
    * can never produce, so merged tokens carrying it remain
    * reconstructable (Sennrich §3.2 uses the same device). */
  val EndOfWord = "</w>"

  private def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  private def initialSymbols(w: String): Array[String] =
    w.map(_.toString).toArray :+ EndOfWord

  /** One merge applied to one symbol sequence (all adjacent
    * occurrences, left to right, non-overlapping — the reference
    * algorithm's replacement order). */
  private[operators] def mergeOnce(syms: Array[String], left: String, right: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += left + right; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn `numMerges` merges from the corpus. Returns one row per
    * merge: (rank, left, right, pair_freq) with rank 1 = first merge.
    * Stops early if no adjacent pair remains (fully merged corpus). */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, "numMerges > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Dataset[(Array[String], Long)] = wordFreq(docs, textCol)
      .as[(String, Long)].map { case (w, f) => (initialSymbols(w), f) }
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // pair counts, weighted by word frequency — vocabulary-sized,
      // map-side-combined agg; the collect is exactly ONE row (argmax)
      val best = vocab.flatMap { case (syms, f) =>
        (0 until syms.length - 1).map(i => (syms(i), syms(i + 1), f))
      }.toDF("left", "right", "f")
        .groupBy("left", "right").agg(sum("f").as("pf"))
        .orderBy(col("pf").desc, col("left"), col("right"))
        .limit(1).as[(String, String, Long)].collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, pf) = best(0)
        merges += ((rank, l, r, pf))
        vocab = vocab.map { case (syms, f) => (mergeOnce(syms, l, r), f) }
          .localCheckpoint(true) // eager — flat lineage across merges
        rank += 1
      }
    }
    merges.result().toDF("rank", "left", "right", "pair_freq")
  }

  /** Tokenize `textCol` with a learned merge table: adds `bpe_tokens`
    * (array of strings, `EndOfWord`-suffixed on each word's last
    * symbol) and `bpe_n_tokens`. `merges` must be the output of
    * [[learnMerges]] (driver-side collect here is numMerges rows — the
    * model, not data). `memoCap` bounds the per-partition word memo. */
  def applyMerges(docs: DataFrame, textCol: String, merges: DataFrame,
                  memoCap: Int = 1 << 17): DataFrame = {
    val spark = docs.sparkSession
    val ranked: Map[(String, String), Int] = merges
      .select("rank", "left", "right")
      .collect().map(r => ((r.getString(1), r.getString(2)), r.getInt(0))).toMap
    val bc = spark.sparkContext.broadcast(ranked)
    val bcId = bc.id

    val tokenize = udf { (text: String) =>
      encodeText(text, bcId, bc.value, memoCap)
    }
    docs.withColumn("bpe_tokens", tokenize(col(textCol)))
      .withColumn("bpe_n_tokens", size(col("bpe_tokens")))
  }

  /** Per-executor-thread word→tokens memo, keyed by the merge table's
    * broadcast id so stale entries from a different model never leak
    * across queries. Bounded by `memoCap` entries per thread. */
  private object Memo {
    private val tl = new ThreadLocal[(Long, java.util.HashMap[String, Array[String]])]()
    def forModel(bcId: Long): java.util.HashMap[String, Array[String]] = {
      val cur = tl.get()
      if (cur == null || cur._1 != bcId) {
        val m = new java.util.HashMap[String, Array[String]]()
        tl.set((bcId, m)); m
      } else cur._2
    }
  }

  // greedy lowest-rank merging of one word (the reference decode loop)
  private[operators] def encodeWord(w: String, rk: Map[(String, String), Int]): Array[String] = {
    var syms = initialSymbols(w)
    var go = true
    while (go && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rk.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bi = i }
        i += 1
      }
      if (bi < 0 || bestRank == Int.MaxValue) go = false
      else syms = mergeOnce(syms, syms(bi), syms(bi + 1))
    }
    syms
  }

  private def encodeText(text: String, bcId: Long, rk: Map[(String, String), Int],
                         memoCap: Int): Array[String] = {
    if (text == null) return Array.empty
    val memo = Memo.forModel(bcId)
    val out = Array.newBuilder[String]
    text.toLowerCase.split("\\s+").foreach { w =>
      if (w.nonEmpty) {
        var t = memo.get(w)
        if (t == null) {
          t = encodeWord(w, rk)
          if (memo.size < memoCap) memo.put(w, t)
        }
        out ++= t
      }
    }
    out.result()
  }
}
