package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Distributed WordPiece vocabulary learning + tokenization (Schuster
  * & Nakajima 2012, "Japanese and Korean Voice Search"; the tokenizer
  * behind BERT — Devlin et al. 2019 §A, and the third production
  * subword family next to BPE ([[Bpe]]) and unigram-LM
  * ([[UnigramLm]]), completing the trio).
  *
  * WordPiece differs from BPE in exactly two places, both implemented
  * here faithfully:
  *
  *  1. TRAINING picks the merge that maximizes the LIKELIHOOD GAIN of
  *     a unigram LM over the corpus, score(a,b) = count(ab) /
  *     (count(a)·count(b)) — not the raw pair frequency. Rare-but-
  *     always-together pieces merge before frequent-but-independent
  *     ones ("##q ##u" beats "##e ##s").
  *  2. ENCODING is greedy LONGEST-MATCH-FIRST against the final
  *     vocabulary SET (BERT's WordpieceTokenizer), not a replay of the
  *     merge sequence. Non-initial pieces carry the `##` continuation
  *     prefix; a word with any unmatchable position becomes `[UNK]`
  *     whole (the reference behavior, not per-char fallback).
  *
  * Scale design — identical to [[Bpe]]'s, because the same
  * observation holds: training needs only the WORD-FREQUENCY table
  * (one map-side-combined `groupBy(word).count()` shuffle; ~10⁷
  * distinct words for a 100 TB corpus), never the corpus. Per merge,
  * [[learnVocab]] runs a vocabulary-sized pair+symbol recount fully
  * distributed; [[learnVocabFast]] keeps the collected table on the
  * driver and updates only the touched words per merge (the Sennrich
  * incremental discipline, extended to WordPiece's denominators: a
  * merge changes count(a)/count(b) for its own symbols, so every pair
  * scoring against a changed symbol count is eagerly re-pushed — a
  * lazy-validate-on-pop heap alone would under-rank pairs whose
  * denominators SHRANK). Corpus-side tokenization is one pass with
  * the vocabulary broadcast in the native
  * [[graft.plans.WordPieceEncode]] expression (task-local memo, no
  * ScalaUDF).
  *
  * Determinism: scores are exact rationals compared by BigInt
  * cross-multiplication (never a float division); ties break by
  * (left, right) lexicographic order; word counts are exact longs —
  * so the learned vocabulary and every tokenization are identical
  * across runs, partitionings, and the two trainer forms (spec-pinned
  * in WordPieceSpec).
  */
object WordPiece {
  val Unk = "[UNK]"
  val ContPrefix = "##"

  private def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** BERT-style initial segmentation: first char bare, continuations
    * `##`-prefixed — the prefix rides IN the symbol so merges preserve
    * word-position information with no end-of-word sentinel. */
  private[operators] def initialSymbols(w: String): Array[String] = {
    val out = new Array[String](w.length)
    var i = 0
    while (i < w.length) {
      out(i) = if (i == 0) w.charAt(i).toString else ContPrefix + w.charAt(i)
      i += 1
    }
    out
  }

  /** The merged token: left keeps its position marker, right drops
    * its continuation prefix ("h"+"##e" → "he"; "##l"+"##l" → "##ll"). */
  @inline private[operators] def mergedToken(l: String, r: String): String =
    l + r.stripPrefix(ContPrefix)

  /** One merge applied to one symbol sequence (adjacent occurrences,
    * left to right, non-overlapping — same contract as
    * [[Bpe.mergeOnce]]). */
  private[operators] def mergeOnce(syms: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += mergedToken(l, r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Exact rational argmax compare: score(a) > score(b) ⟺
    * pfA·lcB·rcB > pfB·lcA·rcA. Counts reach corpus token totals
    * (10¹⁴ at 100 TB) so the cross product overflows Long — BigInt. */
  @inline private def scoreGt(pfA: Long, lcA: Long, rcA: Long,
                              pfB: Long, lcB: Long, rcB: Long): Int = {
    val a = BigInt(pfA) * BigInt(lcB) * BigInt(rcB)
    val b = BigInt(pfB) * BigInt(lcA) * BigInt(rcA)
    a.compare(b)
  }

  /** Learn `numMerges` WordPiece merges with per-iteration DISTRIBUTED
    * recounts — the fallback form for vocabularies past one node's
    * memory (same contract as [[Bpe.learnMerges]]). Returns one row
    * per merge: (rank, left, right, token, pair_freq, left_freq,
    * right_freq) with rank 1 = first merge.
    *
    * The argmax is exact despite running through SQL: pairs are
    * ranked by a decimal(38,18) division (rounding is MONOTONE, so
    * the exact argmax always lands in the max-rounded-score bucket),
    * the max bucket is collected (a handful of rows) and the winner
    * is decided by BigInt cross-multiplication + lexicographic
    * tie-break on the driver — never by the rounded value alone. */
  def learnVocab(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, "numMerges > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Dataset[(Array[String], Long)] = wordFreq(docs, textCol)
      .as[(String, Long)].map { case (w, f) => (initialSymbols(w), f) }
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, String, Long, Long, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val pairs = vocab.flatMap { case (syms, f) =>
        (0 until syms.length - 1).map(i => (syms(i), syms(i + 1), f))
      }.toDF("left", "right", "f")
        .groupBy("left", "right").agg(sum("f").as("pf"))
      val syms = vocab.flatMap { case (s, f) => s.map(x => (x, f)) }
        .toDF("sym", "f").groupBy("sym").agg(sum("f").as("sf"))
      val scored = pairs
        .join(syms.withColumnRenamed("sym", "left").withColumnRenamed("sf", "lc"), "left")
        .join(syms.withColumnRenamed("sym", "right").withColumnRenamed("sf", "rc"), "right")
        .withColumn("score",
          col("pf").cast("decimal(38,18)") /
            (col("lc").cast("decimal(19,0)") * col("rc").cast("decimal(19,0)")))
      val m = scored.agg(max("score")).collect()(0)
      if (m.isNullAt(0)) done = true
      else {
        val cands = scored.filter(col("score") === m.getDecimal(0))
          .select("left", "right", "pf", "lc", "rc")
          .as[(String, String, Long, Long, Long)].collect()
        // exact winner among the max-rounded-score bucket
        val best = cands.reduce { (a, b) =>
          val c = scoreGt(a._3, a._4, a._5, b._3, b._4, b._5)
          if (c > 0) a
          else if (c < 0) b
          else if (a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)) a else b
        }
        val (l, r, pf, lc, rc) = best
        merges += ((rank, l, r, mergedToken(l, r), pf, lc, rc))
        vocab = vocab.map { case (s, f) => (mergeOnce(s, l, r), f) }
          .localCheckpoint(true)
        rank += 1
      }
    }
    merges.result().toDF("rank", "left", "right", "token", "pair_freq",
      "left_freq", "right_freq")
  }

  /** Learn `numMerges` WordPiece merges with INCREMENTAL statistics on
    * the collected word-frequency table — the [[Bpe.learnMergesFast]]
    * architecture extended to likelihood scoring. Two index
    * structures beyond BPE's: exact symbol counts (the score
    * denominators) and a symbol→pairs adjacency index, because a
    * merge changes count(l)/count(r) and thereby the score of EVERY
    * pair touching those symbols — each such pair is eagerly
    * re-pushed with fresh counts (lazy validate-on-pop alone would
    * leave a pair whose denominator shrank sitting in the heap with
    * an understated score and let a worse pair win). Entries are
    * validated on pop against all three live counts.
    *
    * EXACTLY the same merge sequence as [[learnVocab]] (spec-pinned):
    * identical exact-rational compare, identical tie-break.
    *
    * Memory contract: driver holds the symbolized vocabulary + pair
    * and adjacency indexes, O(total symbols) — same bound as the BPE
    * fast trainer; past that, fall back to [[learnVocab]]. */
  def learnVocabFast(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, "numMerges > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val wf: Array[(String, Long)] = wordFreq(docs, textCol).as[(String, Long)].collect()
    val words: Array[Array[String]] = wf.map { case (w, _) => initialSymbols(w) }
    val freqs: Array[Long] = wf.map(_._2)

    @inline def key(l: String, r: String): String = s"${l.length}:$l$r"
    val stats = new java.util.HashMap[String, Long]() // pair -> pf
    val symCount = new java.util.HashMap[String, Long]() // sym -> total freq
    // pair -> word indexes that MAY contain it (stale allowed)
    val index = new java.util.HashMap[String, java.util.ArrayList[Integer]]()
    // symbol -> pair keys that MAY score against it (stale allowed);
    // parallel (l, r) arrays keyed by pair key for re-push
    val symPairs = new java.util.HashMap[String, java.util.HashSet[String]]()
    val pairLeft = new java.util.HashMap[String, String]()
    val pairRight = new java.util.HashMap[String, String]()

    final case class Cand(pf: Long, lc: Long, rc: Long, l: String, r: String)
    val heap = new java.util.PriorityQueue[Cand]((a: Cand, b: Cand) => {
      val c = scoreGt(b.pf, b.lc, b.rc, a.pf, a.lc, a.rc) // desc by score
      if (c != 0) c
      else { val cl = a.l.compareTo(b.l); if (cl != 0) cl else a.r.compareTo(b.r) }
    })

    @inline def push(l: String, r: String): Unit = {
      val pf = stats.getOrDefault(key(l, r), 0L)
      if (pf > 0)
        heap.add(Cand(pf, symCount.getOrDefault(l, 0L), symCount.getOrDefault(r, 0L), l, r))
    }
    @inline def bumpPair(l: String, r: String, by: Long): Unit = {
      val k = key(l, r)
      val n = stats.merge(k, by, (a, b) => a + b)
      if (n <= 0) stats.remove(k)
    }
    @inline def link(l: String, r: String, wi: Int): Unit = {
      val k = key(l, r)
      index.computeIfAbsent(k, _ => new java.util.ArrayList[Integer]())
        .add(Integer.valueOf(wi))
      pairLeft.put(k, l); pairRight.put(k, r)
      symPairs.computeIfAbsent(l, _ => new java.util.HashSet[String]()).add(k)
      symPairs.computeIfAbsent(r, _ => new java.util.HashSet[String]()).add(k)
    }

    var wi = 0
    while (wi < words.length) {
      val s = words(wi); val f = freqs(wi)
      var i = 0
      while (i < s.length) {
        symCount.merge(s(i), f, (a, b) => a + b)
        if (i < s.length - 1) { bumpPair(s(i), s(i + 1), f); link(s(i), s(i + 1), wi) }
        i += 1
      }
      wi += 1
    }
    // initial heap: every live pair once, with exact counts
    stats.forEach { (k, _) => push(pairLeft.get(k), pairRight.get(k)) }

    val merges = Seq.newBuilder[(Int, String, String, String, Long, Long, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      var top: Cand = null
      while (top == null && !heap.isEmpty) {
        val c = heap.poll()
        if (stats.getOrDefault(key(c.l, c.r), 0L) == c.pf &&
            symCount.getOrDefault(c.l, 0L) == c.lc &&
            symCount.getOrDefault(c.r, 0L) == c.rc) top = c
      }
      if (top == null) done = true
      else {
        val (l, r, pf, lc, rc) = (top.l, top.r, top.pf, top.lc, top.rc)
        merges += ((rank, l, r, mergedToken(l, r), pf, lc, rc))
        val touched = index.remove(key(l, r))
        // net symbol-count deltas this merge (only true changes re-push)
        val symDelta = new java.util.HashMap[String, Long]()
        val pairDirty = new java.util.HashSet[String]()
        if (touched != null) {
          val seen = new java.util.HashSet[Integer]()
          touched.forEach { boxed =>
            if (seen.add(boxed)) {
              val w = boxed.intValue()
              val old = words(w)
              var has = false
              var i = 0
              while (!has && i < old.length - 1) {
                if (old(i) == l && old(i + 1) == r) has = true
                i += 1
              }
              if (has) {
                val f = freqs(w)
                i = 0
                while (i < old.length) {
                  symDelta.merge(old(i), -f, (a, b) => a + b)
                  if (i < old.length - 1) {
                    bumpPair(old(i), old(i + 1), -f)
                    pairDirty.add(key(old(i), old(i + 1)))
                  }
                  i += 1
                }
                val nw = mergeOnce(old, l, r)
                words(w) = nw
                i = 0
                while (i < nw.length) {
                  symDelta.merge(nw(i), f, (a, b) => a + b)
                  if (i < nw.length - 1) {
                    bumpPair(nw(i), nw(i + 1), f)
                    pairDirty.add(key(nw(i), nw(i + 1)))
                    link(nw(i), nw(i + 1), w)
                  }
                  i += 1
                }
              }
            }
          }
        }
        stats.remove(key(l, r))
        // apply true symbol-count changes, then eagerly re-push every
        // pair scoring against a changed symbol (the WordPiece-specific
        // invalidation BPE does not need)
        symDelta.forEach { (s, d) =>
          if (d != 0L) {
            val n = symCount.merge(s, d, (a, b) => a + b)
            if (n <= 0) symCount.remove(s)
            val ps = symPairs.get(s)
            if (ps != null) {
              val it = ps.iterator()
              while (it.hasNext) {
                val k = it.next()
                if (stats.containsKey(k)) pairDirty.add(k)
                else it.remove() // pair is dead — drop the stale edge
              }
            }
          }
        }
        pairDirty.forEach { k =>
          if (stats.containsKey(k)) push(pairLeft.get(k), pairRight.get(k))
        }
        rank += 1
      }
    }
    merges.result().toDF("rank", "left", "right", "token", "pair_freq",
      "left_freq", "right_freq")
  }

  /** The final vocabulary SET for greedy encoding: every initial
    * symbol the corpus produces (alphabet-sized distributed distinct)
    * plus the merge tokens, plus `[UNK]`. Sorted for determinism. */
  def vocabSet(docs: DataFrame, textCol: String, merges: DataFrame): Array[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val alphabet = docs
      .select(explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("w"))
      .as[String].flatMap(w => initialSymbols(w))
      .distinct().collect()
    val merged = merges.select("token").as[String].collect()
    (alphabet ++ merged :+ Unk).distinct.sorted
  }

  /** Tokenize `textCol` by greedy longest-match against `vocab` (the
    * BERT WordpieceTokenizer): adds `wp_tokens` + `wp_n_tokens`.
    * Applies through the native [[graft.plans.WordPieceEncode]]
    * expression — vocabulary rides in the expression instance
    * (task-local memo, no ScalaUDF), node shows in plans as
    * `graft_wordpiece_encode`. Words longer than `maxWordChars`
    * become `[UNK]` without scanning (the reference bound, default
    * 100 in BERT; guards the O(len²) longest-match scan). */
  def applyVocab(docs: DataFrame, textCol: String, vocab: Seq[String],
                 maxWordChars: Int = 100, memoCap: Int = 1 << 17): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val enc = ColumnBridge.column(graft.plans.WordPieceEncode(
      ColumnBridge.expression(col(textCol)), vocab, maxWordChars, memoCap))
    docs.withColumn("wp_tokens", enc)
      .withColumn("wp_n_tokens", size(col("wp_tokens")))
  }

  /** Reference single-word greedy longest-match (the spec's oracle for
    * the native expression; also exercised directly in tests). */
  private[graft] def encodeWord(w: String, vocab: java.util.HashSet[String],
                                maxWordChars: Int): Array[String] = {
    if (w.length > maxWordChars) return Array(Unk)
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      var j = w.length
      var hit: String = null
      while (hit == null && j > i) {
        val cand = (if (i > 0) ContPrefix else "") + w.substring(i, j)
        if (vocab.contains(cand)) hit = cand else j -= 1
      }
      if (hit == null) return Array(Unk) // whole word → [UNK] (BERT)
      out += hit
      i = j
    }
    out.result()
  }
}
