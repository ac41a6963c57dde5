package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus retrieval / RAG-prep operators (SURVEY.md §2.4): BM25 ranked
  * search, token-window chunking, and reciprocal-rank fusion. The
  * reference stack's query surface stops at record-level SQL
  * (QueryRecord); a training-data/RAG pipeline additionally needs
  * ranked text retrieval over the corpus itself — scoring re-expresses
  * the public Okapi BM25 formulation (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework: BM25 and Beyond") and RRF
  * re-expresses Cormack, Clarke & Buettcher 2009; both as declarative
  * Spark plans, no UDFs.
  */
object Retrieval {

  /** DuckDB-faithful rounding (round(x·10ⁿ)/10ⁿ — the operation order
    * DuckDB uses on doubles), so rounded scores are bit-identical to a
    * SQL oracle even at .5 boundaries. */
  private def dround(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    round(c * p) / p
  }

  /** BM25 top-k document retrieval for a (small) set of keyword
    * queries.
    *
    * Plan shape — built for the 100 TB corpus / handful-of-queries
    * asymmetry:
    *   1. the distinct query TERMS (tiny) broadcast-semi-join the
    *      exploded token stream, so only postings for query terms ever
    *      reach an aggregation — the corpus-wide term dictionary is
    *      never materialized;
    *   2. per-(doc, term) tf and per-term df aggregate from that
    *      filtered stream (one shuffle keyed by (doc, term), then a
    *      |terms|-row df side that broadcasts back);
    *   3. doc length and the global (N, avgdl) scalars come from one
    *      narrow aggregate; avgdl = sum(dl)/N on exact integers, so the
    *      per-(doc, term) weight is a deterministic chain of double ops
    *      on integer-valued inputs in both engines;
    *   4. scores sum per (query, doc), round to 6 decimals BEFORE
    *      ranking (so the rank compare is on identical values in every
    *      engine), then rank per query with ties broken by doc id.
    *
    * The final ranking window partitions by query_id — fine for a
    * bounded query set (each partition is one query's candidate list).
    * For query sets large enough that a per-query candidate list
    * exceeds a partition, swap stage 4 for the per-partition heap
    * top-k used by [[Ann.bruteForceTopKPartitioned]]; stages 1-3 are
    * already linear in corpus tokens that match query terms.
    *
    * Output: (query_id, doc_id, score, n_terms, rk) — `n_terms` = how
    * many distinct query terms the doc matched.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, queryIdCol: String, queryTextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.wsTokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), col("toks"))
    // Exact-integer global stats: avgdl as sum/count (one double
    // division) — NOT avg(), whose running-mean accumulation order is
    // engine-dependent.
    val stats = toks.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val qt = queries.select(col(queryIdCol).as("query_id"),
        explode(TextAnalysis.wsTokens(col(queryTextCol))).as("term"))
      .distinct()
    val terms = qt.select("term").distinct()
    // dl rides the (filtered) postings stream — one int per matching
    // token — so no second corpus aggregation or per-doc join-back.
    val tf = toks.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(terms), Seq("term"), "left_semi")
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // Robertson idf (the Lucene-default +1 smoothing, never negative).
    // Operand shapes mirror the oracle SQL verbatim so the doubles are
    // identical: all inputs are exact integers (tf, df, n, dl) or the
    // one exact division above (avgdl).
    val wt = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
      (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    val scored = tf
      .join(broadcast(dft), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("wt", wt)
      .join(broadcast(qt), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(dround(sum(col("wt")), 6).as("score"), count(lit(1)).as("n_terms"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** Token-window chunking for RAG / training-sequence prep: each doc
    * splits into windows of `chunkLen` whitespace tokens advancing by
    * `stride` (overlap = chunkLen − stride). Purely narrow — a
    * per-row generate + slice with NO shuffle; chunk count is
    * ⌈n/stride⌉, so output size is bounded by (1 + overlap/stride)× the
    * corpus and the plan scales embarrassingly at 100 TB. Empty docs
    * yield one empty chunk (chunk_id 0, 0 tokens) so every doc_id
    * survives into the chunked corpus.
    *
    * Output: (doc_id, chunk_id, chunk_text, n_chunk_tokens).
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkLen: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkLen >= stride,
      s"chunkTokens: need 0 < stride <= chunkLen, got chunkLen=$chunkLen stride=$stride")
    // Null text coalesces to an empty token array — otherwise
    // wsTokens(null) is a null array and the doc either drops or emits
    // a null chunk with n_chunk_tokens −1, breaking the every-doc_id-
    // survives contract documented above.
    val toks = docs.select(col(idCol).as("doc_id"),
      coalesce(TextAnalysis.wsTokens(col(textCol)),
        typedLit(Array.empty[String])).as("toks"))
    toks
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
          lit(stride))).as("start"))
      .select(
        col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        array_join(slice(col("toks"), col("start") + 1, lit(chunkLen)), " ")
          .as("chunk_text"),
        least(lit(chunkLen), size(col("toks")) - col("start")).cast("long")
          .as("n_chunk_tokens"))
  }

  /** The published RecursiveCharacterTextSplitter algorithm (the
    * splitter NiFi 2.x ChunkDocument wraps for its default
    * 'Recursively Split by Character' strategy; langchain's
    * text_splitter docs state the contract): try the separators in
    * order, split on the FIRST present in the text (the empty
    * separator splits to characters), recurse into any split still
    * over `chunkSize` with the REMAINING separators, then greedily
    * merge adjacent splits into chunks ≤ chunkSize rejoined by the
    * separator, carrying ≤ `overlap` trailing characters of context
    * into the next chunk. Character grain (NiFi's default length
    * function), keep_separator = false. Whitespace-only merged chunks
    * drop (the algorithm's strip step). */
  private[graft] def recursiveSplit(text: String, seps: List[String],
                                    chunkSize: Int, overlap: Int): Seq[String] = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"recursiveSplit: need 0 <= overlap < chunkSize, got $chunkSize/$overlap")
    def mergeSplits(splits: Seq[String], sep: String): Seq[String] = {
      val sepLen = sep.length
      val docs = scala.collection.mutable.ArrayBuffer.empty[String]
      var current = scala.collection.mutable.Queue.empty[String]
      var total = 0
      def joined(): Unit = {
        val doc = current.mkString(sep).trim
        if (doc.nonEmpty) docs += doc
      }
      splits.foreach { d =>
        val dl = d.length
        if (total + dl + (if (current.nonEmpty) sepLen else 0) > chunkSize) {
          if (current.nonEmpty) {
            joined()
            // carry ≤ overlap trailing chars; also keep shrinking while
            // the incoming split would still not fit
            while (total > overlap ||
                   (total + dl + (if (current.nonEmpty) sepLen else 0) > chunkSize &&
                    total > 0)) {
              total -= current.head.length + (if (current.size > 1) sepLen else 0)
              current.dequeue()
            }
          }
        }
        current.enqueue(d)
        total += dl + (if (current.size > 1) sepLen else 0)
      }
      if (current.nonEmpty) joined()
      docs.toSeq
    }
    def split(text: String, seps: List[String]): Seq[String] = {
      val idx = seps.indexWhere(s => s.isEmpty || text.contains(s))
      val (sep, rest) =
        if (idx < 0) (seps.lastOption.getOrElse(""), Nil)
        else (seps(idx), seps.drop(idx + 1))
      val pieces =
        if (sep.isEmpty) text.map(_.toString)
        else text.split(java.util.regex.Pattern.quote(sep), -1).toSeq.filter(_.nonEmpty)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val good = scala.collection.mutable.ArrayBuffer.empty[String]
      pieces.foreach { p =>
        if (p.length < chunkSize) good += p
        else {
          if (good.nonEmpty) { out ++= mergeSplits(good.toSeq, sep); good.clear() }
          if (rest.isEmpty) out += p
          else out ++= split(p, rest)
        }
      }
      if (good.nonEmpty) out ++= mergeSplits(good.toSeq, sep)
      out.toSeq
    }
    if (text == null || text.isEmpty) Seq.empty else split(text, seps)
  }

  /** ChunkDocument, 'Recursively Split by Character' strategy: one row
    * per chunk (doc_id, chunk_id, chunk_text, n_chunk_chars). Narrow
    * per-row split + posexplode — no shuffle, the chunkTokens posture;
    * empty/null docs keep one empty chunk so every doc_id survives. */
  def chunkRecursive(docs: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int, overlap: Int,
                     separators: Seq[String] = Seq("\n\n", "\n", " ", "")): DataFrame = {
    val chunks = graft.plans.DocExpressions.recursiveChunks(
      coalesce(col(textCol), lit("")), chunkSize, overlap, separators)
    docs
      .select(col(idCol).as("doc_id"),
        // the every-doc_id-survives contract: no chunks -> one empty
        when(size(chunks) === 0, array(lit(""))).otherwise(chunks).as("cs"))
      .select(col("doc_id"), posexplode(col("cs")).as(Seq("chunk_id", "chunk_text")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("chunk_text"),
        length(col("chunk_text")).cast("long").as("n_chunk_chars"))
  }

  /** Reciprocal-rank fusion of two rankings (Cormack et al. 2009):
    * rrf(d) = Σ_r 1/(k0 + rank_r(d)) over the rankings that retrieved
    * d. Rank-based, so the fused score is a sum of exact rationals —
    * no floating-point drift from the underlying scores — and the two
    * addends join in a fixed column order. Docs retrieved by only one
    * ranking contribute a single term. Both inputs must carry
    * (query_id, doc_id, rk).
    *
    * Output: (query_id, doc_id, rrf_score, rk) — top `k` per query,
    * ties broken by doc_id.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, k0: Int = 60): DataFrame = {
    def side(df: DataFrame, out: String): DataFrame =
      df.select(col("query_id"), col("doc_id"),
        (lit(1.0) / (lit(k0) + col("rk"))).as(out))
    val fused = side(a, "ra").join(side(b, "rb"), Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        dround(coalesce(col("ra"), lit(0.0)) + coalesce(col("rb"), lit(0.0)), 9)
          .as("rrf_score"))
    val w = Window.partitionBy("query_id").orderBy(col("rrf_score").desc, col("doc_id"))
    fused.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }
}
