package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed n-gram features are under a TARGET corpus's bag-of-grams
  * model than under the raw corpus's own, then resample proportionally
  * to the tempered weights. This is the standard recipe for tilting a
  * 100 TB web crawl toward a curated distribution (Wikipedia/books)
  * without training a classifier, and the weights double as a quality
  * signal alongside the unigram/bigram/trigram LM proxies (§2.4 37a/g/h).
  *
  * Features are unigrams + bigrams of lowercased whitespace tokens,
  * hashed into `numBuckets` buckets by an md5 prefix — the same
  * engine-agnostic hashing the token-budget sampler uses, so the DuckDB
  * oracle reproduces the bucketing bit-for-bit. Both models are
  * add-one-smoothed bucket distributions; a document's log-weight is
  *
  *   log w(d) = Σ_b c_b(d) · [ ln((ct_b+1)/(Nt+B)) − ln((cr_b+1)/(Nr+B)) ]
  *
  * (paper §3: importance weights under hashed generative models).
  *
  * Scale shape: the gram stream is narrow (two array slices zipped per
  * doc), per-doc bucket counts are one linear shuffle keyed by
  * (doc, bucket), and BOTH models live in a single ≤B-row table —
  * grouped from the count stream, broadcast back — so the raw corpus is
  * touched exactly once and nothing global ever sits on the driver.
  * Resampling (the paper's Gumbel top-k) is [[gumbelTopK]]: a
  * deterministic md5-derived uniform provides the Gumbel noise, making
  * the draw reproducible across engines AND runs — at 100 TB the global
  * top-k is Spark's TakeOrdered (per-partition heaps, no full sort).
  */
object Dsir {

  /** Per-bucket count cap none; buckets are 3 hex chars = 4096. Kept as
    * a val so the Scala side and the published oracle SQL stay tied. */
  val DefaultBuckets = 4096

  private def grams(docs: DataFrame, idCol: String, textCol: String,
                    targetCol: Column): DataFrame = {
    val toks = docs.select(col(idCol).as("_id"), targetCol.as("_tgt"),
      graft.functions.TextAnalysis.wsTokens(lower(col(textCol))).as("_toks"))
    val uni = toks.select(col("_id"), col("_tgt"),
      explode(col("_toks")).as("gram"))
    val bi = toks.select(col("_id"), col("_tgt"), explode(
      when(size(col("_toks")) >= 2, zip_with(
        slice(col("_toks"), lit(1), size(col("_toks")) - 1),
        slice(col("_toks"), lit(2), size(col("_toks")) - 1),
        (a, b) => concat(a, lit(" "), b)))
        .otherwise(typedLit(Seq.empty[String]))).as("gram"))
    uni.unionByName(bi)
  }

  /** (id, dsir_logw): importance log-weight per document. `targetCol`
    * is a boolean marking the target (curated) subset; weights are for
    * EVERY doc, target rows included (the paper scores the full raw
    * pool). Docs with no tokens produce no grams and drop. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetCol: Column,
                        numBuckets: Int = DefaultBuckets): DataFrame = {
    require(numBuckets == 4096,
      "bucketing is pinned to 3 md5 hex chars (4096) to stay oracle-identical")
    val db = grams(docs, idCol, textCol, targetCol)
      .withColumn("b", substring(md5(col("gram").cast("binary")), 1, 3))
      .groupBy("_id", "_tgt", "b").agg(count(lit(1)).as("c"))
    // both models in one ≤B-row pass over the count stream
    val model = db.groupBy("b").agg(
      sum("c").as("cr"),
      sum(when(col("_tgt"), col("c")).otherwise(lit(0L))).as("ct"))
    val scal = model.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    val lr = model.crossJoin(broadcast(scal)).select(col("b"),
      (log((col("ct") + 1).cast("double") / (col("nt") + numBuckets)) -
       log((col("cr") + 1).cast("double") / (col("nr") + numBuckets))).as("lr"))
    db.join(broadcast(lr), "b")
      .groupBy(col("_id").as(idCol))
      .agg(sum(col("c") * col("lr")).as("dsir_logw"))
  }

  /** Gumbel top-k resampling over a weight column: draw the k docs with
    * the largest `w/temperature + G_id`, G from a deterministic
    * md5-uniform (`u = int(md5(seed:id)[0,12)) / 2^48`,
    * `G = −ln(−ln u)`) — sampling without replacement proportional to
    * exp(w/T) (Gumbel-max trick), reproducible across engines. */
  def gumbelTopK(weights: DataFrame, idCol: String, weightCol: String,
                 k: Int, temperature: Double = 1.0,
                 seed: String = "dsir"): DataFrame = {
    val u = conv(substring(md5(concat(lit(seed + ":"),
      col(idCol).cast("string")).cast("binary")), 1, 12), 16, 10)
      .cast("double") / math.pow(2, 48)
    weights
      .withColumn("gumbel_key",
        col(weightCol) / temperature - log(-log(u)))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }
}
