package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.TextHash

/** Classifier-based quality filtering (the modern curation component
  * behind FineWeb-Edu / DCLM's fastText filters: score every document
  * with a learned linear model, keep the high-scoring tail): logistic
  * regression over HASHED TOKEN FEATURES (the fastText/vowpal hashing
  * trick — no vocabulary materialization, fixed feature dim), trained
  * distributed with full-batch gradient descent.
  *
  * Scale design: the corpus is never collected — each iteration is one
  * narrow pass computing per-doc errors against the broadcast weight
  * vector, one LINEAR (doc, feature) gradient shuffle (the DSIR shuffle
  * shape — ~20 B/row; sorted-group accumulation trades away map-side
  * combining for bit-determinism, the k-means precedent), and a
  * dim-sized collect (the MODEL, not data — 2¹⁵ doubles = 256 KB, the
  * BPE-merge-table contract). Iterations are fixed-count, so training
  * cost is iters × one linear pass.
  *
  * Determinism: feature hashing is the repo's FNV/splitmix
  * ([[TextHash]]); per-feature gradient sums accumulate over docs
  * SORTED by id (flatMapSortedGroups — the k-means discipline), so
  * float addition order, and therefore the trained weights, are
  * identical across runs and partitionings. */
object TextClassifier {

  /** Hashed-feature extraction: whitespace tokens (lowercased) → FNV
    * index in [0, dim); value = token count / total tokens (L1-norm
    * tf). Returns (id, label, features as (idx → tf) pairs). */
  private def featurize(docs: DataFrame, idCol: String, textCol: String,
                        labelCol: String, dim: Int) = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol), col(labelCol).cast("double"))
      .as[(Long, String, Double)]
      .map { case (id, text, label) =>
        val counts = new java.util.HashMap[Int, Int]()
        var total = 0
        if (text != null) text.toLowerCase.split("\\s+").foreach { w =>
          if (w.nonEmpty) {
            val b = w.getBytes("UTF-8")
            val idx = ((TextHash.hashBytes(b, 0, b.length, TextHash.Seed1) % dim + dim) % dim).toInt
            counts.merge(idx, 1, (a, b2) => a + b2)
            total += 1
          }
        }
        val feats = new Array[(Int, Double)](counts.size)
        var i = 0
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          feats(i) = (e.getKey.intValue(), e.getValue.intValue().toDouble / math.max(total, 1))
          i += 1
        }
        (id, label, feats.sortBy(_._1))
      }
  }

  /** Train: returns the weight vector (index 0..dim-1) plus bias at
    * index dim. `labelCol` must be 0/1. */
  def train(docs: DataFrame, idCol: String, textCol: String, labelCol: String,
            dim: Int = 1 << 15, iters: Int = 20, lr: Double = 2.0,
            l2: Double = 1e-6): Array[Double] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val data = featurize(docs, idCol, textCol, labelCol, dim).cache()
    val n = data.count().toDouble
    var w = new Array[Double](dim + 1) // bias at [dim]
    var iter = 0
    while (iter < iters) {
      val bc = spark.sparkContext.broadcast(w)
      // per-doc error → (featureIdx, doc, grad); bias rides as idx=dim
      val grads = data.flatMap { case (id, label, feats) =>
        val wv = bc.value
        var z = wv(dim)
        feats.foreach { case (idx, v) => z += wv(idx) * v }
        val p = 1.0 / (1.0 + math.exp(-z))
        val err = p - label
        feats.iterator.map { case (idx, v) => (idx, id, err * v) } ++
          Iterator.single((dim, id, err))
      }
      // deterministic accumulation: per feature, docs sorted by id
      val gradRows: Array[(Int, Double)] = grads
        .groupByKey(_._1)
        .flatMapSortedGroups($"_2") { (idx: Int, rows: Iterator[(Int, Long, Double)]) =>
          var acc = 0.0
          rows.foreach { case (_, _, g) => acc += g }
          Iterator.single((idx, acc))
        }.collect()
      val next = w.clone()
      gradRows.foreach { case (idx, g) =>
        next(idx) -= lr * (g / n + (if (idx < dim) l2 * w(idx) else 0.0))
      }
      bc.destroy()
      w = next
      iter += 1
    }
    data.unpersist()
    w
  }

  /** Score every document with a trained model: adds `quality_score`
    * (the sigmoid probability, rounded to 6 decimals) — one narrow
    * pass with the weights broadcast. Filter on it like any Gopher/C4
    * gate. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: Array[Double], dim: Int = 1 << 15): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(weights)
    val scoreUdf = udf { (text: String) =>
      val wv = bc.value
      var z = wv(dim)
      var total = 0
      val counts = new java.util.HashMap[Int, Int]()
      if (text != null) text.toLowerCase.split("\\s+").foreach { word =>
        if (word.nonEmpty) {
          val b = word.getBytes("UTF-8")
          val idx = ((TextHash.hashBytes(b, 0, b.length, TextHash.Seed1) % dim + dim) % dim).toInt
          counts.merge(idx, 1, (a, b2) => a + b2)
          total += 1
        }
      }
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        z += wv(e.getKey.intValue()) * e.getValue.intValue().toDouble / math.max(total, 1)
      }
      math.rint(1.0 / (1.0 + math.exp(-z)) * 1e6) / 1e6
    }
    docs.withColumn("quality_score", scoreUdf(col(textCol)))
  }
}
