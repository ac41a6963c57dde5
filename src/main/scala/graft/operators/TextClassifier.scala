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
  * vector, a gradient shuffle BOUNDED BY buckets × model size
  * (corpus-size-independent; see [[bucketedLayout]] — the r13 form
  * shuffled one row per (doc, feature), linear but ~7 GB/iteration for
  * the multinomial head at 500k docs, measured in
  * tools/classifier_probe_r14.json), and a dim-sized collect (the
  * MODEL, not data — 2¹⁵ doubles = 256 KB, the BPE-merge-table
  * contract). Iterations are fixed-count, so training cost is iters ×
  * one narrow pass.
  *
  * Determinism: feature hashing is the repo's FNV/splitmix
  * ([[TextHash]]); docs are hash-assigned to a fixed bucket count and
  * sorted by id within each bucket, per-feature partials accumulate in
  * that order, and bucket partials combine in bucket order — so float
  * addition order, and therefore the trained weights, are identical
  * across runs and cluster layouts.
  *
  * r14: [[trainMultinomial]] extends the same machinery to K
  * one-vs-rest heads over hashed CHARACTER N-GRAM features — the
  * fastText language-ID architecture (Joulin et al. 2016,
  * arXiv:1607.01759) — for the learned language-ID curation gate; and
  * scoring/prediction are native Catalyst expressions
  * ([[graft.plans.QualityScore]] / [[graft.plans.LangIdScore]] — the
  * BpeEncode pattern: model in the expression instance, no per-row
  * ScalaUDF boxing), so plans show `graft_quality_score` /
  * `graft_langid` nodes. */
object TextClassifier {

  /** Hashed word-tf features: whitespace tokens (lowercased) → FNV
    * index in [0, dim); value = token count / total tokens (L1-norm
    * tf). Sorted by index — the deterministic-iteration contract. */
  def wordTfFeatures(text: String, dim: Int): Array[(Int, Double)] = {
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
    tfArray(counts, total)
  }

  /** Hashed character n-gram (1–3) features over the
    * whitespace-normalized lowercase text — spaces stay IN the n-grams
    * (word-boundary shapes are the strongest language signal, the
    * fastText langid recipe). Same FNV hash family, same L1-norm tf.
    * `maxChars` caps the featurized prefix: language identity
    * saturates within a couple hundred characters, and the cap bounds
    * the per-doc gradient fan-out regardless of document length (a
    * 100 TB corpus has MB-sized outlier docs; featurization cost must
    * not scale with them). */
  def charNgramFeatures(text: String, dim: Int,
                        maxChars: Int = 200): Array[(Int, Double)] = {
    val counts = new java.util.HashMap[Int, Int]()
    var total = 0
    if (text != null) {
      val norm0 = text.toLowerCase.replaceAll("\\s+", " ").trim
      val norm = if (norm0.length > maxChars) norm0.substring(0, maxChars) else norm0
      // n-grams over CHARS (not bytes) so multi-byte scripts keep their
      // codepoint identity; hash the substring's UTF-8 bytes
      var n = 1
      while (n <= 3) {
        var i = 0
        while (i + n <= norm.length) {
          val b = norm.substring(i, i + n).getBytes("UTF-8")
          val idx = ((TextHash.hashBytes(b, 0, b.length, TextHash.Seed1) % dim + dim) % dim).toInt
          counts.merge(idx, 1, (a, b2) => a + b2)
          total += 1
          i += 1
        }
        n += 1
      }
    }
    tfArray(counts, total)
  }

  private def tfArray(counts: java.util.HashMap[Int, Int], total: Int): Array[(Int, Double)] = {
    val feats = new Array[(Int, Double)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      feats(i) = (e.getKey.intValue(), e.getValue.intValue().toDouble / math.max(total, 1))
      i += 1
    }
    scala.util.Sorting.stableSort(feats, (a: (Int, Double), b: (Int, Double)) => a._1 < b._1)
    feats
  }

  /** Deterministic doc layout for gradient accumulation (r14 — the
    * scale fix the classifier probe receipted): docs are assigned to a
    * FIXED number of hash buckets by id (`HashPartitioner` over the
    * doc id — a pure function of the VALUE, independent of the input's
    * physical partitioning) and sorted by id within each bucket, once,
    * before the iteration loop. Each iteration then computes per-bucket
    * per-feature PARTIAL sums locally in that fixed order, so the
    * gradient shuffle carries at most buckets × model-size rows —
    * corpus-size-INDEPENDENT (the r13 form shuffled one row per
    * (doc, feature, class): linear, but ~7 GB/iteration at 500k docs
    * for the multinomial head, measured in
    * tools/classifier_probe_r14.json) — while the weights stay
    * bit-identical across runs and cluster layouts: bucket membership
    * and intra-bucket order are functions of doc ids only, and bucket
    * partials combine in bucket order. `gradParts` is part of the
    * model identity (a different bucket count is a different — equally
    * valid — float addition order). */
  private def bucketedLayout[T](data: org.apache.spark.sql.Dataset[(Long, T, Array[(Int, Double)])],
                                gradParts: Int)(implicit ct: scala.reflect.ClassTag[T])
      : org.apache.spark.rdd.RDD[(Long, T, Array[(Int, Double)])] =
    data.rdd.map(r => (r._1, r))
      .partitionBy(new org.apache.spark.HashPartitioner(gradParts))
      .mapPartitions(it => it.map(_._2).toArray.sortBy(_._1).iterator,
        preservesPartitioning = true)
      // serialized + disk-spillable: the layout is read iters times and
      // must survive corpora larger than executor memory (recompute
      // would re-featurize per iteration); determinism is unaffected —
      // the content is fixed by doc ids either way
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

  /** One gradient accumulation over a [[bucketedLayout]]: `emit` adds
    * this doc's (key → grad) contributions into the bucket-local
    * accumulator (called in fixed doc order); bucket partials come
    * back as (key, bucket, partial) — AT MOST gradParts × model rows,
    * corpus-size-independent, so they collect directly (one stage per
    * iteration, no reduce shuffle: at small corpora the extra stage
    * was the whole cost, bench-measured) and combine on the driver
    * sorted by bucket. Returns model-sized (key, totalGrad) rows. */
  private def accumulateGrads[T](parted: org.apache.spark.rdd.RDD[(Long, T, Array[(Int, Double)])],
                                 emit: ((Long, T, Array[(Int, Double)]),
                                        java.util.HashMap[Long, Double]) => Unit)
      : Array[(Long, Double)] = {
    val partials: Array[(Long, Int, Double)] =
      parted.mapPartitionsWithIndex { (pid, it) =>
        val acc = new java.util.HashMap[Long, Double]()
        it.foreach(row => emit(row, acc))
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
        acc.forEach { (k, v) => out += ((k.longValue(), pid, v.doubleValue())) }
        out.iterator
      }.collect()
    // combine per key in bucket order — deterministic float addition
    val byKey = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[(Int, Double)]]()
    partials.foreach { case (k, pid, g) =>
      var b = byKey.get(k)
      if (b == null) { b = scala.collection.mutable.ArrayBuffer.empty; byKey.put(k, b) }
      b += ((pid, g))
    }
    val out = new Array[(Long, Double)](byKey.size)
    var i = 0
    val it = byKey.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      var acc = 0.0
      e.getValue.sortBy(_._1).foreach { case (_, g) => acc += g }
      out(i) = (e.getKey.longValue(), acc)
      i += 1
    }
    out
  }

  /** Train: returns the weight vector (index 0..dim-1) plus bias at
    * index dim. `labelCol` must be 0/1. */
  def train(docs: DataFrame, idCol: String, textCol: String, labelCol: String,
            dim: Int = 1 << 15, iters: Int = 20, lr: Double = 2.0,
            l2: Double = 1e-6, gradParts: Int = 32): Array[Double] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val data = docs.select(col(idCol).cast("long"), col(textCol), col(labelCol).cast("double"))
      .as[(Long, String, Double)]
      .map { case (id, text, label) => (id, label, wordTfFeatures(text, dim)) }
    val parted = bucketedLayout(data, gradParts)
    val n = parted.count().toDouble
    var w = new Array[Double](dim + 1) // bias at [dim]
    var iter = 0
    while (iter < iters) {
      val bc = spark.sparkContext.broadcast(w)
      // per-doc error folds into the bucket-local accumulator; bias
      // rides as key=dim
      val gradRows = accumulateGrads[Double](parted, { case ((_, label, feats), acc) =>
        val wv = bc.value
        var z = wv(dim)
        feats.foreach { case (idx, v) => z += wv(idx) * v }
        val p = 1.0 / (1.0 + math.exp(-z))
        val err = p - label
        feats.foreach { case (idx, v) =>
          acc.merge(idx.toLong, err * v, (a, b) => a + b)
        }
        acc.merge(dim.toLong, err, (a, b) => a + b)
      })
      val next = w.clone()
      gradRows.foreach { case (key, g) =>
        val idx = key.toInt
        next(idx) -= lr * (g / n + (if (idx < dim) l2 * w(idx) else 0.0))
      }
      bc.destroy()
      w = next
      iter += 1
    }
    parted.unpersist()
    w
  }

  /** Multinomial (one-vs-rest) training over hashed char n-gram
    * features — the fastText langid shape: K independent logistic
    * heads share one featurization pass; the gradient shuffle carries
    * ((class, featureIdx), doc, grad) rows — K× the binary volume,
    * still LINEAR in corpus size — and accumulation is sorted-group
    * deterministic exactly like [[train]]. Returns (labels sorted
    * ascending, K × (dim+1) weight matrix, bias at [dim]). The model
    * is K·(dim+1) doubles — at the default dim 2¹⁴ and K=5 that is
    * ~640 KB: still the model-not-data collect contract. */
  def trainMultinomial(docs: DataFrame, idCol: String, textCol: String,
                       labelCol: String, dim: Int = 1 << 14, iters: Int = 20,
                       lr: Double = 2.0, l2: Double = 1e-6,
                       maxChars: Int = 200,
                       gradParts: Int = 32): (Array[String], Array[Array[Double]]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val labels = docs.select(col(labelCol).cast("string")).distinct()
      .as[String].collect().sorted
    val k = labels.length
    require(k >= 2, s"trainMultinomial: need >= 2 labels, got ${labels.toSeq}")
    val labelIdx = labels.zipWithIndex.toMap
    val bcLabels = spark.sparkContext.broadcast(labelIdx)
    val data = docs.select(col(idCol).cast("long"), col(textCol), col(labelCol).cast("string"))
      .as[(Long, String, String)]
      .map { case (id, text, label) =>
        (id, bcLabels.value(label), charNgramFeatures(text, dim, maxChars))
      }
    val parted = bucketedLayout(data, gradParts)
    val n = parted.count().toDouble
    var w = Array.fill(k)(new Array[Double](dim + 1))
    var iter = 0
    while (iter < iters) {
      val bc = spark.sparkContext.broadcast(w)
      // composite key (class << 32 | featureIdx); all K heads fold into
      // the same bucket-local accumulator in one doc pass
      val gradRows = accumulateGrads[Int](parted, { case ((_, y, feats), acc) =>
        val wm = bc.value
        var c = 0
        while (c < wm.length) {
          val wv = wm(c)
          var z = wv(dim)
          feats.foreach { case (idx, v) => z += wv(idx) * v }
          val p = 1.0 / (1.0 + math.exp(-z))
          val err = p - (if (y == c) 1.0 else 0.0)
          val base = c.toLong << 32
          feats.foreach { case (idx, v) =>
            acc.merge(base | idx.toLong, err * v, (a, b) => a + b)
          }
          acc.merge(base | dim.toLong, err, (a, b) => a + b)
          c += 1
        }
      })
      val next = w.map(_.clone())
      gradRows.foreach { case (key, g) =>
        val c = (key >>> 32).toInt
        val idx = (key & 0xFFFFFFFFL).toInt
        next(c)(idx) -= lr * (g / n + (if (idx < dim) l2 * w(c)(idx) else 0.0))
      }
      bc.destroy()
      w = next
      iter += 1
    }
    parted.unpersist()
    bcLabels.destroy()
    (labels, w)
  }

  /** Score every document with a trained model: adds `quality_score`
    * (the sigmoid probability, rounded to 6 decimals) — one narrow
    * pass as a NATIVE expression (`graft_quality_score` in plans, no
    * ScalaUDF; the model rides in the expression instance). Filter on
    * it like any Gopher/C4 gate. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: Array[Double], dim: Int = 1 << 15): DataFrame = {
    require(weights.length == dim + 1,
      s"score: weights length ${weights.length} != dim+1 ${dim + 1}")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val expr = ColumnBridge.column(graft.plans.QualityScore(
      ColumnBridge.expression(col(textCol)), weights.toSeq))
    docs.withColumn("quality_score", expr)
  }

  /** Predict the language of every document with a trained multinomial
    * model: adds `lang_pred` (argmax head, first-label-wins ties) —
    * one narrow pass as a native `graft_langid` expression. */
  def predictLang(docs: DataFrame, textCol: String,
                  labels: Array[String], weights: Array[Array[Double]],
                  maxChars: Int = 200): DataFrame = {
    require(labels.length == weights.length,
      s"predictLang: ${labels.length} labels vs ${weights.length} heads")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val expr = ColumnBridge.column(graft.plans.LangIdScore(
      ColumnBridge.expression(col(textCol)),
      labels.toSeq, weights.map(_.toSeq).toSeq, maxChars))
    docs.withColumn("lang_pred", expr)
  }
}
