package graft

import org.apache.spark.sql.functions._
import graft.operators.TextClassifier

/** Gates for the classifier-based quality filter: a separable
  * synthetic corpus must be learned to high accuracy, training must be
  * bit-deterministic (the sorted-group gradient contract), and scoring
  * must rank held-out positives above negatives. */
class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  // "high quality" docs carry editorial vocabulary; "low quality" carry
  // boilerplate/spam markers — disjoint marker sets over a shared base
  private def corpus(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val base = Seq("the", "data", "of", "and", "a", "to", "in", "is")
    val good = Seq("analysis", "method", "results", "study", "evidence", "theory")
    val bad = Seq("click", "subscribe", "winner", "free", "buy", "casino")
    (0 until n).map { i =>
      val label = i % 2
      val markers = if (label == 1) good else bad
      val words = (0 until 12).map(_ => base(rnd.nextInt(base.length))) ++
        (0 until 4).map(_ => markers(rnd.nextInt(markers.length)))
      (i.toLong, rnd.shuffle(words).mkString(" "), label)
    }
  }

  test("learns a separable quality signal to >= 0.95 accuracy; training is deterministic") {
    val train = corpus(400, seed = 5).toDF("doc_id", "text", "label").repartition(8)
    val w1 = TextClassifier.train(train, "doc_id", "text", "label")
    val w2 = TextClassifier.train(train, "doc_id", "text", "label")
    assert(w1.toSeq === w2.toSeq, "training must be bit-deterministic")
    // held-out accuracy (fresh seed => unseen word mixes)
    val test = corpus(200, seed = 99).toDF("doc_id", "text", "label")
    val scored = TextClassifier.score(test, "doc_id", "text", w1)
      .select(col("label"), (col("quality_score") > 0.5).cast("int").as("pred"))
      .as[(Int, Int)].collect()
    val acc = scored.count { case (l, p) => l == p }.toDouble / scored.length
    info(f"held-out accuracy = $acc%.3f")
    assert(acc >= 0.95, f"accuracy $acc%.3f below floor")
  }

  test("scores are a usable gate: positives rank above negatives with a wide margin") {
    val train = corpus(400, seed = 5).toDF("doc_id", "text", "label")
    val w = TextClassifier.train(train, "doc_id", "text", "label")
    val scored = TextClassifier.score(
      corpus(200, seed = 7).toDF("doc_id", "text", "label"), "doc_id", "text", w)
    // threshold-free ranking gate (AUC = 1 on separable data): every
    // positive must outscore every negative — what a keep-the-top-X%
    // curation cut actually relies on
    val byLabel = scored.select("label", "quality_score")
      .as[(Int, Double)].collect().groupBy(_._1)
    val minPos = byLabel(1).map(_._2).min
    val maxNeg = byLabel(0).map(_._2).max
    assert(minPos > maxNeg,
      s"ranking not separable: min(pos)=$minPos <= max(neg)=$maxNeg")
    // determinism of scoring
    val a = scored.select("doc_id", "quality_score").as[(Long, Double)].collect().toSet
    val b = TextClassifier.score(
      corpus(200, seed = 7).toDF("doc_id", "text", "label"), "doc_id", "text", w)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toSet
    assert(a === b)
  }
}
