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

  test("batch-trained weights score a STREAM row-identically to batch (ingest-time gate)") {
    // the FineWeb-style deployment: train once offline, gate the
    // firehose at ingest — scoring is one narrow pass, so the same
    // weights run unchanged on a Structured Streaming source
    val train = corpus(400, seed = 5).toDF("doc_id", "text", "label")
    val w = TextClassifier.train(train, "doc_id", "text", "label")
    val fresh = corpus(60, seed = 123)
    val dir = java.nio.file.Files.createTempDirectory("graft_clf_stream").toString
    fresh.zipWithIndex.foreach { case ((id, text, _), i) =>
      java.nio.file.Files.writeString(java.nio.file.Path.of(dir, s"d$i.json"),
        s"""{"doc_id":$id,"text":"$text"}""" + "\n")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val streamed = TextClassifier.score(
      graft.streaming.Streams.fileStream(spark, dir, schema), "doc_id", "text", w)
      .select("doc_id", "quality_score")
    assert(streamed.isStreaming)
    val q = graft.streaming.Streams.toMemorySink(streamed, "clf_stream")
    q.processAllAvailable(); q.stop()
    val got = spark.table("clf_stream").as[(Long, Double)].collect().toSet
    val want = TextClassifier.score(
      fresh.toDF("doc_id", "text", "label"), "doc_id", "text", w)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toSet
    assert(got === want, "streaming scores must be row-identical to batch")
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
