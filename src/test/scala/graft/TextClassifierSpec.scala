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
    // layout-independence: a different physical partitioning must yield
    // bit-identical weights (the bucketed-gradient contract — bucket
    // membership and order are functions of doc ids, not input layout)
    val w3 = TextClassifier.train(
      corpus(400, seed = 5).toDF("doc_id", "text", "label").repartition(3),
      "doc_id", "text", "label")
    assert(w3.toSeq === w1.toSeq, "weights must not depend on input partitioning")
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

  // ------------------------------------------------- r14: multinomial langid

  // five synthetic languages with real per-language stopword/char
  // profiles (accents, umlauts, eszett, CJK) — separable by char
  // n-grams the way natural languages are
  private def langCorpus(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val vocab = Map(
      "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was",
        "with", "house", "water", "small", "street", "year"),
      "es" -> Seq("de", "la", "que", "el", "en", "los", "del", "se", "las",
        "por", "casa", "agua", "pequeño", "año", "calle"),
      "de" -> Seq("der", "die", "und", "den", "von", "zu", "das", "mit",
        "sich", "auf", "haus", "wasser", "klein", "straße", "jahr"),
      "fr" -> Seq("le", "la", "et", "les", "des", "un", "du", "une", "est",
        "pour", "maison", "eau", "petit", "année", "rue"),
      "zh" -> Seq("的", "是", "在", "了", "有", "和", "人", "这", "中",
        "大", "水", "小", "房", "年", "街"))
    val langs = vocab.keys.toSeq.sorted
    (0 until n).map { i =>
      val lang = langs(i % langs.length)
      val words = (0 until 20).map(_ => vocab(lang)(rnd.nextInt(vocab(lang).length)))
      (i.toLong, words.mkString(" "), lang)
    }
  }

  test("multinomial langid: 5 languages to >= 0.95 held-out accuracy; training deterministic") {
    val train = langCorpus(500, seed = 5).toDF("doc_id", "text", "lang").repartition(8)
    val (labels1, w1) = TextClassifier.trainMultinomial(
      train, "doc_id", "text", "lang", iters = 15)
    val (labels2, w2) = TextClassifier.trainMultinomial(
      train, "doc_id", "text", "lang", iters = 15)
    assert(labels1.toSeq === Seq("de", "en", "es", "fr", "zh")) // sorted contract
    assert(labels2.toSeq === labels1.toSeq)
    assert(w1.map(_.toSeq).toSeq === w2.map(_.toSeq).toSeq,
      "multinomial training must be bit-deterministic")
    val heldOut = langCorpus(250, seed = 99).toDF("doc_id", "text", "lang")
    val pred = TextClassifier.predictLang(heldOut, "text", labels1, w1)
      .select("lang", "lang_pred").as[(String, String)].collect()
    val acc = pred.count { case (l, p) => l == p }.toDouble / pred.length
    val confusion = pred.groupBy(identity).view.mapValues(_.length).toSeq.sorted
    info(f"held-out accuracy = $acc%.3f; confusion = ${confusion.mkString(", ")}")
    assert(acc >= 0.95, f"langid accuracy $acc%.3f below floor")
  }

  test("score and predictLang compile to native expressions (no ScalaUDF in the plan)") {
    // range-based source: a local Seq would fold into a LocalTableScan
    // and hide the expression from the executed plan
    val df = spark.range(4).selectExpr("id AS doc_id", "concat('text ', id) AS text")
    val dim = 1 << 10
    val plan1 = TextClassifier.score(df, "doc_id", "text",
      new Array[Double](dim + 1), dim).queryExecution.executedPlan.toString
    assert(plan1.contains("graft_quality_score"), plan1)
    assert(!plan1.contains("UDF"), plan1)
    val heads = Array(new Array[Double](dim + 1), new Array[Double](dim + 1))
    val plan2 = TextClassifier.predictLang(df, "text", Array("a", "b"), heads)
      .queryExecution.executedPlan.toString
    assert(plan2.contains("graft_langid"), plan2)
    assert(!plan2.contains("UDF"), plan2)
  }

  test("langid tie-break is deterministic: all-zero heads predict the first sorted label") {
    val df = Seq((1L, "whatever"), (2L, "else")).toDF("doc_id", "text")
    val dim = 1 << 8
    val heads = Array(new Array[Double](dim + 1), new Array[Double](dim + 1),
      new Array[Double](dim + 1))
    val got = TextClassifier.predictLang(df, "text", Array("aa", "bb", "cc"), heads)
      .select("lang_pred").as[String].collect().toSeq
    assert(got === Seq("aa", "aa"))
  }
}
