package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.Multimodal

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("topTokenFraction measures within-document repetition") {
    val df = Seq(
      (1L, "a a a a"),            // one token dominates: 1.0
      (2L, "a b c d"),            // all distinct: 0.25
      (3L, "spam spam spam x y"), // 3/5
      (4L, "")                    // empty: 0
    ).toDF("id", "text")
    val f = df.select(col("id"), TextAnalysis.topTokenFraction(col("text")).as("f"))
      .as[(Long, Double)].collect().toMap
    assert(f(1L) == 1.0 && f(2L) == 0.25 && f(3L) == 0.6 && f(4L) == 0.0)
  }

  test("redactPii replaces emails, phones, IPs and card numbers") {
    val df = Seq((1L,
      "mail bob.smith+x@corp.example.org or (415) 555-1234, host 192.168.0.1, card 4111111111111111 ok"))
      .toDF("id", "text")
    val out = df.select(TextAnalysis.redactPii(col("text"))).as[String].collect()(0)
    assert(out == "mail <EMAIL> or <PHONE>, host <IP>, card <NUMBER> ok")
    // short digit runs and plain words untouched
    val clean = df.select(TextAnalysis.redactPii(lit("order 12345 from alice"))).as[String].collect()(0)
    assert(clean == "order 12345 from alice")
  }

  test("contamination finds corpus docs overlapping the benchmark set") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog tonight")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix then the quick brown fox jumps over the lazy dog tonight suffix"), // contains benchmark
      (2L, "completely unrelated content about query engines and shuffle plans"),
      (100L, "the quick brown fox jumps over the lazy dog tonight") // benchmark itself: excluded
    ).toDF("doc_id", "text")
    val hits = graft.operators.Dedup.contamination(corpus, bench, "doc_id", "text",
        shingleN = 12, minShared = 5)
      .select("corpus_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((1L, 100L)))
  }

  test("langId identifies stopword-heavy samples and CJK") {
    val df = Seq(
      (1L, "the cat sat on the mat and it was happy with the sun"),
      (2L, "la casa de el perro que se fue por las calles de la ciudad"),
      (3L, "der hund und die katze sind in den garten von dem haus"),
      (4L, "le chat et le chien sont dans la maison de les amis pour une fete"),
      (5L, "今天天气很好我们去公园"),
      (6L, "zzz qqq xxx vvv kkk")
    ).toDF("id", "text")
    val preds = df.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(preds(1L) == "en")
    assert(preds(2L) == "es")
    assert(preds(3L) == "de")
    assert(preds(4L) == "fr")
    assert(preds(5L) == "zh")
    assert(preds(6L) == "und")
  }

  test("quality score rewards prose, penalizes garbage") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs into the forest while the sun sets slowly"),
      (2L, "@@@@ #### $$$$ 1234 %%%% ^^^^ &&&& !!!!")
    ).toDF("id", "text")
    val q = df.select(col("id"), TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(q(1L) > 0.8, s"prose scored ${q(1L)}")
    assert(q(2L) < 0.4, s"garbage scored ${q(2L)}")
  }

  test("token counts: whitespace vs bpe-ish") {
    val df = Seq((1L, "hello world, it's 2024!")).toDF("id", "text")
    val (ws, bp) = df.select(
      TextAnalysis.tokenCount(col("text")).as("ws"),
      TextAnalysis.bpeishCount(col("text")).as("bp"))
      .as[(Long, Long)].collect()(0)
    assert(ws == 4)
    // hello | world | , | it | ' | s | 2024 | !
    assert(bp == 8)
  }

  test("fingerprint is whitespace/case-insensitive; rollingHash is content-sensitive") {
    val df = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "hello worlds")
    ).toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(2L) != fps(3L))
    val rh = df.select(col("id"), TextAnalysis.rollingHash(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(rh(2L) != rh(3L))
    assert(rh.values.forall(h => h >= 0 && h < (1L << 50)))
  }

  test("multimodal: payload bytes + typed meta struct") {
    val df = Seq((1L, "some content"), (2L, "other content")).toDF("id", "text")
    val media = Multimodal.toMedia(df, "text", "text")
    val meta = media
      .select(col("id"), col("media.modality").as("m"), col("media.n_bytes").as("b"))
      .as[(Long, String, Long)].collect()
      .map { case (id, m, b) => id -> (m, b) }.toMap
    assert(meta(1L) == ("text", "some content".getBytes("UTF-8").length.toLong))
    assert(meta(2L)._1 == "text")
    assert(media.schema("payload").dataType.typeName == "binary")
  }

  test("multimodal feature extraction: schema, dim, determinism") {
    val df = Seq((1L, "some content"), (2L, "other content")).toDF("id", "text")
    val media = Multimodal.toMedia(df, "text", "text")
    val feats1 = Multimodal.extractFeatures(spark, media, "payload", dim = 8)
    assert(feats1.schema("features").dataType.typeName == "array")
    val rows1 = feats1.select("id", "features").as[(Long, Seq[Float])].collect().toMap
    val rows2 = Multimodal.extractFeatures(spark, media, "payload", dim = 8)
      .select("id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(rows1(1L).size == 8)
    assert(rows1 == rows2, "stub decode must be deterministic")
    assert(rows1(1L) != rows1(2L), "different payloads → different features")
  }

  test("frameSample explodes every stride-th frame index") {
    val df = Seq((1L, 10)).toDF("id", "n_frames")
    val frames = Multimodal.frameSample(df, "n_frames", stride = 3)
      .select("frame_idx").as[Int].collect()
    assert(frames === Array(0, 3, 6, 9))
  }
}
