package graft

import org.apache.spark.sql.functions._
import graft.operators.Records
import graft.plans.FuzzyHash

/** CTPH fuzzy hashing (NiFi FuzzyHashContent analog): localized edits
  * must leave most of the digest intact; unrelated content must not. */
class FuzzyHashSpec extends SparkSpec {
  import spark.implicits._

  private def doc(seed: Int, words: Int = 600): String = {
    val rnd = new scala.util.Random(seed)
    (1 to words).map(_ => s"w${rnd.nextInt(5000)}").mkString(" ")
  }

  test("digest is deterministic, formatted, and length-bounded") {
    val d = doc(1)
    val df = Seq(d, d, "").toDF("text")
    val hs = Records.fuzzyHashContent(df, "text")
      .select("fuzzy_hash").as[String].collect()
    assert(hs(0) === hs(1), "same content, same digest")
    val parts = hs(0).split(":", -1)
    assert(parts.length === 3 && parts(0).toLong >= 3)
    assert(parts(1).length <= FuzzyHash.DigestChars &&
           parts(1).length >= FuzzyHash.DigestChars / 2)
    assert(hs(2).matches("3::"), "empty content digest")
  }

  test("a localized edit keeps high similarity; unrelated content scores low") {
    val base = doc(7)
    val edited = base.replace("w", "x") // every token touched — heavy edit
    val oneEdit = {
      val words = base.split(" ")
      words(words.length / 2) = "CHANGED"
      words.mkString(" ")
    }
    val df = Seq(
      ("identical", base, base),
      ("one_edit", base, oneEdit),
      ("unrelated", base, doc(99)),
      ("heavy", base, edited)
    ).toDF("case", "a", "b")
    val scored = Records.fuzzyHashContent(
        Records.fuzzyHashContent(df, "a", "ha"), "b", "hb")
      .select(col("case"),
        Records.fuzzyHashSimilarity(col("ha"), col("hb")).as("sim"))
      .as[(String, Double)].collect().toMap
    assert(scored("identical") === 100.0)
    assert(scored("one_edit") >= 70.0,
      s"one localized edit must keep most chunks: ${scored("one_edit")}")
    assert(scored("unrelated") <= 40.0,
      s"unrelated docs must not look similar: ${scored("unrelated")}")
    assert(scored("one_edit") > scored("unrelated"))
  }

  test("block size scales with content length; adjacent sizes stay comparable") {
    val short = doc(3, words = 40)
    val long = doc(3, words = 40) + " " + doc(4, words = 40) // prefix shared
    val df = Seq((short, long)).toDF("a", "b")
    val (bsA, bsB) = Records.fuzzyHashContent(
        Records.fuzzyHashContent(df, "a", "ha"), "b", "hb")
      .select(split(col("ha"), ":").getItem(0).cast("long"),
              split(col("hb"), ":").getItem(0).cast("long"))
      .as[(Long, Long)].head()
    assert(bsA >= 3 && bsB >= bsA, "block size grows (or holds) with length")
    assert(FuzzyHash.initialBlockSize(100) === 3)
    assert(FuzzyHash.initialBlockSize(3 * 64 * 8) === 24)
  }

  test("graft_fuzzy_hash is registered in SQL") {
    val out = spark.sql("SELECT graft_fuzzy_hash('hello world of fuzzy hashing') AS h")
      .as[String].head()
    assert(out.matches("\\d+:.*:.*"))
  }
}
