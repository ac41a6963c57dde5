package graft

import org.apache.spark.sql.functions._
import graft.functions.Gopher

/** Per-rule discrimination gate for the Gopher panel: one crafted doc
  * per rule violates EXACTLY that rule against the paper's published
  * thresholds (word floor lowered so short fixtures are in-band), so a
  * signal wired to the wrong threshold or denominator flips a specific
  * named case, not a diffuse count. */
class GopherSpec extends SparkSpec {
  import spark.implicits._

  // paper thresholds except the word floor (fixtures are short)
  private val th = Gopher.Thresholds(minWords = 5)

  private val clean =
    "the quick brown fox jumps over that lazy dog tail with vigor and haste"

  private val docs = Seq(
    ("clean", clean),
    ("too_short", "the with dogs"), // 3 words < 5; all other rules in-band
    ("long_words", "extraordinarily incomprehensibilities " +
      "internationalization the of countercharacterizations " +
      "electroencephalographically"), // mean word len 16 > 10
    // 6 ellipses / 13 words = 0.46 ≥ 0.1, but line ends plain and every
    // token keeps a letter, so ONLY the symbol rule trips
    ("symbols", "the cat... of dog... and bird... that fish... " +
      "with worm... have fun... ok"),
    // 5/5 bullet lines; alpha 20/25 = 0.8 stays AT the floor (≥ passes)
    ("bullets", "- the weather looks nice\n- of course indeed friend\n" +
      "- and people gather there\n- that market opens early\n" +
      "- with music playing loud"),
    // 1/3 ellipsis lines = 0.33 > 0.3, but 1 ellipsis / 17 words < 0.1
    ("ellipses", "the end came slowly and then...\n" +
      "of all the things we saw here\nthat day with friends"),
    ("numeric", "the 1111 2222 3333 4444 5555 6666 7777 8888 of"), // alpha 0.2
    ("no_stops", "quick brown fox jumps over lazy dog again")) // 0 stop hits

  private def panel() = {
    val t = col("text")
    docs.toDF("name", "text").select(
      col("name"),
      graft.functions.TextAnalysis.tokenCount(t).as("n_words"),
      graft.functions.TextAnalysis.meanTokenLen(t).as("mean_word_len"),
      Gopher.symbolRatio(t).as("symbol_ratio"),
      Gopher.bulletLineFrac(t).as("bullet_frac"),
      Gopher.ellipsisLineFrac(t).as("ellipsis_frac"),
      Gopher.alphaWordFrac(t).as("alpha_word_frac"),
      Gopher.stopHits(t, th.stopWords).as("stop_hits"))
      .withColumn("pass", Gopher.passes(col("n_words"),
        col("mean_word_len"), col("symbol_ratio"), col("bullet_frac"),
        col("ellipsis_frac"), col("alpha_word_frac"), col("stop_hits"), th))
  }

  test("each fixture violates exactly its own rule") {
    val rows = panel().collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(rows("clean").getAs[Boolean]("pass"))
    for (bad <- docs.map(_._1).filter(_ != "clean"))
      assert(!rows(bad).getAs[Boolean]("pass"), s"$bad should fail")
    // and the violated signal is the expected one
    assert(rows("too_short").getAs[Long]("n_words") == 3L)
    assert(rows("long_words").getAs[Double]("mean_word_len") > 10.0)
    assert(rows("symbols").getAs[Double]("symbol_ratio") >= 0.1)
    assert(rows("bullets").getAs[Double]("bullet_frac") > 0.9)
    assert(rows("ellipses").getAs[Double]("ellipsis_frac") > 0.3)
    assert(rows("numeric").getAs[Double]("alpha_word_frac") < 0.8)
    assert(rows("no_stops").getAs[Int]("stop_hits") < 2)
  }

  test("signal values are exact on the clean fixture") {
    val r = panel().filter(col("name") === "clean").collect().head
    assert(r.getAs[Long]("n_words") == 14L)
    assert(r.getAs[Double]("symbol_ratio") == 0.0)
    assert(r.getAs[Double]("bullet_frac") == 0.0)
    assert(r.getAs[Double]("ellipsis_frac") == 0.0)
    assert(r.getAs[Double]("alpha_word_frac") == 1.0)
    // distinct stop hits: the, that, with, and = 4 of the paper's 8
    assert(r.getAs[Int]("stop_hits") == 4)
  }

  test("panel is a single narrow stage — no exchange in the plan") {
    val plan = panel().queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
