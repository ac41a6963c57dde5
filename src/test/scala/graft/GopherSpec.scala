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

  // ------------------------------------------------ repetition panel
  // Hand-computed fixtures for every signal family of the A1.1.2 panel
  // (plans.RepetitionPanel documents the exact semantics under test).

  private def repPanel(text: String): Map[String, Double] = {
    val row = Seq(text).toDF("text")
      .select(Gopher.repetitionPanel(col("text")).as("p"))
      .select(graft.plans.RepetitionPanel.fieldNames.map(f => col(s"p.$f")): _*)
      .collect().head
    graft.plans.RepetitionPanel.fieldNames.zipWithIndex
      .map { case (f, i) => f -> row.getDouble(i) }.toMap
  }

  test("repetition: duplicate lines by count and by chars") {
    val p = repPanel("a b\nc d\na b")
    // lines [a b, c d, a b] → 1 of 3 duplicate; chars 3+3+3, dup 3
    assert(p("dup_line_frac") == 1.0 / 3)
    assert(p("dup_line_char_frac") == 3.0 / 9)
    assert(p("dup_para_frac") == 0.0) // single paragraph
    // tokens a b c d a b (6 chars): top 2-gram (a,b) ×2, charlen 2 → 4/6
    assert(p("top2_frac") == 4.0 / 6)
    assert(p("top3_frac") == 3.0 / 6)  // all 3-grams ×1, charlen 3
    assert(p("top4_frac") == 4.0 / 6)
    assert(p("dup5_frac") == 0.0)      // abcda / bcdab both unique
  }

  test("repetition: paragraph duplicates include interior newlines") {
    val p = repPanel("a b\nc d\n\na b\nc d")
    // paragraphs [a b\nc d] ×2 → 1 of 2 dup; para len 7 each (with \n)
    assert(p("dup_para_frac") == 1.0 / 2)
    assert(p("dup_para_char_frac") == 7.0 / 14)
    // lines [a b, c d, a b, c d] → 2 of 4 dup
    assert(p("dup_line_frac") == 2.0 / 4)
    assert(p("dup_line_char_frac") == 6.0 / 12)
  }

  test("repetition: overlapping dup n-gram spans union, not double-count") {
    val p = repPanel("x x x x x x")
    // the 5-gram xxxxx occurs at 0 and 1: spans [0,5)∪[1,6) = 6 of 6
    assert(p("dup5_frac") == 1.0)
    assert(p("dup6_frac") == 0.0) // single 6-gram occurrence
    // top 2-gram (x,x) ×5 · charlen 2 = 10/6 — uncapped, like the
    // published implementations (threshold compare unaffected)
    assert(p("top2_frac") == 10.0 / 6)
  }

  test("repetition: top n-gram count ties break on char coverage") {
    val p = repPanel("aaa b aaa b cc d cc d")
    // (aaa,b) ×2 charlen 4 beats (cc,d) ×2 charlen 3 → 8 of 14 chars
    assert(p("top2_frac") == 8.0 / 14)
    assert(p("dup5_frac") == 0.0) // all 5-grams distinct
  }

  test("repetition: disjoint dup spans add up; empty text is all-zero") {
    val p = repPanel("p q r s t u p q r s t")
    // pqrst at [0,5) and [6,11) — disjoint union 10 of 11 chars
    assert(p("dup5_frac") == 10.0 / 11)
    assert(p("dup6_frac") == 0.0)
    val z = repPanel("")
    assert(graft.plans.RepetitionPanel.fieldNames.forall(f => z(f) == 0.0))
  }

  test("repetition panel evaluates ONCE for all 13 projected fields") {
    // text must depend on a non-literal column, or constant folding
    // collapses the whole projection before the plan is inspectable
    val df = spark.range(1)
      .select(concat(lit("a b\nc d x"), col("id")).as("text"))
      .select(col("text"), Gopher.repetitionPanel(col("text")).as("p"))
      .select(graft.plans.RepetitionPanel.fieldNames.map(f => col(s"p.$f")): _*)
    val plan = df.queryExecution.executedPlan.toString
    val hits = "graft_repetition_panel".r.findAllIn(plan).size
    assert(hits == 1, s"panel inlined $hits times — CollapseProject regressed:\n$plan")
    assert(!plan.contains("Exchange"))
  }
}
