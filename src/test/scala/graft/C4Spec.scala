package graft

import org.apache.spark.sql.functions._
import graft.functions.C4

/** Rule-by-rule gate for the C4 cleaning panel (Raffel et al. 2020
  * §2.2): each fixture line/page violates exactly one published rule,
  * so a mis-wired threshold or denominator flips a named case. */
class C4Spec extends SparkSpec {
  import spark.implicits._

  private val cfg = C4.Config(badWords = Seq("darn"))

  private def panel(docs: Seq[(String, String)]) =
    docs.toDF("name", "text").select(
      col("name"),
      size(C4.docLines(col("text"))).as("n_lines"),
      size(C4.keptLines(col("text"), cfg)).as("n_kept"),
      C4.cleanedText(col("text"), cfg).as("cleaned"),
      C4.sentenceCount(C4.cleanedText(col("text"), cfg)).as("n_sentences"),
      C4.hasLoremIpsum(col("text")).as("has_lorem"),
      C4.hasBrace(col("text")).as("has_brace"),
      C4.hasBadWord(col("text"), cfg).as("has_badword"))
      .withColumn("keep", C4.pageKeep(col("n_sentences"), col("has_lorem"),
        col("has_brace"), col("has_badword"), cfg))

  test("line rules: terminal punctuation, word floor, javascript") {
    val doc =
      "The sky is blue today.\n" +   // kept
      "ok fine.\n" +                  // 2 words < 3 → dropped
      "This line has no terminal mark\n" + // dropped
      "Is this a question?\n" +       // kept
      "Use of Javascript embedded here.\n" + // javascript token → dropped
      "Another good sentence here!"   // kept
    val r = panel(Seq(("d", doc))).collect().head
    assert(r.getAs[Int]("n_lines") == 6)
    assert(r.getAs[Int]("n_kept") == 3)
    assert(r.getAs[String]("cleaned") ==
      "The sky is blue today.\nIs this a question?\nAnother good sentence here!")
    assert(r.getAs[Int]("n_sentences") == 3)
  }

  test("page rules: sentence floor, lorem ipsum, brace, bad word") {
    val five = (1 to 5).map(i => s"This is sentence number $i.").mkString("\n")
    val four = (1 to 4).map(i => s"This is sentence number $i.").mkString("\n")
    val rows = panel(Seq(
      ("enough", five),
      ("too_few", four),
      ("lorem", five + "\nwith Lorem Ipsum inside."),
      ("brace", five + "\nhas a { brace inside}."),
      ("badword", five + "\nthat is darn good stuff."),
      // closing double quote is a terminal mark in the paper's rule
      ("quote_term", (1 to 5).map(i => s"""He said "number $i."""").mkString("\n"))))
      .collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(rows("enough").getAs[Boolean]("keep"))
    assert(!rows("too_few").getAs[Boolean]("keep"))
    assert(rows("too_few").getAs[Int]("n_sentences") == 4)
    assert(!rows("lorem").getAs[Boolean]("keep"))
    assert(rows("lorem").getAs[Boolean]("has_lorem"))
    assert(!rows("brace").getAs[Boolean]("keep"))
    assert(rows("brace").getAs[Boolean]("has_brace"))
    assert(!rows("badword").getAs[Boolean]("keep"))
    assert(rows("badword").getAs[Boolean]("has_badword"))
    // bad-word match is whole-token: "darning" must NOT hit
    val ok = panel(Seq(("x", five + "\nshe kept darning socks quietly.")))
      .collect().head
    assert(!ok.getAs[Boolean]("has_badword"))
    assert(rows("quote_term").getAs[Int]("n_kept") == 5)
  }

  test("panel is one narrow stage — no exchange in the plan") {
    val plan = panel(Seq(("d", "a."))).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
