package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Language-ID precision over planted samples: the heuristic's
  * SUPPORTED SET is {en, es, de, fr, zh} + 'und' for everything else.
  * Each supported language gets several natural-prose samples that must
  * classify correctly, plus confusable negatives (short strings,
  * numbers, code) that must fall to 'und' rather than misclassify. */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private def idOf(texts: String*): Seq[String] =
    texts.toDF("t").select(TextAnalysis.langId(col("t"))).as[String].collect().toSeq

  test("English prose classifies as en") {
    val got = idOf(
      "the quick brown fox jumps over the lazy dog and the cat is in the house with a friend",
      "it was the best of times and it was the worst of times for all of us in that city",
      "she said that the meeting would be held in the morning and that everyone was welcome to attend")
    assert(got.forall(_ == "en"), s"got $got")
  }

  test("Spanish prose classifies as es") {
    val got = idOf(
      "el perro corre por la calle y los gatos duermen en la casa de mi madre con las ventanas abiertas",
      "la vida es un sueño y los sueños son para que los vivamos con el corazón abierto",
      "en un lugar de la mancha de cuyo nombre no quiero acordarme vivía un hidalgo con una lanza")
    assert(got.forall(_ == "es"), s"got $got")
  }

  test("German prose classifies as de") {
    val got = idOf(
      "der hund läuft über die straße und die katze schläft in dem haus mit den offenen fenstern",
      "das leben ist schön und wir wollen es mit der familie und den freunden genießen",
      "ich habe nicht gewusst dass der zug schon um acht uhr von dem bahnhof abfahren sollte")
    assert(got.forall(_ == "de"), s"got $got")
  }

  test("French prose classifies as fr") {
    val got = idOf(
      "le chien court dans la rue et les chats dorment dans la maison de ma mère avec les fenêtres ouvertes",
      "la vie est un long fleuve tranquille et nous voulons la vivre avec le cœur ouvert",
      "je ne savais pas que le train devait partir de la gare à huit heures du matin avec les voyageurs")
    assert(got.forall(_ == "fr"), s"got $got")
  }

  test("CJK text classifies as zh") {
    val got = idOf(
      "今天天气很好我们一起去公园散步吧",
      "机器学习模型需要大量的训练数据才能取得好的效果")
    assert(got.forall(_ == "zh"), s"got $got")
  }

  test("out-of-set and degenerate inputs fall to und, never misclassify") {
    val got = idOf(
      "1234 5678 9012 3456",                       // numbers
      "xs9f qq7r zz3m kk2p",                       // gibberish
      "SELECT foo FROM bar WHERE baz > 42;",       // code
      "")                                          // empty
    assert(got.forall(_ == "und"), s"got $got")
  }

  test("per-language precision over the mixed planted corpus is 1.0") {
    val samples = Seq(
      ("en", "the house and the dog are in the garden with all of the children"),
      ("en", "we should have been there for the start of the show but it was late"),
      ("es", "los niños juegan en el jardín de la casa con el perro y las flores"),
      ("es", "no sé por qué las cosas son como son pero así es la vida que tenemos"),
      ("de", "die kinder spielen in dem garten mit dem hund und sind sehr glücklich"),
      ("de", "wir haben das buch nicht gelesen weil es zu lang und zu schwer war"),
      ("fr", "les enfants jouent dans le jardin de la maison avec le chien et les fleurs"),
      ("fr", "nous ne savons pas pourquoi les choses sont comme elles sont dans la vie"),
      ("zh", "孩子们在花园里和小狗一起玩耍非常开心"))
      .toDF("expected", "t")
    val scored = samples.select(col("expected"),
      TextAnalysis.langId(col("t")).as("got"))
    val wrong = scored.filter(col("expected") =!= col("got"))
      .collect().map(r => s"${r.getString(0)}->${r.getString(1)}")
    assert(wrong.isEmpty, s"misclassified: ${wrong.mkString(", ")}")
  }
}
