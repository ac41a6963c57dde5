package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** Calibration gate for DSIR importance weights + Gumbel resampling.
  * The reference is an INDEPENDENT driver-side implementation written
  * straight from Xie et al. 2023's formula (hashed bag-of-grams models,
  * add-one smoothing, log-ratio sum; Gumbel-max selection), sharing no
  * code with the operator — agreement means the distributed form
  * reproduces the published method, not itself. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val docs = Seq(
    // target-ish docs: clean prose sharing vocabulary
    (1L, "the quick brown fox jumps over the lazy dog", true),
    (2L, "the lazy dog sleeps while the quick fox runs", true),
    (3L, "a quick brown dog and a lazy fox", true),
    // raw pool: webby noise, partly overlapping
    (4L, "click here buy now cheap deals click here", false),
    (5L, "the quick brown fox visits the cheap deals page", false),
    (6L, "xyzzy qwerty asdf zxcv qwerty xyzzy", false),
    (7L, "the dog runs over the brown fox again and again", false))

  private def refGrams(text: String): Seq[String] = {
    val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    t ++ t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
  }

  private def refWeights(rows: Seq[(Long, String, Boolean)]): Map[Long, Double] = {
    val B = 4096
    val bucketed = rows.map { case (id, text, tgt) =>
      (id, tgt, refGrams(text).map(g => md5hex(g).substring(0, 3)))
    }
    val cr = bucketed.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = bucketed.filter(_._2).flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nr = cr.values.sum.toDouble
    val nt = ct.values.sum.toDouble
    bucketed.map { case (id, _, bs) =>
      val w = bs.groupBy(identity).map { case (b, occ) =>
        occ.size * (math.log((ct.getOrElse(b, 0L) + 1) / (nt + B)) -
                    math.log((cr(b) + 1) / (nr + B)))
      }.sum
      id -> w
    }.toMap
  }

  private lazy val df = docs.map { case (id, t, tgt) =>
    (id, t, if (tgt) "src1" else "src9")
  }.toDF("doc_id", "text", "source")

  private lazy val got = Dsir.importanceWeights(
      df, "doc_id", "text", substring(col("source"), 4, 10).cast("int") < 4)
    .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("weights match the independent reference on every doc") {
    val want = refWeights(docs.map { case (id, t, tgt) => (id, t, tgt) })
    assert(got.keySet === want.keySet)
    got.foreach { case (id, w) =>
      assert(math.abs(w - want(id)) < 1e-9, s"doc $id: $w vs ${want(id)}")
    }
  }

  test("target-like docs outweigh disjoint-vocabulary noise") {
    // raw log-weights are per-doc SUMS (length-sensitive, as in the
    // paper), so compare per-gram averages across docs
    def perGram(id: Long): Double =
      got(id) / refGrams(docs.find(_._1 == id).get._2).size
    // doc 2 shares the target's vocabulary; doc 6 shares none of it
    assert(perGram(2L) > perGram(6L))
    // overlapping doc 5 sits between pure-target and pure-noise
    assert(perGram(5L) > perGram(6L) && perGram(5L) < perGram(2L))
  }

  test("gumbelTopK is the reference Gumbel-max draw, deterministically") {
    val w = Dsir.importanceWeights(
      df, "doc_id", "text", substring(col("source"), 4, 10).cast("int") < 4)
    val pick = Dsir.gumbelTopK(w, "doc_id", "dsir_logw", k = 3,
      temperature = 2.0)
    val gotIds = pick.select("doc_id").as[Long].collect().toSeq
    val refW = refWeights(docs.map { case (id, t, tgt) => (id, t, tgt) })
    val refPick = refW.toSeq.map { case (id, lw) =>
      val u = java.lang.Long.parseLong(md5hex(s"dsir:$id").substring(0, 12), 16) /
        math.pow(2, 48)
      (id, lw / 2.0 - math.log(-math.log(u)))
    }.sortBy { case (id, k) => (-k, id) }.take(3).map(_._1)
    assert(gotIds.toSet === refPick.toSet)
    // and the draw is identical run to run (deterministic noise)
    val again = Dsir.gumbelTopK(w, "doc_id", "dsir_logw", k = 3,
      temperature = 2.0).select("doc_id").as[Long].collect().toSeq
    assert(again === gotIds)
  }
}
