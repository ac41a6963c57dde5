package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.plans.RepetitionPanel

/** Property tests for the 13-signal repetition panel against a
  * straightforward STRING-KEYED reference implementation — random
  * small-vocab documents force genuine duplicate lines/paragraphs and
  * n-gram repetition, and the string-keyed reference cross-checks the
  * expression's 64-bit hash keying on top of the arithmetic. */
object RepetitionProps extends Properties("RepetitionPanel") {

  // tiny vocab + mixed separators → real dup lines, paras and n-grams.
  // The control-char words (0x1C–0x1F file/group/record/unit separators,
  // present in real web crawls) pin the unified whitespace contract:
  // Java-regex \s does NOT split on them, and after r13 neither do the
  // native byte-tokenizers (Character.isWhitespace used to). A word
  // ENDING in 0x1C also exercises the segment trim set — the documented
  // {' ','\t','\r','\n'} only, NOT String.trim's ≤0x20 sweep.
  private val word = Gen.oneOf("a", "bb", "ccc", "dd", "e", "ffff",
    "agg", "b", "cc", "dd")
  private val sep = Gen.frequency(5 -> " ", 1 -> "\t", 2 -> "\n", 1 -> "\n\n")
  private val doc: Gen[String] = for {
    n <- Gen.choose(0, 60)
    ws <- Gen.listOfN(n, word)
    ss <- Gen.listOfN(math.max(n - 1, 0), sep)
  } yield if (ws.isEmpty) "" else
    ws.head + ss.zip(ws.tail).map { case (s, w) => s + w }.mkString

  // the panel's documented trim set is exactly {' ','\t','\r','\n'} —
  // String.trim would also sweep 0x1C–0x1F and hide a contract break
  private def trimSeg(s: String): String = {
    var a = 0; var b = s.length
    def ws(c: Char) = c == ' ' || c == '\t' || c == '\r' || c == '\n'
    while (a < b && ws(s.charAt(a))) a += 1
    while (b > a && ws(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  private def segDup(parts: Seq[String]): (Double, Double) = {
    val segs = parts.map(trimSeg).filter(_.nonEmpty)
    var seen = Set.empty[String]
    var total = 0L; var chars = 0L; var dup = 0L; var dupChars = 0L
    segs.foreach { g =>
      total += 1; chars += g.length
      if (seen(g)) { dup += 1; dupChars += g.length } else seen += g
    }
    (if (total == 0) 0.0 else dup.toDouble / total,
     if (chars == 0) 0.0 else dupChars.toDouble / chars)
  }

  private def ref(s: String): Array[Double] = {
    val out = new Array[Double](13)
    val (dlf, dlcf) = segDup(s.split('\n').toSeq)
    val (dpf, dpcf) = segDup(s.split("\n\n").toSeq)
    out(0) = dlf; out(1) = dlcf; out(2) = dpf; out(3) = dpcf
    val toks = s.split("\\s+").filter(_.nonEmpty)
    val lens = toks.map(_.length)
    val offs = lens.scanLeft(0L)(_ + _)
    val total = lens.map(_.toLong).sum
    for (n <- 2 to 10) {
      val windows = toks.length - n + 1
      if (windows <= 0 || total == 0) out(n + 2) = 0.0
      else {
        val keys = (0 until windows).map(i => toks.slice(i, i + n).mkString("\u0001"))
        val counts = keys.groupBy(identity).map { case (k, v) => k -> v.size }
        if (n <= 4) {
          val mc = counts.values.max
          val best = (0 until windows)
            .filter(i => counts(keys(i)) == mc)
            .map(i => mc.toLong * (offs(i + n - 1) + lens(i + n - 1) - offs(i)))
            .max
          out(n + 2) = best.toDouble / total
        } else {
          var covered = 0L; var curEnd = Long.MinValue
          (0 until windows).foreach { i =>
            if (counts(keys(i)) >= 2) {
              val st = offs(i); val en = offs(i + n - 1) + lens(i + n - 1)
              val from = math.max(st, curEnd)
              if (en > from) covered += en - from
              if (en > curEnd) curEnd = en
            }
          }
          out(n + 2) = covered.toDouble / total
        }
      }
    }
    out
  }

  private def evalPanel(s: String): Array[Double] = {
    val row = RepetitionPanel(Literal(UTF8String.fromString(s)))
      .eval(null).asInstanceOf[InternalRow]
    (0 until 13).map(row.getDouble).toArray
  }

  property("all 13 signals equal the string-keyed reference") =
    Prop.forAll(doc) { s =>
      val got = evalPanel(s)
      val want = ref(s)
      val ok = got.sameElements(want)
      if (!ok) println(s"panel mismatch on ${s.replace("\n", "\\n")}:\n  got =${got.toSeq}\n  want=${want.toSeq}")
      ok
    }
}
