package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** r19 optimization gate: the native single-pass text-signal
  * expressions ([[graft.plans.TextSignal]] family) must produce
  * BIT-IDENTICAL output to the original builtin Column formulations
  * they replaced (filter/split HOF chains + regexp passes) — the
  * declared oracles pin the old arithmetic, so equality here is the
  * proof the optimization changed no query's result.
  *
  * The corpus below is adversarial on the exact edges the scanner
  * hand-rolls: every Java-`\s` byte class, leading/trailing/multiple
  * separators, empty and whitespace-only strings, NULLs, CJK in and
  * out of the 0x3040–0x30FF / 0x4E00–0x9FFF ranges, uppercase Unicode
  * with ASCII-adjacent lowercase mappings (Kelvin sign U+212A → 'k',
  * dotted capital I U+0130 → 'i'+combining dot), 4-byte supplementary
  * codepoints, mixed-language stopword collisions ('de', 'la', 'en',
  * 'un', 'que' live in two profiles), and >4-char tokens that must
  * never match a packed stopword. */
class TextSignalSpec extends SparkSpec {
  import spark.implicits._

  private val samples: Seq[String] = Seq(
    "the quick brown fox jumps over the lazy dog and the cat is in the house",
    "el perro corre por la calle y los gatos duermen en la casa de mi madre",
    "der hund läuft über die straße und die katze schläft in dem haus",
    "de la le et les des en un du une que est pour",
    "  leading and trailing   ",
    "\t tab\nnewlinevt\ffeed\rcr mix\r\n",
    "",
    " \t\r\n ",
    "一二三四五六七八九十 漢字 そして ひらがな カタカナ",
    "mixed 漢字 with english the of and tokens",
    "ヿ぀〿䷿一鿿ꀀ", // CJK range boundary chars
    "THE OF AND TO IN IS A THAT IT FOR WAS ON WITH",
    "PARK the kelvin K sign", // U+212A lowercases to ASCII 'k'
    "İN the dotted capital İ", // U+0130 lowers to i + U+0307
    "emoji 😀 and 🎉 supplementary",
    "that that that that that",
    "punctuation, only; here: !?!",
    "numbers 123 456.789 and x9y",
    "de de de la la que", // es/fr stopword tie goes to es (fold order)
    "word " * 40,
    "athatb withs ofthe", // >4-char near-stopwords must not match
    "ÄÖÜ ß ẞ İ K unicode uppercase",
    null)

  private def df = samples.toDF("t")

  // ---- original builtin formulations (pre-r19), kept verbatim here as
  // the reference implementation the oracles were written against
  private def refWsTokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)
  private def refTokenCount(c: Column): Column = size(refWsTokens(c)).cast("long")
  private def refLangScore(toks: Column, words: Seq[String]): Column = {
    val stop = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(stop, lower(t)))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }
  private def refCjkRatio(c: Column): Column = {
    val nonSpace = regexp_replace(c, "\\s+", "")
    length(regexp_replace(nonSpace, "[^\\x{4e00}-\\x{9fff}\\x{3040}-\\x{30ff}]", "")).cast("double") /
      greatest(length(nonSpace), lit(1)).cast("double")
  }
  private def refLangId(c: Column, minScore: Double = 0.05): Column = {
    val toks = refWsTokens(c)
    val prof = graft.plans.TextSignal.profiles
    val scored = prof.map { case (l, ws) => (l, refLangScore(toks, ws)) }
    val best = scored.tail.foldLeft[(Column, Column)]((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (l, s)) => (when(s > bs, lit(l)).otherwise(bl), greatest(s, bs))
    }
    when(refCjkRatio(c) > 0.3, "zh")
      .when(best._2 >= minScore, best._1)
      .otherwise("und")
  }
  private def refAlphaRatio(c: Column): Column =
    length(regexp_replace(lower(c), "[^a-z]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double")
  private def refStopwordRatio(c: Column): Column =
    refLangScore(refWsTokens(c), graft.plans.TextSignal.profiles.head._2)
  private def refMeanTokenLen(c: Column): Column =
    length(regexp_replace(c, "\\s+", "")).cast("double") /
      greatest(refTokenCount(c), lit(1)).cast("double")
  private def refQualityScore(c: Column): Column = {
    val lenOk  = when(length(c).between(50, 100000), 1.0).otherwise(0.0)
    val tokOk  = when(refMeanTokenLen(c).between(3.0, 10.0), 1.0).otherwise(0.0)
    val stopOk = when(refStopwordRatio(c) >= 0.01, 1.0).otherwise(0.0)
    lenOk * 0.25 + tokOk * 0.25 + stopOk * 0.2 + refAlphaRatio(c) * 0.3
  }
  private def refBpeishCount(c: Column): Column =
    size(regexp_extract_all(c, lit(TextAnalysis.bpeishPattern), lit(0))).cast("long")
  private def refFingerprint(c: Column): Column =
    md5(lower(regexp_replace(c, "\\s+", " ")).cast("binary"))

  private def assertSame(name: String, native: Column, ref: Column): Unit = {
    val rows = df.select(col("t"), native.as("n"), ref.as("r")).collect()
    rows.foreach { row =>
      assert(row.isNullAt(1) == row.isNullAt(2),
        s"$name nullability differs on '${row.get(0)}': native=${row.get(1)} ref=${row.get(2)}")
      if (!row.isNullAt(1))
        assert(row.get(1) == row.get(2),
          s"$name differs on '${row.get(0)}': native=${row.get(1)} ref=${row.get(2)}")
    }
  }

  test("wsTokens matches filter(split) on adversarial corpus") {
    assertSame("wsTokens", TextAnalysis.wsTokens(col("t")), refWsTokens(col("t")))
  }
  test("tokenCount matches size(filter(split))") {
    assertSame("tokenCount", TextAnalysis.tokenCount(col("t")), refTokenCount(col("t")))
  }
  test("meanTokenLen matches the regex formulation bit-for-bit") {
    assertSame("meanTokenLen", TextAnalysis.meanTokenLen(col("t")), refMeanTokenLen(col("t")))
  }
  test("alphaRatio matches the lower+regex formulation bit-for-bit") {
    assertSame("alphaRatio", TextAnalysis.alphaRatio(col("t")), refAlphaRatio(col("t")))
  }
  test("stopwordRatio matches the HOF langScore bit-for-bit") {
    assertSame("stopwordRatio", TextAnalysis.stopwordRatio(col("t")), refStopwordRatio(col("t")))
  }
  test("qualityScore matches the composite bit-for-bit") {
    assertSame("qualityScore", TextAnalysis.qualityScore(col("t")), refQualityScore(col("t")))
  }
  test("langId matches the when-chain, including NULL -> 'und'") {
    assertSame("langId", TextAnalysis.langId(col("t")), refLangId(col("t")))
  }
  test("bpeishCount matches regexp_extract_all count") {
    assertSame("bpeishCount", TextAnalysis.bpeishCount(col("t")), refBpeishCount(col("t")))
  }
  test("fingerprint matches md5(lower(ws-collapse))") {
    assertSame("fingerprint", TextAnalysis.fingerprint(col("t")), refFingerprint(col("t")))
  }
}
