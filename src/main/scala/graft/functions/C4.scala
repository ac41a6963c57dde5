package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer",
  * arXiv:1910.10683 §2.2) — the line- and page-level heuristics behind
  * the C4 corpus, still the baseline web-cleaning recipe newer pipelines
  * (FineWeb, Dolma) measure against. Line rules REWRITE the document
  * (only qualifying lines are retained); page rules then drop whole
  * documents. Every signal is a pure Column expression over Spark's
  * codegen'd higher-order functions — one narrow pass, no UDFs, no
  * shuffle: cleaning 100 TB stays scan-bound.
  *
  * Published rules implemented here: retain lines ending in terminal
  * punctuation; retain lines with ≥ `minWordsPerLine` words; drop lines
  * containing the word "javascript" (case-insensitive whole-token
  * match); drop pages with < `minSentences` sentences after line
  * filtering (sentences counted as '.', '!' or '?' occurrences in the
  * retained text); drop pages containing "lorem ipsum"
  * (case-insensitive), a curly brace '{', or any configured bad word
  * (whole-token match; the paper uses the public "List of Dirty,
  * Naughty, Obscene or Otherwise Bad Words" — corpus config here, like
  * the Gopher stop list). Language-ID and the three-sentence-span dedup
  * from the paper are separate operators in this engine
  * ([[TextAnalysis.langId]], [[graft.operators.Dedup]]). */
object C4 {

  /** Rule thresholds and word lists — corpus config; defaults are the
    * paper's published values. */
  final case class Config(
      minWordsPerLine: Int = 3,
      minSentences: Int = 5,
      badWords: Seq[String] = Seq.empty)

  private def words(c: Column): Column = TextAnalysis.wsTokens(c)
  private def lowerWords(c: Column): Column =
    transform(words(c), t => lower(t))

  /** Non-blank lines of the raw document. */
  def docLines(c: Column): Column = Gopher.docLines(c)

  /** Line qualifies: ends in terminal punctuation ('.', '!', '?' or a
    * closing double quote), has ≥ minWordsPerLine whitespace words, and
    * does not contain the token "javascript" in any case. */
  def lineKeep(line: Column, cfg: Config): Column =
    line.rlike("[.!?\"]\\s*$") &&
      size(words(line)) >= cfg.minWordsPerLine &&
      !array_contains(lowerWords(line), "javascript")

  /** Retained lines, in order. */
  def keptLines(c: Column, cfg: Config): Column =
    filter(docLines(c), l => lineKeep(l, cfg))

  /** The rewritten (line-filtered) document. */
  def cleanedText(c: Column, cfg: Config): Column =
    array_join(keptLines(c, cfg), "\n")

  /** Sentences in a (cleaned) text: occurrences of '.', '!' or '?'. */
  def sentenceCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[.!?]"), lit(0)))

  def hasLoremIpsum(c: Column): Column = lower(c).contains("lorem ipsum")
  def hasBrace(c: Column): Column = c.contains("{")

  /** Whole-token, case-insensitive bad-word hit over the RAW page (page
    * filters see the original text, not the line-filtered rewrite). */
  def hasBadWord(c: Column, cfg: Config): Column =
    if (cfg.badWords.isEmpty) lit(false)
    else exists(lowerWords(c),
      t => cfg.badWords.map(w => t === w.toLowerCase).reduce(_ || _))

  /** Page-level keep decision over ALREADY-COMPUTED signal columns (the
    * caller derives them once; see the rounding discipline in
    * [[Gopher.passes]]). */
  def pageKeep(nSentences: Column, hasLorem: Column, hasBrace: Column,
               hasBadWord: Column, cfg: Config): Column =
    nSentences >= cfg.minSentences && !hasLorem && !hasBrace && !hasBadWord
}
