package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Gopher document-quality rule panel (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * arXiv:2112.11446 Appendix A1.1.1 — the MassiveWeb filter), the
  * published doc-level heuristic set FineWeb and Dolma re-implement.
  * Unlike [[TextAnalysis.qualityScore]] (a weighted composite), this is
  * the full per-rule panel: each signal is exposed individually so a
  * pipeline can tune thresholds per corpus and audit WHICH rule dropped
  * a document — at 100 TB the drop-reason histogram is the first thing
  * a curation run inspects.
  *
  * All signals are pure Column expressions (codegen'd, no UDFs, no
  * shuffle): the panel pipelines with the parquet scan and costs one
  * narrow pass, so filtering 100 TB is scan-bound. Pass/fail should be
  * derived from the ROUNDED signals (see `passes`) so an engine-neutral
  * oracle lands on identical booleans at threshold boundaries.
  */
object Gopher {

  /** Rule thresholds. Defaults are the paper's published values; they
    * are corpus config in practice (the synthetic catalog query binds a
    * tighter word floor and a vocabulary-matched stop list the same way
    * the token-budget query binds its quotas). */
  final case class Thresholds(
      minWords: Long = 50,
      maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      minStopHits: Int = 2,
      stopWords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"))

  private def toks(c: Column): Column = TextAnalysis.wsTokens(c)
  private def nTok(c: Column): Column =
    greatest(size(toks(c)), lit(1)).cast("double")

  /** Non-empty lines (whitespace-only lines are not lines). */
  def docLines(c: Column): Column =
    filter(split(c, "\n"), l => length(trim(l)) > 0)
  private def nLines(c: Column): Column =
    greatest(size(docLines(c)), lit(1)).cast("double")

  /** Symbol-to-word ratio: '#' and ellipsis ("..." or '…') occurrences
    * per word (paper: must stay below 0.1). */
  def symbolRatio(c: Column): Column =
    size(regexp_extract_all(c, lit("#|\\.\\.\\.|…"), lit(0)))
      .cast("double") / nTok(c)

  /** Fraction of lines that start with a bullet ('-', '*', '•'). */
  def bulletLineFrac(c: Column): Column =
    size(filter(docLines(c), l => l.rlike("^\\s*[-*•]"))).cast("double") /
      nLines(c)

  /** Fraction of lines that end with an ellipsis. */
  def ellipsisLineFrac(c: Column): Column =
    size(filter(docLines(c), l => l.rlike("(\\.\\.\\.|…)\\s*$")))
      .cast("double") / nLines(c)

  /** Fraction of words containing at least one alphabetic character
    * (paper: ≥ 80%). */
  def alphaWordFrac(c: Column): Column =
    size(filter(toks(c), t => t.rlike("[A-Za-z]"))).cast("double") / nTok(c)

  /** Number of DISTINCT stop words present (paper: ≥ 2 of its 8). */
  def stopHits(c: Column, stopWords: Seq[String]): Column = {
    val lowered = transform(toks(c), t => lower(t))
    size(filter(array(stopWords.map(lit): _*),
      s => array_contains(lowered, s))).cast("int")
  }

  /** Repetition-removal thresholds (Rae et al. App. A1.1.2, Table A1):
    * a document passes when every signal stays AT OR BELOW its limit.
    * Defaults are the paper's published values; corpora tune them like
    * [[Thresholds]]. `maxTopNgramFrac` covers n = 2,3,4 in order;
    * `maxDupNgramFrac` covers n = 5..10. */
  final case class RepetitionThresholds(
      maxDupLineFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20,
      maxDupParaFrac: Double = 0.30,
      maxDupParaCharFrac: Double = 0.20,
      maxTopNgramFrac: Seq[Double] = Seq(0.20, 0.18, 0.16),
      maxDupNgramFrac: Seq[Double] = Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10)) {
    /** Limits in [[graft.plans.RepetitionPanel.fieldNames]] order. */
    def limits: Seq[Double] =
      Seq(maxDupLineFrac, maxDupLineCharFrac, maxDupParaFrac,
        maxDupParaCharFrac) ++ maxTopNgramFrac ++ maxDupNgramFrac
  }

  /** The full 13-signal repetition panel as ONE struct column (one
    * narrow native pass — see [[graft.plans.RepetitionPanel]] for the
    * exact per-signal semantics). Unrounded; round each field before
    * deriving pass flags so engine boundaries agree. */
  def repetitionPanel(c: Column): Column =
    graft.plans.TextHashExpressions.repetitionPanel(c)

  /** Pass predicate over the 13 ALREADY-ROUNDED panel columns, given in
    * [[graft.plans.RepetitionPanel.fieldNames]] order. */
  def repetitionPasses(signals: Seq[Column], th: RepetitionThresholds): Column = {
    require(signals.size == 13, s"expected 13 panel columns, got ${signals.size}")
    signals.zip(th.limits).map { case (c, lim) => c <= lim }.reduce(_ && _)
  }

  /** The pass predicate over ALREADY-ROUNDED signal columns — callers
    * round each fraction first (both engines land on the same boolean
    * when a signal sits within rounding distance of a threshold). */
  def passes(nWords: Column, meanWordLen: Column, symbolRatio: Column,
             bulletFrac: Column, ellipsisFrac: Column, alphaFrac: Column,
             stopHits: Column, th: Thresholds): Column =
    nWords.between(th.minWords, th.maxWords) &&
      meanWordLen.between(th.minMeanWordLen, th.maxMeanWordLen) &&
      symbolRatio < th.maxSymbolRatio &&
      bulletFrac <= th.maxBulletFrac &&
      ellipsisFrac <= th.maxEllipsisFrac &&
      alphaFrac >= th.minAlphaWordFrac &&
      stopHits >= th.minStopHits
}
