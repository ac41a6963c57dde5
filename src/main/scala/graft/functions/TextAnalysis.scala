package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for training-data pipelines (SURVEY.md §2.4):
  * language ID, quality scoring, token counting, fingerprinting. All are
  * pure Column expressions (codegen'd, no UDFs) so they pipeline with
  * scans and stay inside whole-stage codegen at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokens — semantics of
    * `filter(split(c, "\\s+"), t => length(t) > 0)` as one native pass
    * (r19: the HOF `ArrayFilter` lambda is interpreted per element; see
    * [[graft.plans.WsTokens]]). */
  def wsTokens(c: Column): Column =
    graft.plans.TextSignalExpressions.wsTokens(c)

  /** Whitespace token count (`size(wsTokens(c)).cast("long")`). */
  def tokenCount(c: Column): Column =
    graft.plans.TextSignalExpressions.wsTokenCount(c)

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, single
    * punctuation — the shape GPT-style BPE pre-tokenization produces
    * (public regex family, simplified; RE2/Java compatible). Native
    * one-pass count of `regexp_extract_all(c, bpeishPattern)`. */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishCount(c: Column): Column =
    graft.plans.TextSignalExpressions.bpeishCount(c)

  // -------------------------------------------------------- language ID
  /** Per-language stopword profiles (public most-frequent-word lists,
    * truncated). Latin scripts are discriminated by stopword hit rate;
    * CJK by codepoint range share. The canonical lists live in
    * [[graft.plans.TextSignal.profiles]] (the native single-pass
    * scorer); every langid oracle replays them verbatim. */
  def profiles: Map[String, Seq[String]] =
    graft.plans.TextSignal.profiles.toMap

  /** Share of CJK codepoints among non-space characters. */
  def cjkRatio(c: Column): Column = {
    val nonSpace = regexp_replace(c, "\\s+", "")
    length(regexp_replace(nonSpace, "[^\\x{4e00}-\\x{9fff}\\x{3040}-\\x{30ff}]", "")).cast("double") /
      greatest(length(nonSpace), lit(1)).cast("double")
  }

  /** N-gram/stopword-heuristic language ID: 'zh' if CJK share > 0.3,
    * else the best-scoring Latin profile (≥ minScore), else 'und'.
    * Deterministic tie-break: language code order en < es < de < fr by
    * strictly-greater comparison over an ordered fold.
    *
    * SUPPORTED SET: {en, es, de, fr, zh}; any other language, code,
    * numeric, or degenerate input falls to 'und' (LangIdSpec asserts
    * per-language precision on planted prose and that out-of-set text
    * never misclassifies). A production corpus wants a trained n-gram
    * profile model (e.g. CLD-style) behind this same column contract;
    * the testdata here is English-synthetic, so a stopword heuristic
    * is the honest ceiling. */
  def langId(c: Column, minScore: Double = 0.05): Column =
    graft.plans.TextSignalExpressions.langId(c, minScore)

  // ----------------------------------------------------- quality scores
  /** Punctuation character share. */
  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[^.,;:!?'\"()-]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  /** Alphabetic character share (a-z, case-insensitive). */
  def alphaRatio(c: Column): Column =
    graft.plans.TextSignalExpressions.alphaRatio(c)

  /** English stopword share of tokens (a quality signal: natural prose
    * has 0.2–0.6; keyword spam and boilerplate fall outside). */
  def stopwordRatio(c: Column): Column =
    graft.plans.TextSignalExpressions.stopwordRatio(c)

  /** Mean token length. */
  def meanTokenLen(c: Column): Column =
    graft.plans.TextSignalExpressions.meanTokenLen(c)

  /** Composite quality score in [0,1] (Gopher/C4-style heuristic mix:
    * doc-length band + alpha share + stopword presence + sane mean
    * token length). Weights are fixed, documented, deterministic. */
  def qualityScore(c: Column): Column =
    graft.plans.TextSignalExpressions.qualityScore(c)

  // ------------------------------------------------------ fingerprints
  /** Normalized content fingerprint: lowercase, collapse whitespace,
    * md5. Stable under formatting-only edits. */
  def fingerprint(c: Column): Column =
    md5(graft.plans.TextSignalExpressions.wsCollapseLower(c).cast("binary"))

  /** Within-document repetition (Gopher-style): fraction of tokens taken
    * by the single most frequent token. Native single-pass expression —
    * narrow, no shuffle, unlike an explode+groupBy formulation. */
  def topTokenFraction(c: Column): Column =
    graft.plans.TextHashExpressions.topTokenFraction(c)

  /** Shannon entropy (bits) of the codepoint distribution (Dolma-style
    * gibberish detector; see [[graft.plans.CharEntropy]]). */
  def charEntropy(c: Column): Column =
    graft.plans.TextHashExpressions.charEntropy(c)

  /** Unicode NFC normalization (see [[graft.plans.NfcNormalize]]) —
    * run BEFORE fingerprinting/dedup so canonically-equivalent text
    * hashes together. */
  def nfcNormalize(c: Column): Column =
    graft.plans.TextHashExpressions.nfcNormalize(c)

  /** PII redaction: emails, North-American-style phone numbers, IPv4
    * addresses and long digit runs (card/account numbers) replaced with
    * type tokens. Regex-pass-per-record; extend the pattern list per
    * jurisdiction. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "(?:\\+?1[-. ])?(?:\\(\\d{3}\\)|\\b\\d{3})[-. ]\\d{3}[-. ]\\d{4}\\b" -> "<PHONE>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{12,19}\\b" -> "<NUMBER>")

  def redactPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (x, (pat, tok)) => regexp_replace(x, pat, tok) }

  // -------------------------------------------------------------- URLs
  /** Query-param names dropped by [[normalizeUrl]]: click/campaign
    * trackers that fragment otherwise-identical URLs (the major cause of
    * spurious URL-level "uniqueness" in crawled corpora). */
  val trackingParams: String = "utm_[a-z0-9_]+|fbclid|gclid|msclkid|mc_eid|igshid"

  /** Lowercased host with any leading www. stripped. */
  def urlHost(c: Column): Column =
    regexp_replace(lower(parse_url(c, lit("HOST"))), "^www\\.", "")

  /** Registrable-domain heuristic: last two host labels. (A full answer
    * needs the public-suffix list; two labels is the standard cheap
    * approximation for corpus-level grouping.) */
  def urlDomain(c: Column): Column = {
    val labels = split(urlHost(c), "\\.")
    when(size(labels) >= 2,
      concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
      .otherwise(urlHost(c))
  }

  /** Canonical URL for dedup/grouping: lowercase scheme+host, www.
    * stripped, fragment dropped, tracking params removed (other params
    * kept in order), trailing path slashes trimmed. Deterministic —
    * never widens: normalize(normalize(u)) == normalize(u). */
  def normalizeUrl(c: Column): Column = {
    val scheme = lower(coalesce(parse_url(c, lit("PROTOCOL")), lit("https")))
    val path = regexp_replace(coalesce(parse_url(c, lit("PATH")), lit("")), "/+$", "")
    val q = coalesce(parse_url(c, lit("QUERY")), lit(""))
    val kept = filter(split(q, "&"),
      p => length(p) > 0 && !p.rlike(s"(?i)^(?:$trackingParams)="))
    val qs = array_join(kept, "&")
    concat(scheme, lit("://"), urlHost(c), path,
      when(length(qs) > 0, concat(lit("?"), qs)).otherwise(lit("")))
  }

  /** Rolling polynomial hash: base-31 over code points, modulo 2^50
    * (keeps every intermediate in range under ANSI mode: acc < 2^50,
    * acc*31 + c < 2^56 — no Long overflow). Cheap non-cryptographic
    * content id; pairs with [[fingerprint]] when md5 is overkill. */
  def rollingHash(c: Column): Column =
    aggregate(split(c, ""), lit(0L),
      (acc, ch) => pmod(acc * lit(31L) + coalesce(ascii(ch).cast("long"), lit(0L)),
                        lit(1L << 50)))
}
