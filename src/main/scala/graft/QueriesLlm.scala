package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{El, TextAnalysis}
import graft.operators.{Ann, Cluster, Dedup, Multimodal, Retrieval}

/** SURVEY.md §2.4 (+§2.1 #8): LLM-training-data pipeline queries —
  * dedup family, similarity search, text analysis, multimodal plumbing,
  * expression-language — with DuckDB oracles where SQL-expressible.
  */
object QueriesLlm {
  type Q = (SparkSession, String) => DataFrame

  /** DuckDB-faithful decimal rounding: round(x·10ⁿ)/10ⁿ — DuckDB
    * implements round(x, n) exactly this way on doubles, so matching
    * the operation order makes the rounded values bit-identical in both
    * engines even when x·10ⁿ lands near a .5 boundary (BigDecimal-exact
    * rounding of x, Spark's default, can differ there). */
  def dround(c: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val p = math.pow(10, n)
    round(c * p) / p
  }

  /** NiFi Expression Language compiled to Catalyst (SURVEY §2.1 #8). */
  val qExpressionLanguage: Q = (s, d) => {
    Tables.documents(s, d).select(
      col("doc_id"),
      El.compile("${lang:toUpper():append('-'):append(${source})}").as("tag"),
      El.compile("${text:substring(0, 12):toUpper()}").as("head_uc"),
      El.compileExpr("${n_chars:plus(5):multiply(2)}").as("chars_x"),
      El.compileExpr("${lang:equals('en'):ifElse('english','other')}").as("lang_tag"),
      El.compileExpr("${text:substring(0, 20):escapeHtml4()}").as("head_html"),
      El.compileExpr("${source:padRight(10, '.')}").as("src_pad"),
      El.compileExpr("${lang:repeat(2)}").as("lang2"),
      El.compileExpr("${text:getDelimitedField(2, ' ')}").as("second_field"),
      El.compileExpr("${n_chars:math('pow', 2)}").as("chars_sq"),
      El.compileExpr("${n_chars:math('max', 3000)}").as("chars_floor"),
      // r6: instant arithmetic — build a date from doc columns, shift it,
      // render it back (toInstant/plusDays/minusHours/formatInstant)
      El.compileExpr(
        "${literal('2024-03-'):append(${doc_id:mod(25):plus(1):padLeft(2, '0')})" +
        ":append(' 12:00:00')" +
        ":toInstant('yyyy-MM-dd HH:mm:ss', 'UTC')" +
        ":plusDays(3):minusHours(6)" +
        ":formatInstant('yyyy-MM-dd HH:mm', 'UTC')}").as("shifted_ts"),
      // r6: url round-trip + NiFi default pad char
      El.compileExpr("${source:prepend('q a/'):urlEncode()}").as("url_enc"),
      El.compileExpr("${source:prepend('q a/'):urlEncode():urlDecode()}").as("url_dec"),
      El.compileExpr("${lang:padLeft(6)}").as("lang_pad"),
      El.compileExpr(
        "${doc_id:prepend('{\"k\":\"v'):append('\"}'):jsonPath('$.k')}").as("json_k"),
      // r7: seeded deterministic variants of the nondeterministic family
      // (UUID5 is sha1-based — no sha1 in the oracle engine, so it is
      // spec-gated in ElSpec instead) and getDelimitedField quote modes
      El.compileExpr("${doc_id:UUID3('graft:')}").as("uuid3"),
      El.compileExpr(
        "${source:prepend('\"x,y\",'):getDelimitedField(1, ',', '\"')}").as("csv_q"),
      El.compileExpr(
        "${source:prepend('\"x,y\",'):getDelimitedField(1, ',', '\"', true)}").as("csv_qs"),
      El.compileExpr(
        "${source:prepend('\"x,y\",'):getDelimitedField(2, ',', '\"')}").as("csv_q2"),
      // r11 EL-tail sweep: getUri, evaluateELString, isJson, and the
      // jsonPath WRITE family (each over a row-built JSON document so
      // the oracle pins exact output bytes)
      El.compileExpr(
        "${getUri('https', '', ${source}, 8443, '/ingest', ${doc_id:prepend('id=')}, '')}")
        .as("uri"),
      El.compileExpr("${literal('${lang:toUpper()}'):evaluateELString()}").as("el_eval"),
      El.compileExpr("${doc_id:prepend('{\"k\":'):append('}'):isJson()}").as("is_json_t"),
      El.compileExpr("${text:isJson()}").as("is_json_f"),
      El.compileExpr(
        "${doc_id:prepend('{\"a\":'):append(',\"b\":2}'):jsonPathDelete('$.b')}")
        .as("json_del"),
      El.compileExpr(
        "${source:prepend('{\"a\":7,\"s\":\"'):append('\"}'):jsonPathSet('$.a', '9')}")
        .as("json_set"),
      El.compileExpr(
        "${doc_id:prepend('{\"xs\":['):append(']}'):jsonPathAdd('$.xs', '5')}")
        .as("json_add"),
      El.compileExpr(
        "${doc_id:prepend('{\"m\":{\"id\":'):append('}}'):jsonPathPut('$.m', 'k', 'v')}")
        .as("json_put"))
  }
  val qExpressionLanguageSql: String =
    """SELECT doc_id, upper(lang) || '-' || source AS tag,
      | upper(substring(text, 1, 12)) AS head_uc,
      | (n_chars + 5) * 2 AS chars_x,
      | CASE WHEN lang = 'en' THEN 'english' ELSE 'other' END AS lang_tag,
      | replace(replace(replace(replace(substring(text, 1, 20),
      |   '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;') AS head_html,
      | rpad(source, 10, '.') AS src_pad,
      | repeat(lang, 2) AS lang2,
      | split_part(text, ' ', 2) AS second_field,
      | pow(n_chars, 2) AS chars_sq,
      | greatest(n_chars, 3000) AS chars_floor,
      | strftime(make_timestamp(2024, 3, CAST(doc_id % 25 + 1 AS INT), 12, 0, 0)
      |          + INTERVAL 3 DAY - INTERVAL 6 HOUR, '%Y-%m-%d %H:%M') AS shifted_ts,
      | 'q+a%2F' || source AS url_enc,
      | 'q a/' || source AS url_dec,
      | lpad(lang, 6, '_') AS lang_pad,
      | 'v' || CAST(doc_id AS VARCHAR) AS json_k,
      | substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 8) || '-' ||
      |   substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 9, 4) || '-3' ||
      |   substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 14, 3) || '-' ||
      |   translate(substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 17, 1),
      |             '0123456789abcdef', '89ab89ab89ab89ab') ||
      |   substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 18, 3) || '-' ||
      |   substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 21, 12) AS uuid3,
      | '"x,y"' AS csv_q,
      | 'x,y' AS csv_qs,
      | source AS csv_q2,
      | 'https://' || source || ':8443/ingest?id=' || CAST(doc_id AS VARCHAR) AS uri,
      | upper(lang) AS el_eval,
      | CAST(1 AS BOOLEAN) AS is_json_t,
      | CAST(0 AS BOOLEAN) AS is_json_f,
      | '{"a":' || CAST(doc_id AS VARCHAR) || '}' AS json_del,
      | '{"a":9,"s":"' || source || '"}' AS json_set,
      | '{"xs":[' || CAST(doc_id AS VARCHAR) || ',5]}' AS json_add,
      | '{"m":{"id":' || CAST(doc_id AS VARCHAR) || ',"k":"v"}}' AS json_put
      |FROM documents""".stripMargin

  /** Token counting: whitespace + BPE-ish pre-tokenizer (§2.4 #38). */
  val qTokenCount: Q = (s, d) => {
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
      TextAnalysis.bpeishCount(col("text")).as("bpeish_tokens"))
  }
  val qTokenCountSql: String =
    """SELECT doc_id,
      | CAST(len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS BIGINT) AS ws_tokens,
      | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpeish_tokens
      |FROM documents""".stripMargin

  /** Quality scoring (§2.4 #37): Gopher/C4-style deterministic mix. */
  val qTextQuality: Q = (s, d) => {
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      dround(TextAnalysis.meanTokenLen(col("text")), 4).as("mean_tok_len"),
      dround(TextAnalysis.alphaRatio(col("text")), 4).as("alpha_ratio"),
      dround(TextAnalysis.stopwordRatio(col("text")), 4).as("stopword_ratio"),
      dround(TextAnalysis.qualityScore(col("text")), 4).as("quality"))
  }
  val qTextQualitySql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0)"
    val nToks = s"len($toks)"
    val stopList = "['the','of','and','to','in','is','a','that','it','for','was','on','with']"
    val meanTok = s"length(regexp_replace(text, '\\s+', '', 'g')) * 1.0 / greatest($nToks, 1)"
    val alpha = "length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1.0 / greatest(length(text), 1)"
    val stopRatio = s"len(list_filter($toks, t -> list_contains($stopList, lower(t)))) * 1.0 / greatest($nToks, 1)"
    s"""SELECT doc_id,
       | CAST($nToks AS BIGINT) AS n_tokens,
       | round($meanTok, 4) AS mean_tok_len,
       | round($alpha, 4) AS alpha_ratio,
       | round($stopRatio, 4) AS stopword_ratio,
       | round((CASE WHEN length(text) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.25
       |     + (CASE WHEN $meanTok BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END) * 0.25
       |     + (CASE WHEN $stopRatio >= 0.01 THEN 1.0 ELSE 0.0 END) * 0.2
       |     + $alpha * 0.3, 4) AS quality
       |FROM documents""".stripMargin
  }

  /** Gopher rule panel (§2.4 37j, r12): the full per-rule MassiveWeb
    * filter (Rae et al. 2021 App. A1.1.1) with every signal exposed —
    * the drop-reason audit a 100 TB curation run needs, vs 37's single
    * composite score. Thresholds/stop list are corpus config (bound to
    * the generator's 31-word vocabulary here, like 37f's budgets); the
    * pass flag derives from the ROUNDED signals in BOTH engines so
    * boundary docs agree. One narrow codegen'd pass, no shuffle. */
  val qGopherRules: Q = (s, d) => {
    import graft.functions.Gopher
    val th = Gopher.Thresholds(minWords = 40,
      stopWords = Seq("the", "a", "data", "join", "to", "of"))
    val t = col("text")
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.tokenCount(t).as("n_words"),
      dround(TextAnalysis.meanTokenLen(t), 4).as("mean_word_len"),
      dround(Gopher.symbolRatio(t), 4).as("symbol_ratio"),
      dround(Gopher.bulletLineFrac(t), 4).as("bullet_frac"),
      dround(Gopher.ellipsisLineFrac(t), 4).as("ellipsis_frac"),
      dround(Gopher.alphaWordFrac(t), 4).as("alpha_word_frac"),
      Gopher.stopHits(t, th.stopWords).as("stop_hits"))
      .withColumn("pass", Gopher.passes(col("n_words"),
        col("mean_word_len"), col("symbol_ratio"), col("bullet_frac"),
        col("ellipsis_frac"), col("alpha_word_frac"), col("stop_hits"), th))
  }
  val qGopherRulesSql: String =
    """WITH t AS (SELECT doc_id, text,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks,
      |    list_filter(string_split(text, chr(10)), l -> len(trim(l)) > 0) AS ls
      |  FROM documents),
      |s AS (SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
      |          / greatest(len(toks), 1), 4) AS mean_word_len,
      |    round(CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS DOUBLE)
      |          / greatest(len(toks), 1), 4) AS symbol_ratio,
      |    round(CAST(len(list_filter(ls, l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE)
      |          / greatest(len(ls), 1), 4) AS bullet_frac,
      |    round(CAST(len(list_filter(ls, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS DOUBLE)
      |          / greatest(len(ls), 1), 4) AS ellipsis_frac,
      |    round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
      |          / greatest(len(toks), 1), 4) AS alpha_word_frac,
      |    CAST(len(list_filter(['the','a','data','join','to','of'],
      |      w -> list_contains(list_transform(toks, x -> lower(x)), w))) AS INT) AS stop_hits
      |  FROM t)
      |SELECT s.*, (n_words BETWEEN 40 AND 100000
      |  AND mean_word_len BETWEEN 3.0 AND 10.0
      |  AND symbol_ratio < 0.1 AND bullet_frac <= 0.9
      |  AND ellipsis_frac <= 0.3 AND alpha_word_frac >= 0.8
      |  AND stop_hits >= 2) AS pass
      |FROM s""".stripMargin

  /** Gopher repetition panel (§2.4 37m, r12): Rae et al. 2021 App.
    * A1.1.2 — "repetition removal", the within-document half of the
    * MassiveWeb filter (A1.1.1 = 37j's rule panel). All 13 signals
    * (dup line/paragraph fractions by count and by chars, top 2/3/4-gram
    * char fractions, span-union dup 5..10-gram char coverage) come from
    * ONE narrow native pass ([[graft.plans.RepetitionPanel]] documents
    * the exact semantics); CollapseProject leaves the non-cheap struct
    * un-inlined, so projecting 13 fields does not re-evaluate it — at
    * 100 TB the panel is scan-bound, vs an explode+groupBy formulation
    * that would shuffle every n-gram of the corpus.
    *
    * The synthetic corpus is single-line, so the query synthesizes
    * structure BOTH engines construct identically: 8-token lines, the
    * doc's first two lines appended again (deterministic repetition so
    * the dup-line and dup-n-gram paths carry real signal), paragraphs
    * of 3 lines joined by blank lines. Thresholds are corpus config
    * (like 37j's stop list); pass derives from ROUNDED signals. */
  val qGopherRepetition: Q = (s, d) => {
    import graft.functions.Gopher
    val th = Gopher.RepetitionThresholds(
      maxDupLineCharFrac = 0.30, maxDupParaFrac = 0.5,
      maxDupParaCharFrac = 0.5,
      maxDupNgramFrac = Seq(0.50, 0.50, 0.50, 0.55, 0.55, 0.60))
    val toks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
    val base = Tables.documents(s, d)
      .withColumn("toks", toks)
      .withColumn("lines0",
        when(size(col("toks")) === 0, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0), ceil(size(col("toks")) / lit(8.0)).cast("int") - 1),
            i => array_join(slice(col("toks"), i * 8 + 1, lit(8)), " "))))
      .withColumn("lines", concat(col("lines0"), slice(col("lines0"), 1, 2)))
      .withColumn("paras",
        when(size(col("lines")) === 0, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0), ceil(size(col("lines")) / lit(3.0)).cast("int") - 1),
            j => array_join(slice(col("lines"), j * 3 + 1, lit(3)), "\n"))))
      .withColumn("wrapped", array_join(col("paras"), "\n\n"))
      .select(col("doc_id"), Gopher.repetitionPanel(col("wrapped")).as("p"))
    base.select(
      col("doc_id") +:
        graft.plans.RepetitionPanel.fieldNames.map(f =>
          dround(col("p").getField(f), 6).as(f)): _*)
      .withColumn("rep_pass", Gopher.repetitionPasses(
        graft.plans.RepetitionPanel.fieldNames.map(col), th))
  }
  val qGopherRepetitionSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks
      |  FROM documents),
      |w1 AS (
      |  SELECT doc_id, toks,
      |    [array_to_string(toks[i*8+1 : i*8+8], ' ')
      |       FOR i IN range(0, CAST(ceil(len(toks) / 8.0) AS INT))] AS lines0
      |  FROM base),
      |w2 AS (SELECT doc_id, toks, list_concat(lines0, lines0[1:2]) AS lines FROM w1),
      |w3 AS (
      |  SELECT doc_id, lines,
      |    [array_to_string(lines[j*3+1 : j*3+3], chr(10))
      |       FOR j IN range(0, CAST(ceil(len(lines) / 3.0) AS INT))] AS paras,
      |    list_concat(toks, toks[1 : least(16, len(toks))]) AS ta
      |  FROM w2),
      |lseg AS (SELECT doc_id, unnest(lines) AS seg FROM w3),
      |lcnt AS (SELECT doc_id, seg, count(*) AS c, max(len(seg)) AS l FROM lseg GROUP BY 1, 2),
      |lagg AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n, CAST(sum(c - 1) AS DOUBLE) AS dup,
      |                CAST(sum(c * l) AS DOUBLE) AS ch, CAST(sum((c - 1) * l) AS DOUBLE) AS dch
      |         FROM lcnt GROUP BY 1),
      |pseg AS (SELECT doc_id, unnest(paras) AS seg FROM w3),
      |pcnt AS (SELECT doc_id, seg, count(*) AS c, max(len(seg)) AS l FROM pseg GROUP BY 1, 2),
      |pagg AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n, CAST(sum(c - 1) AS DOUBLE) AS dup,
      |                CAST(sum(c * l) AS DOUBLE) AS ch, CAST(sum((c - 1) * l) AS DOUBLE) AS dch
      |         FROM pcnt GROUP BY 1),
      |tok AS (SELECT doc_id, s.w AS w, s.i AS pos
      |        FROM (SELECT doc_id,
      |                unnest([{'w': ta[i], 'i': i} FOR i IN range(1, len(ta) + 1)]) AS s
      |              FROM w3)),
      |off AS (SELECT doc_id, w, pos, len(w) AS lw,
      |          CAST(coalesce(sum(len(w)) OVER (PARTITION BY doc_id ORDER BY pos
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
      |        FROM tok),
      |tc AS (SELECT doc_id, CAST(sum(lw) AS DOUBLE) AS chars FROM off GROUP BY 1),
      |ld AS (SELECT doc_id, pos, w, lw, o,
      |         lead(w, 1) OVER win AS w1, lead(w, 2) OVER win AS w2,
      |         lead(w, 3) OVER win AS w3, lead(w, 4) OVER win AS w4,
      |         lead(w, 5) OVER win AS w5, lead(w, 6) OVER win AS w6,
      |         lead(w, 7) OVER win AS w7, lead(w, 8) OVER win AS w8,
      |         lead(w, 9) OVER win AS w9,
      |         lead(o + lw, 1) OVER win AS e1, lead(o + lw, 2) OVER win AS e2,
      |         lead(o + lw, 3) OVER win AS e3, lead(o + lw, 4) OVER win AS e4,
      |         lead(o + lw, 5) OVER win AS e5, lead(o + lw, 6) OVER win AS e6,
      |         lead(o + lw, 7) OVER win AS e7, lead(o + lw, 8) OVER win AS e8,
      |         lead(o + lw, 9) OVER win AS e9
      |       FROM off WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
      |g AS (
      |  SELECT doc_id, 2 AS n, concat_ws(chr(1), w, w1) AS k, o AS s, e1 AS e FROM ld WHERE w1 IS NOT NULL
      |  UNION ALL SELECT doc_id, 3, concat_ws(chr(1), w, w1, w2), o, e2 FROM ld WHERE w2 IS NOT NULL
      |  UNION ALL SELECT doc_id, 4, concat_ws(chr(1), w, w1, w2, w3), o, e3 FROM ld WHERE w3 IS NOT NULL
      |  UNION ALL SELECT doc_id, 5, concat_ws(chr(1), w, w1, w2, w3, w4), o, e4 FROM ld WHERE w4 IS NOT NULL
      |  UNION ALL SELECT doc_id, 6, concat_ws(chr(1), w, w1, w2, w3, w4, w5), o, e5 FROM ld WHERE w5 IS NOT NULL
      |  UNION ALL SELECT doc_id, 7, concat_ws(chr(1), w, w1, w2, w3, w4, w5, w6), o, e6 FROM ld WHERE w6 IS NOT NULL
      |  UNION ALL SELECT doc_id, 8, concat_ws(chr(1), w, w1, w2, w3, w4, w5, w6, w7), o, e7 FROM ld WHERE w7 IS NOT NULL
      |  UNION ALL SELECT doc_id, 9, concat_ws(chr(1), w, w1, w2, w3, w4, w5, w6, w7, w8), o, e8 FROM ld WHERE w8 IS NOT NULL
      |  UNION ALL SELECT doc_id, 10, concat_ws(chr(1), w, w1, w2, w3, w4, w5, w6, w7, w8, w9), o, e9 FROM ld WHERE w9 IS NOT NULL),
      |cnt AS (SELECT doc_id, n, k, count(*) AS c, max(e - s) AS klen FROM g GROUP BY 1, 2, 3),
      |tm AS (SELECT doc_id, n, max(c) AS mc FROM cnt WHERE n <= 4 GROUP BY 1, 2),
      |tv AS (SELECT cnt.doc_id, cnt.n, max(cnt.c * cnt.klen) AS num
      |       FROM cnt JOIN tm ON cnt.doc_id = tm.doc_id AND cnt.n = tm.n AND cnt.c = tm.mc
      |       GROUP BY 1, 2),
      |tp AS (SELECT doc_id, max(CASE WHEN n = 2 THEN num END) AS t2,
      |              max(CASE WHEN n = 3 THEN num END) AS t3,
      |              max(CASE WHEN n = 4 THEN num END) AS t4 FROM tv GROUP BY 1),
      |docc AS (SELECT g.doc_id, g.n, g.s, g.e
      |         FROM g JOIN cnt ON g.doc_id = cnt.doc_id AND g.n = cnt.n AND g.k = cnt.k
      |         WHERE g.n >= 5 AND cnt.c >= 2),
      |cv AS (SELECT doc_id, n, s, e,
      |         max(e) OVER (PARTITION BY doc_id, n ORDER BY s, e
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
      |       FROM docc),
      |cva AS (SELECT doc_id, n, CAST(sum(greatest(e - greatest(s, coalesce(pe, s)), 0)) AS DOUBLE) AS cov
      |        FROM cv GROUP BY 1, 2),
      |cvp AS (SELECT doc_id,
      |          max(CASE WHEN n = 5 THEN cov END) AS d5, max(CASE WHEN n = 6 THEN cov END) AS d6,
      |          max(CASE WHEN n = 7 THEN cov END) AS d7, max(CASE WHEN n = 8 THEN cov END) AS d8,
      |          max(CASE WHEN n = 9 THEN cov END) AS d9, max(CASE WHEN n = 10 THEN cov END) AS d10
      |        FROM cva GROUP BY 1),
      |r AS (
      |  SELECT b.doc_id,
      |    round(coalesce(la.dup / nullif(la.n, 0), 0), 6) AS dup_line_frac,
      |    round(coalesce(la.dch / nullif(la.ch, 0), 0), 6) AS dup_line_char_frac,
      |    round(coalesce(pa.dup / nullif(pa.n, 0), 0), 6) AS dup_para_frac,
      |    round(coalesce(pa.dch / nullif(pa.ch, 0), 0), 6) AS dup_para_char_frac,
      |    round(coalesce(tp.t2 / nullif(tc.chars, 0), 0), 6) AS top2_frac,
      |    round(coalesce(tp.t3 / nullif(tc.chars, 0), 0), 6) AS top3_frac,
      |    round(coalesce(tp.t4 / nullif(tc.chars, 0), 0), 6) AS top4_frac,
      |    round(coalesce(cvp.d5 / nullif(tc.chars, 0), 0), 6) AS dup5_frac,
      |    round(coalesce(cvp.d6 / nullif(tc.chars, 0), 0), 6) AS dup6_frac,
      |    round(coalesce(cvp.d7 / nullif(tc.chars, 0), 0), 6) AS dup7_frac,
      |    round(coalesce(cvp.d8 / nullif(tc.chars, 0), 0), 6) AS dup8_frac,
      |    round(coalesce(cvp.d9 / nullif(tc.chars, 0), 0), 6) AS dup9_frac,
      |    round(coalesce(cvp.d10 / nullif(tc.chars, 0), 0), 6) AS dup10_frac
      |  FROM base b
      |  LEFT JOIN lagg la USING (doc_id) LEFT JOIN pagg pa USING (doc_id)
      |  LEFT JOIN tc USING (doc_id) LEFT JOIN tp USING (doc_id)
      |  LEFT JOIN cvp USING (doc_id))
      |SELECT r.*, (dup_line_frac <= 0.3 AND dup_line_char_frac <= 0.3
      |  AND dup_para_frac <= 0.5 AND dup_para_char_frac <= 0.5
      |  AND top2_frac <= 0.2 AND top3_frac <= 0.18 AND top4_frac <= 0.16
      |  AND dup5_frac <= 0.5 AND dup6_frac <= 0.5 AND dup7_frac <= 0.5
      |  AND dup8_frac <= 0.55 AND dup9_frac <= 0.55 AND dup10_frac <= 0.6) AS rep_pass
      |FROM r""".stripMargin

  /** C4 cleaning panel (§2.4 37o, r12): Raffel et al. 2020 §2.2 — the
    * line-rewrite + page-filter recipe behind the C4 corpus (see
    * [[graft.functions.C4]]). Line rules rewrite the doc (terminal
    * punctuation, ≥3 words, no "javascript" token); page rules then
    * gate it (≥5 sentences post-rewrite, no "lorem ipsum", no brace, no
    * configured bad word). One narrow codegen'd pass — no UDFs, no
    * shuffle.
    *
    * The single-line synthetic corpus gets deterministic structure both
    * engines construct identically: 6-token lines whose terminators
    * cycle '.', '!', '?', none by (doc_id·7+j) mod 4 (the none-phase
    * exercises the terminal rule), "javascript " prepended to line 1 of
    * every 7th doc, and marker lines ("lorem ipsum", a brace line, a
    * terminal-punctuated bad-word line that SURVIVES the line filter
    * but kills the page) appended on doc_id strides 11/13/17. */
  val qC4Rules: Q = (s, d) => {
    import graft.functions.C4
    val cfg = C4.Config(badWords = Seq("badword1"))
    val toks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
    val terms = array(lit("."), lit("!"), lit("?"), lit(""))
    val base = Tables.documents(s, d)
      .withColumn("toks", toks)
      .withColumn("lines0",
        when(size(col("toks")) === 0, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0), ceil(size(col("toks")) / lit(6.0)).cast("int") - 1),
            j => concat(
              when(col("doc_id") % 7 === 0 && j === 1, lit("javascript "))
                .otherwise(lit("")),
              array_join(slice(col("toks"), j * 6 + 1, lit(6)), " "),
              element_at(terms, (pmod(col("doc_id") * 7 + j, lit(4)) + 1).cast("int"))))))
      .withColumn("wrapped", concat(
        array_join(col("lines0"), "\n"),
        when(col("doc_id") % 11 === 0, lit("\nlorem ipsum")).otherwise(lit("")),
        when(col("doc_id") % 13 === 0, lit("\n{ config }")).otherwise(lit("")),
        when(col("doc_id") % 17 === 0, lit("\nthe badword1 here.")).otherwise(lit(""))))
    base.select(
      col("doc_id"),
      size(C4.docLines(col("wrapped"))).as("n_lines"),
      size(C4.keptLines(col("wrapped"), cfg)).as("n_kept"),
      C4.sentenceCount(C4.cleanedText(col("wrapped"), cfg)).as("n_sentences"),
      C4.hasLoremIpsum(col("wrapped")).as("has_lorem"),
      C4.hasBrace(col("wrapped")).as("has_brace"),
      C4.hasBadWord(col("wrapped"), cfg).as("has_badword"),
      md5(C4.cleanedText(col("wrapped"), cfg).cast("binary")).as("cleaned_md5"))
      .withColumn("kept_frac",
        dround(col("n_kept").cast("double") /
          greatest(col("n_lines"), lit(1)).cast("double"), 6))
      .withColumn("c4_keep", C4.pageKeep(col("n_sentences"),
        col("has_lorem"), col("has_brace"), col("has_badword"), cfg))
  }
  val qC4RulesSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks
      |  FROM documents),
      |w1 AS (
      |  SELECT doc_id,
      |    [(CASE WHEN doc_id % 7 = 0 AND j = 1 THEN 'javascript ' ELSE '' END)
      |       || array_to_string(toks[j*6+1 : j*6+6], ' ')
      |       || (['.', '!', '?', ''])[CAST((doc_id*7 + j) % 4 AS INT) + 1]
      |     FOR j IN range(0, CAST(ceil(len(toks) / 6.0) AS INT))] AS lines0
      |  FROM base),
      |w2 AS (
      |  SELECT doc_id,
      |    array_to_string(lines0, chr(10))
      |      || (CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'lorem ipsum' ELSE '' END)
      |      || (CASE WHEN doc_id % 13 = 0 THEN chr(10) || '{ config }' ELSE '' END)
      |      || (CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'the badword1 here.' ELSE '' END)
      |      AS wrapped
      |  FROM w1),
      |sig AS (
      |  SELECT doc_id, wrapped,
      |    list_filter(string_split(wrapped, chr(10)), l -> len(trim(l)) > 0) AS ls
      |  FROM w2),
      |sig2 AS (
      |  SELECT doc_id, wrapped, ls,
      |    list_filter(ls, l -> regexp_matches(l, '[.!?"]\s*$')
      |      AND len(list_filter(regexp_split_to_array(l, '\s+'), x -> len(x) > 0)) >= 3
      |      AND NOT list_contains(
      |        list_transform(list_filter(regexp_split_to_array(l, '\s+'), x -> len(x) > 0),
      |                       t -> lower(t)), 'javascript')) AS kept
      |  FROM sig),
      |sig3 AS (
      |  SELECT doc_id,
      |    CAST(len(ls) AS INT) AS n_lines,
      |    CAST(len(kept) AS INT) AS n_kept,
      |    -- array_to_string([]) is NULL in DuckDB, not '' — coalesce or
      |    -- the empty-cleaned docs go NULL through md5/sentence count
      |    CAST(len(regexp_extract_all(coalesce(array_to_string(kept, chr(10)), ''), '[.!?]')) AS INT) AS n_sentences,
      |    contains(lower(wrapped), 'lorem ipsum') AS has_lorem,
      |    contains(wrapped, '{') AS has_brace,
      |    list_contains(
      |      list_transform(list_filter(regexp_split_to_array(wrapped, '\s+'), x -> len(x) > 0),
      |                     t -> lower(t)), 'badword1') AS has_badword,
      |    md5(coalesce(array_to_string(kept, chr(10)), '')) AS cleaned_md5
      |  FROM sig2)
      |SELECT doc_id, n_lines, n_kept, n_sentences, has_lorem, has_brace,
      |  has_badword, cleaned_md5,
      |  round(CAST(n_kept AS DOUBLE) / CAST(greatest(n_lines, 1) AS DOUBLE), 6) AS kept_frac,
      |  (n_sentences >= 5 AND NOT has_lorem AND NOT has_brace AND NOT has_badword) AS c4_keep
      |FROM sig3""".stripMargin

  /** Language ID (§2.4 #36) — stopword-profile heuristic; the oracle
    * replays the same profiles, fold-style argmax tie-break, and CJK
    * codepoint-share rule in DuckDB SQL. */
  val qLangId: Q = (s, d) => {
    Tables.documents(s, d).select(
      col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
  }
  val qLangIdSql: String =
    """WITH t AS (
      |  SELECT doc_id, text,
      |         list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, text,
      |    CAST(len(list_filter(toks, x -> list_contains(['the','of','and','to','in','is','a','that','it','for','was','on','with'], lower(x)))) AS DOUBLE) / greatest(len(toks),1) AS s_en,
      |    CAST(len(list_filter(toks, x -> list_contains(['de','la','que','el','en','y','los','del','se','las','por','un','para'], lower(x)))) AS DOUBLE) / greatest(len(toks),1) AS s_es,
      |    CAST(len(list_filter(toks, x -> list_contains(['der','die','und','in','den','von','zu','das','mit','sich','des','auf','ist'], lower(x)))) AS DOUBLE) / greatest(len(toks),1) AS s_de,
      |    CAST(len(list_filter(toks, x -> list_contains(['de','la','le','et','les','des','en','un','du','une','que','est','pour'], lower(x)))) AS DOUBLE) / greatest(len(toks),1) AS s_fr
      |  FROM t),
      |r AS (
      |  SELECT doc_id, s_en, s_es, s_de, s_fr,
      |    CAST(length(regexp_replace(regexp_replace(text, '\s+', '', 'g'), '[^\x{4e00}-\x{9fff}\x{3040}-\x{30ff}]', '', 'g')) AS DOUBLE)
      |      / greatest(length(regexp_replace(text, '\s+', '', 'g')), 1) AS cjk
      |  FROM s)
      |SELECT doc_id,
      |  CASE WHEN cjk > 0.3 THEN 'zh'
      |       WHEN greatest(s_en,s_es,s_de,s_fr) >= 0.05 THEN
      |         CASE WHEN s_fr > greatest(s_en,s_es,s_de) THEN 'fr'
      |              WHEN s_de > greatest(s_en,s_es) THEN 'de'
      |              WHEN s_es > s_en THEN 'es'
      |              ELSE 'en' END
      |       ELSE 'und' END AS lang_pred
      |FROM r""".stripMargin

  /** Learned language ID (§2.4 #36a, r14): the fastText langid
    * architecture (Joulin et al. 2016) — K one-vs-rest logistic heads
    * over hashed char n-gram features — trained DISTRIBUTED on a
    * deterministic hash slice of the corpus's labeled docs (the
    * sorted-group bit-deterministic gradients of the quality
    * classifier), then predicted over ALL docs with the native
    * `graft_langid` expression (no per-row UDF). Real curation
    * pipelines gate on langid scores before everything else; the
    * 31-word stopword heuristic (`q_lang_id`) stays as the zero-model
    * fallback. Rows-only (float GD is not SQL-replayable);
    * TextClassifierSpec pins held-out confusion accuracy (1.00 on a
    * 5-language corpus with real per-language character profiles) and
    * bit-determinism. Honest caveat on THIS corpus: the driver
    * testdata's `lang` label is statistically independent of `text`
    * (every lang shares one English-ish vocabulary at near-identical
    * frequencies — verified by per-lang top-word counts), so the
    * trained model correctly converges to the majority class here;
    * the separable-corpus spec is the quality gate, this query is the
    * distributed-mechanism gate. */
  val qLangIdLearned: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // train on the hash-1 fifth — langid saturates on a small labeled
    // slice; the other 4/5 of the corpus is genuinely held out
    val train = docs.filter(pmod(xxhash64(col("doc_id")), lit(5)) === 1)
    val (labels, w) = graft.operators.TextClassifier.trainMultinomial(
      train, "doc_id", "text", "lang", dim = 1 << 13, iters = 8)
    graft.operators.TextClassifier.predictLang(docs, "text", labels, w)
      .select(col("doc_id"), col("lang_pred"),
        (col("lang_pred") === col("lang")).as("agree"))
  }

  /** Document fingerprint (§2.4 #39): normalize → md5. */
  val qFingerprint: Q = (s, d) => {
    Tables.documents(s, d).select(
      col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
  }
  val qFingerprintSql: String =
    """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
      |FROM documents""".stripMargin

  /** Rolling polynomial hash fingerprint. Intermediates stay bounded
    * (pmod 2^50 per step — ANSI-safe on the Spark side) which also makes
    * the fold expressible in DuckDB as a list_reduce over codepoints. */
  val qFingerprintRolling: Q = (s, d) => {
    Tables.documents(s, d).select(
      col("doc_id"), TextAnalysis.rollingHash(col("text")).as("rolling_fp"))
  }
  val qFingerprintRollingSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      [CAST(unicode(substring(text, i, 1)) AS BIGINT) FOR i IN range(1, greatest(length(text),0) + 1)]),
      |    (acc, ch) -> (acc * 31 + ch) % 1125899906842624) AS rolling_fp
      |FROM documents""".stripMargin

  /** N-gram Jaccard near-dup, blocked by source (§2.4 #32). */
  val qDedupJaccard: Q = (s, d) => {
    Dedup.ngramJaccard(Tables.documents(s, d), "doc_id", "text", "source",
        n = 3, threshold = 0.7)
      .select(col("block"), col("id_a"), col("id_b"), dround(col("jaccard"), 6).as("jaccard"))
  }
  val qDedupJaccardSql: String =
    """WITH g AS (
      |  SELECT source AS block, doc_id AS id,
      |         list_distinct([substring(text, i, 3)
      |                        FOR i IN range(1, greatest(length(text) - 1, 2))]) AS grams
      |  FROM documents)
      |SELECT a.block AS block, a.id AS id_a, b.id AS id_b,
      |       round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |             / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
      |FROM g a JOIN g b ON a.block = b.block AND a.id < b.id
      |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.7""".stripMargin

  /** End-to-end dedup decision: near-dup pairs → connected components →
    * (id, cluster) labels. Oracle = DuckDB recursive-CTE transitive
    * closure over the same pairs. */
  /** The pair source qDedupCluster clusters — exposed so PlanAudit can
    * re-run clustering with a per-round plan probe. */
  def dedupClusterPairs(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccard(Tables.documents(s, d), "doc_id", "text", "source",
        n = 3, threshold = 0.55)
      .select(col("id_a"), col("id_b"))

  val qDedupCluster: Q = (s, d) =>
    Dedup.clusters(dedupClusterPairs(s, d), maxIter = 50)
  val qDedupClusterSql: String =
    """WITH RECURSIVE g AS (
      |  SELECT source AS block, doc_id AS id,
      |         list_distinct([substring(text, i, 3)
      |                        FOR i IN range(1, greatest(length(text) - 1, 2))]) AS grams
      |  FROM documents),
      |pairs AS (
      |  SELECT a.id AS id_a, b.id AS id_b
      |  FROM g a JOIN g b ON a.block = b.block AND a.id < b.id
      |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.55),
      |edges AS (
      |  SELECT id_a AS s, id_b AS t FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach(id, r) AS (
      |  SELECT s, s FROM edges
      |  UNION SELECT s, t FROM edges
      |  UNION SELECT reach.id, e.t FROM reach JOIN edges e ON reach.r = e.s)
      |SELECT id, min(r) AS cluster FROM reach GROUP BY id""".stripMargin

  /** Boilerplate-capped near-dup clustering (§2.4 #32a, r7): the same
    * capped pair source fed through connected components — the form
    * that stays linear when gram diversity saturates. Oracle = the
    * recursive-CTE transitive closure over the capped pairs. */
  val qDedupClusterCapped: Q = (s, d) =>
    Dedup.clusters(
      Dedup.ngramJaccard(Tables.documents(s, d), "doc_id", "text", "source",
          n = 3, threshold = 0.55, maxGramDf = Some(512))
        .select(col("id_a"), col("id_b")),
      maxIter = 50)
  val qDedupClusterCappedSql: String =
    """WITH RECURSIVE ex AS (
      |  SELECT source AS block, doc_id AS id,
      |         unnest(list_distinct([substring(text, i, 3)
      |                               FOR i IN range(1, greatest(length(text) - 1, 2))])) AS gram
      |  FROM documents),
      |keep AS (SELECT gram FROM ex GROUP BY gram HAVING count(*) <= 512),
      |g AS (
      |  SELECT block, id, list(gram) AS grams
      |  FROM ex JOIN keep USING (gram) GROUP BY block, id),
      |pairs AS (
      |  SELECT a.id AS id_a, b.id AS id_b
      |  FROM g a JOIN g b ON a.block = b.block AND a.id < b.id
      |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.55),
      |edges AS (
      |  SELECT id_a AS s, id_b AS t FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach(id, r) AS (
      |  SELECT s, s FROM edges
      |  UNION SELECT s, t FROM edges
      |  UNION SELECT reach.id, e.t FROM reach JOIN edges e ON reach.r = e.s)
      |SELECT id, min(r) AS cluster FROM reach GROUP BY id""".stripMargin

  /** Boilerplate-capped n-gram Jaccard (§2.4 #32, r7): grams in more
    * than 512 docs are dropped from the gram space (Dedup.ngramJaccard
    * maxGramDf) — the valve for corpora whose gram diversity stops
    * growing (boilerplate/template text; the mult=30 scale-proof hit
    * this shape on the bounded synthetic vocabulary). The oracle
    * replicates the capped semantics exactly in SQL. */
  val qDedupJaccardCapped: Q = (s, d) =>
    Dedup.ngramJaccard(Tables.documents(s, d), "doc_id", "text", "source",
        n = 3, threshold = 0.7, maxGramDf = Some(512))
      .select(col("block"), col("id_a"), col("id_b"), dround(col("jaccard"), 6).as("jaccard"))
  val qDedupJaccardCappedSql: String =
    """WITH ex AS (
      |  SELECT source AS block, doc_id AS id,
      |         unnest(list_distinct([substring(text, i, 3)
      |                               FOR i IN range(1, greatest(length(text) - 1, 2))])) AS gram
      |  FROM documents),
      |keep AS (SELECT gram FROM ex GROUP BY gram HAVING count(*) <= 512),
      |g AS (
      |  SELECT block, id, list(gram) AS grams
      |  FROM ex JOIN keep USING (gram) GROUP BY block, id)
      |SELECT a.block AS block, a.id AS id_a, b.id AS id_b,
      |       round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |             / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
      |FROM g a JOIN g b ON a.block = b.block AND a.id < b.id
      |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.7""".stripMargin

  /** MinHash+LSH near-dup pairs (§2.4 #30) — signature-level, no SQL
    * oracle (MinHash seeds aren't portable); spec asserts it finds the
    * q_dedup_jaccard pairs (recall) on planted dups. */
  val qDedupMinhash: Q = (s, d) => {
    Dedup.minHashLsh(Tables.documents(s, d), "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.6)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** Persistent MinHash-LSH index (§2.4 32c, r15): build the banded
    * signature layout once, then serve the corpus back through it —
    * pair-for-pair (and value-for-value) EQUAL to q_dedup_minhash by
    * the LshIndexSpec parity pin, but every serve reads signatures
    * from parquet instead of re-shingling text. Rows-only at the gate
    * (minhash arithmetic isn't DuckDB-expressible); the spec carries
    * the exactness claim. */
  val qLshIndex: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    // Index dir keyed by the FULL sf path (sanitized), not a 32-bit
    // hashCode — the qFlowFiles/qFlowIndex discipline (r19: last
    // hashCode-keyed dir in the repo)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_q_lsh_index_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_")
    graft.operators.LshIndex.buildIndex(s, docs, path)
    graft.operators.LshIndex.searchIndex(s, path, docs, threshold = 0.6)
      .filter(col("query_id") < col("id"))
      .select(col("query_id").as("id_a"), col("id").as("id_b"), col("est_jaccard"))
  }

  /** r17 GenAI RAG flow (flows/rag_index.json — the NiFi 2.x
    * vector-store vocabulary compiled end-to-end): documents chunk
    * (ChunkDocument), chunks embed deterministically
    * (ComputeTextEmbedding, the hashing-trick stand-in for the model
    * service), the vectors build a persistent IVF-PQ index
    * (PutVectorIndex — executes at compile, the sink discipline), and
    * each doc's own leading text serves as its question, retrieving
    * exact-reranked top-5 chunks from the layout (QueryVectorIndex,
    * corpus edge pinned by `Corpus Source`). Rows-only at the gate
    * (hash embeddings + ADC aren't DuckDB-expressible); FlowIndexSpec
    * pins the output ROW-IDENTICAL to the direct operator API
    * (Retrieval.chunkTokens → hashedTextEmbedding → Pq.buildIndex/
    * searchIndex) — the q_lsh_index parity discipline. */
  val qFlowIndex: Q = (s, d) => {
    val in = getClass.getResourceAsStream("/flows/rag_index.json")
    require(in != null, "flow definition resource missing")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    // the INDEX covers the full corpus (the scale-relevant half); the
    // question batch is a ~1% deterministic sample — a RAG deployment
    // serves a query stream against the corpus, it does not re-ask
    // every document (all-docs-as-queries is q_ann_ivf's job)
    val questions = Tables.documents(s, d)
      .filter(col("doc_id") % 89 === 0)
      .select(col("doc_id").as("query_id"),
        substring(col("text"), 1, 120).as("qtext"))
    // Index dir keyed by the FULL sf path (sanitized), not a 32-bit
    // hashCode — two sf dirs can share a hashCode and would then share
    // (and clobber) one persistent index (the qFlowFiles discipline)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_q_flow_index_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_")
    FlowCompiler.compile(s, json,
      Map("docs" -> docs, "questions" -> questions),
      Map("index_dir" -> path))("hits")
  }

  /** MinHash+LSH with the hot-bucket cap (§2.4 #30, r11) — the
    * 100×-scale form: band buckets larger than 256 docs are skipped
    * (their pairs are the measured-quadratic term; true near-dups
    * re-meet in their population-typical buckets). At driver SFs no
    * bucket reaches the cap, so output is IDENTICAL to q_dedup_minhash
    * (spec-asserted); at m300 it removes the 8.8×-for-3× candidate
    * blowup (tools/NOTES_r11_minhash.md). */
  val qDedupMinhashCapped: Q = (s, d) => {
    Dedup.minHashLsh(Tables.documents(s, d), "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.6, maxBucket = 256)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** SimHash signatures (§2.4 #31); pair-finding spec-tested on planted
    * near-dups (hash bit semantics aren't portable to SQL). */
  val qDedupSimhash: Q = (s, d) =>
    Dedup.simHash(Tables.documents(s, d), "doc_id", "text")

  /** Embedding-cosine near-dup, blocked by label (§2.4 #33). */
  val qEmbedNeardup: Q = (s, d) => {
    Dedup.embeddingCosine(Tables.embeddings(s, d), "vec_id", "embedding", "label", 0.35)
      .select(col("block"), col("id_a"), col("id_b"), dround(col("cos_sim"), 6).as("cos_sim"))
  }
  val qEmbedNeardupSql: String =
    """WITH e AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
      |       round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
      |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.v, b.v) >= 0.35""".stripMargin

  /** Embedding-cosine near-dup pairs with IVF-cell blocking (§2.4 #33
    * scale path): no user blocking key — cells come from the corpus
    * itself (hash-picked centroids, multi-probe assignment), so the
    * within-block quadratic of the fixed-label form is gone once
    * `nCells` is sized ∝ corpus. At the tested SFs the pinned
    * (nCells=16, nProbe=6) config reaches recall 1.0 vs the exact
    * all-pairs form, so the oracle below is the EXACT global pair set —
    * the blocking must lose nothing to pass. */
  /** IVF blocking config by corpus size. At the driver SFs (≤5k
    * vectors) this is exactly the recall-1.0 config the exact oracle
    * depends on (cells=16, probe=6 — verified at sf0.001/sf0.01, gated
    * by DedupAnnSpec). Past that the knobs flip to the SCALE posture:
    * cells ∝ n with probe=2, so expected candidate pairs are
    * ~125·probe²·n/2 = 250·n — linear with a small constant, where a
    * fixed-cardinality blocking is quadratic. */
  private def ivfConfig(n: Long): (Int, Int) =
    if (n <= 5000) (math.max(16L, n / 125L).toInt, 6)
    else (math.max(16L, n / 125L).toInt, 2)
  val qEmbedNeardupIvf: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val (cells, probe) = ivfConfig(emb.count())
    Dedup.embeddingCosineIvf(s, emb, "vec_id", "embedding", 0.35,
        nCells = cells, nProbe = probe)
      .select(col("id_a"), col("id_b"), dround(col("cos_sim"), 6).as("cos_sim"))
  }
  val qEmbedNeardupIvfSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |       round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.v, b.v) >= 0.35""".stripMargin

  /** SemDeDup-style semantic dedup end-to-end (§2.4): embedding-cosine
    * pairs within blocks → connected components → keep each cluster's
    * min-id representative + all singletons. The full keep/drop
    * decision a training-data pipeline makes, hash-checked against a
    * DuckDB recursive-closure oracle. */
  val qSemanticDedup: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val pairs = Dedup.embeddingCosine(emb, "vec_id", "embedding", "label", 0.35)
      .select(col("id_a"), col("id_b"))
    Dedup.dropNearDuplicates(emb, "vec_id", pairs).select("vec_id", "label")
  }
  val qSemanticDedupSql: String =
    """WITH RECURSIVE e AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.v, b.v) >= 0.35),
      |edges AS (SELECT id_a AS s, id_b AS t FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach(id, r) AS (
      |  SELECT s, s FROM edges
      |  UNION SELECT s, t FROM edges
      |  UNION SELECT reach.id, e2.t FROM reach JOIN edges e2 ON reach.r = e2.s),
      |losers AS (SELECT id FROM (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
      |           WHERE id <> cluster)
      |SELECT vec_id, label FROM embeddings
      |WHERE vec_id NOT IN (SELECT id FROM losers)""".stripMargin

  /** Semantic dedup on IVF-cell blocking (§2.4, the 100 TB form):
    * [[qEmbedNeardupIvf]]'s global pairs → connected components → keep
    * min-id representative. Same recursive-closure oracle shape as
    * [[qSemanticDedup]] but with NO label term — the keep/drop decision
    * is corpus-global, which only passes because the IVF blocking
    * loses no pair at the tested recall-1.0 config. */
  val qSemanticDedupIvf: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val (cells, probe) = ivfConfig(emb.count())
    val pairs = Dedup.embeddingCosineIvf(s, emb, "vec_id", "embedding", 0.35,
        nCells = cells, nProbe = probe)
      .select(col("id_a"), col("id_b"))
    Dedup.dropNearDuplicates(emb, "vec_id", pairs).select("vec_id", "label")
  }
  val qSemanticDedupIvfSql: String =
    """WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |pairs AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.v, b.v) >= 0.35),
      |edges AS (SELECT id_a AS s, id_b AS t FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach(id, r) AS (
      |  SELECT s, s FROM edges
      |  UNION SELECT s, t FROM edges
      |  UNION SELECT reach.id, e2.t FROM reach JOIN edges e2 ON reach.r = e2.s),
      |losers AS (SELECT id FROM (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
      |           WHERE id <> cluster)
      |SELECT vec_id, label FROM embeddings
      |WHERE vec_id NOT IN (SELECT id FROM losers)""".stripMargin

  /** Exact cosine top-k via per-partition heaps (§2.4 #34). */
  val qEmbedCosineTopk: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Ann.bruteForceTopKPartitioned(s, emb, emb.filter(col("vec_id") < 8), k = 5)
  }
  val qEmbedCosineTopkSql: String =
    """SELECT query_id, vec_id, cos_sim, rk FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
      |         round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
      |                                      CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim,
      |         row_number() OVER (
      |           PARTITION BY q.vec_id
      |           ORDER BY round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
      |                                                 CAST(q.embedding AS DOUBLE[])), 6) DESC,
      |                    c.vec_id) AS rk
      |  FROM embeddings c, (SELECT * FROM embeddings WHERE vec_id < 8) q
      |  WHERE c.vec_id != q.vec_id)
      |WHERE rk <= 5""".stripMargin

  /** LSH-bucketed approximate top-k (§2.4 #35) — approximate by design,
    * no SQL oracle; spec measures recall vs the exact path. */
  val qAnnLsh: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Ann.lshTopK(emb, emb.filter(col("vec_id") < 8), k = 5, bits = 6, tables = 4)
  }

  /** IVF approximate top-k (§2.4 #35 scale path) — approximate, spec
    * measures recall vs exact; rows-only for the driver. */
  val qAnnIvf: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Ann.ivfTopK(s, emb, emb.filter(col("vec_id") < 8), k = 5, nCells = 16, nProbe = 4)
  }

  /** Int8-quantized similarity search (§2.4 #34 storage path): cosine
    * top-k over QUANTIZED-then-reconstructed embeddings — demonstrates
    * that the 4×-smaller representation preserves the ranking; the
    * oracle replays the quantization math (floor-based half-up) in SQL. */
  val qEmbedQuantized: Q = (s, d) => {
    import graft.functions.VectorFunctions
    val rec = Tables.embeddings(s, d).select(col("vec_id"),
      VectorFunctions.requantize8(col("embedding")).as("r"))
    val qs = rec.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("r").as("q_r"))
    val cand = rec.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        dround(VectorFunctions.cosine(col("r"), col("q_r")), 6).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk").cast("long").as("rk"))
  }
  val qEmbedQuantizedSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (
      |  SELECT vec_id, v,
      |    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
      |         ELSE list_max(list_transform(v, x -> abs(x))) / 127.0 END AS scale
      |  FROM e),
      |r AS (SELECT vec_id, list_transform(v, x -> floor(x / scale + 0.5) * scale) AS rec FROM s)
      |SELECT query_id, vec_id, cos_sim, rk FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
      |         round(list_cosine_similarity(c.rec, q.rec), 6) AS cos_sim,
      |         row_number() OVER (
      |           PARTITION BY q.vec_id
      |           ORDER BY round(list_cosine_similarity(c.rec, q.rec), 6) DESC, c.vec_id) AS rk
      |  FROM r c, (SELECT * FROM r WHERE vec_id < 8) q
      |  WHERE c.vec_id != q.vec_id)
      |WHERE rk <= 5""".stripMargin

  /** Product quantization encode (§2.4 35e, r13 — Jégou et al. 2011,
    * the FAISS IVF-PQ compression layer): 64-dim int8 codes → 8
    * codebook indexes (8 bytes/vector). Deterministic hash-pick
    * codebook + exact integer L2 argmin, so the oracle replays the
    * encoding bit-exactly. Narrow pass against the broadcast 16-entry
    * codebook — scan-bound at 100 TB, and the output IS the resident
    * search index (32× smaller than the raw floats). */
  val qEmbedPq: Q = (s, d) =>
    graft.operators.Pq.encode(Tables.embeddings(s, d), "vec_id", "embedding",
        m = 8, kCodes = 16)
      .select(col("vec_id"),
        array_join(col("pq").cast("array<string>"), ",").as("pq"))
  val qEmbedPqSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
      |         ELSE list_max(list_transform(v, x -> abs(x))) / 127.0 END AS scale FROM e),
      |c AS (SELECT vec_id, list_transform(v, x -> floor(x / scale + 0.5)) AS c FROM s),
      |book AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, c AS bc
      |         FROM c ORDER BY vec_id LIMIT 16),
      |pairs AS (
      |  SELECT c.vec_id, sub.s, book.j,
      |    list_sum([ (c.c[sub.s*8+i] - book.bc[sub.s*8+i]) * (c.c[sub.s*8+i] - book.bc[sub.s*8+i])
      |               FOR i IN range(1, 9) ]) AS dist
      |  FROM c, (SELECT unnest(range(0, 8)) AS s) sub, book),
      |best AS (
      |  SELECT vec_id, s, j FROM (
      |    SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, j) AS rn
      |    FROM pairs) WHERE rn = 1)
      |SELECT vec_id, string_agg(j, ',' ORDER BY s) AS pq FROM best GROUP BY 1""".stripMargin

  /** PQ ADC top-k (§2.4 35e, r13): search over the compressed codes —
    * per query, one m·kCodes integer LUT, score = m table lookups per
    * corpus vector (never touching the original floats), rank by
    * (adc DESC, vec_id). The shuffle carries (query, vec, score)
    * triples only. Exact-integer arithmetic end-to-end → full SQL
    * oracle. The rerank path (exact cosine over the ADC shortlist) is
    * spec-gated in DedupAnnSpec. */
  val qPqTopk: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    graft.operators.Pq.adcTopK(s, emb, emb.filter(col("vec_id") < 8), k = 5,
      m = 8, kCodes = 16, rerankFactor = 0)
  }
  val qPqTopkSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
      |         ELSE list_max(list_transform(v, x -> abs(x))) / 127.0 END AS scale FROM e),
      |c AS (SELECT vec_id, list_transform(v, x -> floor(x / scale + 0.5)) AS c FROM s),
      |book AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, c AS bc
      |         FROM c ORDER BY vec_id LIMIT 16),
      |pairs AS (
      |  SELECT c.vec_id, sub.s, book.j,
      |    list_sum([ (c.c[sub.s*8+i] - book.bc[sub.s*8+i]) * (c.c[sub.s*8+i] - book.bc[sub.s*8+i])
      |               FOR i IN range(1, 9) ]) AS dist
      |  FROM c, (SELECT unnest(range(0, 8)) AS s) sub, book),
      |best AS (
      |  SELECT vec_id, s, j FROM (
      |    SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, j) AS rn
      |    FROM pairs) WHERE rn = 1),
      |qc AS (SELECT vec_id AS query_id, c AS qcodes FROM c WHERE vec_id < 8),
      |lut AS (SELECT q.query_id, sub.s, book.j,
      |    CAST(list_sum([ q.qcodes[sub.s*8+i] * book.bc[sub.s*8+i] FOR i IN range(1, 9) ]) AS BIGINT) AS dot
      |  FROM qc q, (SELECT unnest(range(0, 8)) AS s) sub, book),
      |score AS (SELECT l.query_id, b.vec_id, CAST(sum(l.dot) AS BIGINT) AS adc
      |  FROM best b JOIN lut l ON b.s = l.s AND b.j = l.j
      |  WHERE b.vec_id != l.query_id GROUP BY 1, 2)
      |SELECT query_id, vec_id, adc, rk FROM (
      |  SELECT query_id, vec_id, adc,
      |    row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS rk
      |  FROM score) WHERE rk <= 5""".stripMargin

  /** Persistent IVF-PQ index (§2.4 35g, r14): build the index ONCE —
    * centroids + codebook + cell-PARTITIONED codes as open parquet
    * tables (partition dirs = the inverted lists, bloom filters on
    * vec_id) — then serve the query batch FROM the index: no
    * re-encoding, no corpus pass at search time, which is the
    * build-once/search-many contract a real 100 TB ANN deployment
    * runs. Probing every cell (nProbe = nCells) makes the served
    * ranking provably equal to the flat ADC scan, so the exact-integer
    * SQL oracle replays the whole build → persist → load → search
    * round-trip; partial-probe serving is pinned row-identical to
    * [[graft.operators.Pq.ivfAdcTopK]] in DedupAnnSpec. */
  val qPqIndex: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val path = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_pq_index_" + d.replaceAll("[^A-Za-z0-9._-]", "_")).toString
    graft.operators.Pq.buildIndex(s, emb, path, nCells = 16, m = 8, kCodes = 16)
    graft.operators.Pq.searchIndex(s, path, emb.filter(col("vec_id") < 8), k = 5,
      nProbe = 16, rerankFactor = 0)
  }
  val qPqIndexSql: String = qPqTopkSql

  /** Within-document repetition signal (Gopher-style top-token share). */
  val qRepetition: Q = (s, d) => {
    Tables.documents(s, d).select(col("doc_id"),
      QueriesCore.dround(TextAnalysis.topTokenFraction(col("text")), 6).as("top_tok_frac"))
  }
  val qRepetitionSql: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS word
      |  FROM documents),
      |cnt AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
      |agg AS (SELECT doc_id, max(c) AS mx, CAST(sum(c) AS BIGINT) AS total FROM cnt GROUP BY 1)
      |SELECT d.doc_id, round(coalesce(mx * 1.0 / total, 0), 6) AS top_tok_frac
      |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin

  /** PII redaction over deterministically synthesized contact lines; the
    * oracle replays the same regex chain (RE2, 'g'). */
  val qRedactPii: Q = (s, d) => {
    val withPii = Tables.documents(s, d).select(col("doc_id"),
      concat(substring(col("text"), 1, 40),
        lit(" contact user"), col("doc_id").cast("string"), lit("@mail.example.com"),
        lit(" or call 415-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ip 10.0.0."), (col("doc_id") % 255).cast("string"),
        lit(" card 4111111111111111")).as("line"))
    withPii.select(col("doc_id"),
      md5(TextAnalysis.redactPii(col("line")).cast("binary")).as("redacted_md5"))
  }
  val qRedactPiiSql: String =
    """SELECT doc_id, md5(
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |    substring(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
      |      || ' or call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      || ' ip 10.0.0.' || CAST(doc_id % 255 AS VARCHAR) || ' card 4111111111111111',
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '(?:\+?1[-. ])?(?:\(\d{3}\)|\b\d{3})[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |    '\b\d{12,19}\b', '<NUMBER>', 'g')) AS redacted_md5
      |FROM documents""".stripMargin

  /** Train/eval contamination: corpus docs sharing ≥ minShared
    * CORPUS-RARE 12-gram shingles (document frequency ≤ 100 — the
    * boilerplate cap that keeps the inverted-index join linear in the
    * corpus; the uncapped exact form measured 50x for 10x data in the
    * r7 sf1 scale-proof) with a deterministic benchmark subset. */
  val qContamination: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Dedup.contamination(docs, docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", shingleN = 12, minShared = 5, maxShingleDf = Some(100))
      .select(col("corpus_id"), col("bench_id"), col("shared"))
  }
  val qContaminationSql: String =
    """WITH g AS (
      |  SELECT doc_id, list_distinct([substring(text, i, 12)
      |                                FOR i IN range(1, greatest(length(text) - 10, 2))]) AS grams
      |  FROM documents),
      |e AS (SELECT doc_id, unnest(grams) AS sh FROM g),
      |rare AS (SELECT sh FROM e GROUP BY sh HAVING count(*) <= 100),
      |eb AS (SELECT e.doc_id, e.sh FROM e JOIN rare USING (sh)
      |       WHERE e.doc_id % 50 = 0)
      |SELECT a.doc_id AS corpus_id, eb.doc_id AS bench_id,
      |       CAST(count(*) AS BIGINT) AS shared
      |FROM e a JOIN eb ON a.sh = eb.sh AND a.doc_id != eb.doc_id
      |GROUP BY 1, 2 HAVING count(*) >= 5""".stripMargin

  /** Multimodal payload plumbing (§2.4 #40): binary + typed metadata. */
  val qMultimodalMeta: Q = (s, d) => {
    Multimodal.toMedia(Tables.documents(s, d), "text", "text")
      .select(col("doc_id"), col("media.modality").as("modality"),
              col("media.n_bytes").as("n_bytes"))
  }
  val qMultimodalMetaSql: String =
    """SELECT doc_id, 'text' AS modality, CAST(strlen(text) AS BIGINT) AS n_bytes
      |FROM documents""".stripMargin

  /** Video frame-sampling plumbing (§2.4 #40): every stride-th frame
    * index explodes to a row; the oracle checks the closed form. */
  val qFrameSample: Q = (s, d) => {
    val meta = Tables.documents(s, d).select(col("doc_id"),
      ((col("n_chars") % 50) + 1).cast("int").as("n_frames"))
    Multimodal.frameSample(meta, "n_frames", stride = 7)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sampled"), max("frame_idx").cast("long").as("max_idx"))
  }
  val qFrameSampleSql: String =
    """SELECT doc_id,
      |  CAST(floor((n_chars % 50) / 7) + 1 AS BIGINT) AS n_sampled,
      |  CAST(7 * floor((n_chars % 50) / 7) AS BIGINT) AS max_idx
      |FROM documents""".stripMargin

  /** Unigram-LM quality proxy (§2.4): score each document by the mean
    * negative log2 probability of its tokens under the corpus's own
    * unigram distribution (high = rare/garbled, low = common prose).
    * Two map-side-combined aggregations + one join; the corpus total
    * rides along as a broadcast 1-row cross join — no collect(). */
  val qUnigramLogprob: Q = (s, d) => {
    val toks = Tables.documents(s, d).select(col("doc_id"),
      explode(TextAnalysis.wsTokens(lower(col("text")))).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum("cnt").as("total"))
    toks.join(freq, "tok").crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(dround(avg(-log2(col("cnt").cast("double") / col("total"))), 4)
        .as("avg_neg_logp"))
  }
  val qUnigramLogprobSql: String =
    """WITH toks AS (SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
      |                       x -> len(x) > 0)) AS tok
      |  FROM documents),
      |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq)
      |SELECT doc_id, round(avg(-log2(CAST(cnt AS DOUBLE) / total)), 4) AS avg_neg_logp
      |FROM toks JOIN freq USING (tok) CROSS JOIN tot
      |GROUP BY doc_id""".stripMargin

  /** Per-label embedding centroids (§2.4), first 4 dimensions: the
    * building block of IVF training / semantic-dedup cluster summaries.
    * posexplode → (label, dim) groupBy keeps the whole reduction
    * map-side-combinable; no vectors are collected anywhere. */
  val qEmbedCentroid: Q = (s, d) => {
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .filter(col("pos") < 4)
      .groupBy(col("label"), (col("pos") + 1).as("dim"))
      .agg(dround(avg(col("v").cast("double")), 6).as("mean_v"))
  }
  val qEmbedCentroidSql: String =
    """SELECT label, CAST(dim AS BIGINT) AS dim, round(avg(v), 6) AS mean_v
      |FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
      |             generate_subscripts(embedding, 1) AS dim
      |      FROM embeddings)
      |WHERE dim <= 4 GROUP BY label, dim""".stripMargin

  /** Boilerplate line removal (§2.4): 3-line docs where line 1 is shared
    * across ~1/7th of the corpus (dropped at sf≥0.01, kept at sf0.001 —
    * the doc-frequency threshold is what's under test). The digest sorts
    * lines so the oracle needn't reproduce order (order is spec-tested). */
  val qLineDedup: Q = (s, d) => {
    val docs3 = Tables.documents(s, d).select(col("doc_id"),
      concat(lit("H"), col("doc_id") % 7, lit("\n"),
             lit("B"), col("doc_id"), lit("\n"),
             substring(col("text"), 1, 30)).as("txt"))
    Dedup.dropBoilerplateLines(docs3, "doc_id", "txt", minDocFreq = 60)
      .select(col("doc_id"),
        md5(array_join(array_sort(split(col("clean_text"), "\n", -1)), "\n")
          .cast("binary")).as("clean_md5"),
        col("n_kept"))
  }
  val qLineDedupSql: String =
    """WITH t AS (SELECT doc_id, 'H' || CAST(doc_id % 7 AS VARCHAR) AS l1,
      |                  'B' || CAST(doc_id AS VARCHAR) AS l2,
      |                  substring(text, 1, 30) AS l3 FROM documents),
      |l AS (SELECT doc_id, unnest([l1, l2, l3]) AS line FROM t),
      |f AS (SELECT line, count(DISTINCT doc_id) AS df FROM l GROUP BY line),
      |k AS (SELECT doc_id, line FROM l JOIN f USING (line) WHERE df < 60)
      |SELECT doc_id, md5(string_agg(line, chr(10) ORDER BY line)) AS clean_md5,
      |       count(*) AS n_kept
      |FROM k GROUP BY doc_id""".stripMargin

  /** Corpus vocabulary head (§2.4): top-25 tokens by frequency with a
    * deterministic (count desc, token asc) order — the Zipf head every
    * tokenizer/quality audit starts from. Explode → map-side-combined
    * groupBy on the token, then a single-partition top-k. */
  val qTokenTopk: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(explode(TextAnalysis.wsTokens(lower(col("text")))).as("token"))
    toks.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(25)
  }
  val qTokenTopkSql: String =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
      |                                x -> len(x) > 0)) AS token
      |      FROM documents)
      |GROUP BY token ORDER BY n DESC, token LIMIT 25""".stripMargin

  /** URL canonicalization (§2.4): messy URLs synthesized from doc
    * columns (mixed-case host, www., tracking params, fragment, trailing
    * slash); normalizeUrl must land exactly on the closed-form canonical
    * URL the oracle computes. */
  val qUrlNormalize: Q = (s, d) => {
    val sub = when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit(""))
    val trail = when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit(""))
    val url = concat(lit("https://"), sub, col("source"), lit(".Example.com/p/"),
      col("doc_id"), trail,
      lit("?utm_source=feed&id="), col("doc_id") % 13, lit("&utm_campaign=c&q=t#sec"))
    Tables.documents(s, d).select(col("doc_id"), url.as("url"))
      .select(col("doc_id"),
        TextAnalysis.urlHost(col("url")).as("host"),
        TextAnalysis.urlDomain(col("url")).as("domain"),
        TextAnalysis.normalizeUrl(col("url")).as("clean_url"))
  }
  val qUrlNormalizeSql: String =
    """SELECT doc_id,
      |  source || '.example.com' AS host,
      |  'example.com' AS domain,
      |  'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR)
      |    || '?id=' || CAST(doc_id % 13 AS VARCHAR) || '&q=t' AS clean_url
      |FROM documents""".stripMargin

  /** Real container-header parsing (§2.4 #40b): payloads with valid
    * PNG/GIF/BMP/WAV/JPEG headers are synthesized from doc columns
    * (format by doc_id mod 5), then graft_media_header parses the
    * dimensions back out; the oracle recomputes them in closed form. */
  val qMediaHeader: Q = (s, d) => {
    import org.apache.spark.sql.Column
    def beHex(c: Column, nBytes: Int): Column = lpad(hex(c), nBytes * 2, "0")
    def leHex(c: Column, nBytes: Int): Column = {
      val be = beHex(c, nBytes)
      concat((nBytes - 1 to 0 by -1).map(i => substring(be, i * 2 + 1, 2)): _*)
    }
    val doc = Tables.documents(s, d)
    val w = (col("doc_id") % 1000 + 16).cast("int")
    val h = (col("doc_id") % 500 + 9).cast("int")
    val rate = ((col("doc_id") % 8) * 4000 + 8000).cast("int")
    val ch = (col("doc_id") % 2 + 1).cast("int")
    val pngHex = concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      beHex(w, 4), beHex(h, 4), lit("0806000000"))
    val gifHex = concat(lit("474946383961"), leHex(w, 2), leHex(h, 2), lit("F70000"))
    val bmpHex = concat(lit("424D" + "0" * 24 + "28000000"),
      leHex(w, 4), leHex(h, 4), lit("0100"), leHex(lit(24), 2))
    val wavHex = concat(lit("52494646"), leHex(lit(36), 4), lit("57415645" + "666D7420"),
      leHex(lit(16), 4), leHex(lit(1), 2), leHex(ch, 2), leHex(rate, 4),
      leHex((rate * ch * 2).cast("int"), 4), leHex((ch * 2).cast("int"), 2), leHex(lit(16), 2))
    val jpegHex = concat(lit("FFD8" + "FFE0" + "0010" + "4A46494600010100000100010000"
        + "FFC0" + "0011" + "08"),
      beHex(h, 2), beHex(w, 2), lit("03" + "011100" + "021101" + "031101"))
    val payload = unhex(
      when(col("doc_id") % 5 === 0, pngHex)
        .when(col("doc_id") % 5 === 1, gifHex)
        .when(col("doc_id") % 5 === 2, bmpHex)
        .when(col("doc_id") % 5 === 3, wavHex)
        .otherwise(jpegHex))
    doc.select(col("doc_id"), Multimodal.parseHeader(payload).as("hdr"))
      .select(col("doc_id"), col("hdr.format").as("format"),
        col("hdr.width").as("width"), col("hdr.height").as("height"),
        col("hdr.sample_rate").as("sample_rate"), col("hdr.channels").as("channels"),
        col("hdr.bit_depth").as("bit_depth"))
  }
  val qMediaHeaderSql: String =
    """SELECT doc_id,
      |  CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
      |       WHEN 2 THEN 'bmp' WHEN 3 THEN 'wav' ELSE 'jpeg' END AS format,
      |  CASE WHEN doc_id % 5 = 3 THEN NULL ELSE CAST(doc_id % 1000 + 16 AS INT) END AS width,
      |  CASE WHEN doc_id % 5 = 3 THEN NULL ELSE CAST(doc_id % 500 + 9 AS INT) END AS height,
      |  CASE WHEN doc_id % 5 = 3 THEN CAST((doc_id % 8) * 4000 + 8000 AS INT) END AS sample_rate,
      |  CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 4 WHEN 2 THEN 3
      |       WHEN 3 THEN CAST(doc_id % 2 + 1 AS INT) WHEN 4 THEN 3 END AS channels,
      |  CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 8 WHEN 2 THEN 24
      |       WHEN 3 THEN 16 WHEN 4 THEN 8 END AS bit_depth
      |FROM documents""".stripMargin

  /** REAL media decode (§2.4 #40, r6): payloads are REAL files — PNGs
    * encoded by JDK ImageIO (red gradient rBase+x, constant g/b) and
    * hand-written PCM16 WAVs (±amp square wave) — decoded back by
    * [[Multimodal.decodeMedia]] (ImageIO pixels / javax.sound PCM). The
    * oracle recomputes every statistic in closed form: gradient mean is
    * rBase+(w−1)/2, square-wave RMS is exactly amp/32768. Columns that
    * don't apply to a modality are null. */
  val qMediaDecode: Q = (s, d) => {
    val synth = udf { (id: Long) =>
      if (id % 2 == 0)
        Multimodal.synthPng((id % 16 + 4).toInt, (id % 8 + 2).toInt,
          (id % 200).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt)
      else
        Multimodal.synthWavSquare(((id % 8) * 4000 + 8000).toInt,
          (id % 50 + 8).toInt, ((id % 4 + 1) * 4096).toInt)
    }
    val withPayload = Tables.documents(s, d)
      .select(col("doc_id")).withColumn("payload", synth(col("doc_id")))
    Multimodal.decodeMedia(s, withPayload).select(
      col("doc_id"),
      col("decoded.kind").as("kind"),
      col("decoded.width").as("width"),
      col("decoded.height").as("height"),
      dround(col("decoded.mean_r"), 4).as("mean_r"),
      dround(col("decoded.mean_g"), 4).as("mean_g"),
      dround(col("decoded.mean_b"), 4).as("mean_b"),
      dround(col("decoded.mean_lum"), 4).as("mean_lum"),
      col("decoded.sample_rate").as("sample_rate"),
      col("decoded.n_frames").as("n_frames"),
      dround(col("decoded.duration_s"), 6).as("duration_s"),
      dround(col("decoded.rms"), 4).as("rms"))
  }
  val qMediaDecodeSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
      |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 16 + 4 AS INT) END AS width,
      |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 8 + 2 AS INT) END AS height,
      |  CASE WHEN doc_id % 2 = 0 THEN
      |    round((doc_id % 200) + (doc_id % 16 + 3) * 0.5e0, 4) END AS mean_r,
      |  CASE WHEN doc_id % 2 = 0 THEN
      |    round(CAST(doc_id * 7 % 256 AS DOUBLE), 4) END AS mean_g,
      |  CASE WHEN doc_id % 2 = 0 THEN
      |    round(CAST(doc_id * 13 % 256 AS DOUBLE), 4) END AS mean_b,
      |  CASE WHEN doc_id % 2 = 0 THEN
      |    round(0.299e0 * ((doc_id % 200) + (doc_id % 16 + 3) * 0.5e0)
      |        + 0.587e0 * (doc_id * 7 % 256)
      |        + 0.114e0 * (doc_id * 13 % 256), 4) END AS mean_lum,
      |  CASE WHEN doc_id % 2 = 1 THEN
      |    CAST((doc_id % 8) * 4000 + 8000 AS INT) END AS sample_rate,
      |  CASE WHEN doc_id % 2 = 1 THEN CAST(doc_id % 50 + 8 AS BIGINT) END AS n_frames,
      |  CASE WHEN doc_id % 2 = 1 THEN
      |    round(CAST(doc_id % 50 + 8 AS DOUBLE)
      |        / ((doc_id % 8) * 4000 + 8000), 6) END AS duration_s,
      |  CASE WHEN doc_id % 2 = 1 THEN
      |    round((doc_id % 4 + 1) * 4096 / 32768e0, 4) END AS rms
      |FROM documents""".stripMargin

  /** REAL frame-sampling decode (§2.4 #40a, r6): animated GIFs are
    * synthesized with one solid-gray frame per index (JDK ImageIO
    * sequence writer), then every 2nd frame is decoded back — only the
    * sampled frames pay decode cost. The oracle enumerates the sampled
    * indices with generate_series and recomputes each frame's exact
    * gray level. */
  val qFrameDecode: Q = (s, d) => {
    val synth = udf { (id: Long) =>
      val n = (id % 5 + 2).toInt
      Multimodal.synthGif(8, 4, (0 until n).map(i => (id % 200 + 10 * i).toInt))
    }
    val withPayload = Tables.documents(s, d)
      .select(col("doc_id")).withColumn("payload", synth(col("doc_id")))
    Multimodal.decodeFrames(s, withPayload, stride = 2)
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        col("frame_w"), col("frame_h"), dround(col("mean_r"), 4).as("mean_r"))
  }
  val qFrameDecodeSql: String =
    """SELECT doc_id, CAST(fi AS INT) AS frame_idx,
      |       CAST(doc_id % 5 + 2 AS INT) AS n_frames,
      |       CAST(8 AS INT) AS frame_w, CAST(4 AS INT) AS frame_h,
      |       round(CAST(doc_id % 200 + 10 * fi AS DOUBLE), 4) AS mean_r
      |FROM (SELECT doc_id,
      |        unnest(generate_series(0, CAST(doc_id % 5 + 1 AS BIGINT), 2)) AS fi
      |      FROM documents)""".stripMargin

  /** Exact substring-span dedup (§2.4, r6): docs get a shared boilerplate
    * prefix (doc_id mod 7 variants) so 4-token spans provably recur
    * across ~1/7 of the corpus; duplicateSpans must flag exactly the
    * positions the oracle recomputes token-by-token. */
  val qDupSpans: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"),
      concat(lit("the shared span marker number "), col("doc_id") % 7,
             lit(" ends here "), col("text")).as("txt"))
    Dedup.duplicateSpans(docs, "doc_id", "txt", spanTokens = 4, minDocs = 2)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"),
        md5(array_join(array_sort(collect_list(
          concat(col("pos").cast("string"), lit(":"), col("span")))), "|")
          .cast("binary")).as("spans_md5"))
  }
  val qDupSpansSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(
      |           'the shared span marker number ' || CAST(doc_id % 7 AS VARCHAR)
      |             || ' ends here ' || text, '\s+'),
      |           x -> len(x) > 0) AS ts
      |  FROM documents),
      |w AS (SELECT doc_id, i AS pos,
      |             array_to_string(list_slice(ts, i + 1, i + 4), ' ') AS span
      |      FROM t, LATERAL (SELECT unnest(range(0, len(ts) - 4 + 1)) AS i) r
      |      WHERE len(ts) >= 4),
      |g AS (SELECT span FROM w GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
      |f AS (SELECT w.* FROM w JOIN g USING (span))
      |SELECT doc_id, count(*) AS n_dup_spans,
      |       md5(string_agg(CAST(pos AS VARCHAR) || ':' || span, '|'
      |                      ORDER BY CAST(pos AS VARCHAR) || ':' || span)) AS spans_md5
      |FROM f GROUP BY doc_id""".stripMargin

  /** Cut pass over the flagged spans (§2.4, r6): rebuild text with every
    * covered token removed; the oracle recomputes coverage and the
    * ordered rebuild token-by-token. */
  val qCutSpans: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"),
      concat(lit("the shared span marker number "), col("doc_id") % 7,
             lit(" ends here "), col("text")).as("txt"))
    Dedup.cutDuplicateSpans(docs, "doc_id", "txt", spanTokens = 4, minDocs = 2)
      .select(col("doc_id"), col("n_kept"),
        md5(col("clean_text").cast("binary")).as("clean_md5"))
  }
  val qCutSpansSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(
      |           'the shared span marker number ' || CAST(doc_id % 7 AS VARCHAR)
      |             || ' ends here ' || text, '\s+'),
      |           x -> len(x) > 0) AS ts
      |  FROM documents),
      |w AS (SELECT doc_id, i AS pos,
      |             array_to_string(list_slice(ts, i + 1, i + 4), ' ') AS span
      |      FROM t, LATERAL (SELECT unnest(range(0, len(ts) - 4 + 1)) AS i) r
      |      WHERE len(ts) >= 4),
      |g AS (SELECT span FROM w GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
      |cov AS (SELECT DISTINCT doc_id, pos + o AS idx
      |        FROM w JOIN g USING (span),
      |             LATERAL (SELECT unnest(range(0, 4)) AS o) q),
      |tok AS (SELECT doc_id, unnest(ts) AS tok,
      |               generate_subscripts(ts, 1) - 1 AS idx
      |        FROM t),
      |kept AS (SELECT tok.* FROM tok
      |         LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.idx = cov.idx
      |         WHERE cov.doc_id IS NULL)
      |SELECT doc_id, count(*) AS n_kept,
      |       md5(string_agg(tok, ' ' ORDER BY idx)) AS clean_md5
      |FROM kept GROUP BY doc_id""".stripMargin

  /** The fixed keyword query set for the retrieval family — terms from
    * the synthetic corpus vocabulary so every query has matches. */
  private def retrievalQueries(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((0L, "hash join table"), (1L, "window agg stream"),
        (2L, "fast scan filter"), (3L, "vector merge sort column"))
      .toDF("query_id", "qtext")
  }

  /** BM25 ranked retrieval (§2.4, r10): Okapi BM25 top-10 per keyword
    * query, query terms broadcast so only matching postings aggregate. */
  val qBm25Search: Q = (s, d) =>
    Retrieval.bm25TopK(Tables.documents(s, d), "doc_id", "text",
      retrievalQueries(s), "query_id", "qtext", k = 10)
  val qBm25SearchSql: String =
    """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
      |              FROM documents),
      |dl AS (SELECT doc_id, len(t) AS dl FROM toks),
      |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |queries(query_id, qtext) AS (VALUES (0, 'hash join table'), (1, 'window agg stream'),
      |                                    (2, 'fast scan filter'), (3, 'vector merge sort column')),
      |qt AS (SELECT DISTINCT query_id, term FROM (
      |         SELECT CAST(query_id AS BIGINT) AS query_id,
      |                unnest(string_split(qtext, ' ')) AS term FROM queries)),
      |terms AS (SELECT DISTINCT term FROM qt),
      |tf AS (SELECT doc_id, term, count(*) AS tf
      |       FROM (SELECT doc_id, unnest(t) AS term FROM toks) w
      |       JOIN terms USING (term) GROUP BY 1, 2),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |wsc AS (SELECT tf.doc_id, tf.term,
      |               ln(1.0 + (n - df + 0.5) / (df + 0.5)) * (tf * 2.2) /
      |               (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS wt
      |        FROM tf JOIN dft USING (term) JOIN dl USING (doc_id), stats),
      |sc AS (SELECT qt.query_id, wsc.doc_id, round(sum(wt), 6) AS score, count(*) AS n_terms
      |       FROM wsc JOIN qt USING (term) GROUP BY 1, 2)
      |SELECT query_id, doc_id, score, n_terms, rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
      |  FROM sc)
      |WHERE rk <= 10""".stripMargin

  /** Persistent BM25 index round trip (§2.4 38k, r15 — the q_pq_index
    * pattern for the inverted index): build the bucketed postings
    * layout from the corpus, then SERVE the same query set from it —
    * the oracle is the full inline BM25 computation, so a pass proves
    * the persisted layout is semantically transparent (tf/dl/df/stats
    * all survive the disk round trip exactly). Bm25IndexSpec
    * additionally pins row-identity across appends and compaction. */
  val qBm25Index: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val path = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_bm25_index_" + d.replaceAll("[^A-Za-z0-9._-]", "_")).toString
    // r19: bucket count derived from corpus size (autoBuckets — the
    // Pq.autoCells discipline) instead of a pinned 32; the count is a
    // parquet metadata read. Scores/rankings are bucket-invariant, so
    // the oracle sees identical rows.
    graft.operators.Bm25Index.buildIndex(s, docs, path,
      nBuckets = graft.operators.Bm25Index.autoBuckets(docs.count()))
    graft.operators.Bm25Index.searchIndex(s, path, retrievalQueries(s), k = 10)
  }
  val qBm25IndexSql: String = qBm25SearchSql

  /** Token-window chunking (§2.4, r10): 40-token windows, stride 30 —
    * the RAG/pretraining chunk grain; narrow, shuffle-free. */
  val qChunkDocs: Q = (s, d) =>
    Retrieval.chunkTokens(Tables.documents(s, d), "doc_id", "text",
      chunkLen = 40, stride = 30)
  val qChunkDocsSql: String =
    """WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
      |           FROM documents),
      |c AS (SELECT doc_id, toks,
      |             unnest(generate_series(0, greatest(len(toks) - 1, 0), 30)) AS s
      |      FROM t)
      |SELECT doc_id, CAST(s // 30 AS BIGINT) AS chunk_id,
      |       array_to_string(toks[s + 1 : s + 40], ' ') AS chunk_text,
      |       CAST(least(40, len(toks) - s) AS BIGINT) AS n_chunk_tokens
      |FROM c""".stripMargin

  /** Hybrid retrieval (§2.4, r10): reciprocal-rank fusion of the BM25
    * ranking with the exact-cosine dense ranking (query_id n = embedding
    * vec_id n for n < 4) — rank-based, so fusion math is exact. */
  val qHybridRrf: Q = (s, d) => {
    val lexical = Retrieval.bm25TopK(Tables.documents(s, d), "doc_id", "text",
        retrievalQueries(s), "query_id", "qtext", k = 10)
      .select("query_id", "doc_id", "rk")
    val emb = Tables.embeddings(s, d)
    val dense = Ann.bruteForceTopKPartitioned(s, emb, emb.filter(col("vec_id") < 4), k = 10)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rk"))
    Retrieval.rrfFuse(lexical, dense, k = 10)
  }
  val qHybridRrfSql: String =
    """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
      |              FROM documents),
      |dl AS (SELECT doc_id, len(t) AS dl FROM toks),
      |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |queries(query_id, qtext) AS (VALUES (0, 'hash join table'), (1, 'window agg stream'),
      |                                    (2, 'fast scan filter'), (3, 'vector merge sort column')),
      |qt AS (SELECT DISTINCT query_id, term FROM (
      |         SELECT CAST(query_id AS BIGINT) AS query_id,
      |                unnest(string_split(qtext, ' ')) AS term FROM queries)),
      |terms AS (SELECT DISTINCT term FROM qt),
      |tf AS (SELECT doc_id, term, count(*) AS tf
      |       FROM (SELECT doc_id, unnest(t) AS term FROM toks) w
      |       JOIN terms USING (term) GROUP BY 1, 2),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |wsc AS (SELECT tf.doc_id, tf.term,
      |               ln(1.0 + (n - df + 0.5) / (df + 0.5)) * (tf * 2.2) /
      |               (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS wt
      |        FROM tf JOIN dft USING (term) JOIN dl USING (doc_id), stats),
      |sc AS (SELECT qt.query_id, wsc.doc_id, round(sum(wt), 6) AS score
      |       FROM wsc JOIN qt USING (term) GROUP BY 1, 2),
      |lex AS (SELECT query_id, doc_id, rk FROM (
      |          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
      |          FROM sc) WHERE rk <= 10),
      |dense AS (SELECT query_id, vec_id AS doc_id, rk FROM (
      |            SELECT q.vec_id AS query_id, c.vec_id,
      |                   row_number() OVER (
      |                     PARTITION BY q.vec_id
      |                     ORDER BY round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
      |                                                           CAST(q.embedding AS DOUBLE[])), 6) DESC,
      |                              c.vec_id) AS rk
      |            FROM embeddings c, (SELECT * FROM embeddings WHERE vec_id < 4) q
      |            WHERE c.vec_id != q.vec_id)
      |          WHERE rk <= 10),
      |f AS (SELECT coalesce(a.query_id, b.query_id) AS query_id,
      |             coalesce(a.doc_id, b.doc_id) AS doc_id,
      |             round(coalesce(1.0 / (60 + a.rk), 0.0) + coalesce(1.0 / (60 + b.rk), 0.0), 9) AS rrf_score
      |      FROM lex a FULL OUTER JOIN dense b
      |        ON a.query_id = b.query_id AND a.doc_id = b.doc_id)
      |SELECT query_id, doc_id, rrf_score, rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rk
      |  FROM f)
      |WHERE rk <= 10""".stripMargin

  /** Deterministic k-means over int8-quantized embeddings (§2.4, r10):
    * k=8, two assignment passes; integer-sum centroids make every
    * cosine exact, so the oracle replays the full Lloyd iteration. */
  val qEmbedKmeans: Q = (s, d) =>
    Cluster.kmeansAssign(Tables.embeddings(s, d), "vec_id", "embedding",
      k = 8, iters = 2)
  val qEmbedKmeansSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id, list_transform(v, x -> floor(x / s + 0.5)) AS c
      |      FROM (SELECT vec_id, v,
      |              CASE WHEN list_max(list_transform(v, y -> abs(y))) = 0 THEN 1.0
      |                   ELSE list_max(list_transform(v, y -> abs(y))) / 127.0 END AS s
      |            FROM e)),
      |c0 AS (SELECT vec_id AS cid, c AS cv FROM q WHERE vec_id < 8),
      |a1 AS (SELECT vec_id, cid FROM (
      |         SELECT q.vec_id, c0.cid,
      |                row_number() OVER (PARTITION BY q.vec_id
      |                  ORDER BY list_cosine_similarity(q.c, c0.cv) DESC, c0.cid) AS rk
      |         FROM q, c0) WHERE rk = 1),
      |s1 AS (SELECT cid, list(s ORDER BY i) AS cv FROM (
      |         SELECT cid, i, sum(ci) AS s FROM (
      |           SELECT a1.cid, unnest(generate_series(1, len(q.c))) AS i, unnest(q.c) AS ci
      |           FROM a1 JOIN q USING (vec_id))
      |         GROUP BY cid, i)
      |       GROUP BY cid)
      |SELECT vec_id, cid AS cluster, round(sim, 6) AS sim FROM (
      |  SELECT q.vec_id, s1.cid, list_cosine_similarity(q.c, s1.cv) AS sim,
      |         row_number() OVER (PARTITION BY q.vec_id
      |           ORDER BY list_cosine_similarity(q.c, s1.cv) DESC, s1.cid) AS rk
      |  FROM q, s1) WHERE rk = 1""".stripMargin

  /** Cluster-balanced sampling (§2.4, r10): k-means clusters capped at
    * 25 rows each by a seeded md5 permutation — over-dense clusters
    * downsample, rare clusters survive whole. */
  val qClusterSample: Q = (s, d) =>
    Cluster.balancedSample(
      Cluster.kmeansAssign(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 8, iters = 2)
        .select(col("vec_id"), col("cluster")),
      "vec_id", "cluster", perCluster = 25, seed = "cs7")
  val qClusterSampleSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id, list_transform(v, x -> floor(x / s + 0.5)) AS c
      |      FROM (SELECT vec_id, v,
      |              CASE WHEN list_max(list_transform(v, y -> abs(y))) = 0 THEN 1.0
      |                   ELSE list_max(list_transform(v, y -> abs(y))) / 127.0 END AS s
      |            FROM e)),
      |c0 AS (SELECT vec_id AS cid, c AS cv FROM q WHERE vec_id < 8),
      |a1 AS (SELECT vec_id, cid FROM (
      |         SELECT q.vec_id, c0.cid,
      |                row_number() OVER (PARTITION BY q.vec_id
      |                  ORDER BY list_cosine_similarity(q.c, c0.cv) DESC, c0.cid) AS rk
      |         FROM q, c0) WHERE rk = 1),
      |s1 AS (SELECT cid, list(s ORDER BY i) AS cv FROM (
      |         SELECT cid, i, sum(ci) AS s FROM (
      |           SELECT a1.cid, unnest(generate_series(1, len(q.c))) AS i, unnest(q.c) AS ci
      |           FROM a1 JOIN q USING (vec_id))
      |         GROUP BY cid, i)
      |       GROUP BY cid),
      |a2 AS (SELECT vec_id, cid FROM (
      |         SELECT q.vec_id, s1.cid,
      |                row_number() OVER (PARTITION BY q.vec_id
      |                  ORDER BY list_cosine_similarity(q.c, s1.cv) DESC, s1.cid) AS rk
      |         FROM q, s1) WHERE rk = 1)
      |SELECT vec_id, cluster FROM (
      |  SELECT vec_id, cid AS cluster,
      |         row_number() OVER (PARTITION BY cid
      |           ORDER BY md5('cs7:' || CAST(vec_id AS VARCHAR)), vec_id) AS rk
      |  FROM a2) WHERE rk <= 25""".stripMargin

  /** Domain-level filtering (§2.4, r10): C4/RefinedWeb-style curation
    * at the SOURCE grain — keep documents whose source's mean token
    * count clears the corpus mean (a domain-quality gate, not a
    * per-doc one). Shape: per-source aggregate + one global scalar
    * (exact sum/count divisions), gate broadcasts back as a semi-join
    * so the doc stream is never shuffled. */
  val qDomainFilter: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val scored = docs.select(col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")).as("n_tok"))
    val bySrc = scored.groupBy("source")
      .agg((sum(col("n_tok")).cast("double") / count(lit(1))).as("avg_tok"))
    val global = scored
      .agg((sum(col("n_tok")).cast("double") / count(lit(1))).as("g_avg"))
    val good = bySrc.crossJoin(broadcast(global))
      .filter(col("avg_tok") >= col("g_avg")).select("source")
    docs.join(broadcast(good), Seq("source"), "left_semi")
      .select(col("doc_id"), col("source"))
  }
  val qDomainFilterSql: String =
    """WITH n AS (SELECT doc_id, source,
      |             CAST(len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS BIGINT) AS n_tok
      |           FROM documents),
      |bysrc AS (SELECT source, CAST(sum(n_tok) AS DOUBLE) / count(*) AS avg_tok FROM n GROUP BY 1),
      |g AS (SELECT CAST(sum(n_tok) AS DOUBLE) / count(*) AS g_avg FROM n),
      |good AS (SELECT source FROM bysrc, g WHERE avg_tok >= g_avg)
      |SELECT doc_id, source FROM documents WHERE source IN (SELECT source FROM good)""".stripMargin

  /** Token-budget mixture assembly (§2.4, r11): the step after
    * [[qDomainFilter]]/[[qSampleStratified]] in corpus mixing — each
    * source fills a token QUOTA (not a row fraction): keep, per source,
    * the prefix of a seeded md5 document order whose cumulative token
    * count stays within that source's budget. Rate-based sampling can't
    * express "2B tokens of web, 500M of code" — this is that op.
    * Distribution: [[graft.operators.Scale.tokenBudgetSample]] splits
    * the md5 key space into deterministic ordered buckets and assembles
    * exact per-source running sums from bucket-local windows +
    * per-(source, bucket) offsets, so no source ever funnels through one
    * reducer (the naive PARTITION BY source window the oracle uses
    * would). */
  val qTokenBudgetMix: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")).as("n_tok"))
    // Budgets are CONFIG in the real op ("2B tokens web / 500M code");
    // here both sides derive from ONE rule over the generator's source
    // domain (GenSf: source = "src" + i % 20): numeric suffix < 10 →
    // 600, else 150. The oracle's CASE applies that rule to ANY
    // source, while the Scala map only covers its own domain — so if
    // the generator's modulus ever grows, grow `srcDomain` with it or
    // new sources are silently dropped here yet budgeted there.
    val srcDomain = 0 until 20
    val budgets =
      srcDomain.map(i => s"src$i" -> (if (i < 10) 600L else 150L)).toMap
    graft.operators.Scale
      .tokenBudgetSample(docs, "doc_id", "source", "n_tok", budgets, seed = "mx1")
      .select(col("doc_id"), col("source"))
  }
  val qTokenBudgetMixSql: String =
    """WITH n AS (SELECT doc_id, source,
      |    CAST(len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS BIGINT) AS n_tok,
      |    CASE WHEN CAST(substring(source, 4) AS INT) < 10 THEN 600 ELSE 150 END AS budget
      |  FROM documents),
      |c AS (SELECT doc_id, source, budget,
      |        sum(n_tok) OVER (PARTITION BY source
      |          ORDER BY md5('mx1:' || CAST(doc_id AS VARCHAR)), doc_id) AS cum
      |      FROM n)
      |SELECT doc_id, source FROM c WHERE cum <= budget""".stripMargin

  /** Temperature-scaled source mixture (§2.4 37p, r12): p_s ∝ √n_s,
    * the pre-UniMax multilingual sampling standard — run next to
    * [[qUnimaxQuota]] to see the published critique in the data: at
    * B=30000 the four small languages oversample past 1 epoch
    * (epochs_used > 1) while `en` under-fills, exactly what UniMax's
    * cap prevents. α=0.5 via `sqrt` (IEEE-correctly-rounded in both
    * engines); weight total accumulated in ascending-source order so
    * the double sum matches bitwise. */
  val qTemperatureMix: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("lang"),
      TextAnalysis.tokenCount(col("text")).as("n_tok"))
    graft.operators.Scale
      .temperatureQuota(docs, "lang", "n_tok", totalBudget = 30000L)
      .select(col("source"), col("n_tokens"),
        dround(col("share"), 6).as("share"),
        dround(col("quota_tokens"), 4).as("quota_tokens"),
        dround(col("epochs_used"), 6).as("epochs_used"))
  }
  val qTemperatureMixSql: String =
    """WITH sizes AS (
      |  SELECT lang AS source,
      |    CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |w AS (SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS wgt FROM sizes),
      |c AS (SELECT *, sum(wgt) OVER (ORDER BY source
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM w),
      |t AS (SELECT *, max(cum) OVER () AS total FROM c)
      |SELECT source, n_tokens,
      |  round(wgt / total, 6) AS share,
      |  round(30000.0 * (wgt / total), 4) AS quota_tokens,
      |  round((30000.0 * (wgt / total)) / greatest(CAST(n_tokens AS DOUBLE), 1.0), 6) AS epochs_used
      |FROM t""".stripMargin

  /** UniMax source quotas (§2.4 37n, r12): water-filling token-budget
    * split across sources under a per-source epoch cap (Chung et al.
    * 2023; see [[graft.operators.Scale.unimaxQuota]] for the closed
    * form and the S-row scale argument). Grouped by `lang` — the
    * corpus's genuinely skewed axis — with budget/epoch-cap as config:
    * at sf0.01 (B=20000, C=1.0) the four small languages cap out at one
    * epoch and `en` absorbs the re-shared remainder, exercising both
    * sides of the water level. Exact SQL oracle: identical sorted
    * prefix-sum accumulation order, so the doubles agree bitwise. */
  val qUnimaxQuota: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("lang"),
      TextAnalysis.tokenCount(col("text")).as("n_tok"))
    graft.operators.Scale
      .unimaxQuota(docs, "lang", "n_tok", totalBudget = 20000L, maxEpochs = 1.0)
      .select(col("source"), col("n_tokens"),
        dround(col("cap_tokens"), 4).as("cap_tokens"),
        dround(col("quota_tokens"), 4).as("quota_tokens"),
        dround(col("epochs_used"), 6).as("epochs_used"),
        col("capped"))
  }
  val qUnimaxQuotaSql: String =
    """WITH sizes AS (
      |  SELECT lang AS source,
      |    CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |w AS (
      |  SELECT source, n_tokens, CAST(n_tokens AS DOUBLE) * 1.0 AS cap_tokens,
      |    row_number() OVER (ORDER BY CAST(n_tokens AS DOUBLE) * 1.0, source) AS r,
      |    coalesce(sum(CAST(n_tokens AS DOUBLE) * 1.0) OVER (
      |      ORDER BY CAST(n_tokens AS DOUBLE) * 1.0, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix,
      |    count(*) OVER () AS L
      |  FROM sizes),
      |t AS (SELECT *, (20000.0 - prefix) / CAST(L - r + 1 AS DOUBLE) AS u FROM w),
      |t2 AS (SELECT *, max(u) OVER () AS theta FROM t)
      |SELECT source, n_tokens,
      |  round(cap_tokens, 4) AS cap_tokens,
      |  round(least(cap_tokens, theta), 4) AS quota_tokens,
      |  round(least(cap_tokens, theta) / greatest(CAST(n_tokens AS DOUBLE), 1.0), 6) AS epochs_used,
      |  cap_tokens <= theta AS capped
      |FROM t2""".stripMargin

  /** Stupid Backoff scoring (§2.4 37q, r12): Brants et al. 2007,
    * "Large Language Models in Machine Translation" — THE published
    * LM-scoring scheme designed for MapReduce-scale corpora (no
    * normalized probabilities, no held-out smoothing fits — relative
    * frequencies with a fixed 0.4 backoff penalty, which is exactly
    * what stays cheap when the model is a distributed count table).
    * S(w3|w1w2) = c123/c12 if the trigram was seen, else
    * 0.4·c23/c2, else 0.4²·c3/N (OOV floor: count 1).
    *
    * The model trains on the EVEN half of the corpus (deterministic
    * doc_id % 2 split) and scores EVERY doc — scoring the corpus with
    * its own counts would never back off (every trigram has c ≥ 1);
    * the held-out half genuinely exercises all three levels, and the
    * per-level hit fractions are exposed as signals. Scale shape: the
    * model is three count tables built by map-side-combined aggs; the
    * scoring stream joins them KEYED on its own gram columns
    * (sort-merge at 100 TB — the distributed analog of Brants' sharded
    * LM servers); N is a broadcast 1-row cross join. A trigram's
    * prefix bigram is always in the bigram table when the trigram is
    * (prefix positions are a superset), so the top CASE arm never
    * divides by null. Docs with <3 tokens have no trigram positions
    * and drop (oracle agrees by construction). */
  val qStupidBackoff: Q = (s, d) => {
    val toks = Tables.documents(s, d).select(col("doc_id"),
      TextAnalysis.wsTokens(lower(col("text"))).as("toks"))
    def triPos(df: DataFrame): DataFrame = df
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - 2),
        i => struct(element_at(col("toks"), i).as("w1"),
          element_at(col("toks"), i + 1).as("w2"),
          element_at(col("toks"), i + 2).as("w3")))).as("t"))
      .select(col("doc_id"), col("t.w1"), col("t.w2"), col("t.w3"))
    def biPos(df: DataFrame): DataFrame = df
      .filter(size(col("toks")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => struct(element_at(col("toks"), i).as("w1"),
          element_at(col("toks"), i + 1).as("w2")))).as("t"))
      .select(col("t.w1"), col("t.w2"))
    val even = toks.filter(col("doc_id") % 2 === 0)
    val ct = triPos(even).groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123"))
    val cb = biPos(even).groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val cu = even.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val nN = even.select(explode(col("toks")).as("w")).agg(count(lit(1)).as("n"))
    val scored = triPos(toks)
      .join(ct, Seq("w1", "w2", "w3"), "left")
      .join(cb, Seq("w1", "w2"), "left")
      .join(cb.toDF("b1", "b2", "c23"),
        col("w2") === col("b1") && col("w3") === col("b2"), "left")
      .join(cu.toDF("u2", "cu2"), col("w2") === col("u2"), "left")
      .join(cu.toDF("u3", "cu3"), col("w3") === col("u3"), "left")
      .crossJoin(broadcast(nN))
      .withColumn("s",
        when(col("c123").isNotNull,
          col("c123").cast("double") / col("c12"))
        .when(col("c23").isNotNull,
          lit(0.4) * (col("c23").cast("double") / col("cu2")))
        .otherwise(lit(0.4) * lit(0.4) *
          (coalesce(col("cu3"), lit(1L)).cast("double") / col("n"))))
      .withColumn("lev",
        when(col("c123").isNotNull, 3)
          .when(col("c23").isNotNull, 2).otherwise(1))
    scored.groupBy("doc_id").agg(
      dround(avg(-log2(col("s"))), 4).as("neg_logp2"),
      dround(avg(when(col("lev") === 3, 1.0).otherwise(0.0)), 6).as("tri_frac"),
      dround(avg(when(col("lev") === 2, 1.0).otherwise(0.0)), 6).as("bi_frac"),
      dround(avg(when(col("lev") === 1, 1.0).otherwise(0.0)), 6).as("uni_frac"))
  }
  val qStupidBackoffSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
      |  FROM documents),
      |tri AS (
      |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3
      |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
      |        FROM t WHERE len(toks) >= 3)),
      |ct AS (SELECT w1, w2, w3, count(*) AS c123 FROM tri WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
      |ebi AS (
      |  SELECT toks[i] AS w1, toks[i+1] AS w2
      |  FROM (SELECT toks, unnest(range(1, len(toks))) AS i
      |        FROM t WHERE doc_id % 2 = 0 AND len(toks) >= 2)),
      |cb AS (SELECT w1, w2, count(*) AS c12 FROM ebi GROUP BY 1, 2),
      |euni AS (SELECT unnest(toks) AS w FROM t WHERE doc_id % 2 = 0),
      |cu AS (SELECT w, count(*) AS cw FROM euni GROUP BY 1),
      |nn AS (SELECT count(*) AS n FROM euni),
      |sc AS (
      |  SELECT tri.doc_id,
      |    CASE WHEN ct.c123 IS NOT NULL THEN CAST(ct.c123 AS DOUBLE) / cb12.c12
      |         WHEN cb23.c12 IS NOT NULL THEN 0.4 * (CAST(cb23.c12 AS DOUBLE) / cu2.cw)
      |         ELSE 0.4 * 0.4 * (CAST(coalesce(cu3.cw, 1) AS DOUBLE) / nn.n) END AS s,
      |    CASE WHEN ct.c123 IS NOT NULL THEN 3
      |         WHEN cb23.c12 IS NOT NULL THEN 2 ELSE 1 END AS lev
      |  FROM tri
      |  LEFT JOIN ct ON tri.w1 = ct.w1 AND tri.w2 = ct.w2 AND tri.w3 = ct.w3
      |  LEFT JOIN cb cb12 ON tri.w1 = cb12.w1 AND tri.w2 = cb12.w2
      |  LEFT JOIN cb cb23 ON tri.w2 = cb23.w1 AND tri.w3 = cb23.w2
      |  LEFT JOIN cu cu2 ON tri.w2 = cu2.w
      |  LEFT JOIN cu cu3 ON tri.w3 = cu3.w
      |  CROSS JOIN nn)
      |SELECT doc_id,
      |  round(avg(-log2(s)), 4) AS neg_logp2,
      |  round(avg(CASE WHEN lev = 3 THEN 1.0 ELSE 0.0 END), 6) AS tri_frac,
      |  round(avg(CASE WHEN lev = 2 THEN 1.0 ELSE 0.0 END), 6) AS bi_frac,
      |  round(avg(CASE WHEN lev = 1 THEN 1.0 ELSE 0.0 END), 6) AS uni_frac
      |FROM sc GROUP BY doc_id""".stripMargin

  /** Bigram-LM quality proxy (§2.4, r11): the CCNet-style LM filter one
    * order up from [[qUnigramLogprob]] — mean negative log2 conditional
    * probability of each document's bigrams under the corpus's own
    * add-one-smoothed bigram model, P(w2|w1) = (c(w1w2)+1)/(c1(w1)+V).
    * Garbled text pairs words the corpus never pairs, so it scores high
    * even when every individual token is common (what the unigram proxy
    * can't see). Shape: bigrams from two array slices zipped (narrow),
    * two map-side-combined count aggs keyed by bigram/left-token, V as
    * a broadcast 1-row cross join — every join keyed on the bigram
    * stream's own columns, nothing driver-side. Docs with <2 tokens
    * have no bigrams and drop (oracle agrees by construction). */
  val qBigramLogprob: Q = (s, d) => bigramPpl(s, d)

  /** Per-doc mean −log2 P under the corpus bigram model (the 37g
    * stream), shared by `q_bigram_logprob` and the CCNet bucketing. */
  private def bigramPpl(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d).select(col("doc_id"),
      TextAnalysis.wsTokens(lower(col("text"))).as("toks"))
    val big = toks.select(col("doc_id"), explode(
      when(size(col("toks")) >= 2, zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(typedLit(Seq.empty[String]))).as("bg"))
    val c12 = big.groupBy("bg").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum("c12").as("c1"))
    val v = toks.select(explode(col("toks")).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    big.join(c12, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(c1, "w1")
      .crossJoin(broadcast(v))
      .groupBy("doc_id")
      .agg(dround(avg(-log2((col("c12") + 1).cast("double") / (col("c1") + col("v")))), 4)
        .as("avg_neg_logp2"))
  }
  val qBigramLogprobSql: String =
    """WITH toks AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
      |  FROM documents),
      |e AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks),
      |bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS bg
      |       FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |c12 AS (SELECT bg, count(*) AS c12 FROM bg GROUP BY 1),
      |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v FROM e)
      |SELECT bg.doc_id, round(avg(-log2((c12 + 1) / (c1 + v))), 4) AS avg_neg_logp2
      |FROM bg JOIN c12 USING (bg)
      |JOIN c1 ON split_part(bg.bg, ' ', 1) = c1.w1
      |CROSS JOIN v
      |GROUP BY bg.doc_id""".stripMargin

  /** CCNet perplexity bucketing (§2.4 37k, r12; Wenzek et al. 2019,
    * arXiv:1911.00359 §3): split the corpus into head/middle/tail
    * terciles by LM perplexity — CCNet's central curation move (keep
    * head+middle, drop or down-weight tail). Cut points come from an
    * EXACT percentile over a deterministic md5 half-sample of docs —
    * the paper fits its LM thresholds on a sample too, and at 100 TB
    * an exact percentile over ALL docs would buffer 10¹⁰ values in one
    * agg; the sample is rate-bounded config. Cuts broadcast as one row;
    * bucketing is a narrow compare — no global sort, no ntile window. */
  val qCcnetBuckets: Q = (s, d) => {
    val ppl = bigramPpl(s, d)
    val sampled = ppl.filter(substring(md5(concat(lit("ccq:"),
      col("doc_id").cast("string")).cast("binary")), 1, 1) < lit("8"))
    val cuts = sampled.agg(
      percentile(col("avg_neg_logp2"), lit(1.0 / 3)).as("c1"),
      percentile(col("avg_neg_logp2"), lit(2.0 / 3)).as("c2"))
    ppl.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("avg_neg_logp2"),
        when(col("avg_neg_logp2") <= col("c1"), "head")
          .when(col("avg_neg_logp2") <= col("c2"), "middle")
          .otherwise("tail").as("bucket"))
  }
  val qCcnetBucketsSql: String =
    """WITH toks AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
      |  FROM documents),
      |e AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks),
      |bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS bg
      |       FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |c12 AS (SELECT bg, count(*) AS c12 FROM bg GROUP BY 1),
      |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v FROM e),
      |w AS (SELECT bg.doc_id, round(avg(-log2((c12 + 1) / (c1 + v))), 4) AS avg_neg_logp2
      |      FROM bg JOIN c12 USING (bg)
      |      JOIN c1 ON split_part(bg.bg, ' ', 1) = c1.w1
      |      CROSS JOIN v GROUP BY bg.doc_id),
      |cuts AS (SELECT
      |    quantile_cont(CAST(avg_neg_logp2 AS DOUBLE), 1.0/3) AS c1,
      |    quantile_cont(CAST(avg_neg_logp2 AS DOUBLE), 2.0/3) AS c2
      |  FROM w WHERE substr(md5('ccq:' || CAST(doc_id AS VARCHAR)), 1, 1) < '8')
      |SELECT doc_id, avg_neg_logp2,
      |  CASE WHEN avg_neg_logp2 <= c1 THEN 'head'
      |       WHEN avg_neg_logp2 <= c2 THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM w CROSS JOIN cuts""".stripMargin

  /** Curation pipeline v2 (§2.4 37r, r12): the round's NEW panel
    * family composed into the end-to-end flow a 100 TB curation run
    * actually executes — Gopher rule gate (37j, reused verbatim) →
    * within-doc repetition gate (37m's top-n-gram signals on the raw
    * text) → char-entropy band (37l) → CCNet perplexity-tail drop
    * (37k, reused verbatim) → exact near-dup canonicalization
    * (normalized fingerprint, min-doc_id winner among gate-passing
    * docs). Output is the AUDIT TABLE (one row per input doc, each
    * gate's verdict exposed) rather than just survivors — the
    * drop-reason histogram is the first thing a curation run reads.
    *
    * Scale: the gates are the already-audited shapes (two zero-shuffle
    * panels, the bigram-stream aggs, one broadcast cut-point row); the
    * only NEW exchange is the fingerprint window — the dedup shuffle
    * any exact-dedup pass pays. Thresholds are corpus config. */
  val qCurationV2: Q = (s, d) => {
    import graft.functions.Gopher
    val g = qGopherRules(s, d).select(col("doc_id"), col("pass").as("gopher_pass"))
    val cc = qCcnetBuckets(s, d).select(col("doc_id"), col("bucket"))
    val base = Tables.documents(s, d)
      .select(col("doc_id"), Gopher.repetitionPanel(col("text")).as("p"),
        dround(TextAnalysis.charEntropy(col("text")), 4).as("entropy"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .select(col("doc_id"), col("entropy"), col("fp"),
        dround(col("p").getField("top2_frac"), 6).as("top2_frac"),
        dround(col("p").getField("top3_frac"), 6).as("top3_frac"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    base.join(g, "doc_id").join(cc, "doc_id")
      .withColumn("rep_ok", col("top2_frac") <= 0.12 && col("top3_frac") <= 0.15)
      .withColumn("entropy_ok", col("entropy").between(4.0, 5.5))
      .withColumn("gates", col("gopher_pass") && col("rep_ok") &&
        col("entropy_ok") && col("bucket") =!= "tail")
      .withColumn("canon",
        min(when(col("gates"), col("doc_id"))).over(w))
      .withColumn("kept", col("gates") && col("doc_id") === col("canon"))
      .select("doc_id", "gopher_pass", "rep_ok", "entropy_ok", "bucket", "kept")
  }
  val qCurationV2Sql: String = {
    // the gopher/ccnet blocks are the 37j/37k oracles verbatim; the
    // repetition gate needs only n=2,3 of 37m's machinery on raw toks
    """WITH t AS (SELECT doc_id, text,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks,
      |    list_filter(string_split(text, chr(10)), l -> len(trim(l)) > 0) AS ls
      |  FROM documents),
      |gop AS (SELECT doc_id,
      |    (CAST(len(toks) AS BIGINT) BETWEEN 40 AND 100000
      |     AND round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
      |          / greatest(len(toks), 1), 4) BETWEEN 3.0 AND 10.0
      |     AND round(CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS DOUBLE)
      |          / greatest(len(toks), 1), 4) < 0.1
      |     AND round(CAST(len(list_filter(ls, l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE)
      |          / greatest(len(ls), 1), 4) <= 0.9
      |     AND round(CAST(len(list_filter(ls, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS DOUBLE)
      |          / greatest(len(ls), 1), 4) <= 0.3
      |     AND round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
      |          / greatest(len(toks), 1), 4) >= 0.8
      |     AND CAST(len(list_filter(['the','a','data','join','to','of'],
      |       w -> list_contains(list_transform(toks, x -> lower(x)), w))) AS INT) >= 2
      |    ) AS gopher_pass
      |  FROM t),
      |tok AS (SELECT doc_id, s.w AS w, s.i AS pos
      |        FROM (SELECT doc_id,
      |                unnest([{'w': toks[i], 'i': i} FOR i IN range(1, len(toks) + 1)]) AS s
      |              FROM t)),
      |off AS (SELECT doc_id, w, pos, len(w) AS lw,
      |          CAST(coalesce(sum(len(w)) OVER (PARTITION BY doc_id ORDER BY pos
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
      |        FROM tok),
      |tc AS (SELECT doc_id, CAST(sum(lw) AS DOUBLE) AS chars FROM off GROUP BY 1),
      |ld AS (SELECT doc_id, pos, w, lw, o,
      |         lead(w, 1) OVER win AS w1, lead(w, 2) OVER win AS w2,
      |         lead(o + lw, 1) OVER win AS e1, lead(o + lw, 2) OVER win AS e2
      |       FROM off WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
      |g AS (
      |  SELECT doc_id, 2 AS n, concat_ws(chr(1), w, w1) AS k, o AS s, e1 AS e FROM ld WHERE w1 IS NOT NULL
      |  UNION ALL SELECT doc_id, 3, concat_ws(chr(1), w, w1, w2), o, e2 FROM ld WHERE w2 IS NOT NULL),
      |cnt AS (SELECT doc_id, n, k, count(*) AS c, max(e - s) AS klen FROM g GROUP BY 1, 2, 3),
      |tm AS (SELECT doc_id, n, max(c) AS mc FROM cnt GROUP BY 1, 2),
      |tv AS (SELECT cnt.doc_id, cnt.n, max(cnt.c * cnt.klen) AS num
      |       FROM cnt JOIN tm ON cnt.doc_id = tm.doc_id AND cnt.n = tm.n AND cnt.c = tm.mc
      |       GROUP BY 1, 2),
      |rep AS (SELECT t.doc_id,
      |    (round(coalesce(t2.num / nullif(tc.chars, 0), 0), 6) <= 0.12
      |     AND round(coalesce(t3.num / nullif(tc.chars, 0), 0), 6) <= 0.15) AS rep_ok
      |  FROM t
      |  LEFT JOIN tc ON t.doc_id = tc.doc_id
      |  LEFT JOIN (SELECT doc_id, num FROM tv WHERE n = 2) t2 ON t.doc_id = t2.doc_id
      |  LEFT JOIN (SELECT doc_id, num FROM tv WHERE n = 3) t3 ON t.doc_id = t3.doc_id),
      |ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
      |ccq AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
      |ent0 AS (SELECT doc_id, CAST(sum(n) AS DOUBLE) AS tot, sum(n * log2(n)) AS s2
      |      FROM ccq GROUP BY 1),
      |ent AS (SELECT doc_id,
      |    round(log2(tot) - s2 / tot, 4) BETWEEN 4.0 AND 5.5 AS entropy_ok FROM ent0),
      |lt AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t2
      |  FROM documents),
      |e AS (SELECT doc_id, unnest(t2) AS w, generate_subscripts(t2, 1) AS i FROM lt),
      |bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS bg
      |       FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |c12 AS (SELECT bg, count(*) AS c12 FROM bg GROUP BY 1),
      |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v FROM e),
      |ppl AS (SELECT bg.doc_id, round(avg(-log2((c12 + 1) / (c1 + v))), 4) AS avg_neg_logp2
      |      FROM bg JOIN c12 USING (bg)
      |      JOIN c1 ON split_part(bg.bg, ' ', 1) = c1.w1
      |      CROSS JOIN v GROUP BY bg.doc_id),
      |cuts AS (SELECT
      |    quantile_cont(CAST(avg_neg_logp2 AS DOUBLE), 1.0/3) AS cc1,
      |    quantile_cont(CAST(avg_neg_logp2 AS DOUBLE), 2.0/3) AS cc2
      |  FROM ppl WHERE substr(md5('ccq:' || CAST(doc_id AS VARCHAR)), 1, 1) < '8'),
      |bkt AS (SELECT doc_id,
      |    CASE WHEN avg_neg_logp2 <= cc1 THEN 'head'
      |         WHEN avg_neg_logp2 <= cc2 THEN 'middle'
      |         ELSE 'tail' END AS bucket
      |  FROM ppl CROSS JOIN cuts),
      |fp AS (SELECT doc_id,
      |    md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp FROM documents),
      |gated AS (
      |  SELECT d.doc_id, gop.gopher_pass, rep.rep_ok, ent.entropy_ok, bkt.bucket, fp.fp,
      |    (gop.gopher_pass AND rep.rep_ok AND ent.entropy_ok AND bkt.bucket != 'tail') AS gates
      |  FROM documents d
      |  JOIN gop ON d.doc_id = gop.doc_id
      |  JOIN rep ON d.doc_id = rep.doc_id
      |  JOIN ent ON d.doc_id = ent.doc_id
      |  JOIN bkt ON d.doc_id = bkt.doc_id
      |  JOIN fp ON d.doc_id = fp.doc_id)
      |SELECT doc_id, gopher_pass, rep_ok, entropy_ok, bucket,
      |  (gates AND doc_id = min(CASE WHEN gates THEN doc_id END)
      |     OVER (PARTITION BY fp)) AS kept
      |FROM gated""".stripMargin
  }

  /** Drop-reason rollup (r13, verdict stretch #8) — the FIRST table a
    * curation run reads: the per-doc audit verdicts of [[qCurationV2]]
    * collapsed to one row per drop reason under a fixed gate precedence
    * (gopher → repetition → entropy → ccnet tail → duplicate → kept).
    * Exactly one new exchange over the audited plan: a map-side-combined
    * groupBy on ≤6 keys — free at any scale. */
  val qCurationReport: Q = (s, d) => {
    val reason = when(!col("gopher_pass"), "gopher")
      .when(!col("rep_ok"), "repetition")
      .when(!col("entropy_ok"), "entropy")
      .when(col("bucket") === "tail", "ccnet_tail")
      .when(!col("kept"), "duplicate")
      .otherwise("kept")
    qCurationV2(s, d)
      .withColumn("reason", reason)
      .groupBy("reason").agg(count(lit(1)).as("n_docs"))
  }
  val qCurationReportSql: String =
    s"""WITH v2 AS (${qCurationV2Sql})
       |SELECT CASE WHEN NOT gopher_pass THEN 'gopher'
       |            WHEN NOT rep_ok THEN 'repetition'
       |            WHEN NOT entropy_ok THEN 'entropy'
       |            WHEN bucket = 'tail' THEN 'ccnet_tail'
       |            WHEN NOT kept THEN 'duplicate'
       |            ELSE 'kept' END AS reason,
       |  count(*) AS n_docs
       |FROM v2 GROUP BY 1""".stripMargin

  /** Unicode NFC normalization (§2.4 37s, r12): the dedup pre-pass real
    * pipelines run first (SlimPajama's cleaning step) — canonically
    * equivalent strings with different codepoint sequences hash apart
    * and defeat exact AND near dedup. The ASCII synthetic corpus is
    * NFC-invariant, so every third doc gets a deterministic decomposed
    * sequence injected ("e" → "e"+COMBINING ACUTE) that NFC must
    * compose back to "é"; both engines build the mutation identically
    * and the oracle normalizes with DuckDB's own `nfc_normalize`.
    * Narrow native expression, no shuffle — scan-bound at 100 TB. */
  val qNfcNormalize: Q = (s, d) => {
    val mutated = when(col("doc_id") % 3 === 0,
      regexp_replace(col("text"), "e", "e\u0301")).otherwise(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), mutated.as("m"))
      .select(col("doc_id"),
        TextAnalysis.nfcNormalize(col("m")).as("n"), col("m"))
      .select(col("doc_id"),
        (col("n") =!= col("m")).as("nfc_changed"),
        length(col("m")).as("len_before"),
        length(col("n")).as("len_after"),
        md5(col("n").cast("binary")).as("nfc_md5"))
  }
  val qNfcNormalizeSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN replace(text, 'e', 'e' || chr(769))
      |         ELSE text END AS m
      |  FROM documents),
      |n AS (SELECT doc_id, m, nfc_normalize(m) AS n FROM m)
      |SELECT doc_id, n != m AS nfc_changed,
      |  CAST(length(m) AS INT) AS len_before,
      |  CAST(length(n) AS INT) AS len_after,
      |  md5(n) AS nfc_md5
      |FROM n""".stripMargin

  /** Whitespace-contract fixture (r13): the synthetic corpus is
    * plain-ASCII-spaced, so nothing ever exercised the divergence the
    * r12 verdict flagged — native byte-tokenizers used
    * Character.isWhitespace (which sweeps 0x1C–0x1F, the ASCII
    * file/group/record/unit separators found in real web crawls) while
    * `wsTokens` and every SQL oracle split on Java-regex \s. Same
    * injection pattern as [[qNfcNormalize]]: every third doc gets 0x1C
    * embedded after each 'a' and 0x1F before each 'r' (both engines
    * mutate identically), then the REGEX token count, the NATIVE
    * top-token fraction and the NATIVE panel's dup_line_frac are
    * emitted side by side. The oracle recomputes all three from string
    * tokens — a pass means the unified contract (TextHash.isWs == \s)
    * holds on text that actually contains the once-divergent bytes. */
  val qWsContract: Q = (s, d) => {
    val mutated = when(col("doc_id") % 3 === 0,
      regexp_replace(regexp_replace(col("text"), "a", "a\u001C"), "r", "\u001Fr"))
      .otherwise(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), mutated.as("m"))
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("m")).as("n_tokens"),
        dround(graft.plans.TextHashExpressions.topTokenFraction(col("m")), 6)
          .as("top_tok_frac"),
        dround(graft.plans.TextHashExpressions.repetitionPanel(col("m"))
          .getField("dup_line_frac"), 6).as("dup_line_frac"))
  }
  val qWsContractSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0
      |      THEN replace(replace(text, 'a', 'a' || chr(28)), 'r', chr(31) || 'r')
      |      ELSE text END AS m
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, t
      |  FROM (SELECT doc_id, unnest(regexp_split_to_array(m, '\s+')) AS t FROM m)
      |  WHERE t != ''),
      |c AS (SELECT doc_id, t, count(*) AS n FROM tok GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
      |    round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_tok_frac
      |  FROM c GROUP BY 1),
      |seg AS (
      |  SELECT doc_id, trim(x, chr(32) || chr(9) || chr(13) || chr(10)) AS g
      |  FROM (SELECT doc_id, unnest(string_split(m, chr(10))) AS x FROM m)
      |  WHERE trim(x, chr(32) || chr(9) || chr(13) || chr(10)) != ''),
      |sc AS (SELECT doc_id, g, count(*) AS n FROM seg GROUP BY 1, 2),
      |ln AS (
      |  SELECT doc_id,
      |    round(CAST(sum(n) - count(*) AS DOUBLE) / sum(n), 6) AS dup_line_frac
      |  FROM sc GROUP BY 1)
      |SELECT agg.doc_id, agg.n_tokens, agg.top_tok_frac, ln.dup_line_frac
      |FROM agg JOIN ln ON agg.doc_id = ln.doc_id""".stripMargin

  // --------------------------------------------------- HTML stage-0 (r16)
  // Every real pretraining chain starts from crawl HTML; these queries
  // pin the jusText-style extractor ([[graft.operators.Html]]) with the
  // 37s/37t fixture discipline: BOTH engines construct the page from
  // document columns with identical concatenation, so the extractor's
  // output is exactly predictable in SQL. documents.text is known
  // single-spaced with no '<', '&', or newline (verified across
  // testdata SFs) — the wrap is injective and the oracle exact.

  /** Second content paragraph: > 200 chars for every doc_id, so the
    * no-stoplist classifier marks it good directly (len > lengthHigh). */
  private def htmlPara2(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("the remaining prose of document "), id.cast("string"),
      lit(" continues with additional context sentences that keep this " +
        "block comfortably beyond the two hundred character boundary " +
        "required by the published classifier for a direct good verdict " +
        "in the absence of a stoplist across every row of the corpus"))

  private val htmlPara2Sql: String =
    "'the remaining prose of document ' || CAST(doc_id AS VARCHAR) || " +
      "' continues with additional context sentences that keep this " +
      "block comfortably beyond the two hundred character boundary " +
      "required by the published classifier for a direct good verdict " +
      "in the absence of a stoplist across every row of the corpus'"

  /** The boilerplate page: nav (link-dense → bad), heading (short),
    * two content paragraphs, a stray short block, a © footer. */
  private[graft] def htmlWrap(withPara2: Boolean): org.apache.spark.sql.Column = {
    val pieces = Seq(
      lit("<html><head><title>corpus page</title><style>p{margin:0}</style>" +
        "<script>var tracker=1;</script></head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/about\">About us</a> " +
        "<a href=\"/contact\">Contact</a></nav>"),
      lit("<h1>Doc "), col("doc_id").cast("string"), lit(" heading</h1>"),
      lit("<p>"), col("text"), lit("</p>")) ++
      (if (withPara2) Seq(lit("<p>"), htmlPara2(col("doc_id")), lit("</p>")) else Nil) ++
      Seq(lit("<p>fin</p>" +
        "<div>© graft corpus <a href=\"/terms\">terms of use</a></div>" +
        "</body></html>"))
    concat(pieces: _*)
  }

  private[graft] def htmlWrapSql(withPara2: Boolean): String = {
    val p2 = if (withPara2) s" || '<p>' || $htmlPara2Sql || '</p>'" else ""
    "'<html><head><title>corpus page</title><style>p{margin:0}</style>" +
      "<script>var tracker=1;</script></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/about\">About us</a> " +
      "<a href=\"/contact\">Contact</a></nav>" +
      "<h1>Doc ' || CAST(doc_id AS VARCHAR) || ' heading</h1>" +
      "<p>' || text || '</p>'" + p2 +
      " || '<p>fin</p>" +
      "<div>' || chr(169) || ' graft corpus <a href=\"/terms\">terms of use</a></div>" +
      "</body></html>'"
  }

  /** §2.4 HTML→text (r16): default-parameter jusText classification
    * over the full fixture. Expected output is derivable per the
    * published rules: para2 (>200 chars) is good; para1 survives iff
    * len ≥ lengthLow (near-good/good next to a good block — the short
    * class needs BOTH neighbors good and the nav side is bad); the
    * heading, "fin", nav and © footer all drop. */
  /** ParseDocument pdf mode (r17, NiFi 2.x GenAI): every document's
    * text round-trips through REAL PDF bytes — [[graft.operators.Doc
    * .synthPdf]] writes a one-page PDF per row (odd doc_ids
    * Flate-compressed, even raw; doc_id % 3 == 0 additionally gets
    * the PDF 1.5 layout — objects inside an /ObjStm, a /Type /XRef
    * cross-reference stream with PNG predictor — so all THREE layout
    * paths run in the catalog, r18) and the native `graft_pdf_text`
    * extractor recovers the text EXACTLY, so the oracle is the source
    * column itself. Narrow per-row work, zero shuffle; the udf is the
    * fixture GENERATOR (the audio/video payload discipline), the
    * extractor under test is the native. */
  val qParsePdf: Q = (s, d) => {
    // four layout paths in one catalog row (r18): raw, Flate, PDF 1.5
    // object-stream, and CID/Type0-with-ToUnicode — every extraction
    // mode the module supports, each EXACT against the same oracle
    val synth = udf { (id: Long, text: String) =>
      if (id % 5 == 0) graft.operators.Doc.synthPdfCid(text)
      else graft.operators.Doc.synthPdf(text, compress = id % 2 == 1,
        objectStreams = id % 3 == 0) }
    Tables.documents(s, d)
      .withColumn("payload", synth(col("doc_id"), col("text")))
      .select(col("doc_id"),
        graft.plans.DocExpressions.pdfText(col("payload")).as("extracted"))
  }
  val qParsePdfSql: String =
    "SELECT doc_id, text AS extracted FROM documents"

  /** ParseDocument markdown mode (r17): a markdown document is
    * synthesized IN-PLAN from each row's columns (heading, emphasis,
    * blockquote, bullets, a link, a fenced code block, a pipe table —
    * one of every stripped construct), so the expected plain text is a
    * pure string concat the DuckDB oracle states exactly. */
  val qParseMarkdown: Q = (s, d) => {
    val md = concat(
      lit("# Doc "), col("doc_id"),
      lit("\n\n**"), col("lang"), lit("** intro\n\n> quoted "), col("source"),
      lit("\n\n- first item\n- [ref](http://example.com/r) tail\n\n```\ncode "),
      col("doc_id"),
      lit("\n```\n\n| a | b |\n|---|---|\n| 1 | 2 |\n\n"), col("text"))
    Tables.documents(s, d).withColumn("md", md)
      .select(col("doc_id"),
        graft.plans.DocExpressions.markdownText(col("md")).as("plain"))
  }
  val qParseMarkdownSql: String =
    """SELECT doc_id,
      |  'Doc ' || doc_id || chr(10) || chr(10) ||
      |  lang || ' intro' || chr(10) || chr(10) ||
      |  'quoted ' || source || chr(10) || chr(10) ||
      |  'first item' || chr(10) || 'ref tail' || chr(10) || chr(10) ||
      |  'code ' || doc_id || chr(10) || chr(10) ||
      |  'a b' || chr(10) || '1 2' || chr(10) || chr(10) ||
      |  text AS plain
      |FROM documents""".stripMargin

  val qHtmlExtract: Q = (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"), htmlWrap(withPara2 = true).as("html"))
      .select(col("doc_id"),
        graft.plans.HtmlFunctions.mainText(col("html"), useStoplist = false)
          .as("main_text"))
  }
  val qHtmlExtractSql: String =
    s"""SELECT doc_id,
       |  CASE WHEN length(text) >= 70
       |    THEN text || chr(10) || $htmlPara2Sql
       |    ELSE $htmlPara2Sql END AS main_text
       |FROM documents""".stripMargin

  /** §2.4 curation-from-crawl-bytes (r16): stage-0 extraction wired in
    * front of the Gopher rule panel (37j). With lengthLow = 20 /
    * lengthHigh = 40 every document paragraph (≥ 44 chars) classifies
    * good while the heading (< 20), "fin", nav and footer drop — so
    * extraction is exactly `text` and the panel must reproduce
    * q_gopher_rules verbatim: the oracle IS qGopherRulesSql. Pins that
    * the HTML stage is semantically transparent to the panel. */
  val qHtmlPipeline: Q = (s, d) => {
    import graft.functions.Gopher
    val th = Gopher.Thresholds(minWords = 40,
      stopWords = Seq("the", "a", "data", "join", "to", "of"))
    // lengthLow = 25 keeps the fixture heading ("Doc <id> heading",
    // max 22 chars through 10-digit ids) in the Short class at ANY
    // scale factor; document paragraphs are >= 44 chars at every SF
    val extracted = Tables.documents(s, d)
      .select(col("doc_id"), htmlWrap(withPara2 = false).as("html"))
      .select(col("doc_id"),
        graft.plans.HtmlFunctions.mainText(col("html"), useStoplist = false,
          lengthLow = 25, lengthHigh = 40).as("text"))
    val t = col("text")
    extracted.select(
      col("doc_id"),
      TextAnalysis.tokenCount(t).as("n_words"),
      dround(TextAnalysis.meanTokenLen(t), 4).as("mean_word_len"),
      dround(Gopher.symbolRatio(t), 4).as("symbol_ratio"),
      dround(Gopher.bulletLineFrac(t), 4).as("bullet_frac"),
      dround(Gopher.ellipsisLineFrac(t), 4).as("ellipsis_frac"),
      dround(Gopher.alphaWordFrac(t), 4).as("alpha_word_frac"),
      Gopher.stopHits(t, th.stopWords).as("stop_hits"))
      .withColumn("pass", Gopher.passes(col("n_words"),
        col("mean_word_len"), col("symbol_ratio"), col("bullet_frac"),
        col("ellipsis_frac"), col("alpha_word_frac"), col("stop_hits"), th))
  }

  /** Character-entropy signal (§2.4 37l, r12; the Dolma toolkit's
    * gibberish/encoding-noise detector): Shannon entropy in bits of
    * each doc's codepoint distribution via the single-pass native
    * expression [[graft.plans.CharEntropy]] — natural prose ~4.0–4.5,
    * base64/minified/repeated-char text falls far outside. Narrow,
    * codegen-adjacent, no shuffle: the 100 TB cost is the scan. */
  val qCharEntropy: Q = (s, d) =>
    Tables.documents(s, d).select(col("doc_id"),
      dround(TextAnalysis.charEntropy(col("text")), 4).as("char_entropy"))
  val qCharEntropySql: String =
    """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
      |cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
      |t AS (SELECT doc_id, CAST(sum(n) AS DOUBLE) AS tot, sum(n * log2(n)) AS s
      |      FROM cc GROUP BY 1)
      |SELECT doc_id, round(log2(tot) - s / tot, 4) AS char_entropy FROM t""".stripMargin

  /** Trigram-LM quality proxy (§2.4 37h, r12): mean −log2 P(w3|w1,w2)
    * under the corpus's own add-one-smoothed trigram model,
    * P(w3|w1w2) = (c(w1w2w3)+1)/(c(w1w2)+V) with the CONTEXT count
    * derived from the trigram table itself (so both engines count
    * exactly the bigram occurrences that HAVE a successor — the
    * document-final bigram is not a trigram context). One decade
    * sharper than the bigram proxy at spotting templated/boilerplate
    * text (long exact n-gram reuse scores near zero) while garbled
    * text saturates the smoothing floor. Shape mirrors the bigram
    * query: trigrams from three zipped slices (narrow), two
    * map-side-combined count aggs, V broadcast as a 1-row cross join —
    * the model table is vocab³-bounded and every join is keyed on the
    * trigram stream's own columns. Docs with <3 tokens drop (oracle
    * agrees by construction). */
  val qTrigramLogprob: Q = (s, d) => {
    val toks = Tables.documents(s, d).select(col("doc_id"),
      TextAnalysis.wsTokens(lower(col("text"))).as("toks"))
    val tri = toks.select(col("doc_id"), explode(
      when(size(col("toks")) >= 3, zip_with(
        zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 2),
          slice(col("toks"), lit(2), size(col("toks")) - 2),
          (a, b) => concat(a, lit(" "), b)),
        slice(col("toks"), lit(3), size(col("toks")) - 2),
        (ab, c) => concat(ab, lit(" "), c)))
      .otherwise(typedLit(Seq.empty[String]))).as("tg"))
    val c123 = tri.groupBy("tg").agg(count(lit(1)).as("c123"))
    val c12 = c123.groupBy(substring_index(col("tg"), " ", 2).as("w12"))
      .agg(sum("c123").as("c12"))
    val v = toks.select(explode(col("toks")).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    tri.join(c123, "tg")
      .withColumn("w12", substring_index(col("tg"), " ", 2))
      .join(c12, "w12")
      .crossJoin(broadcast(v))
      .groupBy("doc_id")
      .agg(dround(avg(-log2((col("c123") + 1).cast("double") / (col("c12") + col("v")))), 4)
        .as("avg_neg_logp3"))
  }
  val qTrigramLogprobSql: String =
    """WITH toks AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
      |  FROM documents),
      |e AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks),
      |tg AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS tg
      |       FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |                JOIN e c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
      |c123 AS (SELECT tg, count(*) AS c123 FROM tg GROUP BY 1),
      |c12 AS (SELECT split_part(tg, ' ', 1) || ' ' || split_part(tg, ' ', 2) AS w12,
      |               sum(c123) AS c12 FROM c123 GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v FROM e)
      |SELECT tg.doc_id, round(avg(-log2((c123 + 1) / (c12 + v))), 4) AS avg_neg_logp3
      |FROM tg JOIN c123 USING (tg)
      |JOIN c12 ON split_part(tg.tg, ' ', 1) || ' ' || split_part(tg.tg, ' ', 2) = c12.w12
      |CROSS JOIN v
      |GROUP BY tg.doc_id""".stripMargin

  /** DSIR importance weights (§2.4 37i, r12): Xie et al. 2023's hashed
    * n-gram importance weight per document — how much more likely the
    * doc's unigram+bigram buckets are under the TARGET subset's model
    * than under the raw corpus's. Target here = the curated low-numbered
    * sources (suffix < 4), the stand-in for "Wikipedia/books" in the
    * synthetic corpus. See [[graft.operators.Dsir]] for the scale shape
    * (one linear (doc,bucket) shuffle, one ≤4096-row broadcast model). */
  val qDsirWeights: Q = (s, d) =>
    graft.operators.Dsir.importanceWeights(
      Tables.documents(s, d), "doc_id", "text",
      substring(col("source"), 4, 10).cast("int") < 4)
      .select(col("doc_id"), dround(col("dsir_logw"), 4).as("dsir_logw"))
  val qDsirWeightsSql: String =
    """WITH toks AS (SELECT doc_id,
      |    CAST(substring(source, 4) AS INT) < 4 AS tgt,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
      |  FROM documents),
      |e AS (SELECT doc_id, tgt, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks),
      |g AS (SELECT doc_id, tgt, w AS gram FROM e
      |      UNION ALL
      |      SELECT a.doc_id, a.tgt, a.w || ' ' || b.w
      |      FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |db AS (SELECT doc_id, tgt, substr(md5(gram), 1, 3) AS b, count(*) AS c
      |       FROM g GROUP BY 1, 2, 3),
      |model AS (SELECT b, sum(c) AS cr, sum(CASE WHEN tgt THEN c ELSE 0 END) AS ct
      |          FROM db GROUP BY 1),
      |scal AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM model),
      |lr AS (SELECT b, ln((ct + 1) / (nt + 4096.0)) - ln((cr + 1) / (nr + 4096.0)) AS lr
      |       FROM model CROSS JOIN scal)
      |SELECT db.doc_id, round(sum(c * lr), 4) AS dsir_logw
      |FROM db JOIN lr USING (b)
      |GROUP BY db.doc_id""".stripMargin

  /** DSIR Gumbel top-k resample (§2.4 37i, r12): the paper's actual
    * selection step — k docs drawn without replacement ∝ exp(logw/T)
    * via the Gumbel-max trick, with DETERMINISTIC md5-derived noise so
    * the draw is reproducible (and oracle-checkable) run to run. The
    * global top-k is TakeOrdered at scale, never a full sort. */
  val qDsirSample: Q = (s, d) => {
    val w = graft.operators.Dsir.importanceWeights(
      Tables.documents(s, d), "doc_id", "text",
      substring(col("source"), 4, 10).cast("int") < 4)
      .select(col("doc_id"), dround(col("dsir_logw"), 4).as("dsir_logw"))
    graft.operators.Dsir.gumbelTopK(w, "doc_id", "dsir_logw", k = 100,
        temperature = 2.0)
      .select(col("doc_id"), col("dsir_logw"),
        dround(col("gumbel_key"), 4).as("gumbel_key"))
  }
  val qDsirSampleSql: String =
    """WITH toks AS (SELECT doc_id,
      |    CAST(substring(source, 4) AS INT) < 4 AS tgt,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
      |  FROM documents),
      |e AS (SELECT doc_id, tgt, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks),
      |g AS (SELECT doc_id, tgt, w AS gram FROM e
      |      UNION ALL
      |      SELECT a.doc_id, a.tgt, a.w || ' ' || b.w
      |      FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |db AS (SELECT doc_id, tgt, substr(md5(gram), 1, 3) AS b, count(*) AS c
      |       FROM g GROUP BY 1, 2, 3),
      |model AS (SELECT b, sum(c) AS cr, sum(CASE WHEN tgt THEN c ELSE 0 END) AS ct
      |          FROM db GROUP BY 1),
      |scal AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM model),
      |lr AS (SELECT b, ln((ct + 1) / (nt + 4096.0)) - ln((cr + 1) / (nr + 4096.0)) AS lr
      |       FROM model CROSS JOIN scal),
      |w AS (SELECT db.doc_id, round(sum(c * lr), 4) AS dsir_logw
      |      FROM db JOIN lr USING (b) GROUP BY db.doc_id),
      |keyed AS (SELECT doc_id, dsir_logw,
      |    dsir_logw / 2.0 - ln(-ln(
      |      ('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
      |        / 281474976710656.0)) AS gk
      |  FROM w)
      |SELECT doc_id, dsir_logw, round(gk, 4) AS gumbel_key
      |FROM keyed ORDER BY gk DESC, doc_id LIMIT 100""".stripMargin

  /** BPE merge learning (§2.4 38g, r12): the real Sennrich-2016
    * procedure, distributed — merges learned from the corpus's
    * word-frequency table (vocabulary-sized after one shuffle; each
    * iteration is a narrow pair-explode + map-side-combined agg + a
    * ONE-row argmax collect). Declared no-oracle: the merge sequence
    * is an iterative argmax DuckDB SQL cannot express; BpeSpec pins a
    * hand-derived merge sequence, the greedy-apply reconstruction
    * property, and monotone token-count decrease.
    *
    * r13: the catalog runs [[graft.operators.Bpe.learnMergesFast]] —
    * incremental Sennrich statistics on the collected word-frequency
    * table, spec-pinned sequence-identical to the per-iteration
    * distributed recount and flat per-merge cost at 1k merges
    * (tools/bpe_probe_r13.json); the distributed form remains for
    * vocabularies past one node's memory. */
  val qBpeMerges: Q = (s, d) =>
    graft.operators.Bpe.learnMergesFast(Tables.documents(s, d), "text", numMerges = 24)

  /** BPE corpus tokenization with the learned merges: per-doc token
    * count + an order-stable digest of the token stream. The heavy
    * side is ONE mapPartitions-style pass with the numMerges-row model
    * broadcast and per-thread word memoization. No-oracle (model is
    * the iterative learn above); spec-gated. */
  val qBpeTokens: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val merges = graft.operators.Bpe.learnMergesFast(docs, "text", numMerges = 24)
    graft.operators.Bpe.applyMerges(docs, "text", merges)
      .select(col("doc_id"), col("bpe_n_tokens"),
        md5(array_join(col("bpe_tokens"), " ").cast("binary")).as("tokens_md5"))
  }

  /** Unigram-LM tokenization (§2.4 38i, r13 — Kudo 2018, the
    * SentencePiece unigram model; with BPE this covers both production
    * subword families): train on the corpus's word-frequency table
    * (one shuffle, then vocabulary-local EM + pruning), Viterbi-best
    * segmentation per word with the piece table broadcast. No-oracle
    * (EM + Viterbi are iterative argmax SQL can't express);
    * UnigramLmSpec pins Viterbi optimality against brute-force
    * segmentation enumeration, reconstruction, determinism and the
    * memo contract. */
  val qUlmTokens: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val model = graft.operators.UnigramLm.train(docs, "text", vocabSize = 64)
    graft.operators.UnigramLm.tokenize(docs, "text", model)
      .select(col("doc_id"), col("ulm_n_tokens"),
        md5(array_join(col("ulm_tokens"), " ").cast("binary")).as("tokens_md5"))
  }

  /** WordPiece tokenization (§2.4 38j, r15 — Schuster & Nakajima
    * 2012; Devlin et al. 2019 §A: BERT's tokenizer, completing the
    * production subword trio next to BPE and unigram-LM): train the
    * likelihood-scored merge vocabulary on the corpus's word-frequency
    * table (one shuffle, then the incremental trainer — exact-rational
    * argmax, spec-pinned identical to the per-iteration distributed
    * recount), then greedy longest-match-first encode with the
    * vocabulary broadcast in the native `graft_wordpiece_encode`
    * expression. No-oracle (likelihood-argmax training and greedy
    * longest-match are iterative argmax SQL can't express);
    * WordPieceSpec pins both trainer forms against an independent
    * reference implementation and the encoder against independent
    * greedy pseudocode. */
  val qWordPieceTokens: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val merges = graft.operators.WordPiece.learnVocabFast(docs, "text", numMerges = 24)
    val vocab = graft.operators.WordPiece.vocabSet(docs, "text", merges)
    graft.operators.WordPiece.applyVocab(docs, "text", vocab.toSeq)
      .select(col("doc_id"), col("wp_n_tokens"),
        md5(array_join(col("wp_tokens"), " ").cast("binary")).as("tokens_md5"))
  }

  /** DoReMi domain reweighting (§2.4 37v, r15 — Xie et al. 2023,
    * NeurIPS; see [[graft.operators.Scale.doremiWeights]]): the
    * excess-loss mixture optimizer, completing the mixture family
    * (temperature, UniMax, DSIR, token-budget). The offline excess
    * signal is the gap between the corpus's own two LM proxies —
    * unigram NLL (weak reference) minus bigram NLL (stronger proxy),
    * clipped at 0 — over the `lang` axis, so domains whose text the
    * stronger model explains much better (headroom) get upweighted
    * exactly as the paper prescribes. EXACT SQL oracle: the per-doc
    * NLL streams are the established 4dp-rounded q_unigram_logprob /
    * q_bigram_logprob fragments (bit-identical across engines by the
    * r11/r12 precedent), and the 4 multiplicative-weights steps
    * unroll as chained CTEs with the same ascending-domain ordered
    * normalizer accumulation. */
  val qDoremiMix: Q = (s, d) => {
    val uni = qUnigramLogprob(s, d)
    val bi = bigramPpl(s, d)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    val ex = uni.join(bi, "doc_id").join(docs, "doc_id")
      .select(col("lang"),
        (col("avg_neg_logp") - col("avg_neg_logp2")).as("excess_doc"))
    graft.operators.Scale
      .doremiWeights(ex, "lang", "excess_doc", eta = 0.1, iters = 4,
        smoothing = 1e-3)
      .select(col("domain"), dround(col("excess"), 6).as("excess"),
        dround(col("weight"), 6).as("weight"),
        dround(col("avg_weight"), 6).as("avg_weight"))
  }
  val qDoremiMixSql: String =
    """WITH toks AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
      |  FROM documents),
      |u AS (SELECT doc_id, unnest(t) AS tok FROM toks),
      |freq AS (SELECT tok, count(*) AS cnt FROM u GROUP BY tok),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq),
      |uni AS (SELECT doc_id, round(avg(-log2(CAST(cnt AS DOUBLE) / total)), 4) AS nll1
      |        FROM u JOIN freq USING (tok) CROSS JOIN tot GROUP BY doc_id),
      |e AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks),
      |bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS bg
      |       FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |c12 AS (SELECT bg, count(*) AS c12 FROM bg GROUP BY 1),
      |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v FROM e),
      |bi AS (SELECT bg.doc_id, round(avg(-log2((c12 + 1) / (c1 + v))), 4) AS nll2
      |       FROM bg JOIN c12 USING (bg)
      |       JOIN c1 ON split_part(bg.bg, ' ', 1) = c1.w1
      |       CROSS JOIN v GROUP BY bg.doc_id),
      |ex AS (SELECT d.lang AS domain, greatest(nll1 - nll2, 0.0) AS x
      |       FROM uni JOIN bi USING (doc_id) JOIN documents d USING (doc_id)),
      |lam AS (SELECT domain, avg(x) AS excess FROM ex GROUP BY domain),
      |i0 AS (SELECT domain, excess,
      |         CAST(count(*) OVER () AS DOUBLE) AS S,
      |         1.0 / CAST(count(*) OVER () AS DOUBLE) AS alpha,
      |         0.0 AS acc
      |       FROM lam),
      |i1 AS (SELECT domain, excess, S, alpha, acc + alpha AS acc FROM (
      |  SELECT domain, excess, S, acc,
      |         (1.0 - 0.001) * up / z + 0.001 / S AS alpha
      |  FROM (SELECT * , max(cum) OVER () AS z FROM
      |        (SELECT *, sum(up) OVER (ORDER BY domain
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM
      |         (SELECT domain, excess, S, acc, alpha * exp(0.1 * excess) AS up FROM i0))))),
      |i2 AS (SELECT domain, excess, S, alpha, acc + alpha AS acc FROM (
      |  SELECT domain, excess, S, acc,
      |         (1.0 - 0.001) * up / z + 0.001 / S AS alpha
      |  FROM (SELECT * , max(cum) OVER () AS z FROM
      |        (SELECT *, sum(up) OVER (ORDER BY domain
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM
      |         (SELECT domain, excess, S, acc, alpha * exp(0.1 * excess) AS up FROM i1))))),
      |i3 AS (SELECT domain, excess, S, alpha, acc + alpha AS acc FROM (
      |  SELECT domain, excess, S, acc,
      |         (1.0 - 0.001) * up / z + 0.001 / S AS alpha
      |  FROM (SELECT * , max(cum) OVER () AS z FROM
      |        (SELECT *, sum(up) OVER (ORDER BY domain
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM
      |         (SELECT domain, excess, S, acc, alpha * exp(0.1 * excess) AS up FROM i2))))),
      |i4 AS (SELECT domain, excess, S, alpha, acc + alpha AS acc FROM (
      |  SELECT domain, excess, S, acc,
      |         (1.0 - 0.001) * up / z + 0.001 / S AS alpha
      |  FROM (SELECT * , max(cum) OVER () AS z FROM
      |        (SELECT *, sum(up) OVER (ORDER BY domain
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM
      |         (SELECT domain, excess, S, acc, alpha * exp(0.1 * excess) AS up FROM i3)))))
      |SELECT domain, round(excess, 6) AS excess, round(alpha, 6) AS weight,
      |       round(acc / 4, 6) AS avg_weight
      |FROM i4""".stripMargin

  /** Classifier-based quality filtering (§2.4 37u, r13 — the
    * FineWeb-Edu / DCLM component: score every doc with a learned
    * linear model, curate on the score): logistic regression over
    * hashed token features trained distributed with bit-deterministic
    * sorted-group gradient accumulation. The label is a TF-visible
    * text signal ("data" makes up > 4 % of the doc's tokens — the
    * synthetic corpus has no teacher labels, and its lang column is
    * drawn INDEPENDENTLY of the text, i.e. unlearnable by
    * construction; a tf-threshold label lives exactly in the model's
    * feature space, so the catalog run demonstrates real learning).
    * Rows-only (float GD is not SQL-replayable); TextClassifierSpec
    * pins held-out accuracy, ranking separability and
    * bit-determinism. */
  val qQualityClassifier: Q = (s, d) => {
    val toks = TextAnalysis.wsTokens(lower(col("text")))
    val docs = Tables.documents(s, d)
      .withColumn("label",
        (size(filter(toks, t => t === "data")).cast("double") /
          greatest(size(toks), lit(1)) > 0.04).cast("int"))
    val w = graft.operators.TextClassifier.train(docs, "doc_id", "text", "label",
      dim = 1 << 12, iters = 12)
    // curation cuts at a score PERCENTILE, not the 0.5 probability (the
    // FineWeb-Edu recipe: keep the top-scoring share). The cut comes
    // from a hash-sampled exact percentile broadcast as ONE row — the
    // 37k CCNet-terciles pattern; a global percent_rank window would be
    // a single-partition sort of the corpus (at sf0.01 the cut keeps
    // 159 of the 175 true positives — precision/recall 0.91 against
    // the tf label the model never saw at scoring time)
    val scored = graft.operators.TextClassifier.score(
      docs, "doc_id", "text", w, dim = 1 << 12)
    val cut = scored.filter(xxhash64(col("doc_id")) % 2 === 0)
      .agg(expr("percentile(quality_score, 0.65)").as("cut"))
    scored.crossJoin(broadcast(cut))
      .withColumn("kept", col("quality_score") >= col("cut"))
      .select(col("doc_id"), col("quality_score"), col("kept"))
  }

  /** Heavy hitters (§2.6, r10): corpus token frequencies through the
    * mergeable Misra-Gries frequent-items sketch. On the bounded
    * 31-token vocabulary nothing evicts at any SF, so every estimate is
    * exact and the oracle is plain GROUP BY counts; the eviction regime
    * (guarantee bounds) is spec-gated in SketchesSpec. */
  val qHeavyHitters: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(explode(TextAnalysis.wsTokens(col("text"))).as("token"))
    graft.operators.Sketches.frequentItems(toks, "token", maxMapSize = 64)
      .select(col("item").as("token"), col("estimate").as("freq"))
  }
  val qHeavyHittersSql: String =
    """WITH w AS (SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS token
      |           FROM documents)
      |SELECT token, count(*) AS freq FROM w GROUP BY token""".stripMargin

  /** Bloom-prefiltered incremental dedup (§2.4, r10): which incoming
    * docs are genuinely new vs a history corpus — EXACT result (the
    * bloom only shrinks the anti-join's input; collisions can only add
    * candidates that the exact join then resolves). */
  val qBloomDedup: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val history = docs.filter(col("doc_id") % 3 === 0).select(col("text"))
    graft.operators.Sketches.bloomAntiJoin(
        docs.select(col("doc_id"), col("text")), history, "text", fpp = 0.01)
      .select(col("doc_id"))
  }
  val qBloomDedupSql: String =
    """SELECT doc_id FROM documents
      |WHERE text NOT IN (SELECT text FROM documents WHERE doc_id % 3 = 0)""".stripMargin

  /** Corpus difference (§2.6, r15 — the survey row the r14 verdict
    * flagged as untracked): "how much NEW data does this source add"
    * through the Theta A-NOT-B sketch. Distinct text counts at every
    * oracle SF sit far below the 2^14 nominal entries, so the sketches
    * never sample and every estimate is EXACT (the same no-eviction
    * contract as q_heavy_hitters); the eviction regime's error bounds
    * are spec-gated in SketchesSpec. */
  val qCorpusDifference: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    graft.operators.Sketches.corpusDifference(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), "text")
  }
  val qCorpusDifferenceSql: String =
    """SELECT
      |  (SELECT count(DISTINCT text) FROM documents WHERE doc_id % 2 = 0) AS distinct_a,
      |  (SELECT count(DISTINCT text) FROM documents WHERE doc_id % 2 = 1) AS distinct_b,
      |  (SELECT count(DISTINCT text) FROM documents
      |   WHERE doc_id % 2 = 0
      |     AND text NOT IN (SELECT text FROM documents WHERE doc_id % 2 = 1)) AS a_not_b""".stripMargin

  /** Block-pattern PNG payload for the perceptual-hash queries: red
    * channel of 9×8 blocks = (17i + 29j + 21(id%10) + noise) mod 256,
    * noise = 5(id%7) at cell (3,2) for id%3=0 — every term replayable
    * in SQL, so the dHash bits (and therefore the hamming pair set)
    * have a closed-form oracle over REAL ImageIO-encoded PNGs.
    *
    * The payload set caps at doc_id < 20000: with only 10 pattern
    * groups, group size — and therefore the TRUE near-dup pair count —
    * grows linearly with the corpus, so the pair set is quadratic BY
    * CONSTRUCTION past the cap (a property of this synthetic oracle
    * corpus, not of the banded operator; same posture as the
    * fixed-label q_embed_neardup form). */
  private def phashPayloads(s: SparkSession, d: String): DataFrame = {
    val synth = udf { (id: Long) =>
      Multimodal.synthBlockPng((i, j) =>
        ((i * 17 + j * 29 + (id % 10) * 21 +
          (if (id % 3 == 0 && i == 3 && j == 2) (id % 7) * 5 else 0)) % 256).toInt,
        g = 40, b = 200)
    }
    Tables.documents(s, d)
      .filter(col("doc_id") % 4 === 0 && col("doc_id") < 20000)
      .select(col("doc_id"), synth(col("doc_id")).as("payload"))
  }
  /** The f(i, j, id) cell formula above, as a SQL fragment. */
  private def phashCellSql(iExpr: String): String =
    s"(($iExpr) * 17 + (k // 8) * 29 + (doc_id % 10) * 21 + " +
    s"CASE WHEN doc_id % 3 = 0 AND ($iExpr) = 3 AND k // 8 = 2 " +
    s"THEN (doc_id % 7) * 5 ELSE 0 END) % 256"

  /** Image perceptual hash (§2.4 #40, r10): dHash-64 over real decoded
    * PNGs; the oracle replays the bit construction in closed form. */
  val qImagePhash: Q = (s, d) =>
    Multimodal.dHashes(s, phashPayloads(s, d), "doc_id", "payload")
      .select(col("id").as("doc_id"), col("dhash"))
  val qImagePhashSql: String =
    s"""SELECT doc_id,
       |  array_to_string(list_transform(generate_series(0, 63), k ->
       |    CASE WHEN ${phashCellSql("k % 8 + 1")} > ${phashCellSql("k % 8")}
       |    THEN '1' ELSE '0' END), '') AS dhash
       |FROM documents WHERE doc_id % 4 = 0 AND doc_id < 20000""".stripMargin

  /** Image near-dup pairs (§2.4 #40, r10): banded dHash join — at
    * maxHamming 3 the 4×16-bit banding is lossless (pigeonhole), so
    * the oracle is the EXACT global hamming-≤3 pair set. */
  val qImageNeardup: Q = (s, d) =>
    Multimodal.imageNearDupPairs(s, phashPayloads(s, d), "doc_id", "payload",
      maxHamming = 3)
  val qImageNeardupSql: String =
    s"""WITH bits AS (
       |  SELECT doc_id,
       |    array_to_string(list_transform(generate_series(0, 63), k ->
       |      CASE WHEN ${phashCellSql("k % 8 + 1")} > ${phashCellSql("k % 8")}
       |      THEN '1' ELSE '0' END), '') AS dhash
       |  FROM documents WHERE doc_id % 4 = 0 AND doc_id < 20000)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |         CAST(len(list_filter(generate_series(1, 64),
       |           k -> substr(a.dhash, CAST(k AS INT), 1) != substr(b.dhash, CAST(k AS INT), 1)))
       |           AS BIGINT) AS hamming
       |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id)
       |WHERE hamming <= 3""".stripMargin

  /** Segment-amplitude WAVs for the audio-hash queries: 65 constant
    * segments of amplitude (173i + 311(id%8) + noise) mod 2048, noise =
    * 37(id%5) at segment 33 for id%3=0 — every box abs-mean IS the
    * segment amplitude, so the envelope-hash bits are closed-form.
    * Same doc_id cap rationale as [[phashPayloads]]. */
  private def audioPayloads(s: SparkSession, d: String): DataFrame = {
    val synth = udf { (id: Long) =>
      Multimodal.synthWavSegments((0 until 65).map(i =>
        ((i * 173 + (id % 8) * 311 +
          (if (id % 3 == 0 && i == 33) (id % 5) * 37 else 0)) % 2048).toInt),
        framesPerSeg = 8)
    }
    Tables.documents(s, d)
      .filter(col("doc_id") % 4 === 1 && col("doc_id") < 20000)
      .select(col("doc_id"), synth(col("doc_id")).as("payload"))
  }
  /** The amp(i, id) segment formula above, as a SQL fragment. */
  private def audioCellSql(iExpr: String): String =
    s"(($iExpr) * 173 + (doc_id % 8) * 311 + " +
    s"CASE WHEN doc_id % 3 = 0 AND ($iExpr) = 33 " +
    s"THEN (doc_id % 5) * 37 ELSE 0 END) % 2048"

  /** Audio envelope hash (§2.4 #40, r10): 64-bit envelope dHash over
    * real javax.sound-decoded PCM16 WAVs; closed-form oracle. */
  val qAudioPhash: Q = (s, d) =>
    Multimodal.audioHashes(s, audioPayloads(s, d), "doc_id", "payload")
      .select(col("id").as("doc_id"), col("dhash"))
  val qAudioPhashSql: String =
    s"""SELECT doc_id,
       |  array_to_string(list_transform(generate_series(0, 63), k ->
       |    CASE WHEN ${audioCellSql("k + 1")} > ${audioCellSql("k")}
       |    THEN '1' ELSE '0' END), '') AS dhash
       |FROM documents WHERE doc_id % 4 = 1 AND doc_id < 20000""".stripMargin

  /** Audio near-dup pairs (§2.4 #40, r10): banded envelope-hash join,
    * lossless at hamming ≤ 3 — exact global pair oracle. */
  val qAudioNeardup: Q = (s, d) =>
    Multimodal.audioNearDupPairs(s, audioPayloads(s, d), "doc_id", "payload",
      maxHamming = 3)
  val qAudioNeardupSql: String =
    s"""WITH bits AS (
       |  SELECT doc_id,
       |    array_to_string(list_transform(generate_series(0, 63), k ->
       |      CASE WHEN ${audioCellSql("k + 1")} > ${audioCellSql("k")}
       |      THEN '1' ELSE '0' END), '') AS dhash
       |  FROM documents WHERE doc_id % 4 = 1 AND doc_id < 20000)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |         CAST(len(list_filter(generate_series(1, 64),
       |           k -> substr(a.dhash, CAST(k AS INT), 1) != substr(b.dhash, CAST(k AS INT), 1)))
       |           AS BIGINT) AS hamming
       |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id)
       |WHERE hamming <= 3""".stripMargin

  /** 65-frame solid-gray GIFs for the video-hash queries: frame i has
    * gray (29i + 43(id%6) + noise) mod 256, noise = 17(id%5) at frame
    * 40 for id%3=0 — with exactly 65 frames each temporal box IS one
    * frame, and luminance is strictly monotone in the gray level, so
    * the hash bits reduce to integer compares a SQL oracle replays.
    * Same doc_id cap rationale as [[phashPayloads]]. */
  private def videoPayloads(s: SparkSession, d: String): DataFrame = {
    val synth = udf { (id: Long) =>
      Multimodal.synthGif(4, 4, (0 until 65).map(i =>
        ((i * 29 + (id % 6) * 43 +
          (if (id % 3 == 0 && i == 40) (id % 5) * 17 else 0)) % 256).toInt))
    }
    Tables.documents(s, d)
      .filter(col("doc_id") % 4 === 2 && col("doc_id") < 2000)
      .select(col("doc_id"), synth(col("doc_id")).as("payload"))
  }
  /** The gray(i, id) frame formula above, as a SQL fragment. */
  private def videoCellSql(iExpr: String): String =
    s"(($iExpr) * 29 + (doc_id % 6) * 43 + " +
    s"CASE WHEN doc_id % 3 = 0 AND ($iExpr) = 40 " +
    s"THEN (doc_id % 5) * 17 ELSE 0 END) % 256"

  /** Video temporal hash (§2.4 #40a, r10): 64-bit frame-luminance
    * dHash over real multi-frame GIF decode; closed-form oracle. */
  val qVideoPhash: Q = (s, d) =>
    Multimodal.videoHashes(s, videoPayloads(s, d), "doc_id", "payload")
      .select(col("id").as("doc_id"), col("dhash"))
  val qVideoPhashSql: String =
    s"""SELECT doc_id,
       |  array_to_string(list_transform(generate_series(0, 63), k ->
       |    CASE WHEN ${videoCellSql("k + 1")} > ${videoCellSql("k")}
       |    THEN '1' ELSE '0' END), '') AS dhash
       |FROM documents WHERE doc_id % 4 = 2 AND doc_id < 2000""".stripMargin

  /** Video near-dup pairs (§2.4 #40a, r10): banded temporal-hash join,
    * lossless at hamming ≤ 3 — exact global pair oracle. */
  val qVideoNeardup: Q = (s, d) =>
    Multimodal.videoNearDupPairs(s, videoPayloads(s, d), "doc_id", "payload",
      maxHamming = 3)
  val qVideoNeardupSql: String =
    s"""WITH bits AS (
       |  SELECT doc_id,
       |    array_to_string(list_transform(generate_series(0, 63), k ->
       |      CASE WHEN ${videoCellSql("k + 1")} > ${videoCellSql("k")}
       |      THEN '1' ELSE '0' END), '') AS dhash
       |  FROM documents WHERE doc_id % 4 = 2 AND doc_id < 2000)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |         CAST(len(list_filter(generate_series(1, 64),
       |           k -> substr(a.dhash, CAST(k AS INT), 1) != substr(b.dhash, CAST(k AS INT), 1)))
       |           AS BIGINT) AS hamming
       |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id)
       |WHERE hamming <= 3""".stripMargin

  /** Training-sequence packing (§2.4, r6): greedy concat-and-chunk pack
    * assignment per shard — the precomputed packing a pretraining data
    * loader consumes. Sharded windows (doc_id % 16) keep it scale-shaped:
    * parallelism = shards, no global sort. Oracle recomputes the
    * cumulative-sum bin in closed form. */
  val qTokenPack: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(
      col("doc_id"),
      (col("doc_id") % 16).as("shard"),
      TextAnalysis.tokenCount(col("text")).as("n_tok"))
    graft.operators.Scale.packSequences(docs, "shard", "doc_id", "n_tok", 200L)
  }
  val qTokenPackSql: String =
    """WITH t AS (
      |  SELECT doc_id, doc_id % 16 AS shard,
      |         CAST(len(list_filter(string_split_regex(text, '\s+'),
      |                              x -> length(x) > 0)) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (SELECT *,
      |        sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) - n_tok AS prior
      |      FROM t)
      |SELECT doc_id, shard, n_tok,
      |       CAST(floor(prior / 200.0) AS BIGINT) AS pack_id
      |FROM c""".stripMargin

  /** Stratified mixture sampling (§2.4, r6): deterministic per-source
    * keep rates (id-mod selection, no RNG) — the fixed-ratio corpus
    * mixing step. Narrow codegen'd filter; same selection reproduces in
    * the oracle. */
  val qSampleStratified: Q = (s, d) => {
    graft.operators.Scale.sampleStratified(
      Tables.documents(s, d).select(col("doc_id"), col("source"), col("lang")),
      "doc_id", "source", Map("src0" -> 0.5, "src1" -> 0.25), defaultRate = 0.1)
  }
  val qSampleStratifiedSql: String =
    """SELECT doc_id, source, lang FROM documents
      |WHERE doc_id % 100 <
      |      CASE source WHEN 'src0' THEN 50 WHEN 'src1' THEN 25 ELSE 10 END""".stripMargin

  /** Deterministic global corpus shuffle (§2.4, r6): seeded epoch
    * reshuffle with exact global positions — the order a pretraining
    * loader reads. md5-keyed so the oracle reproduces the identical
    * permutation; the Spark side assigns positions with
    * range-partition + zipWithIndex, never a one-partition window. */
  val qGlobalShuffle: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    graft.operators.Scale.globalShuffle(docs, "doc_id", "epoch3")
      .withColumn("shard", col("pos") % 8)
  }
  val qGlobalShuffleSql: String =
    """SELECT doc_id, source,
      |       row_number() OVER (ORDER BY md5('epoch3:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS pos,
      |       (row_number() OVER (ORDER BY md5('epoch3:' || CAST(doc_id AS VARCHAR)), doc_id) - 1) % 8 AS shard
      |FROM documents""".stripMargin

  /** End-to-end training-data pipeline (§2.4, r6 flagship): the whole
    * curation chain as ONE composed plan — quality score + language ID
    * (narrow, codegen'd) → keep en docs above threshold → exact dedup
    * (one shuffle on the content hash) → per-source corpus rollup
    * (map-side partial agg). This is the shape a 100 TB curation run
    * takes: two shuffles total (dedup window + final groupBy), filters
    * evaluated in the scan stage before anything wide. The oracle
    * replays every stage in closed form. */
  val qLlmPipeline: Q = (s, d) => {
    val scored = Tables.documents(s, d).select(
      col("doc_id"), col("source"), col("text"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.langId(col("text")).as("lang_pred"),
      TextAnalysis.tokenCount(col("text")).as("n_tok"))
    val kept = scored.filter(col("quality") >= 0.5 && col("lang_pred") === "en")
    val deduped = graft.operators.Dedup.exact(kept, "text", "doc_id")
    deduped.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tok").as("n_tokens"),
      dround(avg("quality"), 4).as("avg_quality"),
      min("doc_id").as("first_doc"))
  }
  val qLlmPipelineSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0)"
    val nToks = s"len($toks)"
    val stopEn = "['the','of','and','to','in','is','a','that','it','for','was','on','with']"
    val meanTok = s"length(regexp_replace(text, '\\s+', '', 'g')) * 1.0 / greatest($nToks, 1)"
    val alpha = "length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1.0 / greatest(length(text), 1)"
    val stopRatio = s"len(list_filter($toks, t -> list_contains($stopEn, lower(t)))) * 1.0 / greatest($nToks, 1)"
    s"""WITH t AS (
       |  SELECT doc_id, source, text,
       |         list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS toks,
       |         (CASE WHEN length(text) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.25
       |           + (CASE WHEN $meanTok BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END) * 0.25
       |           + (CASE WHEN $stopRatio >= 0.01 THEN 1.0 ELSE 0.0 END) * 0.2
       |           + $alpha * 0.3 AS quality,
       |         CAST($nToks AS BIGINT) AS n_tok
       |  FROM documents),
       |s AS (
       |  SELECT *,
       |    CAST(len(list_filter(toks, x -> list_contains($stopEn, lower(x)))) AS DOUBLE) / greatest(len(toks),1) AS s_en,
       |    CAST(len(list_filter(toks, x -> list_contains(['de','la','que','el','en','y','los','del','se','las','por','un','para'], lower(x)))) AS DOUBLE) / greatest(len(toks),1) AS s_es,
       |    CAST(len(list_filter(toks, x -> list_contains(['der','die','und','in','den','von','zu','das','mit','sich','des','auf','ist'], lower(x)))) AS DOUBLE) / greatest(len(toks),1) AS s_de,
       |    CAST(len(list_filter(toks, x -> list_contains(['de','la','le','et','les','des','en','un','du','une','que','est','pour'], lower(x)))) AS DOUBLE) / greatest(len(toks),1) AS s_fr
       |  FROM t),
       |r AS (
       |  SELECT *,
       |    CAST(length(regexp_replace(regexp_replace(text, '\\s+', '', 'g'), '[^\\x{4e00}-\\x{9fff}\\x{3040}-\\x{30ff}]', '', 'g')) AS DOUBLE)
       |      / greatest(length(regexp_replace(text, '\\s+', '', 'g')), 1) AS cjk
       |  FROM s),
       |lang AS (
       |  SELECT *,
       |    CASE WHEN cjk > 0.3 THEN 'zh'
       |         WHEN greatest(s_en,s_es,s_de,s_fr) >= 0.05 THEN
       |           CASE WHEN s_fr > greatest(s_en,s_es,s_de) THEN 'fr'
       |                WHEN s_de > greatest(s_en,s_es) THEN 'de'
       |                WHEN s_es > s_en THEN 'es'
       |                ELSE 'en' END
       |         ELSE 'und' END AS lang_pred
       |  FROM r),
       |kept AS (SELECT * FROM lang WHERE quality >= 0.5 AND lang_pred = 'en'),
       |dd AS (SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM kept)
       |SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |       round(avg(quality), 4) AS avg_quality, min(doc_id) AS first_doc
       |FROM dd WHERE rn = 1 GROUP BY source""".stripMargin
  }

  // -------------------------------------------------------------- export
  val queries: Map[String, Q] = Map(
    "q_expression_language" -> qExpressionLanguage,
    "q_token_count"         -> qTokenCount,
    "q_text_quality"        -> qTextQuality,
    "q_gopher_rules"        -> qGopherRules,
    "q_gopher_repetition"   -> qGopherRepetition,
    "q_c4_rules"            -> qC4Rules,
    "q_lang_id"             -> qLangId,
    "q_fingerprint"         -> qFingerprint,
    "q_fingerprint_rolling" -> qFingerprintRolling,
    "q_dedup_jaccard"       -> qDedupJaccard,
    "q_dedup_cluster"       -> qDedupCluster,
    "q_dedup_jaccard_capped" -> qDedupJaccardCapped,
    "q_dedup_cluster_capped" -> qDedupClusterCapped,
    "q_dedup_minhash"       -> qDedupMinhash,
    "q_lsh_index"           -> qLshIndex,
    "q_flow_index"          -> qFlowIndex,
    "q_dedup_minhash_capped" -> qDedupMinhashCapped,
    "q_dedup_simhash"       -> qDedupSimhash,
    "q_embed_neardup"       -> qEmbedNeardup,
    "q_embed_neardup_ivf"   -> qEmbedNeardupIvf,
    "q_semantic_dedup"      -> qSemanticDedup,
    "q_semantic_dedup_ivf"  -> qSemanticDedupIvf,
    "q_embed_cosine_topk"   -> qEmbedCosineTopk,
    "q_ann_lsh"             -> qAnnLsh,
    "q_ann_ivf"             -> qAnnIvf,
    "q_embed_quantized"     -> qEmbedQuantized,
    "q_embed_pq"            -> qEmbedPq,
    "q_pq_topk"             -> qPqTopk,
    "q_pq_index"            -> qPqIndex,
    "q_repetition"          -> qRepetition,
    "q_redact_pii"          -> qRedactPii,
    "q_contamination"       -> qContamination,
    "q_multimodal_meta"     -> qMultimodalMeta,
    "q_frame_sample"        -> qFrameSample,
    "q_media_header"        -> qMediaHeader,
    "q_media_decode"        -> qMediaDecode,
    "q_url_normalize"       -> qUrlNormalize,
    "q_line_dedup"          -> qLineDedup,
    "q_token_topk"          -> qTokenTopk,
    "q_unigram_logprob"     -> qUnigramLogprob,
    "q_embed_centroid"      -> qEmbedCentroid,
    "q_token_pack"          -> qTokenPack,
    "q_sample_stratified"   -> qSampleStratified,
    "q_global_shuffle"      -> qGlobalShuffle,
    "q_llm_pipeline"        -> qLlmPipeline,
    "q_frame_decode"        -> qFrameDecode,
    "q_dup_spans"           -> qDupSpans,
    "q_cut_spans"           -> qCutSpans,
    "q_bm25_search"         -> qBm25Search,
    "q_bm25_index"          -> qBm25Index,
    "q_chunk_docs"          -> qChunkDocs,
    "q_hybrid_rrf"          -> qHybridRrf,
    "q_embed_kmeans"        -> qEmbedKmeans,
    "q_cluster_sample"      -> qClusterSample,
    "q_domain_filter"       -> qDomainFilter,
    "q_token_budget_mix"    -> qTokenBudgetMix,
    "q_unimax_quota"        -> qUnimaxQuota,
    "q_temperature_mix"     -> qTemperatureMix,
    "q_stupid_backoff"      -> qStupidBackoff,
    "q_nfc_normalize"       -> qNfcNormalize,
    "q_ws_contract"         -> qWsContract,
    "q_html_extract"        -> qHtmlExtract,
    "q_parse_pdf"           -> qParsePdf,
    "q_parse_markdown"      -> qParseMarkdown,
    "q_html_pipeline"       -> qHtmlPipeline,
    "q_curation_v2"         -> qCurationV2,
    "q_curation_report"     -> qCurationReport,
    "q_bigram_logprob"      -> qBigramLogprob,
    "q_ccnet_buckets"       -> qCcnetBuckets,
    "q_char_entropy"        -> qCharEntropy,
    "q_trigram_logprob"     -> qTrigramLogprob,
    "q_dsir_weights"        -> qDsirWeights,
    "q_dsir_sample"         -> qDsirSample,
    "q_bpe_merges"          -> qBpeMerges,
    "q_bpe_tokens"          -> qBpeTokens,
    "q_ulm_tokens"          -> qUlmTokens,
    "q_wordpiece_tokens"    -> qWordPieceTokens,
    "q_doremi_mix"          -> qDoremiMix,
    "q_quality_classifier"  -> qQualityClassifier,
    "q_lang_id_learned"     -> qLangIdLearned,
    "q_heavy_hitters"       -> qHeavyHitters,
    "q_corpus_difference"   -> qCorpusDifference,
    "q_bloom_dedup"         -> qBloomDedup,
    "q_image_phash"         -> qImagePhash,
    "q_image_neardup"       -> qImageNeardup,
    "q_audio_phash"         -> qAudioPhash,
    "q_audio_neardup"       -> qAudioNeardup,
    "q_video_phash"         -> qVideoPhash,
    "q_video_neardup"       -> qVideoNeardup)

  val oracles: Map[String, String] = Map(
    "q_expression_language" -> qExpressionLanguageSql,
    "q_token_count"         -> qTokenCountSql,
    "q_text_quality"        -> qTextQualitySql,
    "q_gopher_rules"        -> qGopherRulesSql,
    "q_gopher_repetition"   -> qGopherRepetitionSql,
    "q_c4_rules"            -> qC4RulesSql,
    "q_lang_id"             -> qLangIdSql,
    "q_fingerprint"         -> qFingerprintSql,
    "q_fingerprint_rolling" -> qFingerprintRollingSql,
    "q_dedup_jaccard"       -> qDedupJaccardSql,
    "q_dedup_cluster"       -> qDedupClusterSql,
    "q_dedup_jaccard_capped" -> qDedupJaccardCappedSql,
    "q_dedup_cluster_capped" -> qDedupClusterCappedSql,
    "q_embed_neardup"       -> qEmbedNeardupSql,
    "q_embed_neardup_ivf"   -> qEmbedNeardupIvfSql,
    "q_semantic_dedup_ivf"  -> qSemanticDedupIvfSql,
    "q_semantic_dedup"      -> qSemanticDedupSql,
    "q_embed_cosine_topk"   -> qEmbedCosineTopkSql,
    "q_embed_quantized"     -> qEmbedQuantizedSql,
    "q_embed_pq"            -> qEmbedPqSql,
    "q_pq_topk"             -> qPqTopkSql,
    "q_pq_index"            -> qPqIndexSql,
    "q_repetition"          -> qRepetitionSql,
    "q_redact_pii"          -> qRedactPiiSql,
    "q_contamination"       -> qContaminationSql,
    "q_multimodal_meta"     -> qMultimodalMetaSql,
    "q_frame_sample"        -> qFrameSampleSql,
    "q_media_header"        -> qMediaHeaderSql,
    "q_media_decode"        -> qMediaDecodeSql,
    "q_url_normalize"       -> qUrlNormalizeSql,
    "q_line_dedup"          -> qLineDedupSql,
    "q_token_topk"          -> qTokenTopkSql,
    "q_unigram_logprob"     -> qUnigramLogprobSql,
    "q_embed_centroid"      -> qEmbedCentroidSql,
    "q_token_pack"          -> qTokenPackSql,
    "q_sample_stratified"   -> qSampleStratifiedSql,
    "q_global_shuffle"      -> qGlobalShuffleSql,
    "q_llm_pipeline"        -> qLlmPipelineSql,
    "q_frame_decode"        -> qFrameDecodeSql,
    "q_dup_spans"           -> qDupSpansSql,
    "q_cut_spans"           -> qCutSpansSql,
    "q_bm25_search"         -> qBm25SearchSql,
    "q_bm25_index"          -> qBm25IndexSql,
    "q_chunk_docs"          -> qChunkDocsSql,
    "q_hybrid_rrf"          -> qHybridRrfSql,
    "q_embed_kmeans"        -> qEmbedKmeansSql,
    "q_cluster_sample"      -> qClusterSampleSql,
    "q_domain_filter"       -> qDomainFilterSql,
    "q_token_budget_mix"    -> qTokenBudgetMixSql,
    "q_unimax_quota"        -> qUnimaxQuotaSql,
    "q_temperature_mix"     -> qTemperatureMixSql,
    "q_stupid_backoff"      -> qStupidBackoffSql,
    "q_nfc_normalize"       -> qNfcNormalizeSql,
    "q_ws_contract"         -> qWsContractSql,
    "q_html_extract"        -> qHtmlExtractSql,
    "q_parse_pdf"           -> qParsePdfSql,
    "q_parse_markdown"      -> qParseMarkdownSql,
    "q_html_pipeline"       -> qGopherRulesSql, // stage-0 transparency: panel == panel(text)
    "q_curation_v2"         -> qCurationV2Sql,
    "q_curation_report"     -> qCurationReportSql,
    "q_bigram_logprob"      -> qBigramLogprobSql,
    "q_ccnet_buckets"       -> qCcnetBucketsSql,
    "q_char_entropy"        -> qCharEntropySql,
    "q_trigram_logprob"     -> qTrigramLogprobSql,
    "q_dsir_weights"        -> qDsirWeightsSql,
    "q_dsir_sample"         -> qDsirSampleSql,
    "q_doremi_mix"          -> qDoremiMixSql,
    "q_heavy_hitters"       -> qHeavyHittersSql,
    "q_corpus_difference"   -> qCorpusDifferenceSql,
    "q_bloom_dedup"         -> qBloomDedupSql,
    "q_image_phash"         -> qImagePhashSql,
    "q_image_neardup"       -> qImageNeardupSql,
    "q_audio_phash"         -> qAudioPhashSql,
    "q_audio_neardup"       -> qAudioNeardupSql,
    "q_video_phash"         -> qVideoPhashSql,
    "q_video_neardup"       -> qVideoNeardupSql)
}
