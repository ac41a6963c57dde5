package graft

import org.apache.spark.sql.functions._

import graft.operators.{Parse, Records, Route}

/** Round-2 additions to SURVEY.md §2.1–2.2: text metrics, content
  * encoding, mapping-based replacement, line routing, JSON array
  * splitting, record-field surgery, grok/syslog parsing, CSV
  * validation. Same oracle-parity conventions as [[QueriesCore]].
  *
  * The grok/syslog/csv queries synthesize their input lines
  * deterministically from table columns and parse them back; the oracle
  * recomputes the expected fields directly from the raw columns, so the
  * parser (not the synthesizer) is what the hash-compare validates.
  */
object QueriesText {
  import QueriesCore.Q

  /** CountText: line/word/char metrics per document. */
  val qCountText: Q = (s, d) => {
    Records.countText(Tables.documents(s, d), "text")
      .select("doc_id", "n_lines", "n_words", "n_chars")
  }
  val qCountTextSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
      |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_words,
      |  CAST(length(text) AS BIGINT) AS n_chars
      |FROM documents""".stripMargin

  /** EncodeContent: base64 + hex encodings (of a bounded prefix, to keep
    * the dump small) and a decode round-trip check. */
  val qEncodeContent: Q = (s, d) => {
    val head = Tables.documents(s, d)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("head"))
    val enc = Records.encodeContent(
      Records.encodeContent(head, "head", "base64", "b64"), "head", "hex", "hx")
    Records.decodeContent(enc, "b64", "base64", "rt")
      .select(col("doc_id"), col("b64"), col("hx"),
              (col("rt") === col("head").cast("binary")).as("roundtrip_ok"))
  }
  val qEncodeContentSql: String =
    """SELECT doc_id,
      |  to_base64(encode(substring(text, 1, 24))) AS b64,
      |  hex(encode(substring(text, 1, 24))) AS hx,
      |  true AS roundtrip_ok
      |FROM documents""".stripMargin

  /** EncryptContentPGP → DecryptContentPGP round trip (§2.5 43f,
    * r15): every doc's text encrypted under a passphrase (RFC 4880
    * SKESK+SEIPD on JCE — the real packet format gpg reads; PgpSpec
    * carries the live interop gates) and decrypted back. The EXACT
    * oracle is the identity: md5 of the decrypted bytes must equal
    * DuckDB's md5 of the original text — a hash mismatch would catch
    * any drift in S2K, CFB framing, MDC handling or packet lengths.
    * A wrong-passphrase leg rides along pinning the NULL failure-row
    * contract (count must be 0 decrypted). */
  val qPgpRoundtrip: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val enc = graft.operators.Pgp.encryptPgp(docs, "text", "catalog-pass")
    val good = graft.operators.Pgp.decryptPgp(enc, "pgp", "catalog-pass", outCol = "rt")
    val bad = graft.operators.Pgp.decryptPgp(enc, "pgp", "wrong-pass", outCol = "bad")
    good.join(bad.select("doc_id", "bad"), "doc_id")
      .select(col("doc_id"), md5(col("rt")).as("rt_md5"),
        col("bad").isNull.as("wrong_pass_failed"))
  }
  val qPgpRoundtripSql: String =
    """SELECT doc_id, md5(text) AS rt_md5, true AS wrong_pass_failed
      |FROM documents""".stripMargin

  /** ReplaceTextWithMapping: ordered literal substitutions (digest to
    * bound row size). */
  val qReplaceMapping: Q = (s, d) => {
    Records.replaceWithMapping(Tables.documents(s, d), "text",
        Seq("the" -> "THE", "and" -> "AND", "data" -> "DATA"), "replaced")
      .select(col("doc_id"), md5(col("replaced").cast("binary")).as("replaced_md5"))
  }
  val qReplaceMappingSql: String =
    """SELECT doc_id,
      | md5(replace(replace(replace(text, 'the', 'THE'), 'and', 'AND'), 'data', 'DATA')) AS replaced_md5
      |FROM documents""".stripMargin

  /** RouteText: per-line regex routing, rolled up per route. */
  val qRouteText: Q = (s, d) => {
    Records.routeText(Tables.documents(s, d), "text",
        Seq("digits" -> "[0-9]", "sparky" -> "(?i)spark", "short" -> "^.{0,40}$"))
      .groupBy("route")
      .agg(count(lit(1)).as("n_lines"),
           countDistinct(col("doc_id")).as("n_docs"))
  }
  val qRouteTextSql: String =
    """WITH lines AS (
      |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents)
      |SELECT CASE WHEN regexp_matches(line, '[0-9]') THEN 'digits'
      |            WHEN regexp_matches(line, '(?i)spark') THEN 'sparky'
      |            WHEN regexp_matches(line, '^.{0,40}$') THEN 'short'
      |            ELSE 'unmatched' END AS route,
      |       count(*) AS n_lines, count(DISTINCT doc_id) AS n_docs
      |FROM lines GROUP BY 1""".stripMargin

  /** SplitJson: build a per-user JSON array (sorted by event_id), split
    * it back into elements, and aggregate the recovered values — the
    * oracle computes the same aggregate straight off the rows. */
  val qSplitJson: Q = (s, d) => {
    val e = Tables.events(s, d)
      .filter(pmod(col("user_id"), lit(4)) === 0) // bounded demo cohort
      .select(col("user_id"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    val arr = e.groupBy("user_id").agg(
      to_json(transform(array_sort(collect_list(struct(col("event_id"), col("k")))),
                        x => x.getField("k"))).as("arr_json"))
    Records.splitJson(arr, "arr_json")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_elems"),
           sum(col("element").cast("long")).as("sum_k"))
  }
  val qSplitJsonSql: String =
    """SELECT user_id, count(*) AS n_elems,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events WHERE user_id % 4 = 0 GROUP BY user_id""".stripMargin

  /** Remove/RenameRecordField on a struct column (drop one field, rename
    * another; field order follows withField-append semantics). */
  val qRecordFields: Q = (s, d) => {
    val recs = Tables.orders(s, d).select(col("o_orderkey"),
      struct(col("o_orderstatus").as("status"), col("o_orderpriority").as("prio"),
             col("o_custkey").as("cust")).as("m"))
    val surgically = Records.renameField(Records.removeField(recs, "m.prio"), "m.status", "state")
    surgically.select(col("o_orderkey"), to_json(col("m")).as("rec_json"))
  }
  val qRecordFieldsSql: String =
    """SELECT o_orderkey,
      | to_json(struct_pack(cust := o_custkey, state := o_orderstatus)) AS rec_json
      |FROM orders""".stripMargin

  /** UpdateRecord's WRITE half over every record-path form (r13,
    * SURVEY 24aj): build nested structs + an array-of-structs + a map
    * from orders columns, then
    *   /m/state_lc        struct leaf CREATE (withField)
    *   /tags[*]/flag      array wildcard write (every element)
    *   /tags[-1]/rank     one indexed element (negative = from the end)
    *   /props['k2']       map upsert (new key)
    *   /props['k']        map upsert (overwrite)
    * and flatten the result to scalars the DuckDB oracle recomputes
    * directly. All codegen'd transform/withField/map primitives —
    * narrow, zero exchanges, scan-bound at 100 TB. */
  val qRecordUpdate: Q = (s, d) => {
    import graft.functions.RecordPath
    val recs = Tables.orders(s, d).select(col("o_orderkey"),
      col("o_custkey"), col("o_totalprice"),
      struct(col("o_orderstatus").as("status")).as("m"),
      array(
        struct(col("o_orderpriority").as("name"), lit(1).as("rank")),
        struct(col("o_orderstatus").as("name"), lit(2).as("rank"))).as("tags"),
      map(lit("k"), col("o_custkey")).as("props"))
    val updated =
      RecordPath.update(
        RecordPath.update(
          RecordPath.update(
            RecordPath.update(
              RecordPath.update(recs, "/m/state_lc", lower(col("m.status"))),
              "/tags[*]/flag", col("o_totalprice") > 250000.0),
            "/tags[-1]/rank", lit(99)),
          "/props['k2']", col("o_custkey") * 2),
        "/props['k']", lit(0L))
    updated.select(col("o_orderkey"),
      col("m.state_lc").as("state_lc"),
      col("tags")(0).getField("flag").as("flag0"),
      col("tags")(1).getField("flag").as("flag1"),
      col("tags")(0).getField("rank").as("rank0"),
      col("tags")(1).getField("rank").as("rank1"),
      element_at(col("props"), "k").as("k_over"),
      element_at(col("props"), "k2").as("k2_new"))
  }
  val qRecordUpdateSql: String =
    """SELECT o_orderkey, lower(o_orderstatus) AS state_lc,
      |  o_totalprice > 250000.0 AS flag0, o_totalprice > 250000.0 AS flag1,
      |  1 AS rank0, 99 AS rank1,
      |  CAST(0 AS BIGINT) AS k_over, o_custkey * 2 AS k2_new
      |FROM orders""".stripMargin

  /** ExtractGrok over deterministically synthesized log lines. */
  val qExtractGrok: Q = (s, d) => {
    val lines = Tables.events(s, d).select(col("event_id"),
      concat(col("user_id").cast("string"), lit(" ["),
             upper(col("event_type")), lit("] evt="),
             col("event_id").cast("string")).as("line"))
    // literal text between %{} references is regex-quoted by the grok
    // compiler — no manual escaping of [ ]
    Parse.extractGrok(lines, "line", "%{INT:uid} [%{WORD:etype}] evt=%{INT:evt}")
      .select(col("event_id"), col("uid").cast("long").as("uid"),
              col("etype"), col("evt").cast("long").as("evt"))
  }
  val qExtractGrokSql: String =
    """SELECT event_id, CAST(user_id AS BIGINT) AS uid, upper(event_type) AS etype,
      |       CAST(event_id AS BIGINT) AS evt
      |FROM events""".stripMargin

  /** ParseSyslog over deterministically synthesized RFC-3164 lines;
    * oracle recomputes pri/facility/severity/host/tag/pid/msg directly. */
  val qParseSyslog: Q = (s, d) => {
    val lines = Tables.events(s, d).select(col("event_id"),
      concat(lit("<"), (col("user_id") % 192).cast("int").cast("string"), lit(">"),
             lit("Feb  5 12:00:00 "),
             concat(lit("h"), (col("user_id") % 10).cast("string")), lit(" "),
             col("event_type"), lit("["), (col("event_id") % 97).cast("string"),
             lit("]: value "), col("event_id").cast("string")).as("line"))
    Parse.parseSyslog(lines, "line")
      .select(col("event_id"), col("pri"), col("facility"), col("severity"),
              col("sl_host"), col("sl_tag"), col("sl_pid"), col("sl_msg"))
  }
  val qParseSyslogSql: String =
    """SELECT event_id,
      |  CAST(user_id % 192 AS INT) AS pri,
      |  CAST(floor((user_id % 192) / 8) AS INT) AS facility,
      |  CAST((user_id % 192) % 8 AS INT) AS severity,
      |  'h' || CAST(user_id % 10 AS VARCHAR) AS sl_host,
      |  event_type AS sl_tag,
      |  CAST(event_id % 97 AS INT) AS sl_pid,
      |  'value ' || CAST(event_id AS VARCHAR) AS sl_msg
      |FROM events""".stripMargin

  /** ValidateCsv over synthesized delimited lines; oracle recomputes the
    * rule outcomes from the raw columns. */
  val qValidateCsv: Q = (s, d) => {
    val lines = Tables.orders(s, d).select(col("o_orderkey"),
      concat_ws(",", col("o_orderkey"), col("o_custkey"),
                col("o_orderstatus"), col("o_orderpriority")).as("line"))
    Parse.validateCsv(lines, "line", ",", expectedFields = 4, Seq(
        (1, "key_numeric", f => f.rlike("^\\d+$")),
        // deterministic failures at every SF so both routes are exercised
        (2, "cust_not_7x", f => f.cast("long") % 7 =!= 0),
        (3, "status_known", f => f.isin("O", "F", "P")),
        (4, "prio_format", f => f.rlike("^\\d-[A-Z ]+$"))))
      .select(col("o_orderkey"), col("is_valid"),
              size(col("violations")).cast("long").as("n_violations"))
  }
  val qValidateCsvSql: String =
    """SELECT o_orderkey,
      |  (o_custkey % 7 <> 0 AND o_orderstatus IN ('O','F','P')
      |   AND regexp_matches(o_orderpriority, '^\d-[A-Z ]+$')) AS is_valid,
      |  CAST((CASE WHEN o_custkey % 7 <> 0 THEN 0 ELSE 1 END)
      |     + (CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END)
      |     + (CASE WHEN regexp_matches(o_orderpriority, '^\d-[A-Z ]+$') THEN 0 ELSE 1 END)
      |   AS BIGINT) AS n_violations
      |FROM orders""".stripMargin

  /** RouteOnAttribute driven by flow-definition-style EL predicate
    * strings (NiFi dynamic properties), compiled to Catalyst booleans. */
  val qRouteEl: Q = (s, d) => {
    Route.taggedFromElConfig(Tables.documents(s, d), Seq(
        "english" -> "${lang:equals('en')}",
        "long"    -> "${n_chars:gt(300)}",
        "sparky"  -> "${text:contains('spark')}"))
      .groupBy("route")
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).cast("long").as("sum_chars"))
  }
  val qRouteElSql: String =
    """SELECT CASE WHEN lang = 'en' THEN 'english'
      |            WHEN n_chars > 300 THEN 'long'
      |            WHEN strpos(text, 'spark') > 0 THEN 'sparky'
      |            ELSE 'unmatched' END AS route,
      |       count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1""".stripMargin

  /** PackageFlowFile → UnpackContent round-trip: bundle each customer's
    * orders into one packed row, unpack back with fragment indexes. */
  val qPackUnpack: Q = (s, d) => {
    val packed = Records.pack(Tables.orders(s, d), Seq("o_custkey"), "o_orderkey",
      Seq("o_orderstatus"))
    Records.unpack(packed, "packed")
      .select(col("o_custkey"), col("frag_idx"), col("o_orderkey"), col("o_orderstatus"))
  }
  val qPackUnpackSql: String =
    """SELECT o_custkey,
      |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1 AS INT) AS frag_idx,
      |  o_orderkey, o_orderstatus
      |FROM orders""".stripMargin

  /** JoltTransformJSON (shift/default subset) over the event props. */
  val qJolt: Q = (s, d) => {
    Records.joltTransform(Tables.events(s, d), "props",
        shift = Seq("$.k" -> "payload.k", "$.missing" -> "payload.m"),
        defaults = Seq("payload.k" -> "0", "payload.m" -> "none", "meta.v" -> "1"))
      .select(col("event_id"), col("jolted"))
  }
  val qJoltSql: String =
    """SELECT event_id,
      |  to_json(struct_pack(
      |    payload := struct_pack(
      |      k := coalesce(json_extract_string(props, '$.k'), '0'),
      |      m := 'none'),
      |    meta := struct_pack(v := '1'))) AS jolted
      |FROM events""".stripMargin

  /** JoltTransformJSON, full chained DSL (r17): a five-step chain —
    * shift (`*` wildcard + `&` reference), remove, cardinality ONE,
    * default, modify-overwrite-beta `=toUpper` — interpreted per row
    * ([[graft.operators.Jolt]]) over a document synthesized from event
    * columns, so the DuckDB oracle can state the expected OUTPUT bytes
    * exactly (both serializers emit compact insertion-ordered JSON). */
  val qJoltChain: Q = (s, d) => {
    val chain =
      """[
        |{"operation": "shift", "spec": {"user": {"*": "account.&"},
        |                                "k": "meta.key", "tags": "tags",
        |                                "gone": "trash.x"}},
        |{"operation": "remove", "spec": {"trash": ""}},
        |{"operation": "cardinality", "spec": {"tags": "ONE"}},
        |{"operation": "default", "spec": {"meta": {"source": "events"}}},
        |{"operation": "modify-overwrite-beta",
        | "spec": {"account": {"type": "=toUpper"},
        |          "meta": {"total": "=intSum(@(1,key), 10)"}}}
        |]""".stripMargin
    val doc = to_json(struct(
      struct(col("user_id").as("id"), col("event_type").as("type")).as("user"),
      get_json_object(col("props"), "$.k").cast("int").as("k"),
      array(col("event_type"), lit("x")).as("tags"),
      lit(1).as("gone")))
    Records.joltTransformChain(
        Tables.events(s, d).withColumn("doc", doc), "doc", chain, "jolted")
      .select(col("event_id"), col("jolted"))
  }
  val qJoltChainSql: String =
    """SELECT event_id,
      |  to_json(struct_pack(
      |    account := struct_pack(id := user_id, type := upper(event_type)),
      |    meta := struct_pack(key := CAST(json_extract_string(props, '$.k') AS INT),
      |                        source := 'events',
      |                        total := CAST(json_extract_string(props, '$.k') AS INT) + 10),
      |    tags := event_type)) AS jolted
      |FROM events""".stripMargin

  /** JoltTransformJSON `@`-lookups (r18): the docs' value-copy and
    * data-keyed-destination forms — `"@"` copies the whole matched
    * node, `"@(0,score)"` reads a field as the written VALUE, and
    * `"by.@(1,type).id"` keys the OUTPUT path by an input value. The
    * chain is one shift; the oracle states the exact output bytes by
    * string concatenation (Jackson's compact insertion-ordered JSON
    * is deterministic per row). */
  val qJoltLookup: Q = (s, d) => {
    val chain =
      """[{"operation": "shift", "spec": {
        |  "item": {
        |    "@": "orig",
        |    "@(0,score)": "by.@(0,type).score",
        |    "@(0,absent)": "never.written",
        |    "id": "by.@(1,type).id"
        |  }}}]""".stripMargin
    val doc = to_json(struct(struct(
      col("user_id").cast("int").as("id"),
      col("event_type").as("type"),
      coalesce(get_json_object(col("props"), "$.k").cast("int"), lit(0)).as("score")
    ).as("item")))
    Records.joltTransformChain(
        Tables.events(s, d).withColumn("doc", doc), "doc", chain, "jolted")
      .select(col("event_id"), col("jolted"))
  }
  val qJoltLookupSql: String =
    """SELECT event_id,
      |  '{"orig":{"id":' || CAST(CAST(user_id AS INT) AS VARCHAR)
      |    || ',"type":"' || event_type
      |    || '","score":' || CAST(coalesce(CAST(json_extract_string(props, '$.k') AS INT), 0) AS VARCHAR)
      |    || '},"by":{"' || event_type
      |    || '":{"score":' || CAST(coalesce(CAST(json_extract_string(props, '$.k') AS INT), 0) AS VARCHAR)
      |    || ',"id":' || CAST(CAST(user_id AS INT) AS VARCHAR) || '}}}' AS jolted
      |FROM events""".stripMargin

  /** Composite NiFi-flow parity, hash-checked end-to-end:
    * EvaluateJsonPath → UpdateAttribute(EL) → RouteOnAttribute →
    * MergeRecord(ordered digest) per (route, day) — four processors as
    * ONE Catalyst plan, verified as one oracle. */
  val qFlowComposite: Q = (s, d) => {
    val e = Records.jsonPath(Tables.events(s, d), "props", "k" -> "$.k")
    val up = Records.update(e,
      "k" -> col("k").cast("long"),
      "day" -> date_format(col("ts"), "yyyy-MM-dd"),
      "user_tag" -> graft.functions.El.compile("u-${user_id:padLeft(4, '0')}"))
    val routed = Route.tagged(up, Seq(
      "alerts"    -> (col("event_type") === "error"),
      "purchases" -> (col("event_type") === "purchase"),
      "traffic"   -> col("event_type").isin("click", "view")))
    routed.groupBy("route", "day")
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("sum_k"),
           md5(concat_ws("|",
             transform(array_sort(collect_list(struct(col("event_id"), col("user_tag")))),
                       x => x.getField("user_tag"))).cast("binary")).as("tags_md5"))
  }
  val qFlowCompositeSql: String =
    """WITH e AS (
      |  SELECT event_id, strftime(ts, '%Y-%m-%d') AS day,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |         'u-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS user_tag,
      |         CASE WHEN event_type = 'error' THEN 'alerts'
      |              WHEN event_type = 'purchase' THEN 'purchases'
      |              WHEN event_type IN ('click','view') THEN 'traffic'
      |              ELSE 'unmatched' END AS route
      |  FROM events)
      |SELECT route, day, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
      |       md5(string_agg(user_tag, '|' ORDER BY event_id)) AS tags_md5
      |FROM e GROUP BY route, day""".stripMargin

  /** Flow-definition parity (NiFi Registry): the SAME four-processor
    * pipeline as [[qFlowComposite]], but compiled by [[FlowCompiler]]
    * from the committed versioned-flow JSON instead of hand-coded —
    * must hash-match the identical DuckDB oracle. */
  val qFlowDefinition: Q = (s, d) => {
    val in = getClass.getResourceAsStream("/flows/composite_events.json")
    require(in != null, "flow definition resource missing")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    FlowCompiler.compile(s, json, Map("events" -> Tables.events(s, d)))("summary")
  }

  /** Committed UpdateRecord flow (r13): nested records built by
    * QueryRecord, stamped by UpdateRecord across every record-path
    * write form, flattened back — same semantics as [[qRecordUpdate]]
    * but authored as flow JSON with EL value templates. */
  val qFlowRecordUpdate: Q = (s, d) => {
    val in = getClass.getResourceAsStream("/flows/record_update.json")
    require(in != null, "flow definition resource missing")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    FlowCompiler.compile(s, json, Map("orders" -> Tables.orders(s, d)))("stamped")
  }
  val qFlowRecordUpdateSql: String =
    """SELECT o_orderkey, lower(o_orderstatus) AS state_lc,
      |  o_totalprice > 250000.0 AS flag0, o_totalprice > 250000.0 AS flag1,
      |  CAST(1 AS BIGINT) AS rank0, CAST(99 AS BIGINT) AS rank1,
      |  o_custkey AS k_over, o_custkey * 2 AS k2_new
      |FROM orders""".stripMargin

  /** Two-input flow definition (JoinEnrichment): orders enriched with
    * customer via a derived join key, aggregated per market segment by
    * QueryRecord — the whole DAG authored as committed JSON. */
  val qFlowEnrichment: Q = (s, d) => {
    val in = getClass.getResourceAsStream("/flows/enrich_orders.json")
    require(in != null, "flow definition resource missing")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    FlowCompiler.compile(s, json, Map(
      "orders" -> Tables.orders(s, d),
      "customer" -> Tables.customer(s, d)))("by_segment")
  }
  val qFlowEnrichmentSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** Third committed flow, over the round-5 vocabulary: RouteText as a
    * router (selectedRelationships proper subset → filtered stream),
    * CryptographicHashAttribute, LookupAttribute, QueryRecord rollup. */
  val qFlowLines: Q = (s, d) => {
    val in = getClass.getResourceAsStream("/flows/lines_pipeline.json")
    require(in != null, "flow definition resource missing")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    FlowCompiler.compile(s, json, Map("documents" -> Tables.documents(s, d)))("by_route")
  }
  val qFlowLinesSql: String =
    """WITH lines AS (
      |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents),
      |r AS (
      |  SELECT doc_id,
      |         CASE WHEN regexp_matches(line, '\bmerge\b') THEN 'merges'
      |              WHEN regexp_matches(line, '\bwindow\b') THEN 'windows'
      |              WHEN regexp_matches(line, '\bhash\b') THEN 'hashy'
      |              ELSE 'unmatched' END AS route,
      |         md5(line) AS lh
      |  FROM lines)
      |SELECT route,
      |       CASE route WHEN 'windows' THEN 'high' WHEN 'hashy' THEN 'low'
      |                  ELSE 'none' END AS priority,
      |       count(*) AS n_lines, count(DISTINCT doc_id) AS n_docs,
      |       md5(string_agg(lh, '|' ORDER BY doc_id, lh)) AS lines_md5
      |FROM r WHERE route IN ('windows', 'hashy')
      |GROUP BY route""".stripMargin

  /** Fourth committed flow (r6), over the parse family: UpdateAttribute
    * synthesizes an RFC-3164 syslog line per document via an EL template,
    * ParseSyslog structures it, ExtractGrok pulls event id + status from
    * the message, QueryRecord rolls up per facility+severity — the whole
    * parse pipeline authored as versioned JSON, one composed plan. */
  val qFlowParse: Q = (s, d) => {
    val in = getClass.getResourceAsStream("/flows/parse_syslog.json")
    require(in != null, "flow definition resource missing")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    FlowCompiler.compile(s, json, Map("documents" -> Tables.documents(s, d)))("by_facility")
  }
  val qFlowParseSql: String =
    """WITH s AS (
      |  SELECT doc_id % 190 AS pri, doc_id % 5 AS h, doc_id % 97 AS pid,
      |         doc_id AS eid
      |  FROM documents)
      |SELECT CAST(pri // 8 AS INT) AS facility, CAST(pri % 8 AS INT) AS severity,
      |       count(*) AS n, count(DISTINCT h) AS n_hosts,
      |       min(eid) AS min_event, CAST(max(pid) AS INT) AS max_pid
      |FROM s GROUP BY 1, 2""".stripMargin

  /** Eighth committed flow (r7): NESTED process groups — the curation
    * stage lives in a child group whose ports flatten to internal
    * edges, the dedup stage in a grandchild group (depth 2), exactly
    * how NiFi exports a structured flow. Dedup keeps the smallest
    * doc_id per identical text, a routed proper-subset connection
    * keeps docs >= 150 chars, and a root-level QueryRecord rolls up
    * per language. Same oracle shape as a flat authoring — the group
    * boundaries must be semantically invisible. */
  val qFlowNested: Q = (s, d) => {
    val in = getClass.getResourceAsStream("/flows/nested_curation.json")
    require(in != null, "flow definition resource missing")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    FlowCompiler.compile(s, json, Map("documents" -> Tables.documents(s, d)))("by_lang")
  }
  val qFlowNestedSql: String =
    """WITH k AS (
      |  SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      |  FROM documents),
      |kept AS (SELECT * FROM k WHERE rn = 1 AND n_chars >= 150)
      |SELECT lang, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       md5(string_agg(CAST(doc_id AS VARCHAR), '|'
      |                      ORDER BY CAST(doc_id AS VARCHAR))) AS docs_md5
      |FROM kept GROUP BY lang""".stripMargin

  /** Seventh committed flow (r6), over the content family: EnforceOrder
    * per-source sequence → AttributesToCSV RFC-4180 line (text cells
    * carry commas/quotes/newlines — quoting + doubling exercised on
    * real data) → HashContent per line → QueryRecord order-independent
    * corpus digest per source. */
  val qFlowCsv: Q = (s, d) => {
    val in = getClass.getResourceAsStream("/flows/csv_export.json")
    require(in != null, "flow definition resource missing")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    FlowCompiler.compile(s, json, Map("documents" -> Tables.documents(s, d)))("by_source")
  }
  /** Ninth committed flow (r7), file-sourced: GetFile ingests one JSON
    * file per document from a parameterized directory (`#{indir}`),
    * ConvertRecord re-serializes each record json → csv, LogAttribute
    * passes through (real NiFi exports are littered with it),
    * EvaluateJsonPath + QueryRecord type the extracted fields. The
    * SOURCE lives inside the flow — no caller-bound input port. */
  val qFlowFiles: Q = (s, d) => {
    // stage one file per document (bounded: 200 docs — driver-side
    // writes ARE the GetFile ingestion contract; files are the source)
    val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id"), length(col("text")).cast("int").as("text_len"))
      .collect()
    // Stage dir keyed by the FULL sf path (sanitized), not a 32-bit
    // hashCode — two dirs can share a hashCode, and a prior run's files
    // would ghost into this run through GetFile's glob. Same reason the
    // dir is wiped before staging: the file listing IS the source.
    val dir = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_flow_files_" + d.replaceAll("[^A-Za-z0-9._-]", "_"))
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.list(dir).forEach(p => java.nio.file.Files.deleteIfExists(p))
    docs.foreach { r =>
      val id = r.getLong(0)
      java.nio.file.Files.writeString(dir.resolve(f"doc_$id%05d.json"),
        s"""{"doc_id":$id,"text_len":${r.getInt(1)}}""")
    }
    val in = getClass.getResourceAsStream("/flows/file_convert.json")
    require(in != null, "flow definition resource missing")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    FlowCompiler.compile(s, json, Map.empty[String, org.apache.spark.sql.DataFrame],
        Map("indir" -> dir.toString))("converted")
      .select("doc_id", "text_len", "converted")
  }
  val qFlowFilesSql: String =
    """SELECT doc_id, CAST(length(text) AS INT) AS text_len,
      |       CAST(doc_id AS VARCHAR) || ',' || CAST(length(text) AS VARCHAR) AS converted
      |FROM documents WHERE doc_id < 200""".stripMargin

  /** Eleventh committed flow (r10), the database-to-sink shape a real
    * NiFi deployment runs constantly and the compiler could not author
    * until this round: ExecuteSQL reads a JDBC source (embedded Derby
    * here — staged from the nation table; the production swap is the
    * `#{db.url}` parameter), QueryRecord filters/projects, and PutFile
    * persists parquet at `#{sink.dir}`. Compiling EXECUTES the sink
    * write; the flow's output port returns the sink READ-BACK, so what
    * this query hash-checks against DuckDB is exactly what a separate
    * consumer of the sink directory would read. */
  val qFlowSink: Q = (s, d) => {
    val key = d.replaceAll("[^A-Za-z0-9._-]", "_")
    val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val dbDir = base.resolve(s"graft_flow_db_$key")
    val url = s"jdbc:derby:$dbDir/db;create=true"
    graft.sources.Io.writeJdbc(
      Tables.load(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey"),
      url, "graft_nation", "overwrite")
    val sinkDir = base.resolve(s"graft_flow_sink_$key").toString
    val in = getClass.getResourceAsStream("/flows/jdbc_sink.json")
    require(in != null, "flow definition resource missing")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    FlowCompiler.compile(s, json, Map.empty[String, org.apache.spark.sql.DataFrame],
      Map("db.url" -> url, "sink.dir" -> sinkDir))("exported")
  }
  val qFlowSinkSql: String =
    """SELECT n_nationkey, n_name, n_regionkey
      |FROM nation WHERE n_regionkey < 4""".stripMargin

  /** Thirteenth committed flow (r12): controller-service depth — the
    * way a real NiFi canvas factors shared config. ONE
    * DBCPConnectionPool service carries the connection URL; the
    * ExecuteSQL source references it (no inline URL), and a
    * DatabaseRecordLookupService — itself bound to the same pool —
    * backs the LookupRecord enrichment (region name joined onto each
    * nation row, broadcast dimension-sized). Oracle: the same join in
    * DuckDB over the parquet the Derby tables were staged from. */
  val qFlowJdbcLookup: Q = (s, d) => {
    val key = d.replaceAll("[^A-Za-z0-9._-]", "_")
    val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val dbDir = base.resolve(s"graft_flow_lkpdb_$key")
    val url = s"jdbc:derby:$dbDir/db;create=true"
    graft.sources.Io.writeJdbc(
      Tables.load(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey"),
      url, "graft_nation", "overwrite")
    graft.sources.Io.writeJdbc(
      Tables.load(s, d, "region").select("r_regionkey", "r_name"),
      url, "graft_region", "overwrite")
    val in = getClass.getResourceAsStream("/flows/jdbc_lookup.json")
    require(in != null, "flow definition resource missing")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    FlowCompiler.compile(s, json, Map.empty[String, org.apache.spark.sql.DataFrame],
      Map("db.url" -> url))("enriched")
  }
  val qFlowJdbcLookupSql: String =
    """SELECT n_nationkey, n_name, r_name AS region_name
      |FROM nation LEFT JOIN region ON n_regionkey = r_regionkey""".stripMargin

  val qFlowCsvSql: String =
    """WITH o AS (
      |  SELECT doc_id, source, text,
      |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS seq
      |  FROM documents),
      |c AS (
      |  SELECT source, seq,
      |    CAST(seq AS VARCHAR) || ',' || CAST(doc_id AS VARCHAR) || ',' ||
      |    CASE WHEN regexp_matches(source, '[",\n\r]')
      |         THEN '"' || replace(source, '"', '""') || '"' ELSE source END || ',' ||
      |    CASE WHEN regexp_matches(text, '[",\n\r]')
      |         THEN '"' || replace(text, '"', '""') || '"' ELSE text END AS line
      |  FROM o)
      |SELECT source, count(*) AS n_lines,
      |       CAST(min(seq) AS INT) AS first_seq, CAST(max(seq) AS INT) AS last_seq,
      |       md5(string_agg(md5(line), '|' ORDER BY md5(line))) AS corpus_md5
      |FROM c GROUP BY source""".stripMargin

  /** CalculateRecordStats (§2.2): total + per-category-value counts. */
  val qRecordStats: Q = (s, d) =>
    Records.recordStats(Tables.documents(s, d), Seq("source", "lang"))
  val qRecordStatsSql: String =
    """SELECT 'total' AS stat, NULL AS value, count(*) AS n FROM documents
      |UNION ALL SELECT 'source', source, count(*) FROM documents GROUP BY source
      |UNION ALL SELECT 'lang', lang, count(*) FROM documents GROUP BY lang""".stripMargin

  /** AttributesToCSV (§2.2): RFC-4180 line with synthesized
    * delimiter/quote-bearing cells to exercise quoting + doubling. */
  val qAttrsToCsv: Q = (s, d) => {
    val df = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
      concat(col("o_orderpriority"), lit(",v")).as("pri"),
      concat(lit("a\""), col("o_orderstatus")).as("qv"))
    Records.attributesToCsv(df, Seq("o_orderkey", "o_orderstatus", "pri", "qv"))
      .select("o_orderkey", "attrs_csv")
  }
  val qAttrsToCsvSql: String =
    """SELECT o_orderkey,
      |  CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus || ','
      |  || '"' || o_orderpriority || ',v"' || ','
      |  || '"a""' || o_orderstatus || '"' AS attrs_csv
      |FROM orders""".stripMargin

  /** ConvertJSONToSQL (§2.2): JSON object → INSERT statement; the note
    * field carries an apostrophe so literal doubling is exercised. */
  val qJsonToSql: Q = (s, d) => {
    val j = Tables.documents(s, d).select(col("doc_id"),
      to_json(struct(col("doc_id"), col("source"),
        concat(substring(col("text"), 1, 10), lit("'s")).as("note"))).as("j"))
    Records.jsonToSql(j, "j", "docs",
        Seq("doc_id" -> false, "source" -> true, "note" -> true))
      .select(col("doc_id"), col("sql"))
  }
  val qJsonToSqlSql: String =
    """SELECT doc_id,
      |  'INSERT INTO docs (doc_id, source, note) VALUES ('
      |  || CAST(doc_id AS VARCHAR) || ', ' || chr(39) || source || chr(39) || ', '
      |  || chr(39) || substring(text, 1, 10) || chr(39) || chr(39) || 's' || chr(39)
      |  || ')' AS sql
      |FROM documents""".stripMargin

  /** ModifyBytes (§2.2): strip a 5-byte head + 3-byte tail from the
    * payload; oracle replays the blob substring. */
  val qModifyBytes: Q = (s, d) => {
    val payloads = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    Records.modifyBytes(payloads, "payload", dropHead = 5, dropTail = 3)
      .select(col("doc_id"), md5(col("trimmed")).as("trimmed_md5"),
        octet_length(col("trimmed")).cast("long").as("trimmed_len"))
  }
  // DuckDB has no BLOB substring; the synthetic text is ASCII, so the
  // VARCHAR substring is byte-identical to the Spark-side binary trim
  val qModifyBytesSql: String =
    """SELECT doc_id,
      |  md5(substring(text, 6, greatest(length(text) - 8, 0))) AS trimmed_md5,
      |  CAST(greatest(octet_length(encode(text)) - 8, 0) AS BIGINT) AS trimmed_len
      |FROM documents""".stripMargin

  /** SplitContent (§2.2): binary payload split on the space byte —
    * segments (incl. empties from runs/edges) must match DuckDB's
    * string_split on the same ASCII text. */
  val qSplitContent: Q = (s, d) => {
    val payloads = Tables.documents(s, d)
      .select(col("doc_id"), substring(col("text"), 1, 50).cast("binary").as("payload"))
    Records.splitContent(payloads, "payload", " ".getBytes)
      .select(col("doc_id"), col("seg_idx").cast("long").as("seg_idx"),
        md5(col("segment")).as("seg_md5"))
  }
  val qSplitContentSql: String =
    """SELECT doc_id, CAST(i AS BIGINT) AS seg_idx, md5(parts[i]) AS seg_md5
      |FROM (SELECT doc_id, string_split(substring(text, 1, 50), ' ') AS parts
      |      FROM documents), LATERAL (SELECT unnest(range(1, len(parts) + 1)) AS i)""".stripMargin

  /** ValidateXml (§2.2): docs where id % 7 = 0 get truncated (invalid)
    * XML; the schema's required field drives the verdict. */
  val qValidateXml: Q = (s, d) => {
    val xml = when(col("doc_id") % 7 === 0, lit("<r><id>"))
      .otherwise(concat(lit("<r><id>"), col("doc_id"), lit("</id><s>"),
        col("source"), lit("</s></r>")))
    val df = Tables.documents(s, d).select(col("doc_id"), xml.as("xml"))
    Records.validateXml(df,
        "xml", org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("s",
            org.apache.spark.sql.types.StringType))),
        requiredField = "id")
      .select("doc_id", "xml_valid")
  }
  val qValidateXmlSql: String =
    """SELECT doc_id, doc_id % 7 != 0 AS xml_valid FROM documents""".stripMargin

  /** ParseCEF (§2.2): ArcSight CEF lines synthesized from events —
    * header pipes + key=value extensions (msg holds spaces, exercising
    * the value-runs-to-next-key rule); oracle recomputes from raw
    * columns. */
  val qParseCef: Q = (s, d) => {
    val lines = Tables.events(s, d).select(col("event_id"),
      concat(lit("CEF:0|graft|engine|1.0|SIG-"), col("event_id") % 50,
        lit("|"), col("event_type"), lit("|"), col("event_id") % 10,
        lit("|src=10.0.0."), col("user_id") % 255,
        lit(" spt="), col("event_id") % 65535,
        lit(" msg=value "), col("event_id")).as("line"))
    Parse.parseCef(lines, "line", Seq("src", "spt", "msg"))
      .select(col("event_id"), col("cef_version"), col("cef_sig_id"),
        col("cef_name"), col("cef_severity"), col("cef_src"),
        col("cef_spt").cast("long").as("cef_spt"), col("cef_msg"))
  }
  val qParseCefSql: String =
    """SELECT event_id,
      |  CAST(0 AS INT) AS cef_version,
      |  'SIG-' || CAST(event_id % 50 AS VARCHAR) AS cef_sig_id,
      |  event_type AS cef_name,
      |  CAST(event_id % 10 AS VARCHAR) AS cef_severity,
      |  '10.0.0.' || CAST(user_id % 255 AS VARCHAR) AS cef_src,
      |  CAST(event_id % 65535 AS BIGINT) AS cef_spt,
      |  'value ' || CAST(event_id AS VARCHAR) AS cef_msg
      |FROM events""".stripMargin

  /** GeoEnrichIP-style range lookup (§2.2/§2.6): event IPs enriched
    * against a 25-row nation range table via broadcast range join — the
    * big side never shuffles. Nation n owns 10.[8n..8n+7].*.*; the
    * second octet is user_id % 200, so every IP hits exactly one range. */
  val qIpLookup: Q = (s, d) => {
    val ips = Tables.events(s, d).select(col("event_id"),
      concat(lit("10."), col("user_id") % 200, lit(".7."),
             col("event_id") % 250).as("ip"))
    val base = lit(167772160L) // 10.0.0.0
    val ranges = Tables.nation(s, d).select(col("n_name"),
      (base + col("n_nationkey") * 8L * 65536L).as("ip_start"),
      (base + (col("n_nationkey") + 1L) * 8L * 65536L - 1L).as("ip_end"))
    graft.operators.Scale.broadcastRangeJoin(
        ips, ranges, Parse.ipv4ToLong(col("ip")), "ip_start", "ip_end")
      .select("event_id", "ip", "n_name")
  }
  val qIpLookupSql: String =
    """SELECT e.event_id,
      |       '10.' || CAST(e.user_id % 200 AS VARCHAR) || '.7.'
      |         || CAST(e.event_id % 250 AS VARCHAR) AS ip,
      |       n.n_name
      |FROM events e JOIN nation n
      |  ON n.n_nationkey = CAST(floor((e.user_id % 200) / 8) AS INT)""".stripMargin

  /** EvaluateXPath (§2.1): XML docs synthesized from columns, values
    * extracted back with XPath — incl. a count() over repeated nodes.
    * The oracle recomputes from the raw columns, validating the XPath
    * evaluation itself. */
  val qXpathExtract: Q = (s, d) => {
    val words = slice(filter(split(col("text"), "\\s+"), t => length(t) > 0), 1, 5)
    val xml = concat(lit("<doc><id>"), col("doc_id"), lit("</id><src>"), col("source"),
      lit("</src><ws>"),
      array_join(transform(words, w => concat(lit("<w>"), w, lit("</w>"))), ""),
      lit("</ws></doc>"))
    Records.evaluateXPath(
        Tables.documents(s, d).select(col("doc_id"), xml.as("xml")),
        "xml", Map("src" -> "/doc/src", "first_w" -> "/doc/ws/w[1]"))
      .withColumn("n_w", xpath_long(col("xml"), lit("count(/doc/ws/w)")))
      .select("doc_id", "src", "first_w", "n_w")
  }
  val qXpathExtractSql: String =
    """WITH t AS (SELECT doc_id, source,
      |             list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks
      |           FROM documents)
      |SELECT doc_id, source AS src,
      |       coalesce(toks[1], '') AS first_w,
      |       CAST(least(len(toks), 5) AS BIGINT) AS n_w
      |FROM t""".stripMargin

  /** SplitXml (§2.1): explode repeated <w> nodes to one row each. */
  val qSplitXml: Q = (s, d) => {
    val words = slice(filter(split(col("text"), "\\s+"), t => length(t) > 0), 1, 4)
    val xml = concat(lit("<ws>"),
      array_join(transform(words, w => concat(lit("<w>"), w, lit("</w>"))), ""),
      lit("</ws>"))
    Records.splitXml(
        Tables.documents(s, d).select(col("doc_id"), xml.as("xml")),
        "xml", "/ws/w/text()", outCol = "word")
      .select("doc_id", "word")
  }
  val qSplitXmlSql: String =
    """SELECT doc_id, unnest(
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)[1:4]) AS word
      |FROM documents""".stripMargin

  /** ForkRecord: pack events into per-user arrays of records, fork one
    * record back out per element with the parent key carried along —
    * the oracle recomputes fork order straight off the rows. */
  val qForkRecord: Q = (s, d) => {
    val e = Tables.events(s, d).filter(pmod(col("user_id"), lit(5)) === 1)
    val packed = e.groupBy("user_id").agg(
      array_sort(collect_list(struct(col("event_id"), col("event_type")))).as("recs"))
    Records.forkRecord(packed, "recs", Seq("user_id"))
      .select(col("user_id"), col("fork_idx").cast("long").as("fork_idx"),
              col("event_id"), col("event_type"))
  }
  val qForkRecordSql: String =
    """SELECT user_id,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS BIGINT) AS fork_idx,
      |  event_id, event_type
      |FROM events WHERE user_id % 5 = 1""".stripMargin

  /** LookupAttribute: static key→value map as a literal expression (no
    * join, no shuffle); `zh` is deliberately absent to exercise the
    * default. */
  val qLookupAttribute: Q = (s, d) => {
    Records.lookupAttribute(Tables.documents(s, d), "lang",
        Map("en" -> "germanic", "de" -> "germanic",
            "es" -> "romance", "fr" -> "romance"),
        "family", default = Some("other"))
      .select("doc_id", "lang", "family")
  }
  val qLookupAttributeSql: String =
    """SELECT doc_id, lang,
      |  CASE lang WHEN 'en' THEN 'germanic' WHEN 'de' THEN 'germanic'
      |            WHEN 'es' THEN 'romance'  WHEN 'fr' THEN 'romance'
      |            ELSE 'other' END AS family
      |FROM documents""".stripMargin

  /** CryptographicHashAttribute: per-attribute digests (md5 + sha256)
    * alongside the originals. */
  val qHashAttributes: Q = (s, d) => {
    val md5d = Records.hashAttributes(Tables.documents(s, d), Seq("source"), "md5")
    Records.hashAttributes(md5d, Seq("lang"), "sha256")
      .select("doc_id", "source_hash", "lang_hash")
  }
  val qHashAttributesSql: String =
    """SELECT doc_id, md5(source) AS source_hash, sha256(lang) AS lang_hash
      |FROM documents""".stripMargin

  /** ValidateJson: mangle a deterministic subset of the props documents
    * (drop the opening brace → parse failure; swap in a document missing
    * the required field → structural failure) and validate the rest. */
  val qValidateJson: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("event_id"),
      when(pmod(col("event_id"), lit(7)) === 0, expr("substring(props, 2)"))
        .when(pmod(col("event_id"), lit(11)) === 3, lit("""{"x": 1}"""))
        .otherwise(col("props")).as("doc"))
    Records.validateJson(e, "doc",
        new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.LongType), Seq("k"))
      .select("event_id", "route")
  }
  val qValidateJsonSql: String =
    """WITH t AS (SELECT event_id,
      |  CASE WHEN event_id % 7 = 0 THEN substring(props, 2)
      |       WHEN event_id % 11 = 3 THEN '{"x": 1}'
      |       ELSE props END AS doc FROM events)
      |SELECT event_id,
      |  CASE WHEN NOT json_valid(doc) THEN 'invalid'
      |       WHEN json_extract(doc, '$.k') IS NULL THEN 'invalid'
      |       ELSE 'valid' END AS route
      |FROM t""".stripMargin

  /** GenerateFlowFile: deterministic synthetic records — the oracle
    * regenerates the identical rows from a bare range. */
  val qGenerate: Q = (s, _) =>
    graft.sources.Io.generate(s, 1000)
  val qGenerateSql: String =
    """SELECT CAST(i AS BIGINT) AS id, md5(CAST(i AS VARCHAR)) AS content,
      |       CAST(i % 10 AS BIGINT) AS bucket
      |FROM range(1000) t(i)""".stripMargin

  /** ExtractEmailHeaders: synthesize RFC-822 messages from order rows
    * (with a FOLDED Subject continuation line and a conditional header)
    * and parse them back — the oracle recomputes the expected headers
    * straight from the raw columns, so the parser is what's checked. */
  val qEmailHeaders: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val msg = concat(
      lit("From: cust-"), col("o_custkey"), lit("@example.com\r\n"),
      lit("To: ops@example.com\r\n"),
      lit("Subject: Order "), col("o_orderkey"),
      lit("\r\n viapriority "), col("o_orderpriority"), lit("\r\n"),
      when(col("o_orderstatus") === "F", lit("X-Flag: done\r\n")).otherwise(lit("")),
      lit("\r\nBody: thanks; Subject: decoy\r\n"))
    Parse.extractEmailHeaders(o.select(col("o_orderkey"), msg.as("msg")), "msg",
        Seq("From", "Subject", "X-Flag"))
      .select("o_orderkey", "email_from", "email_subject", "email_x_flag")
  }
  val qEmailHeadersSql: String =
    """SELECT o_orderkey,
      |  'cust-' || o_custkey || '@example.com' AS email_from,
      |  'Order ' || o_orderkey || ' viapriority ' || o_orderpriority AS email_subject,
      |  CASE WHEN o_orderstatus = 'F' THEN 'done' END AS email_x_flag
      |FROM orders""".stripMargin

  /** Wait/Notify release gate: orders wait until their customer has a
    * BUILDING-segment signal row; per-route rollup. */
  val qWaitNotify: Q = (s, d) => {
    val signals = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    Records.waitRelease(Tables.orders(s, d), signals, Seq("o_custkey" -> "c_custkey"))
      .groupBy("route")
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
  }
  val qWaitNotifySql: String =
    """SELECT CASE WHEN c.c_custkey IS NOT NULL THEN 'success' ELSE 'wait' END AS route,
      |       count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      |FROM orders o LEFT JOIN (
      |  SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') c
      |  ON o.o_custkey = c.c_custkey
      |GROUP BY 1""".stripMargin

  /** RetryFlowFile: seeded retry counters bumped once, routed against
    * the max-retries budget. */
  val qRetry: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("event_id"),
      pmod(col("event_id"), lit(5)).cast("int").as("flowfile_retries"))
    Records.retryFlowFile(e, maxRetries = 3)
      .select("event_id", "flowfile_retries", "route")
  }
  val qRetrySql: String =
    """SELECT event_id, CAST(event_id % 5 + 1 AS INT) AS flowfile_retries,
      |  CASE WHEN event_id % 5 + 1 <= 3 THEN 'retry' ELSE 'retries_exceeded' END AS route
      |FROM events""".stripMargin

  /** RecordPath compiler: nested struct/array/map extraction by NiFi
    * record paths — the oracle recomputes every projection from the
    * flat columns the nested record was built from. */
  val qRecordPath: Q = (s, d) => {
    import graft.functions.RecordPath
    val recs = Tables.orders(s, d).select(col("o_orderkey"),
      struct(col("o_orderstatus").as("status"),
             array(col("o_custkey"), col("o_orderkey")).as("ks"),
             map(lit("prio"), col("o_orderpriority")).as("m")).as("rec"))
    recs.select(col("o_orderkey"),
      RecordPath.compile("/rec/status").as("status"),
      RecordPath.compile("/rec/ks[0]").as("first_k"),
      RecordPath.compile("/rec/ks[-1]").as("last_k"),
      RecordPath.compile("/rec/m['prio']").as("prio"),
      RecordPath.compile("/rec/m['absent']").as("missing"))
  }
  val qRecordPathSql: String =
    """SELECT o_orderkey, o_orderstatus AS status,
      |  o_custkey AS first_k, o_orderkey AS last_k,
      |  o_orderpriority AS prio, CAST(NULL AS VARCHAR) AS missing
      |FROM orders""".stripMargin

  /** RecordPath standalone FUNCTIONS (r18): the guide's string subset
    * compiled onto codegen'd builtins — case/trim, concat, substring
    * (0-based, end-exclusive, negatives from the end), substringBefore/
    * After with the whole-string-when-absent rule, replaceRegex,
    * padLeft (pad-never-truncate). Every output stated exactly by the
    * DuckDB oracle. */
  val qRecordPathFns: Q = (s, d) => {
    import graft.functions.RecordPath.compileExpr
    val recs = Tables.orders(s, d).select(col("o_orderkey"),
      struct(col("o_orderpriority").as("prio"),
             col("o_orderstatus").as("status"),
             col("o_orderdate").cast("string").as("odate")).as("rec"))
    recs.select(col("o_orderkey"),
      compileExpr("toLowerCase(/rec/prio)").as("prio_lc"),
      compileExpr("concat(/rec/status, '-', toLowerCase(/rec/prio))").as("tag"),
      compileExpr("substring(/rec/prio, 0, 1)").as("prio_code"),
      compileExpr("substring(/rec/odate, -5, -1)").as("date_mid"),
      compileExpr("substringAfter(/rec/prio, '-')").as("prio_word"),
      compileExpr("substringBefore(/rec/prio, '-')").as("prio_num"),
      compileExpr("substringBefore(/rec/status, '-')").as("status_whole"),
      compileExpr("replaceRegex(/rec/odate, '-', '/')").as("date_slash"),
      compileExpr("padLeft(/rec/status, 3, '*')").as("status_pad"))
  }
  val qRecordPathFnsSql: String =
    """SELECT o_orderkey,
      |  lower(o_orderpriority) AS prio_lc,
      |  o_orderstatus || '-' || lower(o_orderpriority) AS tag,
      |  substring(o_orderpriority, 1, 1) AS prio_code,
      |  substring(CAST(o_orderdate AS VARCHAR),
      |            length(CAST(o_orderdate AS VARCHAR)) - 4, 4) AS date_mid,
      |  CASE WHEN instr(o_orderpriority, '-') > 0
      |       THEN substring(o_orderpriority, instr(o_orderpriority, '-') + 1)
      |       ELSE o_orderpriority END AS prio_word,
      |  CASE WHEN instr(o_orderpriority, '-') > 0
      |       THEN substring(o_orderpriority, 1, instr(o_orderpriority, '-') - 1)
      |       ELSE o_orderpriority END AS prio_num,
      |  o_orderstatus AS status_whole,
      |  replace(CAST(o_orderdate AS VARCHAR), '-', '/') AS date_slash,
      |  CASE WHEN length(o_orderstatus) >= 3 THEN o_orderstatus
      |       ELSE lpad(o_orderstatus, 3, '*') END AS status_pad
      |FROM orders""".stripMargin

  /** r16 crawl-bytes curation flow (flows/html_curation.json): pages
    * enter as raw HTML, ExtractHTMLMainContent recovers the text
    * (jusText no-stoplist mode, thresholds making extraction exactly
    * `text` on this corpus — see qHtmlPipeline), an EL length gate
    * drops thin pages, QueryRecord rolls up per language. The oracle is
    * the same rollup straight off `documents` — pinning that the whole
    * HTML leg is semantically transparent. */
  val qFlowHtml: Q = (s, d) => {
    val in = getClass.getResourceAsStream("/flows/html_curation.json")
    require(in != null, "flow definition resource missing")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val pages = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      QueriesLlm.htmlWrap(withPara2 = false).as("content"))
    FlowCompiler.compile(s, json, Map("pages" -> pages))("by_lang")
  }
  val qFlowHtmlSql: String =
    """WITH kept AS (SELECT * FROM documents WHERE length(text) >= 100)
      |SELECT lang, count(*) AS n_docs,
      |       CAST(sum(length(text)) AS BIGINT) AS total_chars,
      |       md5(string_agg(CAST(doc_id AS VARCHAR), '|'
      |                      ORDER BY CAST(doc_id AS VARCHAR))) AS docs_md5
      |FROM kept GROUP BY lang""".stripMargin

  // -------------------------------------------------------------- export
  val queries: Map[String, Q] = Map(
    "q_count_text"      -> qCountText,
    "q_encode_content"  -> qEncodeContent,
    "q_pgp_roundtrip"   -> qPgpRoundtrip,
    "q_replace_mapping" -> qReplaceMapping,
    "q_route_text"      -> qRouteText,
    "q_split_json"      -> qSplitJson,
    "q_record_fields"   -> qRecordFields,
    "q_record_update"   -> qRecordUpdate,
    "q_extract_grok"    -> qExtractGrok,
    "q_parse_syslog"    -> qParseSyslog,
    "q_validate_csv"    -> qValidateCsv,
    "q_route_el"        -> qRouteEl,
    "q_pack_unpack"     -> qPackUnpack,
    "q_jolt"            -> qJolt,
    "q_jolt_chain"      -> qJoltChain,
    "q_jolt_lookup"     -> qJoltLookup,
    "q_flow_composite"  -> qFlowComposite,
    "q_flow_definition" -> qFlowDefinition,
    "q_flow_enrichment" -> qFlowEnrichment,
    "q_xpath_extract"   -> qXpathExtract,
    "q_split_xml"       -> qSplitXml,
    "q_record_stats"    -> qRecordStats,
    "q_attrs_to_csv"    -> qAttrsToCsv,
    "q_json_to_sql"     -> qJsonToSql,
    "q_parse_cef"       -> qParseCef,
    "q_ip_lookup"       -> qIpLookup,
    "q_modify_bytes"    -> qModifyBytes,
    "q_split_content"   -> qSplitContent,
    "q_validate_xml"    -> qValidateXml,
    "q_flow_lines"      -> qFlowLines,
    "q_flow_parse"      -> qFlowParse,
    "q_flow_csv"        -> qFlowCsv,
    "q_flow_files"      -> qFlowFiles,
    "q_flow_sink"       -> qFlowSink,
    "q_flow_jdbc_lookup" -> qFlowJdbcLookup,
    "q_flow_record_update" -> qFlowRecordUpdate,
    "q_flow_nested"     -> qFlowNested,
    "q_flow_html"       -> qFlowHtml,
    "q_fork_record"     -> qForkRecord,
    "q_lookup_attribute" -> qLookupAttribute,
    "q_hash_attributes" -> qHashAttributes,
    "q_validate_json"   -> qValidateJson,
    "q_generate"        -> qGenerate,
    "q_email_headers"   -> qEmailHeaders,
    "q_record_path"     -> qRecordPath,
    "q_record_path_fns" -> qRecordPathFns,
    "q_wait_notify"     -> qWaitNotify,
    "q_retry"           -> qRetry)

  val oracles: Map[String, String] = Map(
    "q_count_text"      -> qCountTextSql,
    "q_encode_content"  -> qEncodeContentSql,
    "q_pgp_roundtrip"   -> qPgpRoundtripSql,
    "q_replace_mapping" -> qReplaceMappingSql,
    "q_route_text"      -> qRouteTextSql,
    "q_split_json"      -> qSplitJsonSql,
    "q_record_fields"   -> qRecordFieldsSql,
    "q_record_update"   -> qRecordUpdateSql,
    "q_extract_grok"    -> qExtractGrokSql,
    "q_parse_syslog"    -> qParseSyslogSql,
    "q_validate_csv"    -> qValidateCsvSql,
    "q_route_el"        -> qRouteElSql,
    "q_pack_unpack"     -> qPackUnpackSql,
    "q_jolt"            -> qJoltSql,
    "q_jolt_chain"      -> qJoltChainSql,
    "q_jolt_lookup"     -> qJoltLookupSql,
    "q_flow_composite"  -> qFlowCompositeSql,
    "q_flow_definition" -> qFlowCompositeSql,
    "q_flow_enrichment" -> qFlowEnrichmentSql,
    "q_xpath_extract"   -> qXpathExtractSql,
    "q_split_xml"       -> qSplitXmlSql,
    "q_record_stats"    -> qRecordStatsSql,
    "q_attrs_to_csv"    -> qAttrsToCsvSql,
    "q_json_to_sql"     -> qJsonToSqlSql,
    "q_parse_cef"       -> qParseCefSql,
    "q_ip_lookup"       -> qIpLookupSql,
    "q_modify_bytes"    -> qModifyBytesSql,
    "q_split_content"   -> qSplitContentSql,
    "q_validate_xml"    -> qValidateXmlSql,
    "q_flow_lines"      -> qFlowLinesSql,
    "q_flow_parse"      -> qFlowParseSql,
    "q_flow_csv"        -> qFlowCsvSql,
    "q_flow_files"      -> qFlowFilesSql,
    "q_flow_sink"       -> qFlowSinkSql,
    "q_flow_jdbc_lookup" -> qFlowJdbcLookupSql,
    "q_flow_record_update" -> qFlowRecordUpdateSql,
    "q_flow_nested"     -> qFlowNestedSql,
    "q_flow_html"       -> qFlowHtmlSql,
    "q_fork_record"     -> qForkRecordSql,
    "q_lookup_attribute" -> qLookupAttributeSql,
    "q_hash_attributes" -> qHashAttributesSql,
    "q_validate_json"   -> qValidateJsonSql,
    "q_generate"        -> qGenerateSql,
    "q_email_headers"   -> qEmailHeadersSql,
    "q_record_path"     -> qRecordPathSql,
    "q_record_path_fns" -> qRecordPathFnsSql,
    "q_wait_notify"     -> qWaitNotifySql,
    "q_retry"           -> qRetrySql)
}
