package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextAnalysis, VectorFunctions}
import graft.operators.{Dedup, Parse, Records}

/** Edge cases for the round-3 operators beyond what the DuckDB oracles
  * exercise: malformed inputs, null handling, idempotence, and
  * HOF-vs-native equivalence. */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  test("normalizeUrl: idempotent, handles no-query/no-path/only-tracking URLs") {
    val urls = Seq(
      "https://WWW.Ex.COM/a/b/?utm_source=x",     // only tracking → no '?'
      "http://ex.com",                             // no path, no query
      "https://ex.com/p?id=1&utm_b=2&q=3#frag",    // mixed params + fragment
      "https://sub.ex.com/deep/path/")
      .toDF("url").select(TextAnalysis.normalizeUrl(col("url")).as("n"))
    val out = urls.as[String].collect().toSeq
    assert(out === Seq(
      "https://ex.com/a/b",
      "http://ex.com",
      "https://ex.com/p?id=1&q=3",
      "https://sub.ex.com/deep/path"))
    // idempotence: normalize(normalize(u)) == normalize(u)
    val again = urls.select(TextAnalysis.normalizeUrl(col("n"))).as[String].collect().toSeq
    assert(again === out)
  }

  test("urlDomain: two-label heuristic, single-label host unchanged") {
    val d = Seq("https://a.b.ex.org/x", "https://localhost/x")
      .toDF("u").select(TextAnalysis.urlDomain(col("u"))).as[String].collect().toSeq
    assert(d === Seq("ex.org", "localhost"))
  }

  test("parseCef: malformed lines yield nulls; missing extension keys null") {
    val out = Parse.parseCef(
      Seq("CEF:0|v|p|1|sig|name|5|src=1.2.3.4 msg=hello world",
          "not a cef line").toDF("line"),
      "line", Seq("src", "dst", "msg"))
    val rows = out.select("cef_version", "cef_name", "cef_src", "cef_dst", "cef_msg")
      .collect()
    assert(rows(0).toSeq === Seq(0, "name", "1.2.3.4", null, "hello world"))
    assert(rows(1).toSeq === Seq(null, null, null, null, null))
  }

  test("ipv4ToLong: valid, boundary, malformed") {
    val out = Seq("0.0.0.0", "255.255.255.255", "10.1.2.3", "999.1.2", "x.y.z.w",
        "999.1.2.3", "10.256.0.1")
      .toDF("ip").select(Parse.ipv4ToLong(col("ip")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
    assert(out === Seq(0L, 4294967295L, 167838211L, -1L, -1L, -1L, -1L))
  }

  test("jsonToSql: null/absent fields become SQL NULL; quotes doubled") {
    val out = Records.jsonToSql(
      Seq("""{"a":1,"b":"it's"}""", """{"a":2}""").toDF("j"),
      "j", "t", Seq("a" -> false, "b" -> true))
      .select("sql").as[String].collect().toSeq
    assert(out === Seq(
      "INSERT INTO t (a, b) VALUES (1, 'it''s')",
      "INSERT INTO t (a, b) VALUES (2, NULL)"))
  }

  test("attributesToCsv: nulls empty, embedded quotes/commas/newlines quoted") {
    val out = Records.attributesToCsv(
      Seq((Some("plain"), Some("a,b"), Some("q\"t"), None: Option[String]))
        .toDF("w", "x", "y", "z"), Seq("w", "x", "y", "z"))
      .select("attrs_csv").as[String].head
    assert(out === "plain,\"a,b\",\"q\"\"t\",")
  }

  test("dropBoilerplateLines preserves per-doc line order") {
    val docs = Seq(
      (1L, "COMMON\nfirst1\nsecond1"),
      (2L, "first2\nCOMMON\nsecond2"),
      (3L, "first3\nsecond3\nCOMMON")).toDF("id", "txt")
    val out = Dedup.dropBoilerplateLines(docs, "id", "txt", minDocFreq = 3)
      .orderBy("id").select("clean_text", "n_kept")
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("first1\nsecond1", 2L), ("first2\nsecond2", 2L),
      ("first3\nsecond3", 2L)))
  }

  test("duplicateSpans flags exactly the recurring token windows") {
    val docs = Seq(
      (1L, "alpha beta gamma delta one"),     // shares alpha..delta with doc 2
      (2L, "x alpha beta gamma delta two"),   // same span, offset 1
      (3L, "alpha beta qq gamma delta"),      // broken span — no 4-window match
      (4L, "short one")                       // too short for a 4-window
    ).toDF("id", "txt")
    val flagged = Dedup.duplicateSpans(docs, "id", "txt", spanTokens = 4, minDocs = 2)
      .select("id", "pos", "span", "n_docs")
      .as[(Long, Int, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(flagged === Array(
      (1L, 0, "alpha beta gamma delta", 2L),
      (2L, 1, "alpha beta gamma delta", 2L)))
    // raising minDocs above the recurrence kills the flag
    assert(Dedup.duplicateSpans(docs, "id", "txt", 4, minDocs = 3).count() === 0)
  }

  test("hash-candidate duplicateSpans equals the all-text reference on real documents") {
    // the r10 shuffle-byte form (8-byte hash keys corpus-wide, exact
    // text confirm over candidates only) must flag the IDENTICAL set as
    // a straight group-by-span-text reference — same windows, same
    // positions, same n_docs
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val k = 4
    val wins = docs
      .select(col("doc_id"), graft.functions.TextAnalysis.wsTokens(col("text")).as("__ts"))
      .filter(size(col("__ts")) >= k)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("__ts")) - k),
          i => array_join(slice(col("__ts"), i + 1, lit(k)), " ")))
          .as(Seq("pos", "span")))
    val reference = wins.join(
        wins.groupBy("span").agg(countDistinct(col("doc_id")).as("n_docs"))
          .filter(col("n_docs") >= 2), "span")
      .select("doc_id", "pos", "span", "n_docs")
      .as[(Long, Int, String, Long)].collect().toSet
    val fast = Dedup.duplicateSpans(docs, "doc_id", "text", spanTokens = k, minDocs = 2)
      .select("doc_id", "pos", "span", "n_docs")
      .as[(Long, Int, String, Long)].collect().toSet
    assert(fast === reference,
      s"ref-only=${(reference -- fast).size} fast-only=${(fast -- reference).size}")
    assert(fast.nonEmpty, "sf0.001 documents must contain repeated 4-token spans")
  }

  test("updateCounter: named counters ride the job as observed metrics") {
    val captured = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Row]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) => captured.put(k, v) }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Seq(1, 2, 3, 4, 5).toDF("n")
      val out = Records.updateCounter(df, "graft_counters",
        Map("all" -> lit(true), "big" -> (col("n") > 3))).collect()
      assert(out.length === 5, "counters must not change the stream")
      val deadline = System.currentTimeMillis() + 15000
      while (!captured.containsKey("graft_counters") && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val m = captured.get("graft_counters")
      assert(m != null, "observed metrics never arrived")
      assert(m.getAs[Long]("all") === 5L && m.getAs[Long]("big") === 2L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("cutDuplicateSpans removes exactly the covered tokens, in order") {
    val docs = Seq(
      (1L, "alpha beta gamma delta one"),
      (2L, "x alpha beta gamma delta two"),
      (3L, "alpha beta qq gamma delta"),
      (4L, "short one")
    ).toDF("id", "txt")
    val cleaned = Dedup.cutDuplicateSpans(docs, "id", "txt", spanTokens = 4, minDocs = 2)
      .select("id", "clean_text", "n_kept")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(cleaned === Array(
      (1L, "one", 1L),
      (2L, "x two", 2L),
      (3L, "alpha beta qq gamma delta", 5L),
      (4L, "short one", 2L)))
    // a fully-covered doc emits no row
    val twins = Seq((1L, "same four token span"), (2L, "same four token span"))
      .toDF("id", "txt")
    val out = Dedup.cutDuplicateSpans(twins, "id", "txt", 4, 2).count()
    assert(out === 0)
  }

  test("requantize8 equals the composed HOF quantize->dequantize exactly") {
    val vecs = Seq(
      Array(0.5f, -1.25f, 3.75f, 0.0f),
      Array(0.0f, 0.0f, 0.0f, 0.0f), // all-zero → scale 1.0
      Array(-127.0f, 127.0f, 63.5f, -0.001f)).toDF("v")
    val both = vecs.select(
      VectorFunctions.requantize8(col("v")).as("native"),
      VectorFunctions.dequantize8(VectorFunctions.quantize8(col("v"))).as("hof"))
    val rows = both.as[(Seq[Double], Seq[Double])].collect()
    rows.foreach { case (n, h) => assert(n === h) }
  }

  test("splitContent: multi-byte delimiter, edge/consecutive delimiters, no match") {
    def segs(payload: String, delim: String): Seq[String] =
      Records.splitContent(Seq(payload.getBytes).toDF("payload"), "payload",
          delim.getBytes)
        .orderBy("seg_idx").select("segment")
        .as[Array[Byte]].collect().toSeq.map(new String(_))
    assert(segs("a--bb--c", "--") === Seq("a", "bb", "c"))
    assert(segs("--a----b--", "--") === Seq("", "a", "", "b", ""))
    assert(segs("nodelim", "--") === Seq("nodelim"))
    assert(segs("", "--") === Seq(""))
  }

  test("validateXml: malformed and missing-required-field XML fail") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    val out = Records.validateXml(
      Seq("<r><id>5</id></r>", "<r><other>x</other></r>", "<r><id>broken").toDF("xml"),
      "xml", schema, "id")
      .select("xml_valid").as[Boolean].collect().toSeq
    assert(out === Seq(true, false, false))
  }

  test("evaluateXPath and splitXml on attributes and empty matches") {
    val xml = Seq("""<r a="1"><x>u</x><x>v</x></r>""", "<r></r>").toDF("xml")
    val ex = Records.evaluateXPath(xml, "xml", Map("attr" -> "/r/@a", "x1" -> "/r/x[1]"))
      .select("attr", "x1").as[(String, String)].collect().toSeq
    assert(ex === Seq(("1", "u"), ("", ""))) // xpath_string yields "" on no match
    val split = Records.splitXml(xml, "xml", "/r/x/text()", "w")
      .select("w").as[String].collect().toSeq
    assert(split === Seq("u", "v")) // empty doc explodes to zero rows
  }
}
