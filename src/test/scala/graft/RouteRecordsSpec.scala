package graft

import org.apache.spark.sql.functions._
import graft.operators.{Records, Route}

class RouteRecordsSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    (1L, "error", 10.0), (2L, "click", 200.0), (3L, "purchase", 150.0),
    (4L, "weird", 5.0), (5L, "error", 20.0)
  ).toDF("id", "etype", "value")

  test("Route.onAttribute partitions rows; unmatched catches the rest") {
    val routes = Route.onAttribute(events, Seq(
      "err" -> (col("etype") === "error"),
      "big" -> (col("value") > 100)))
    assert(routes("err").select("id").as[Long].collect().sorted === Array(1L, 5L))
    assert(routes("big").select("id").as[Long].collect().sorted === Array(2L, 3L))
    assert(routes("unmatched").select("id").as[Long].collect() === Array(4L))
  }

  test("Route.tagged picks FIRST matching route (priority)") {
    val tagged = Route.tagged(events, Seq(
      "err" -> (col("etype") === "error"),
      "big" -> (col("value") > 100)))
    val m = tagged.select("id", "route").as[(Long, String)].collect().toMap
    assert(m(1L) == "err" && m(5L) == "err")
    assert(m(2L) == "big" && m(3L) == "big")
    assert(m(4L) == "unmatched")
  }

  test("Records.filterAttributes: retain/remove, regex whole-name match, protect") {
    // enumeration retain keeps listed + protected, in original order
    val r1 = Records.filterAttributes(events, retain = true, names = Seq("value"),
      protect = Seq("id"))
    assert(r1.columns.toSeq == Seq("id", "value"))
    // enumeration remove drops listed, protect overrides the removal
    val r2 = Records.filterAttributes(events, retain = false,
      names = Seq("etype", "id"), protect = Seq("id"))
    assert(r2.columns.toSeq == Seq("id", "value"))
    // regex matches the WHOLE name (NiFi contract): "e" alone keeps nothing
    val r3 = Records.filterAttributes(events, retain = true,
      regex = Some("e.*"), protect = Seq("id"))
    assert(r3.columns.toSeq == Seq("id", "etype"))
    intercept[IllegalArgumentException](
      Records.filterAttributes(events, retain = true, names = Seq("nope")))
    // the projection prunes to the source: no surviving reference to
    // dropped columns anywhere in the optimized plan
    val plan = r1.queryExecution.optimizedPlan.toString
    assert(!plan.contains("etype"), plan)
  }

  test("Records.validate flags each failed rule") {
    val v = Records.validate(events,
      "pos" -> (col("value") > 0),
      "known" -> col("etype").isin("error", "click", "purchase"))
    val bad = v.filter(!col("is_valid")).select("id", "violations")
      .as[(Long, Seq[String])].collect().toMap
    assert(bad.keySet === Set(4L))
    assert(bad(4L) === Seq("known"))
  }

  test("Records.split + merge round-trips content") {
    val df = Seq((1L, "a b c"), (2L, "x y")).toDF("id", "text")
    val pieces = Records.split(df, "text", " ")
    assert(pieces.count() == 5)
    val merged = Records.merge(pieces, Seq("id"), "pos", "piece", " ")
    val m = merged.select("id", "merged").as[(Long, String)].collect().toMap
    assert(m(1L) == "a b c" && m(2L) == "x y")
  }

  test("Records.binPack: no bin exceeds cap except single-oversize items") {
    val df = (1 to 20).map(i => (1, i.toLong, 300L)).toDF("g", "ord", "sz")
    val bins = Records.binPack(df, Seq("g"), "ord", "sz", 1000L)
      .groupBy("bin").agg(sum("sz").as("total")).select("total").as[Long].collect()
    assert(bins.forall(_ <= 1200L)) // 3×300 fits, 4th opens a new bin
  }

  test("Records.segment chunks cover the content exactly") {
    val df = Seq((1L, "abcdefghij")).toDF("id", "text")
    val chunks = Records.segment(df, "text", 4)
      .orderBy("chunk_idx").select("chunk").as[String].collect()
    assert(chunks === Array("abcd", "efgh", "ij"))
  }

  test("Records.defragment reassembles STRING-indexed fragments numerically") {
    // NiFi's fragment.index attribute is a string — 12 fragments would
    // sort '10','11' before '2' lexically and silently corrupt content;
    // the index must be coerced to long inside the sort struct
    val text = "abcdefghijklmnopqrstuvwx" // 12 fragments of 2
    val frags = (0 until 12).map(i => ("d1", i.toString, text.substring(i * 2, i * 2 + 2)))
      .toDF("fragment_id", "fragment_index", "chunk")
    val out = Records.defragment(frags, "fragment_id", "fragment_index", "chunk")
      .select("content").as[String].head()
    assert(out === text)
  }

  test("Records.enforceOrder assigns dense per-key sequence") {
    val df = Seq((1, 30), (1, 10), (1, 20), (2, 5)).toDF("k", "t")
    val seqd = Records.enforceOrder(df, Seq("k"), Seq("t"))
    val rows = seqd.filter(col("k") === 1).orderBy("seq")
      .select("t").as[Int].collect()
    assert(rows === Array(10, 20, 30))
  }

  test("Records.rollingWindow sums only the trailing range") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val df = Seq((1, ts(0), 1.0), (1, ts(30), 2.0), (1, ts(90), 4.0))
      .toDF("k", "ts", "v")
    val r = Records.rollingWindow(df, "k", "ts", "v", 3600000L)
      .orderBy("ts").select("rolling_sum").as[Double].collect()
    assert(r === Array(1.0, 3.0, 6.0)) // 90min row: 30min+90min in range
  }

  test("Records.topNPerKey keeps n best with deterministic ties") {
    val df = Seq((1, 10, "a"), (1, 30, "b"), (1, 30, "c"), (1, 5, "d"))
      .toDF("k", "score", "tag")
    val top = Records.topNPerKey(df, Seq("k"), Seq(col("score").desc, col("tag")), 2)
      .orderBy("rk").select("tag").as[String].collect()
    assert(top === Array("b", "c"))
  }

  test("ConvertRecord xml mode (r17): XMLReader parse, writer round-trip, malformed -> null") {
    val ddl = "u BIGINT, t STRING"
    val xmlRows = Seq(
      (1L, "<e><u>7</u><t>click</t></e>"),
      (2L, "<rec><t>view</t><u>9</u></rec>"), // any root tag, any field order
      (3L, "not xml at all <<<")
    ).toDF("id", "content")
    val j = Records.convertRecordFormat(xmlRows, "content", "xml", "json", ddl)
      .orderBy("id").select("converted").as[String].collect()
    assert(j(0) === """{"u":7,"t":"click"}""")
    assert(j(1) === """{"u":9,"t":"view"}""")
    assert(j(2) === "{}", "malformed xml parses to an all-null record")
    // writer direction: json -> xml -> back is identity on the record
    val jsonRows = Seq((1L, """{"u": 7, "t": "a<b"}""")).toDF("id", "content")
    val toXml = Records.convertRecordFormat(jsonRows, "content", "json", "xml", ddl, "x")
    val xmlOut = toXml.select("x").as[String].collect()(0)
    assert(xmlOut.contains("<u>7</u>") && xmlOut.contains("a&lt;b"),
      "writer escapes markup-significant characters")
    val back = Records.convertRecordFormat(toXml, "x", "xml", "json", ddl, "round")
      .select("round").as[String].collect()(0)
    assert(back === """{"u":7,"t":"a<b"}""")
  }

  test("ValidateCsv (r17): cell processors, RFC-4180 quoting, Unique window, schema rejects at parse") {
    val rows = Seq(
      (1L, """7,alpha,1.5"""),            // all pass
      (2L, """x,alpha,1.5"""),            // ParseLong fails
      (3L, """8,al,2.0"""),               // StrMinMax(3,8) fails (len 2)
      (4L, """9,beta"""),                 // Optional third missing -> valid
      (5L, """10,beta,notnum"""),         // Optional(ParseDouble) fails
      (6L, """11,beta,1.0,extra"""),      // extra cell -> invalid
      (7L, "12,\"has, comma\",3.0")       // quoted comma stays ONE cell
    ).toDF("id", "line")
    val out = Records.validateCsv(rows, "line",
      """ParseLong, StrMinMax(3,10), Optional(ParseDouble)""")
      .orderBy("id").select("route").as[String].collect()
    assert(out === Array("valid", "invalid", "invalid", "valid",
      "invalid", "invalid", "valid"))
    // Unique(): the duplicated cell value routes BOTH rows invalid
    val dups = Seq((1L, "a,1"), (2L, "b,2"), (3L, "a,3")).toDF("id", "line")
    val uniq = Records.validateCsv(dups, "line", "Unique(), ParseLong")
      .orderBy("id").select("route").as[String].collect()
    assert(uniq === Array("invalid", "valid", "invalid"))
    // a bad schema throws at PARSE time, not per row
    intercept[IllegalArgumentException] {
      graft.operators.CsvCells.parseSchema("ParseLong, Frobnicate()")
    }
    intercept[IllegalArgumentException] {
      graft.operators.CsvCells.parseSchema("StrMinMax(3)")
    }
    // flow node: the valid relationship is selectable on a connection
    val flow =
      """{"flowContents": {"name": "vcsv",
        |  "inputPorts": [{"identifier": "in", "name": "lines"}],
        |  "outputPorts": [{"identifier": "out", "name": "ok"}],
        |  "processors": [
        |    {"identifier": "v", "type": "ValidateCsv",
        |     "properties": {"Content Column": "line",
        |       "Schema": "ParseLong, NotNull"}}],
        |  "connections": [
        |    {"source": {"id": "in"}, "destination": {"id": "v"}},
        |    {"source": {"id": "v"}, "destination": {"id": "out"},
        |     "selectedRelationships": ["valid"]}]}}""".stripMargin
    val got = FlowCompiler.compile(spark, flow,
      Map("lines" -> Seq("5,ok", "bad,ok").toDF("line")))("ok")
      .select("line").as[String].collect()
    assert(got.toSeq === Seq("5,ok"), "only the valid relationship flows")
  }

  test("ValidateCsv (r18): Unique rejects a null cell; Optional(Unique) passes it") {
    // super-csv's Unique/UniqueHashCode reject null; Optional short-
    // circuits the rest of the chain on null, so Optional(Unique())
    // lets ANY number of nulls through without tripping the window
    val rows = Seq((1L, "a,1"), (2L, ",2"), (3L, "b,3")).toDF("id", "line")
    val bare = Records.validateCsv(rows, "line", "Unique(), ParseLong")
      .orderBy("id").select("route").as[String].collect()
    assert(bare === Array("valid", "invalid", "valid"),
      "a lone null Unique cell routes invalid")
    val opt = Records.validateCsv(rows, "line", "Optional(Unique()), ParseLong")
      .orderBy("id").select("route").as[String].collect()
    assert(opt === Array("valid", "valid", "valid"))
    val twoNull = Seq((1L, ",1"), (2L, ",2")).toDF("id", "line")
    val opt2 = Records.validateCsv(twoNull, "line", "Optional(Unique()), ParseLong")
      .orderBy("id").select("route").as[String].collect()
    assert(opt2 === Array("valid", "valid"),
      "multiple nulls bypass the count window under Optional")
  }
}
