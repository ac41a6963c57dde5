package graft

import org.apache.spark.sql.functions._

/** Flow-definition JSON → composed Catalyst plan: the compiled flow
  * must match the hand-coded composite pipeline row-for-row, honor
  * relationship selection, and reject malformed graphs loudly. */
class FlowCompilerSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("committed flow definition compiles to the same result as the hand-coded composite") {
    val compiled = QueriesText.qFlowDefinition(spark, sf)
      .orderBy("route", "day").collect().toSeq
    val handCoded = QueriesText.qFlowComposite(spark, sf)
      .orderBy("route", "day").collect().toSeq
    assert(compiled === handCoded)
    assert(compiled.nonEmpty)
  }

  test("compiled flow is ONE lazy plan — routing does not split the scan") {
    val json = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/flows/composite_events.json"), "UTF-8").mkString
    val out = FlowCompiler.compile(spark, json,
      Map("events" -> Tables.events(spark, sf)))("summary")
    // a full-relationship router connection must pass the tagged stream
    // through unfiltered: exactly one scan of events in the plan
    val scans = out.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.length === 1, "router fan-through must not duplicate the scan")
  }

  test("selectedRelationships naming a proper subset filter the routed stream") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {"name": "t",
        |  "processors": [
        |    {"identifier": "r", "type": "RouteOnAttribute",
        |     "properties": {"big": "${n:gt(5)}", "small": "${n:le(5)}"}}],
        |  "inputPorts": [{"identifier": "i", "name": "nums"}],
        |  "outputPorts": [{"identifier": "o", "name": "big_only"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "r"}},
        |    {"source": {"id": "r"}, "destination": {"id": "o"},
        |     "selectedRelationships": ["big"]}]}}""".stripMargin)
    val out = FlowCompiler.compile(spark, flow,
      Map("nums" -> (1 to 10).toDF("n")))("big_only")
    assert(out.select("n").as[Int].collect().sorted === (6 to 10).toArray)
  }

  test("unknown processor types, unbound ports and cycles fail loudly") {
    val badType = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [{"identifier": "x", "type": "ExecuteGroovyScript", "properties": {}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "x"}},
        |    {"source": {"id": "x"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val e1 = intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, badType, Map("in" -> Seq(1).toDF("n")))
    }
    assert(e1.getMessage.contains("unsupported processor type"))

    val e2 = intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, badType, Map.empty)
    }
    assert(e2.getMessage.contains("no input bound"))

    val cyclic = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "a", "type": "UpdateAttribute", "properties": {"x": "1"}},
        |    {"identifier": "b", "type": "UpdateAttribute", "properties": {"y": "2"}}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "a"}, "destination": {"id": "b"}},
        |    {"source": {"id": "b"}, "destination": {"id": "a"}},
        |    {"source": {"id": "b"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val e3 = intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, cyclic, Map.empty)
    }
    assert(e3.getMessage.contains("cycle"))
  }

  test("FilterAttribute compiles both modes; fixed props stay out of dynamics") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "f1", "type": "FilterAttribute",
        |     "properties": {"Filter Mode": "Retain",
        |                    "Attribute Regular Expression": "v.*"}},
        |    {"identifier": "f2", "type": "FilterAttribute",
        |     "properties": {"Filter Mode": "Remove",
        |                    "Attribute Matching Strategy": "Enumerate attributes",
        |                    "Attribute Set": "v, w"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o1", "name": "o1"}, {"identifier": "o2", "name": "o2"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "f1"}},
        |    {"source": {"id": "i"}, "destination": {"id": "f2"}},
        |    {"source": {"id": "f1"}, "destination": {"id": "o1"}},
        |    {"source": {"id": "f2"}, "destination": {"id": "o2"}}]}}""".stripMargin)
    val in = Seq((1, 2.0, "x")).toDF("id", "v", "w")
    val out = FlowCompiler.compile(spark, flow, Map("in" -> in))
    assert(out("o1").columns.toSeq == Seq("v"))
    assert(out("o2").columns.toSeq == Seq("id"))

    // real NiFi exports keep the UNSELECTED strategy's stale value:
    // the selected strategy must decide, not value presence
    val stale = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "f", "type": "FilterAttribute",
        |     "properties": {"Filter Mode": "Retain",
        |                    "Attribute Matching Strategy": "Enumeration of Attributes",
        |                    "Attribute Set": "id, w",
        |                    "Attribute Regular Expression": "v.*"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "f"}},
        |    {"source": {"id": "f"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val out2 = FlowCompiler.compile(spark, stale, Map("in" -> in))
    assert(out2("out").columns.toSeq == Seq("id", "w"),
      "enumeration strategy must win over the stale regex value")
  }

  test("committed enrichment flow: JoinEnrichment plan broadcasts the dim side") {
    val out = QueriesText.qFlowEnrichment(spark, sf)
    out.collect()
    // customer is the small side at test SF — the compiled join must
    // resolve to a broadcast hash join (AQE final plan), not a shuffle
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "enrichment join should broadcast the small side")
  }

  test("JoinEnrichment joins its two incoming connections on the configured key") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "j", "type": "org.apache.nifi.processors.standard.JoinEnrichment",
        |     "properties": {"Join Key": "id", "Join Type": "inner"}}],
        |  "inputPorts": [
        |    {"identifier": "i1", "name": "facts"}, {"identifier": "i2", "name": "dims"}],
        |  "outputPorts": [{"identifier": "o", "name": "enriched"}],
        |  "connections": [
        |    {"source": {"id": "i1"}, "destination": {"id": "j"}},
        |    {"source": {"id": "i2"}, "destination": {"id": "j"}},
        |    {"source": {"id": "j"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val out = FlowCompiler.compile(spark, flow, Map(
      "facts" -> Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("id", "v"),
      "dims" -> Seq((1, "a"), (3, "c")).toDF("id", "name")))("enriched")
    assert(out.select("id", "name").as[(Int, String)].collect().sorted ===
      Array((1, "a"), (3, "c")))
  }

  test("ExtractText/HashContent/EncodeContent/AttributesToJSON/ScanContent compile") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "ex", "type": "ExtractText",
        |     "properties": {"Content Column": "txt", "num": "n=([0-9]+)", "word": "w=([a-z]+)"}},
        |    {"identifier": "h", "type": "HashContent",
        |     "properties": {"Content Column": "txt", "Hash Algorithm": "sha256", "Output Column": "h"}},
        |    {"identifier": "enc", "type": "EncodeContent",
        |     "properties": {"Content Column": "word", "Mode": "hex", "Output Column": "word_hex"}},
        |    {"identifier": "sc", "type": "ScanContent",
        |     "properties": {"Content Column": "txt", "Dictionary": "alpha, beta", "Output Column": "terms"}},
        |    {"identifier": "aj", "type": "AttributesToJSON",
        |     "properties": {"Attributes List": "num, word", "Output Column": "aj"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "ex"}},
        |    {"source": {"id": "ex"}, "destination": {"id": "h"}},
        |    {"source": {"id": "h"}, "destination": {"id": "enc"}},
        |    {"source": {"id": "enc"}, "destination": {"id": "sc"}},
        |    {"source": {"id": "sc"}, "destination": {"id": "aj"}},
        |    {"source": {"id": "aj"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val row = FlowCompiler.compile(spark, flow,
      Map("in" -> Seq("n=42 w=alpha").toDF("txt")))("out")
      .select("num", "word", "h", "word_hex", "terms", "aj").collect()(0)
    assert(row.getString(0) === "42")
    assert(row.getString(1) === "alpha")
    assert(row.getString(2).length === 64) // sha256 hex
    assert(row.getString(3) === "616C706861")
    assert(row.getSeq[String](4) === Seq("alpha"))
    assert(row.getString(5) === """{"num":"42","word":"alpha"}""")
  }

  test("a flow compiles against a STREAMING input (narrow processors)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    ms.addData("n=1 w=aa", "n=2 w=bb", "n=3 w=aa")
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "ex", "type": "ExtractText",
        |     "properties": {"Content Column": "txt", "w": "w=([a-z]+)"}},
        |    {"identifier": "r", "type": "RouteOnAttribute",
        |     "properties": {"aa": "${w:equals('aa')}"}}],
        |  "inputPorts": [{"identifier": "i", "name": "lines"}],
        |  "outputPorts": [{"identifier": "o", "name": "aa_only"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "ex"}},
        |    {"source": {"id": "ex"}, "destination": {"id": "r"}},
        |    {"source": {"id": "r"}, "destination": {"id": "o"},
        |     "selectedRelationships": ["aa"]}]}}""".stripMargin)
    val out = FlowCompiler.compile(spark, flow,
      Map("lines" -> ms.toDF.toDF("txt")))("aa_only")
    assert(out.isStreaming, "compiled flow must stay a streaming Dataset")
    val q = graft.streaming.Streams.toMemorySink(out, "flow_stream_out")
    q.processAllAvailable(); q.stop()
    assert(spark.table("flow_stream_out").select("txt").as[String].collect().sorted ===
      Array("n=1 w=aa", "n=3 w=aa"))
  }

  test("DeduplicateRecord and DistributeLoad compile in a flow") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "dd", "type": "DeduplicateRecord",
        |     "properties": {"Record Hashing Columns": "txt", "Tie Breaker": "id"}},
        |    {"identifier": "dl", "type": "DistributeLoad",
        |     "properties": {"Number of Relationships": "3"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "dd"}},
        |    {"source": {"id": "dd"}, "destination": {"id": "dl"}},
        |    {"source": {"id": "dl"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val out = FlowCompiler.compile(spark, flow, Map(
      "in" -> Seq((3, "dup"), (1, "dup"), (2, "only")).toDF("id", "txt")))("out")
    // dedup keeps the smallest id per content; load distributed over 3 partitions
    assert(out.select("id", "txt").as[(Int, String)].collect().sortBy(_._1)
      === Array((1, "dup"), (2, "only")))
    assert(out.rdd.getNumPartitions === 3)
  }

  test("GenerateFlowFile is a source; SampleRecord and MergeRecord compile downstream") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "gen", "type": "GenerateFlowFile",
        |     "properties": {"File Count": "20", "Buckets": "4"}},
        |    {"identifier": "samp", "type": "SampleRecord",
        |     "properties": {"Key Column": "id", "Modulus": "2", "Bucket": "1"}},
        |    {"identifier": "mrg", "type": "MergeRecord",
        |     "properties": {"Group Columns": "bucket", "Order Column": "id",
        |                    "Content Column": "content", "Separator": ","}}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "gen"}, "destination": {"id": "samp"}},
        |    {"source": {"id": "samp"}, "destination": {"id": "mrg"}},
        |    {"source": {"id": "mrg"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val out = FlowCompiler.compile(spark, flow, Map.empty)("out")
    // odd ids only → buckets 1 and 3; ids 1,5,9,13,17 land in bucket 1
    val merged = out.select("bucket", "merged").as[(Long, String)].collect().toMap
    assert(merged.keySet === Set(1L, 3L))
    assert(merged(1L).split(",").length === 5)
  }

  test("ValidateJson, ForkRecord, PartitionRecord, SplitText and CountText compile") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "vj", "type": "ValidateJson",
        |     "properties": {"Content Column": "doc", "Schema": "k BIGINT",
        |                    "Required Fields": "k"}},
        |    {"identifier": "pk", "type": "PartitionRecord",
        |     "properties": {"shard": "${id:mod(2)}"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "vj"}},
        |    {"source": {"id": "vj"}, "destination": {"id": "pk"}},
        |    {"source": {"id": "pk"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val out = FlowCompiler.compile(spark, flow, Map(
      "in" -> Seq((1L, """{"k": 9}"""), (2L, "oops")).toDF("id", "doc")))("out")
    val rows = out.select("id", "route", "shard").as[(Long, String, Long)].collect().sortBy(_._1)
    assert(rows === Array((1L, "valid", 1L), (2L, "invalid", 0L)))

    val split = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "st", "type": "SplitText",
        |     "properties": {"Content Column": "txt"}},
        |    {"identifier": "ct", "type": "CountText",
        |     "properties": {"Content Column": "piece"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "st"}},
        |    {"source": {"id": "st"}, "destination": {"id": "ct"}},
        |    {"source": {"id": "ct"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val lines = FlowCompiler.compile(spark, split, Map(
      "in" -> Seq("one two\nthree").toDF("txt")))("out")
    assert(lines.select("piece", "n_words").as[(String, Long)].collect().sortBy(_._1)
      === Array(("one two", 2L), ("three", 1L)))
  }

  test("UpdateRecord sets struct fields by record path; EvaluateRecordPath extracts") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "ur", "type": "UpdateRecord",
        |     "properties": {"/meta/stamp": "${id:plus(100)}"}},
        |    {"identifier": "rp", "type": "EvaluateRecordPath",
        |     "properties": {"stamp": "/meta/stamp", "tag": "/meta/tag"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "ur"}},
        |    {"source": {"id": "ur"}, "destination": {"id": "rp"}},
        |    {"source": {"id": "rp"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val in = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .select(col("id"), struct(col("tag").as("tag")).as("meta"))
    val out = FlowCompiler.compile(spark, flow, Map("in" -> in))("out")
      .select("id", "stamp", "tag").as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out === Array((1L, 101L, "a"), (2L, 102L, "b")))
  }

  test("RemoveRecordField and RenameRecordField compile over struct paths") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "rm", "type": "RemoveRecordField",
        |     "properties": {"drop internal": "/meta/internal"}},
        |    {"identifier": "rn", "type": "RenameRecordField",
        |     "properties": {"/meta/tag": "label", "/id": "doc_id"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "rm"}},
        |    {"source": {"id": "rm"}, "destination": {"id": "rn"}},
        |    {"source": {"id": "rn"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val in = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "tag", "internal")
      .select(col("id"),
        struct(col("tag").as("tag"), col("internal").as("internal")).as("meta"))
    val out = FlowCompiler.compile(spark, flow, Map("in" -> in))("out")
    assert(out.columns.toSeq === Seq("doc_id", "meta"))
    assert(out.select("meta.*").columns.toSeq === Seq("label"))
    assert(out.select(col("doc_id"), col("meta.label"))
      .as[(Long, String)].collect().sortBy(_._1) === Array((1L, "a"), (2L, "b")))
    // a non-record-path property fails loudly
    val bad = flow.copy(processors = flow.processors.map(p =>
      if (p.id == "rm") p.copy(props = Seq("oops" -> "meta.internal")) else p))
    val e = intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, bad, Map("in" -> in))("out")
    }
    assert(e.getMessage.contains("record path"))
  }

  test("parse family compiles: ParseCEF, EvaluateXPath, SplitXml") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "cef", "type": "org.apache.nifi.processors.standard.ParseCEF",
        |     "properties": {"Content Column": "cef_line", "Extension Keys": "src, act"}},
        |    {"identifier": "xp", "type": "EvaluateXPath",
        |     "properties": {"Content Column": "xml", "who": "/doc/who/text()"}},
        |    {"identifier": "sx", "type": "SplitXml",
        |     "properties": {"Content Column": "xml", "Split Path": "/doc/item/text()"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "cef"}},
        |    {"source": {"id": "cef"}, "destination": {"id": "xp"}},
        |    {"source": {"id": "xp"}, "destination": {"id": "sx"}},
        |    {"source": {"id": "sx"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val in = Seq((
      "CEF:0|acme|fw|1.0|100|blocked|5|src=10.0.0.9 act=deny",
      "<doc><who>ada</who><item>a</item><item>b</item></doc>"
    )).toDF("cef_line", "xml")
    val rows = FlowCompiler.compile(spark, flow, Map("in" -> in))("out")
      .select("cef_vendor", "cef_severity", "cef_src", "who", "fragment")
      .as[(String, String, String, String, String)].collect().sorted
    assert(rows === Array(
      ("acme", "5", "10.0.0.9", "ada", "a"),
      ("acme", "5", "10.0.0.9", "ada", "b")))
  }

  test("content family compiles: mapping, segments, compress and encode round-trips, SQL gen, bin-pack") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "map", "type": "ReplaceTextWithMapping",
        |     "properties": {"Content Column": "content", "colour": "color", "err": "error"}},
        |    {"identifier": "seg", "type": "SegmentContent",
        |     "properties": {"Content Column": "content", "Segment Size": "6"}},
        |    {"identifier": "comp", "type": "CompressContent",
        |     "properties": {"Content Column": "chunk", "Mode": "compress", "Compression Format": "gzip"}},
        |    {"identifier": "deco", "type": "CompressContent",
        |     "properties": {"Content Column": "chunk", "Mode": "decompress", "Compression Format": "gzip"}},
        |    {"identifier": "enc", "type": "EncodeContent",
        |     "properties": {"Content Column": "chunk", "Mode": "encode", "Encoding": "base32", "Output Column": "b32"}},
        |    {"identifier": "dec", "type": "EncodeContent",
        |     "properties": {"Content Column": "b32", "Mode": "decode", "Encoding": "base32", "Output Column": "back"}},
        |    {"identifier": "sql", "type": "ConvertJSONToSQL",
        |     "properties": {"Content Column": "meta", "Table Name": "events",
        |                    "id": "number", "name": "string"}},
        |    {"identifier": "bin", "type": "MergeContent",
        |     "properties": {"Order Column": "chunk_idx", "Size Column": "chunk_idx",
        |                    "Maximum Group Size": "3"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "map"}},
        |    {"source": {"id": "map"}, "destination": {"id": "seg"}},
        |    {"source": {"id": "seg"}, "destination": {"id": "comp"}},
        |    {"source": {"id": "comp"}, "destination": {"id": "deco"}},
        |    {"source": {"id": "deco"}, "destination": {"id": "enc"}},
        |    {"source": {"id": "enc"}, "destination": {"id": "dec"}},
        |    {"source": {"id": "dec"}, "destination": {"id": "sql"}},
        |    {"source": {"id": "sql"}, "destination": {"id": "bin"}},
        |    {"source": {"id": "bin"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val in = Seq(("the colour of err logs", """{"id": 7, "name": "o'brien"}"""))
      .toDF("content", "meta")
    val out = FlowCompiler.compile(spark, flow, Map("in" -> in))("out")
      .withColumn("chunk_str", col("chunk").cast("string"))
      .withColumn("back_str", col("back").cast("string"))
    val rows = out.select("chunk_idx", "chunk_str", "back_str", "sql", "bin")
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    // mapping applied in order, then 6-char segments of the mapped text
    assert(rows.map(_._2).mkString === "the color of error logs")
    // compress -> decompress -> base32 -> back is the identity
    assert(rows.forall(r => r._2 == r._3))
    assert(rows.head._4 === "INSERT INTO events (id, name) VALUES (7, 'o''brien')")
    // bin ids advance as cumulative size crosses the 3-unit cap
    assert(rows.map(_._5).distinct.length > 1 && rows.map(_._5).sorted === rows.map(_._5))
  }

  test("committed parameterized flow: funnel -> CSV lookup -> parameterized route") {
    val dir = java.nio.file.Files.createTempDirectory("graft_flow_lookup")
    java.nio.file.Files.writeString(dir.resolve("tiers.csv"),
      "plan,tier\nfree,bronze\npro,gold\n")
    val json = {
      val s = getClass.getResourceAsStream("/flows/lookup_enrich.json")
      try scala.io.Source.fromInputStream(s, "UTF-8").mkString finally s.close()
    }
    val a = Seq((3L, "free"), (9L, "pro")).toDF("n", "plan")
    val b = Seq((7L, "free"), (1L, "pro")).toDF("n", "plan")
    val out = FlowCompiler.compile(spark, json,
      Map("events_a" -> a, "events_b" -> b),
      Map("lookup_dir" -> dir.toString, "min_n" -> "5"))("enriched")
      .select("n", "tier").as[(Long, String)].collect().sorted
    assert(out === Array((7L, "bronze"), (9L, "gold")))
  }

  test("LookupRecord reads its CSV lookup service file and broadcasts the join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lookup")
    java.nio.file.Files.writeString(dir.resolve("tiers.csv"),
      "plan,tier\nfree,bronze\npro,gold\n")
    val flow = FlowCompiler.parse(
      s"""{"flowContents": {
         |  "processors": [
         |    {"identifier": "lk", "type": "LookupRecord",
         |     "properties": {"Lookup File": "${dir.resolve("tiers.csv")}",
         |                    "Join Key": "plan"}}],
         |  "inputPorts": [{"identifier": "i", "name": "in"}],
         |  "outputPorts": [{"identifier": "o", "name": "out"}],
         |  "connections": [
         |    {"source": {"id": "i"}, "destination": {"id": "lk"}},
         |    {"source": {"id": "lk"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val in = Seq((1L, "free"), (2L, "pro"), (3L, "trial")).toDF("id", "plan")
    val out = FlowCompiler.compile(spark, flow, Map("in" -> in))("out")
    val rows = out.select("id", "tier").as[(Long, Option[String])].collect().sortBy(_._1)
    assert(rows === Array((1L, Some("bronze")), (2L, Some("gold")), (3L, None)))
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "lookup side must broadcast")
  }

  test("LookupRecord matches numeric stream keys as strings, keeping the stream type") {
    // a numeric stream-side key must NOT implicit-cast the all-string
    // lookup side: "01" may not match 1 (string-keyed matching contract)
    val dir = java.nio.file.Files.createTempDirectory("graft_lookup_num")
    java.nio.file.Files.writeString(dir.resolve("codes.csv"),
      "code,label\n01,padded\n2,two\n")
    val flow = FlowCompiler.parse(
      s"""{"flowContents": {
         |  "processors": [
         |    {"identifier": "lk", "type": "LookupRecord",
         |     "properties": {"Lookup File": "${dir.resolve("codes.csv")}",
         |                    "Join Key": "code"}}],
         |  "inputPorts": [{"identifier": "i", "name": "in"}],
         |  "outputPorts": [{"identifier": "o", "name": "out"}],
         |  "connections": [
         |    {"source": {"id": "i"}, "destination": {"id": "lk"}},
         |    {"source": {"id": "lk"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val in = Seq((1, "a"), (2, "b")).toDF("code", "v")
    val out = FlowCompiler.compile(spark, flow, Map("in" -> in))("out")
    // stream key keeps its original integer type in the output
    assert(out.schema("code").dataType === org.apache.spark.sql.types.IntegerType)
    val rows = out.select("code", "label").as[(Int, Option[String])]
      .collect().sortBy(_._1)
    // 1 does NOT match "01"; 2 matches "2" string-to-string
    assert(rows === Array((1, None), (2, Some("two"))))
  }

  test("parameter contexts substitute #{name} in property values; funnels fan in") {
    val json =
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "r1", "type": "RouteOnAttribute",
        |     "properties": {"big": "${n:gt(#{threshold})}"}},
        |    {"identifier": "r2", "type": "RouteOnAttribute",
        |     "properties": {"big": "${n:gt(#{threshold})}"}},
        |    {"identifier": "sql", "type": "ConvertJSONToSQL",
        |     "properties": {"Content Column": "meta", "Table Name": "#{target table}",
        |                    "n": "number"}}],
        |  "funnels": [{"identifier": "fun"}],
        |  "inputPorts": [
        |    {"identifier": "i1", "name": "a"}, {"identifier": "i2", "name": "b"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i1"}, "destination": {"id": "r1"}},
        |    {"source": {"id": "i2"}, "destination": {"id": "r2"}},
        |    {"source": {"id": "r1"}, "destination": {"id": "fun"}, "selectedRelationships": ["big"]},
        |    {"source": {"id": "r2"}, "destination": {"id": "fun"}, "selectedRelationships": ["big"]},
        |    {"source": {"id": "fun"}, "destination": {"id": "sql"}},
        |    {"source": {"id": "sql"}, "destination": {"id": "o"}}]}}""".stripMargin
    val a = Seq((1L, """{"n": 1}"""), (9L, """{"n": 9}""")).toDF("n", "meta")
    val b = Seq((2L, """{"n": 2}"""), (8L, """{"n": 8}""")).toDF("n", "meta")
    val out = FlowCompiler.compile(spark, json, Map("a" -> a, "b" -> b),
      Map("threshold" -> "5", "target table" -> "events"))("out")
      .select("n", "sql").as[(Long, String)].collect().sorted
    // both branches' >5 rows funnel into one stream; the table parameter lands
    assert(out === Array(
      (8L, "INSERT INTO events (n) VALUES (8)"),
      (9L, "INSERT INTO events (n) VALUES (9)")))
    // unknown parameter fails loudly at compile
    val err = intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, json, Map("a" -> a, "b" -> b),
        Map("threshold" -> "5"))
    }
    assert(err.getMessage.contains("target table"))
    // NiFi's ##{ escape: a literal #{x} neither substitutes nor errors
    val escFlow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "u", "type": "UpdateAttribute",
        |     "properties": {"tag": "ref ##{n} here"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "u"}},
        |    {"source": {"id": "u"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val escOut = FlowCompiler.compile(spark, escFlow,
      Map("in" -> Seq(1L).toDF("n")), Map.empty[String, String])("out")
      .select("tag").as[String].head()
    assert(escOut === "ref #{n} here")
  }

  test("r6 content-family vocabulary: pack/unpack, bytes, charset, fuzzy, mime, stats") {
    // pack -> unpack round-trip through authored JSON
    val packFlow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "p", "type": "PackageFlowFile",
        |     "properties": {"Group Columns": "grp", "Order Column": "idx",
        |                    "Payload Columns": "payload"}},
        |    {"identifier": "u", "type": "UnpackContent",
        |     "properties": {"Packed Column": "packed"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "p"}},
        |    {"source": {"id": "p"}, "destination": {"id": "u"}},
        |    {"source": {"id": "u"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val rows = Seq(("a", 2, "y"), ("a", 1, "x"), ("b", 1, "z"))
      .toDF("grp", "idx", "payload")
    val rt = FlowCompiler.compile(spark, packFlow, Map("in" -> rows))("out")
      .select("grp", "idx", "payload").as[(String, Int, String)].collect().sorted
    assert(rt === Array(("a", 1, "x"), ("a", 2, "y"), ("b", 1, "z")))

    // ModifyBytes -> SplitContent -> ConvertCharacterSet -> FuzzyHash ->
    // IdentifyMimeType chained on one stream
    val byteFlow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "m", "type": "ModifyBytes",
        |     "properties": {"Content Column": "content", "Start Offset": "4",
        |                    "Output Column": "body"}},
        |    {"identifier": "s", "type": "SplitContent",
        |     "properties": {"Content Column": "body", "Byte Sequence": ";"}},
        |    {"identifier": "c", "type": "ConvertCharacterSet",
        |     "properties": {"Content Column": "segment",
        |                    "Input Character Set": "UTF-8",
        |                    "Output Character Set": "UTF-16BE"}},
        |    {"identifier": "f", "type": "FuzzyHashContent",
        |     "properties": {"Content Column": "segment"}},
        |    {"identifier": "t", "type": "IdentifyMimeType",
        |     "properties": {"Content Column": "segment"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "m"}},
        |    {"source": {"id": "m"}, "destination": {"id": "s"}},
        |    {"source": {"id": "s"}, "destination": {"id": "c"}},
        |    {"source": {"id": "c"}, "destination": {"id": "f"}},
        |    {"source": {"id": "f"}, "destination": {"id": "t"}},
        |    {"source": {"id": "t"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val in2 = Seq("HDR:ab;cd").toDF("content")
    val out2 = FlowCompiler.compile(spark, byteFlow, Map("in" -> in2))("out")
    // segment was re-encoded UTF-16BE in place — decode to read it back
    val got = out2.selectExpr("seg_idx", "decode(segment, 'UTF-16BE')",
        "fuzzy_hash", "mime_type")
      .as[(Int, String, String, String)].collect().sortBy(_._1)
    // header stripped, then split at ';' -> two segments
    assert(got.map(_._2).toSeq === Seq("ab", "cd"))
    assert(got.forall(_._3.contains(":")))         // CTPH digest shape
    assert(got.forall(_._4 === "application/octet-stream"))
    // UTF-16BE re-encode doubled the byte length
    assert(out2.selectExpr("octet_length(segment)").as[Int].collect().forall(_ === 4))

    // CalculateRecordStats from JSON
    val statsFlow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "st", "type": "CalculateRecordStats",
        |     "properties": {"Category Columns": "grp"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "st"}},
        |    {"source": {"id": "st"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val stats = FlowCompiler.compile(spark, statsFlow, Map("in" -> rows))("out")
      .select("stat", "value", "n").as[(String, Option[String], Long)].collect().toSet
    assert(stats === Set(("total", None, 3L), ("grp", Some("a"), 2L), ("grp", Some("b"), 1L)))
  }

  test("RouteOnContent Match Requirement and DuplicateFlowFile compile") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "r", "type": "RouteOnContent",
        |     "properties": {"Content Column": "txt",
        |                    "Match Requirement": "content must match exactly",
        |                    "digits": "[0-9]+"}},
        |    {"identifier": "d", "type": "DuplicateFlowFile",
        |     "properties": {"Number of Copies": "2"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "r"}},
        |    {"source": {"id": "r"}, "destination": {"id": "d"}, "selectedRelationships": ["digits"]},
        |    {"source": {"id": "d"}, "destination": {"id": "o"}}]}}""".stripMargin)
    // "12a" contains digits but is not WHOLLY digits; "99\n" has a
    // trailing newline that Java's $ would wrongly accept — \z must not
    val in = Seq("123", "abc", "12a", "99\n").toDF("txt")
    val out = FlowCompiler.compile(spark, flow, Map("in" -> in))("out")
      .select("txt", "copy_idx").as[(String, Int)].collect().sorted
    // each surviving row fans to 1 original + 2 copies
    assert(out === Array(("123", 0), ("123", 1), ("123", 2)))
  }

  test("ValidateJson resolves a registered Schema Name; unknown names fail loudly") {
    SchemaRegistry.register("event_v1", "k BIGINT, tag STRING")
    try {
      def flowJson(schemaName: String) =
        s"""{"flowContents": {
           |  "processors": [
           |    {"identifier": "v", "type": "ValidateJson",
           |     "properties": {"Content Column": "payload",
           |                    "Schema Name": "$schemaName",
           |                    "Required Fields": "k"}}],
           |  "inputPorts": [{"identifier": "i", "name": "in"}],
           |  "outputPorts": [{"identifier": "o", "name": "out"}],
           |  "connections": [
           |    {"source": {"id": "i"}, "destination": {"id": "v"}},
           |    {"source": {"id": "v"}, "destination": {"id": "o"}}]}}""".stripMargin
      val in = Seq("""{"k": 1, "tag": "a"}""", """{"tag": "missing k"}""", "not json")
        .toDF("payload")
      val routes = FlowCompiler.compile(spark, FlowCompiler.parse(flowJson("event_v1")),
        Map("in" -> in))("out")
        .select("route").as[String].collect().sorted
      assert(routes === Array("invalid", "invalid", "valid"))
      val err = intercept[IllegalArgumentException] {
        FlowCompiler.compile(spark, FlowCompiler.parse(flowJson("nope_v9")),
          Map("in" -> in))("out")
      }
      assert(err.getMessage.contains("not registered"))
    } finally SchemaRegistry.clear()
  }

  test("fan-in unions by name; ReplaceText and RouteOnContent compile") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "fix", "type": "ReplaceText",
        |     "properties": {"Content Column": "txt", "Search Value": "colour", "Replacement Value": "color"}},
        |    {"identifier": "rc", "type": "RouteOnContent",
        |     "properties": {"Content Column": "txt", "hit": "color"}}],
        |  "inputPorts": [
        |    {"identifier": "i1", "name": "left"}, {"identifier": "i2", "name": "right"}],
        |  "outputPorts": [{"identifier": "o", "name": "hits"}],
        |  "connections": [
        |    {"source": {"id": "i1"}, "destination": {"id": "fix"}},
        |    {"source": {"id": "i2"}, "destination": {"id": "fix"}},
        |    {"source": {"id": "fix"}, "destination": {"id": "rc"}},
        |    {"source": {"id": "rc"}, "destination": {"id": "o"},
        |     "selectedRelationships": ["hit"]}]}}""".stripMargin)
    val out = FlowCompiler.compile(spark, flow, Map(
      "left" -> Seq("the colour red", "plain").toDF("txt"),
      "right" -> Seq("another colour").toDF("txt")))("hits")
    assert(out.select("txt").as[String].collect().sorted ===
      Array("another color", "the color red"))
  }

  // ------------------------------------------------- nested groups (r7)

  test("nested process groups flatten: group ports become internal edges, depth 2 works") {
    // the committed nested flow equals a FLAT authoring of the same
    // pipeline — group boundaries must be semantically invisible
    val nested = QueriesText.qFlowNested(spark, sf)
    val flat = FlowCompiler.compile(spark,
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "p-dedup", "type": "DeduplicateRecord",
        |     "properties": {"Record Hashing Columns": "text", "Tie Breaker": "doc_id"}},
        |    {"identifier": "p-quality", "type": "RouteOnAttribute",
        |     "properties": {"kept": "${n_chars:ge(150)}"}},
        |    {"identifier": "p-rollup", "type": "QueryRecord",
        |     "properties": {"Query": "SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars, md5(concat_ws('|', sort_array(collect_list(cast(doc_id AS string))))) AS docs_md5 FROM FLOWFILE GROUP BY lang"}}],
        |  "inputPorts": [{"identifier": "root-in", "name": "documents"}],
        |  "outputPorts": [{"identifier": "root-out", "name": "by_lang"}],
        |  "connections": [
        |    {"source": {"id": "root-in"}, "destination": {"id": "p-dedup"}},
        |    {"source": {"id": "p-dedup"}, "destination": {"id": "p-quality"}},
        |    {"source": {"id": "p-quality"}, "destination": {"id": "p-rollup"},
        |     "selectedRelationships": ["kept"]},
        |    {"source": {"id": "p-rollup"}, "destination": {"id": "root-out"}}]}}""".stripMargin,
      Map("documents" -> Tables.documents(spark, sf)))("by_lang")
    val a = nested.orderBy("lang").collect().toSeq
    assert(a === flat.orderBy("lang").collect().toSeq)
    assert(a.nonEmpty)
  }

  test("cycles crossing a group boundary are detected; duplicate ids across groups rejected") {
    // parent processor feeds the child group, child output feeds it back
    val cyclic =
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "p1", "type": "ReplaceText",
        |     "properties": {"Content Column": "txt", "Search Value": "a", "Replacement Value": "b"}}],
        |  "processGroups": [{
        |    "identifier": "g1",
        |    "inputPorts": [{"identifier": "g-in", "name": "in"}],
        |    "outputPorts": [{"identifier": "g-out", "name": "out"}],
        |    "processors": [
        |      {"identifier": "p2", "type": "CountText",
        |       "properties": {"Content Column": "txt"}}],
        |    "connections": [
        |      {"source": {"id": "g-in"}, "destination": {"id": "p2"}},
        |      {"source": {"id": "p2"}, "destination": {"id": "g-out"}}]}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "p1"}, "destination": {"id": "g-in"}},
        |    {"source": {"id": "g-out"}, "destination": {"id": "p1"}},
        |    {"source": {"id": "g-out"}, "destination": {"id": "o"}}]}}""".stripMargin
    val e = intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, cyclic, Map.empty[String, org.apache.spark.sql.DataFrame])
    }
    assert(e.getMessage.contains("cycle"))
    val dupIds =
      """{"flowContents": {
        |  "processors": [{"identifier": "x", "type": "CountText", "properties": {}}],
        |  "processGroups": [{
        |    "identifier": "g1",
        |    "processors": [{"identifier": "x", "type": "CountText", "properties": {}}]}]}}""".stripMargin
    val e2 = intercept[IllegalArgumentException] { FlowCompiler.parse(dupIds) }
    assert(e2.getMessage.contains("duplicate node ids"))
  }

  // ------------------------------------- r7 coordination/security family

  private def onePipe(procJson: String, in: org.apache.spark.sql.DataFrame,
                      extraIn: Option[(String, org.apache.spark.sql.DataFrame)] = None): org.apache.spark.sql.DataFrame = {
    val secondPort = extraIn.map { case (n, _) =>
      s""", {"identifier": "i2", "name": "$n"}""" }.getOrElse("")
    val secondConn = extraIn.map { _ =>
      s""", {"source": {"id": "i2"}, "destination": {"id": "p"}}""" }.getOrElse("")
    val flow =
      s"""{"flowContents": {
         |  "processors": [$procJson],
         |  "inputPorts": [{"identifier": "i", "name": "in"}$secondPort],
         |  "outputPorts": [{"identifier": "o", "name": "out"}],
         |  "connections": [
         |    {"source": {"id": "i"}, "destination": {"id": "p"}}$secondConn,
         |    {"source": {"id": "p"}, "destination": {"id": "o"}}]}}""".stripMargin
    FlowCompiler.compile(spark, flow,
      Map("in" -> in) ++ extraIn.map { case (n, d) => n -> d })("out")
  }

  test("TransformXml compiles from an XSLT file and an inline stylesheet") {
    val xslt =
      """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
        |<xsl:output method="text"/>
        |<xsl:template match="/doc"><xsl:value-of select="@id"/>:<xsl:value-of select="."/></xsl:template>
        |</xsl:stylesheet>""".stripMargin
    val f = java.nio.file.Files.createTempFile("graft_xsl", ".xslt")
    java.nio.file.Files.writeString(f, xslt)
    val in = Seq("""<doc id="7">hello</doc>""").toDF("content")
    val fromFile = onePipe(
      s"""{"identifier": "p", "type": "TransformXml",
         |  "properties": {"XSLT File Name": "$f"}}""".stripMargin, in)
    assert(fromFile.select("transformed").as[String].head() === "7:hello")
    val inline = onePipe(
      s"""{"identifier": "p", "type": "TransformXml",
         |  "properties": {"Stylesheet": ${new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(xslt)}}}""".stripMargin, in)
    assert(inline.select("transformed").as[String].head() === "7:hello")
  }

  test("EncryptContent round-trips through a flow pair; bad key length fails loudly") {
    val key = "0123456789abcdef" // 16 bytes via a parameter context in practice
    val in = Seq(("a", "secret payload"), ("b", "more")).toDF("id", "content")
    val enc = onePipe(
      s"""{"identifier": "p", "type": "EncryptContent",
         |  "properties": {"Key": "$key"}}""".stripMargin, in)
    val dec = onePipe(
      s"""{"identifier": "p", "type": "EncryptContent",
         |  "properties": {"Mode": "decrypt", "Key": "$key", "Content Column": "encrypted"}}""".stripMargin, enc)
    assert(dec.select(col("decrypted").cast("string")).as[String].collect().sorted ===
      Array("more", "secret payload"))
    val e = intercept[IllegalArgumentException] {
      onePipe("""{"identifier": "p", "type": "EncryptContent",
                |  "properties": {"Key": "short"}}""".stripMargin, in)
    }
    assert(e.getMessage.contains("16/24/32"))
  }

  test("VerifyContentMAC sign + verify legs route tampered content to failure") {
    val in = Seq(("a", "payload one"), ("b", "payload two")).toDF("id", "content")
    val signed = onePipe(
      """{"identifier": "p", "type": "VerifyContentMAC",
        |  "properties": {"Mode": "sign", "Secret Key": "shhh"}}""".stripMargin, in)
    val tampered = signed.withColumn("content",
      when(col("id") === "b", lit("payload TWO")).otherwise(col("content")))
    val verified = onePipe(
      """{"identifier": "p", "type": "VerifyContentMAC",
        |  "properties": {"Mode": "verify", "Secret Key": "shhh"}}""".stripMargin, tampered)
    assert(verified.select("id", "route").as[(String, String)].collect().sorted ===
      Array(("a", "success"), ("b", "failure")))
  }

  test("Wait gates on a second signal connection; Notify passes through") {
    val stream = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("job_id", "v")
    val signals = Seq(1L, 3L).toDF("job_id")
    val flow =
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "n", "type": "Notify", "properties": {}},
        |    {"identifier": "w", "type": "Wait",
        |     "properties": {"Release Signal Identifier": "job_id"}}],
        |  "inputPorts": [
        |    {"identifier": "i1", "name": "stream"}, {"identifier": "i2", "name": "signals"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i2"}, "destination": {"id": "n"}},
        |    {"source": {"id": "i1"}, "destination": {"id": "w"}},
        |    {"source": {"id": "n"}, "destination": {"id": "w"}},
        |    {"source": {"id": "w"}, "destination": {"id": "o"}}]}}""".stripMargin
    val out = FlowCompiler.compile(spark, flow,
      Map("stream" -> stream, "signals" -> signals))("out")
    assert(out.select("job_id", "route").as[(Long, String)].collect().sorted ===
      Array((1L, "success"), (2L, "wait"), (3L, "success")))
  }

  test("Wait/Notify coordinate across compiles through a MapCache path") {
    val cache = java.nio.file.Files.createTempDirectory("graft_wait_cache").toString + "/c"
    val signals = Seq(10L, 30L).toDF("job_id")
    // trigger 1: Notify records its signals into the cache
    onePipe(
      s"""{"identifier": "p", "type": "Notify",
         |  "properties": {"Release Signal Identifier": "job_id",
         |                 "Distributed Cache Service": "$cache"}}""".stripMargin,
      signals).count()
    // trigger 2 (separate compile): Wait releases what was notified
    val stream = Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("job_id", "v")
    val out = onePipe(
      s"""{"identifier": "p", "type": "Wait",
         |  "properties": {"Release Signal Identifier": "job_id",
         |                 "Distributed Cache Service": "$cache"}}""".stripMargin, stream)
    assert(out.select("job_id", "route").as[(Long, String)].collect().sorted ===
      Array((10L, "success"), (20L, "wait"), (30L, "success")))
  }

  test("RetryFlowFile, DetectDuplicate and UpdateCounter compile") {
    val in = Seq((1L, 2), (2L, 3)).toDF("id", "flowfile_retries")
    val retried = onePipe(
      """{"identifier": "p", "type": "RetryFlowFile",
        |  "properties": {"Maximum Retries": "3"}}""".stripMargin, in)
    assert(retried.select("id", "flowfile_retries", "route").as[(Long, Int, String)]
      .collect().sorted === Array((1L, 3, "retry"), (2L, 4, "retries_exceeded")))

    val cache = java.nio.file.Files.createTempDirectory("graft_dd_cache").toString + "/c"
    val b1 = onePipe(
      s"""{"identifier": "p", "type": "DetectDuplicate",
         |  "properties": {"Cache Entry Identifier": "k",
         |                 "Distributed Cache Service": "$cache"}}""".stripMargin,
      Seq("k1", "k2").toDF("k"))
    assert(b1.select("route").as[String].collect().toSet === Set("non-duplicate"))
    val b2 = onePipe(
      s"""{"identifier": "p", "type": "DetectDuplicate",
         |  "properties": {"Cache Entry Identifier": "k",
         |                 "Distributed Cache Service": "$cache"}}""".stripMargin,
      Seq("k2", "k3").toDF("k"))
    assert(b2.select("k", "route").as[(String, String)].collect().sorted ===
      Array(("k2", "duplicate"), ("k3", "non-duplicate")))

    // UpdateCounter: metrics observed without forking the plan
    var seen: Map[String, Any] = Map.empty
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             ns: Long): Unit = {
        qe.observedMetrics.collectFirst { case (name, row) if name.startsWith("counter_") =>
          seen = row.schema.fieldNames.map(n => n -> row.getAs[Any](n)).toMap
        }
      }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val counted = onePipe(
        """{"identifier": "p", "type": "UpdateCounter",
          |  "properties": {"Counter Name": "all_rows", "big": "${id:gt(1)}"}}""".stripMargin,
        Seq(1L, 2L, 3L).toDF("id"))
      assert(counted.count() === 3L)
      eventually { // listener callbacks are async
        assert(seen.get("all_rows") === Some(3L))
        assert(seen.get("big") === Some(2L))
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("selectedRelationships filter the r7 route producers, not just the routers") {
    // a Wait output connection naming only "success" must drop the
    // waiting rows — NiFi connections always select relationships
    val flow =
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "w", "type": "Wait",
        |     "properties": {"Release Signal Identifier": "job_id"}}],
        |  "inputPorts": [
        |    {"identifier": "i1", "name": "stream"}, {"identifier": "i2", "name": "signals"}],
        |  "outputPorts": [{"identifier": "o", "name": "released"}],
        |  "connections": [
        |    {"source": {"id": "i1"}, "destination": {"id": "w"}},
        |    {"source": {"id": "i2"}, "destination": {"id": "w"}},
        |    {"source": {"id": "w"}, "destination": {"id": "o"},
        |     "selectedRelationships": ["success"]}]}}""".stripMargin
    val out = FlowCompiler.compile(spark, flow,
      Map("stream" -> Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("job_id", "v"),
          "signals" -> Seq(1L, 3L).toDF("job_id")))("released")
    assert(out.select("job_id").as[Long].collect().sorted === Array(1L, 3L))

    // VerifyContentMAC verify-mode: only the failure leg selected
    val signed = onePipe(
      """{"identifier": "p", "type": "VerifyContentMAC",
        |  "properties": {"Mode": "sign", "Secret Key": "shhh"}}""".stripMargin,
      Seq(("a", "ok"), ("b", "bad")).toDF("id", "content"))
    val tampered = signed.withColumn("content",
      when(col("id") === "b", lit("BAD")).otherwise(col("content")))
    val failFlow =
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "p", "type": "VerifyContentMAC",
        |     "properties": {"Mode": "verify", "Secret Key": "shhh"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "failures"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "p"}},
        |    {"source": {"id": "p"}, "destination": {"id": "o"},
        |     "selectedRelationships": ["failure"]}]}}""".stripMargin
    val failures = FlowCompiler.compile(spark, failFlow, Map("in" -> tampered))("failures")
    assert(failures.select("id").as[String].collect() === Array("b"))
  }

  test("a selected relationship the source never emits fails compile loudly") {
    // typo'd relationship in an exported flow: isin-filtering it would
    // compile to a silently always-empty stream — must throw instead
    val flow =
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "w", "type": "Wait", "name": "gate",
        |     "properties": {"Release Signal Identifier": "job_id"}}],
        |  "inputPorts": [
        |    {"identifier": "i1", "name": "stream"}, {"identifier": "i2", "name": "signals"}],
        |  "outputPorts": [{"identifier": "o", "name": "released"}],
        |  "connections": [
        |    {"source": {"id": "i1"}, "destination": {"id": "w"}},
        |    {"source": {"id": "i2"}, "destination": {"id": "w"}},
        |    {"source": {"id": "w"}, "destination": {"id": "o"},
        |     "selectedRelationships": ["sucess"]}]}}""".stripMargin
    val e = intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, flow,
        Map("stream" -> Seq((1L, "x")).toDF("job_id", "v"),
            "signals" -> Seq(1L).toDF("job_id")))("released")
    }
    assert(e.getMessage.contains("sucess") && e.getMessage.contains("valid:"))
  }

  test("Notify signal recording is idempotent across compiles") {
    val cache = java.nio.file.Files.createTempDirectory("notify-idem").toString + "/cache"
    val flow =
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "n", "type": "Notify",
        |     "properties": {"Release Signal Identifier": "job_id",
        |                    "Distributed Cache Service": "CACHE"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "n"}},
        |    {"source": {"id": "n"}, "destination": {"id": "o"}}]}}""".stripMargin
        .replace("CACHE", cache)
    val in = Seq(1L, 2L).toDF("job_id")
    def gens = {
      val d = new java.io.File(cache)
      if (d.exists) d.listFiles.count(_.getName.startsWith("gen=")) else 0
    }
    FlowCompiler.compile(spark, flow, Map("in" -> in))("out").count()
    val after1 = gens
    assert(after1 == 1, s"first compile must record one generation, got $after1")
    FlowCompiler.compile(spark, flow, Map("in" -> in))("out").count()
    assert(gens == after1, "recompile over the same data must append nothing")
    // genuinely new signals still get recorded
    FlowCompiler.compile(spark, flow, Map("in" -> Seq(3L).toDF("job_id")))("out").count()
    assert(gens == after1 + 1, "new signal keys must still append")
    val live = graft.operators.MapCache.entries(spark, cache)
      .select("key").as[String].collect().sorted
    assert(live === Array("1", "2", "3"))
  }

  test("committed kafka flow: ConsumeKafka stand-in -> demarcator -> route -> PublishKafka wire") {
    implicit val sqlCtx = spark.sqlContext
    val in = getClass.getResourceAsStream("/flows/kafka_pipeline.json")
    require(in != null, "kafka flow resource missing")
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (String, String, java.sql.Timestamp)]
    // one payload batch carrying two demarcated records, one overload
    ms.addData(
      ("h1", "metric=cpu level=9\nmetric=mem level=2", new java.sql.Timestamp(10000L)),
      ("h2", "metric=io level=8", new java.sql.Timestamp(11000L)))
    val out = FlowCompiler.compile(spark, json,
      Map("kafka:events.in" -> ms.toDF.toDF("key", "value", "ts")))("published")
    assert(out.isStreaming, "ConsumeKafka must compile to a streaming plan")
    assert(out.columns.toSeq === Seq("key", "value", "topic"),
      "PublishKafka must emit the publish wire projection")
    val q = graft.streaming.Streams.toMemorySink(out, "kafka_flow_out")
    q.processAllAvailable(); q.stop()
    val rows = spark.table("kafka_flow_out")
      .as[(String, String, String)].collect().sortBy(_._2)
    // demarcator split the first payload; only level>=8 records survive
    // the route; the publish key is the extracted metric name
    assert(rows.map(_._2) === Array("metric=cpu level=9", "metric=io level=8"))
    assert(rows.map(_._1) === Array("cpu", "io"))
    assert(rows.forall(_._3 == "events.out"))
  }

  test("ConsumeKafka without brokers or a stand-in binding fails loudly") {
    val flow =
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "ck", "type": "ConsumeKafka",
        |     "properties": {"Topic Name(s)": "t1"}}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "ck"}, "destination": {"id": "o"}}]}}""".stripMargin
    val e = intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, flow, Map.empty[String, org.apache.spark.sql.DataFrame])("out")
    }
    assert(e.getMessage.contains("Kafka Brokers") && e.getMessage.contains("kafka:t1"))
  }

  test("processor-specific fixed names stay DYNAMIC for other processors") {
    // "Key" is EncryptContent's fixed property; an UpdateAttribute
    // dynamic property of the same name must still produce a column
    val out = onePipe(
      """{"identifier": "p", "type": "UpdateAttribute",
        |  "properties": {"Key": "${id:toUpper()}", "Counter Name": "${id:toLower()}"}}""".stripMargin,
      Seq("aB", "cD").toDF("id"))
    assert(out.columns.toSeq === Seq("id", "Key", "Counter Name"))
    assert(out.select("Key").as[String].collect().sorted === Array("AB", "CD"))
  }

  test("Wait pins the signal connection by Signal Source, independent of JSON order") {
    // the signal connection listed FIRST: without the property this
    // would swap the roles; Signal Source names the upstream node
    def flowJson(sigSrc: String) =
      s"""{"flowContents": {
         |  "processors": [
         |    {"identifier": "n", "name": "notifier", "type": "Notify", "properties": {}},
         |    {"identifier": "w", "type": "Wait",
         |     "properties": {"Release Signal Identifier": "job_id",
         |                    "Signal Source": "$sigSrc"}}],
         |  "inputPorts": [
         |    {"identifier": "i1", "name": "stream"}, {"identifier": "i2", "name": "signals"}],
         |  "outputPorts": [{"identifier": "o", "name": "out"}],
         |  "connections": [
         |    {"source": {"id": "i2"}, "destination": {"id": "n"}},
         |    {"source": {"id": "n"}, "destination": {"id": "w"}},
         |    {"source": {"id": "i1"}, "destination": {"id": "w"}},
         |    {"source": {"id": "w"}, "destination": {"id": "o"}}]}}""".stripMargin
    val inputs = Map(
      "stream" -> Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("job_id", "v"),
      "signals" -> Seq(1L, 3L).toDF("job_id"))
    // by processor name AND by id — both resolve
    for (ref <- Seq("notifier", "n")) {
      val out = FlowCompiler.compile(spark, flowJson(ref), inputs)("out")
      assert(out.select("job_id", "route").as[(Long, String)].collect().sorted ===
        Array((1L, "success"), (2L, "wait"), (3L, "success")), s"ref=$ref")
    }
    val err = intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, flowJson("nope"), inputs)
    }
    assert(err.getMessage.contains("Signal Source"))
  }

  test("GetFile/ListFile sources, ConvertRecord and LogAttribute compile in a flow") {
    val dir = java.nio.file.Files.createTempDirectory("graft_getfile")
    java.nio.file.Files.writeString(dir.resolve("a.json"), """{"id":1,"v":"x"}""")
    java.nio.file.Files.writeString(dir.resolve("b.json"), """{"id":2,"v":"y,z"}""")
    java.nio.file.Files.writeString(dir.resolve("skip.txt"), "not me")
    val flow = FlowCompiler.parse(
      s"""{"flowContents": {
         |  "processors": [
         |    {"identifier": "g", "type": "GetFile",
         |     "properties": {"Input Directory": "$dir", "File Filter": "*.json"}},
         |    {"identifier": "c", "type": "ConvertRecord",
         |     "properties": {"Record Reader": "json", "Record Writer": "csv",
         |                    "Schema": "id BIGINT, v STRING"}},
         |    {"identifier": "l", "type": "LogAttribute", "properties": {}}],
         |  "inputPorts": [],
         |  "outputPorts": [{"identifier": "o", "name": "out"}],
         |  "connections": [
         |    {"source": {"id": "g"}, "destination": {"id": "c"}},
         |    {"source": {"id": "c"}, "destination": {"id": "l"}},
         |    {"source": {"id": "l"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val out = FlowCompiler.compile(spark, flow, Map.empty)("out")
    // File Filter honored, filename extracted, csv quoting on the comma
    val rows = out.select("filename", "converted").as[(String, String)]
      .collect().sortBy(_._1)
    assert(rows === Array(("a.json", "1,x"), ("b.json", "2,\"y,z\"")))

    // ListFile source: one row per file with size + mtime
    val lsFlow = FlowCompiler.parse(
      s"""{"flowContents": {
         |  "processors": [
         |    {"identifier": "ls", "type": "ListFile",
         |     "properties": {"Input Directory": "$dir", "File Filter": "*.json"}}],
         |  "inputPorts": [],
         |  "outputPorts": [{"identifier": "o", "name": "listing"}],
         |  "connections": [
         |    {"source": {"id": "ls"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val listing = FlowCompiler.compile(spark, lsFlow, Map.empty)("listing")
    assert(listing.columns.toSeq === Seq("path", "size", "mtime"))
    assert(listing.count() === 2L)
  }

  test("LookupRecord resolves a lookup column colliding with a stream column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lookup_collide")
    java.nio.file.Files.writeString(dir.resolve("labels.csv"),
      "code,label\n1,one\n2,two\n")
    val flow = FlowCompiler.parse(
      s"""{"flowContents": {
         |  "processors": [
         |    {"identifier": "lk", "type": "LookupRecord",
         |     "properties": {"Lookup File": "${dir.resolve("labels.csv")}",
         |                    "Join Key": "code"}}],
         |  "inputPorts": [{"identifier": "i", "name": "in"}],
         |  "outputPorts": [{"identifier": "o", "name": "out"}],
         |  "connections": [
         |    {"source": {"id": "i"}, "destination": {"id": "lk"}},
         |    {"source": {"id": "lk"}, "destination": {"id": "o"}}]}}""".stripMargin)
    // the stream carries its own `label`: matched keys take the looked-up
    // value, misses keep the stream's own (result-in-place enrichment)
    val in = Seq(("1", "old_one"), ("3", "old_three")).toDF("code", "label")
    val out = FlowCompiler.compile(spark, flow, Map("in" -> in))("out")
    assert(out.columns.toSeq === Seq("code", "label"))
    assert(out.as[(String, String)].collect().sortBy(_._1) ===
      Array(("1", "one"), ("3", "old_three")))
  }

  test("connection prioritizers (r19): PriorityAttribute orders the edge; ControlRate takes highest priority first") {
    def flowWith(prioritizer: String) = FlowCompiler.parse(
      s"""{"flowContents": {
         |  "processors": [
         |    {"identifier": "cr", "type": "ControlRate",
         |     "properties": {"Maximum Rate": "2"}}],
         |  "inputPorts": [{"identifier": "i", "name": "in"}],
         |  "outputPorts": [{"identifier": "o", "name": "out"}],
         |  "connections": [
         |    {"source": {"id": "i"}, "destination": {"id": "cr"},
         |     "prioritizers": ["org.apache.nifi.prioritizer.$prioritizer"],
         |     "backPressureObjectThreshold": 10000},
         |    {"source": {"id": "cr"}, "destination": {"id": "o"}}]}}""".stripMargin)
    // priorities "10" vs "9": NUMERIC order (9 first) — a lexical sort
    // would cap to {p10, p1}; rows without the attribute sort last
    val in = Seq(("p10", "10"), ("p9", "9"), ("p1", "1"), ("pnone", null))
      .toDF("name", "priority")
    val out = FlowCompiler.compile(spark,
      flowWith("PriorityAttributePrioritizer"), Map("in" -> in))("out")
    assert(out.select("name").as[String].collect().toSet === Set("p1", "p9"),
      "ControlRate's cap must take the two highest-priority rows, numerically ordered")
    // FIFO/OldestFirst are the batch arrival order — a no-op that compiles
    val fifo = FlowCompiler.compile(spark,
      flowWith("FirstInFirstOutPrioritizer"), Map("in" -> in))("out")
    assert(fifo.count() === 2L)
    // NewestFlowFileFirst needs queue-entry age the columnar model
    // doesn't carry — loud reject, not a silent no-op
    val e1 = intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark,
        flowWith("NewestFlowFileFirstPrioritizer"), Map("in" -> in))("out").count()
    }
    assert(e1.getMessage.contains("NewestFlowFileFirst"))
    // PriorityAttribute on a stream WITHOUT the priority column: loud
    val e2 = intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, flowWith("PriorityAttributePrioritizer"),
        Map("in" -> Seq("x").toDF("name")))("out").count()
    }
    assert(e2.getMessage.contains("priority"))
  }

  test("connection back-pressure (r19): objectThreshold caps the streaming source's per-trigger admission") {
    val spool = java.nio.file.Files.createTempDirectory("graft_bp_spool")
    (1 to 10).foreach { i =>
      java.nio.file.Files.writeString(spool.resolve(s"f$i.txt"), s"line$i\n")
    }
    val flow = FlowCompiler.parse(
      s"""{"flowContents": {
         |  "processors": [
         |    {"identifier": "tcp", "type": "ListenTCP",
         |     "properties": {"Listening Port": "0", "Spool Directory": "$spool"}}],
         |  "outputPorts": [{"identifier": "o", "name": "lines"}],
         |  "connections": [
         |    {"source": {"id": "tcp"}, "destination": {"id": "o"},
         |     "backPressureObjectThreshold": 3}]}}""".stripMargin)
    val lines = FlowCompiler.compile(spark, flow, Map.empty)("lines")
    assert(lines.isStreaming)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bp_ckpt").toString
    val q = lines.writeStream.format("memory").queryName("graft_bp_mem")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(spark.table("graft_bp_mem").count() === 10L, "all spool files drain")
    assert(batches.forall(_.numInputRows <= 3),
      s"no trigger admits more than the declared threshold: ${batches.map(_.numInputRows).mkString(",")}")
    assert(batches.length >= 4, // ceil(10/3): the cap actually split the drain
      s"threshold 3 over 10 files must take >= 4 triggers, got ${batches.length}")
  }
}
