package graft

import org.apache.spark.sql.functions._

/** Registry round-trip: every committed flow must survive
  * parse → export → parse with an IDENTICAL model (property order,
  * relationships, ports, funnels), and an exported flow must compile
  * to the same results as its original. */
class FlowExportSpec extends SparkSpec {
  import spark.implicits._

  private val committed = Seq(
    "composite_events", "csv_export", "enrich_orders", "file_convert",
    "lines_pipeline", "lookup_enrich", "nested_curation", "parse_syslog",
    "syslog_stream", "kafka_pipeline", "listen_http", "jdbc_lookup",
    "record_update", "ws_syslog_edge")

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/flows/$name.json")
    require(in != null, s"flow resource $name missing")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("parse(export(parse(f))) == parse(f) for every committed flow") {
    committed.foreach { name =>
      val flow = FlowCompiler.parse(resource(name))
      val round = FlowCompiler.parse(FlowCompiler.export(flow))
      assert(round === flow, s"round-trip changed the model of $name")
      // idempotent: exporting the round-tripped model is byte-identical
      assert(FlowCompiler.export(round) === FlowCompiler.export(flow),
        s"export of $name is not a fixed point")
    }
  }

  test("an exported flow compiles to the same rows as the original") {
    // csv_export is batch, parameter-free and hits routers + record ops
    val json = resource("csv_export")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = FlowCompiler.compile(spark, json, Map("documents" -> docs))("by_source")
    val exported = FlowCompiler.export(FlowCompiler.parse(json))
    val b = FlowCompiler.compile(spark, exported, Map("documents" -> docs))("by_source")
    assert(a.schema === b.schema)
    val ka = a.orderBy(a.columns.map(col): _*).collect().toSeq
    val kb = b.orderBy(b.columns.map(col): _*).collect().toSeq
    assert(ka === kb, "exported flow produced different rows")
  }

  test("a realistic NiFi 2.7 canvas export round-trips with unknown fields preserved") {
    // hand-authored to NiFi's full versioned-flow shape: bundle
    // coordinates, positions, scheduling/back-pressure config,
    // endpoint metadata, labels — everything parse does not interpret
    // must survive parse → export → parse verbatim
    val json = resource("nifi27_canvas")
    val flow = FlowCompiler.parse(json)
    val round = FlowCompiler.parse(FlowCompiler.export(flow))
    assert(round === flow, "round-trip changed a realistic canvas export")
    assert(FlowCompiler.export(round) === FlowCompiler.export(flow),
      "export of the realistic canvas is not a fixed point")
    // the preserved fields really are there — spot-check each node kind
    val emit = flow.processors.find(_.name == "Emit").get
    assert(emit.extra.contains("\"bundle\"") && emit.extra.contains("2.7.0"))
    assert(emit.extra.contains("schedulingPeriod"))
    val conn = flow.connections.head
    assert(conn.extra.contains("backPressureObjectThreshold"))
    assert(conn.srcExtra.contains("\"type\"") && conn.dstExtra.contains("groupId"))
    val port = flow.outputPorts.head._1
    assert(flow.nodeExtras(port).contains("allowRemoteAccess"))
    assert(flow.extra.contains("\"labels\"") && flow.extra.contains("flowFileConcurrency"))
    // and the exported document still carries them textually
    val exported = FlowCompiler.export(flow)
    for (field <- Seq("bundle", "position", "backPressureDataSizeThreshold",
                      "autoTerminatedRelationships", "labels", "parameterContextName"))
      assert(exported.contains(field), s"exported canvas lost '$field'")
  }

  test("the realistic canvas export compiles and honors its route selection") {
    val outs = FlowCompiler.compile(spark, resource("nifi27_canvas"),
      Map.empty[String, org.apache.spark.sql.DataFrame])
    val ids = outs("big_ids").select("id").as[Long].collect().toSeq.sorted
    assert(ids === (25L to 49L).toSeq, "selectedRelationships=[big] must filter id>24 of 50")
  }

  test("export fails loudly on duplicate property keys") {
    val f = FlowCompiler.Flow("x",
      Seq(FlowCompiler.Processor("p1", "dupey", "UpdateAttribute",
        Seq("a" -> "1", "a" -> "2"))),
      Nil, Seq("o" -> "out"), Nil)
    val e = intercept[IllegalArgumentException] { FlowCompiler.export(f) }
    assert(e.getMessage.contains("duplicate property"))
  }
}
