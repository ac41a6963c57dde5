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
}
