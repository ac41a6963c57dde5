package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Jms

/** ConsumeJMS / PublishJMS adapter seam (r18, the 48k′ honest-attempt
  * discipline): no JMS API jar exists offline and Spark has no JMS
  * source, so the REAL half is out of reach by construction
  * (tools/NOTES_r18_jms.md records the sweep); these gates pin the
  * half that IS built — the wire contract, the ConsumeJMS attribute
  * decode, the SQL-92 message-selector subset, the publish shaping,
  * and the flow vocabulary. */
class JmsSeamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("wire schema: stand-in conforms exactly; decode emits the published jms_* attributes") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Timestamp)]
    val wire = Jms.toWire(ms.toDF.toDF("body", "ts"), "orders.q", "body", "ts")
    assert(wire.schema.map(f => (f.name, f.dataType)) ===
      Jms.wireSchema.map(f => (f.name, f.dataType)))
    wire.schema.zip(Jms.wireSchema).foreach { case (got, want) =>
      assert(!got.nullable || want.nullable, s"${got.name} nullability widens the contract")
    }
    assert(wire.isStreaming)
    // decode on a batch frame: the attribute names NiFi publishes
    val batch = Jms.toWire(Seq(("hi", ts(7))).toDF("body", "ts"),
      "orders.q", "body", "ts")
    val row = Jms.decodeString(batch)
      .select("value", "jms_destination", "jms_messageid", "jms_priority")
      .as[(String, String, String, Int)].head()
    assert((row._1, row._2, row._4) === (("hi", "orders.q", 4)))
    assert(row._3.startsWith(s"ID:orders.q-${7000000L}-"),
      s"id = destination + micros + content hash, got ${row._3}")
    // r19 (ADVICE): two messages sharing a timestamp in one batch get
    // DISTINCT message ids (the content hash is the discriminator) —
    // and the ids stay DETERMINISTIC across a replay of the same batch
    def ids() = Jms.toWire(
        Seq(("m1", ts(7)), ("m2", ts(7))).toDF("body", "ts"),
        "orders.q", "body", "ts")
      .select("message_id").as[String].collect().toSeq.sorted
    val first = ids()
    assert(first.distinct.length === 2,
      s"equal-timestamp messages must not share an id: $first")
    assert(ids() === first, "message ids must be replay-deterministic")
  }

  test("JMS message selector: headers rewrite, bare names bind to properties, literals survive") {
    val df = Seq(
      ("a", 9, Map("kind" -> "alert", "env" -> "prod")),
      ("b", 2, Map("kind" -> "info", "env" -> "prod")),
      ("c", 9, Map("kind" -> "alert", "env" -> "dev"))
    ).toDF("body0", "prio0", "props")
      .select(col("body0").cast("binary").as("body"),
        lit("t").as("destination"), lit("m").as("message_id"),
        lit(null).cast("timestamp").as("timestamp"),
        lit(null).cast("string").as("correlation_id"),
        lit(null).cast("string").as("jms_type"),
        col("prio0").as("priority"), col("props").as("properties"))
    def sel(s: String): Seq[String] =
      df.filter(Jms.selector(s)).select(col("body").cast("string"))
        .as[String].collect().sorted.toSeq
    assert(sel("JMSPriority >= 5") === Seq("a", "c"))
    assert(sel("kind = 'alert' AND env = 'prod'") === Seq("a"))
    assert(sel("JMSPriority >= 5 AND kind = 'alert' AND env = 'dev'") === Seq("c"))
    // a property name inside a string literal is NOT rewritten
    assert(sel("kind = 'kind'") === Seq.empty)
    // a syntactically malformed selector throws at compile (flow-config)
    // time (Spark's parser is lenient about keywords-as-identifiers, so
    // semantic typos surface at flow ANALYSIS instead — still compile
    // time on the FlowCompiler path, never per record)
    intercept[Exception] { Jms.selector("= = =") }
  }

  test("flow vocabulary: ConsumeJMS stand-in -> selector -> PublishJMS wire; boundary errors are loud") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Timestamp)]
    ms.addData(("sev=9 disk full", ts(1)), ("sev=2 heartbeat", ts(2)))
    val flow =
      """{"flowContents": {"name": "jmsflow",
        |  "outputPorts": [{"identifier": "o", "name": "published"}],
        |  "processors": [
        |    {"identifier": "c", "type": "ConsumeJMS",
        |     "properties": {"Destination Name": "alerts.in",
        |       "Destination Type": "QUEUE"}},
        |    {"identifier": "r", "type": "RouteOnContent",
        |     "properties": {"Content Column": "value",
        |       "Route Column": "route", "hot": "sev=9"}},
        |    {"identifier": "p", "type": "PublishJMS",
        |     "properties": {"Destination Name": "alerts.out"}}],
        |  "connections": [
        |    {"source": {"id": "c"}, "destination": {"id": "r"}},
        |    {"source": {"id": "r"}, "destination": {"id": "p"},
        |     "selectedRelationships": ["hot"]},
        |    {"source": {"id": "p"}, "destination": {"id": "o"}}]}}""".stripMargin
    val out = FlowCompiler.compile(spark, flow,
      Map("jms:alerts.in" -> ms.toDF.toDF("body", "ts")))("published")
    assert(out.isStreaming, "ConsumeJMS must compile to a streaming plan")
    assert(out.columns.toSeq === Seq("destination", "body", "properties"),
      "PublishJMS must emit the publish wire projection")
    val q = graft.streaming.Streams.toMemorySink(out, "jms_flow_out")
    q.processAllAvailable(); q.stop()
    val rows = spark.table("jms_flow_out")
      .select(col("destination"), col("body").cast("string"))
      .as[(String, String)].collect()
    assert(rows === Array(("alerts.out", "sev=9 disk full")))
    // no binding -> the boundary error names the fix
    val e = intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, flow, Map.empty[String, org.apache.spark.sql.DataFrame])
    }
    assert(e.getMessage.contains("jms:alerts.in") && e.getMessage.contains("no JMS client"))
    // bad destination type rejects at compile
    val e2 = intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, flow.replace("QUEUE", "PIPE"),
        Map("jms:alerts.in" -> ms.toDF.toDF("body", "ts")))
    }
    assert(e2.getMessage.contains("QUEUE or TOPIC"))
  }
}
