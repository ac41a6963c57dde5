package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.{Dedup, Parse}

/** Round-4 fixes: CEF header escaping, Requantize8 input typing, the
  * size-gated broadcast in connected components, and the PPJoin
  * positional-filter float boundary. */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  test("parseCef: escaped pipes inside header fields don't desync the line") {
    val out = Parse.parseCef(
      Seq("""CEF:0|ven\|dor|p|1|sig|na\|me|5|src=1.2.3.4 msg=ok""").toDF("line"),
      "line", Seq("src", "msg"))
      .select("cef_vendor", "cef_product", "cef_name", "cef_severity", "cef_src", "cef_msg")
      .head
    // escapes stay raw in the output; fields after the escape keep sync
    assert(out.toSeq === Seq("""ven\|dor""", "p", """na\|me""", "5", "1.2.3.4", "ok"))
  }

  test("requantize8 accepts array<double> and rejects non-numeric arrays") {
    val d = Seq(Seq(0.5, -1.25, 3.75, 0.0)).toDF("v")
    val fromDouble = d.select(VectorFunctions.requantize8(col("v")))
      .as[Seq[Double]].head
    val fromFloat = Seq(Array(0.5f, -1.25f, 3.75f, 0.0f)).toDF("v")
      .select(VectorFunctions.requantize8(col("v"))).as[Seq[Double]].head
    assert(fromDouble === fromFloat)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Seq("a", "b")).toDF("v")
        .select(VectorFunctions.requantize8(col("v"))).collect()
    }
    assert(err.getMessage.contains("graft_requantize8"))
  }

  test("clusters broadcast gate: size and disabled-threshold cases") {
    assert(Dedup.shouldBroadcastLabels(100L, "10m"))
    assert(Dedup.shouldBroadcastLabels(1000L, "10485760b"))
    assert(!Dedup.shouldBroadcastLabels(1000000000L, "10m")) // 48 GB estimate
    assert(!Dedup.shouldBroadcastLabels(100L, "-1"))         // broadcast disabled
  }

  test("clusters: identical labels through the shuffle-join (gate-off) path") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L)).toDF("id_a", "id_b")
      val labels = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
      assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("executeScript: per-record and per-partition escape hatches stay narrow") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").repartition(2)
    val outSchema = StructType(Seq(
      StructField("id", LongType), StructField("tagged", StringType)))
    val perRecord = graft.operators.Records.executeScript(df, outSchema) { r =>
      Row(r.getLong(0) * 10, r.getString(1) + "!")
    }
    assert(perRecord.as[(Long, String)].collect().toSet ===
      Set((10L, "a!"), (20L, "b!"), (30L, "c!")))
    // per-partition: setup cost paid once per partition, not per row
    val perPart = graft.operators.Records.executeScriptPartitions(df, outSchema) { it =>
      val prefix = s"p:" // stands in for an expensive per-partition handle
      it.map(r => Row(r.getLong(0), prefix + r.getString(1)))
    }
    assert(perPart.as[(Long, String)].collect().toSet ===
      Set((1L, "p:a"), (2L, "p:b"), (3L, "p:c")))
    // the escape hatch must not introduce a shuffle
    val plan = perRecord.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"executeScript must stay narrow:\n$plan")
  }

  test("driver contract: entry() returns rows and every query has a catalog type") {
    assert(SparkEntry.entry(spark).count() > 0, "flagship entry must return rows")
    // every oracle key must have a matching query; no orphaned SQL
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("clusters converges on a 20k-node pathological graph within maxIter") {
    // worst shapes for label propagation: one long chain (diameter
    // 10000 — pointer jumping must collapse it in O(log n) rounds, not
    // O(n)) + one big star + isolated pairs, all in one pair table
    val chain = (0L until 10000L).map(i => (i, i + 1))          // 0-...-10000
    val star = (1L to 5000L).map(i => (20000L, 20000L + i))     // hub 20000
    val pairs2 = (0L until 2500L).map(i => (30000L + 2 * i, 30001L + 2 * i))
    val pairs = (chain ++ star ++ pairs2).toDF("id_a", "id_b")
    val labels = Dedup.clusters(pairs, maxIter = 20)
      .as[(Long, Long)].collect().toMap
    // chain: all nodes label 0
    assert((0L to 10000L).forall(labels(_) == 0L), "chain not fully collapsed")
    // star: hub + leaves all label 20000
    assert(labels(20000L) == 20000L && (1L to 5000L).forall(i => labels(20000L + i) == 20000L))
    // isolated pairs: each labeled by its smaller member
    assert((0L until 2500L).forall(i => labels(30001L + 2 * i) == 30000L + 2 * i))
    assert(labels.size === 10001 + 5001 + 5000)
  }

  test("transformXml: XSLT reshapes payloads; malformed XML routes to error") {
    val xslt =
      """<?xml version="1.0"?>
        |<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
        |  <xsl:output method="text"/>
        |  <xsl:template match="/rec">
        |    <xsl:value-of select="name"/>:<xsl:value-of select="qty"/>
        |  </xsl:template>
        |</xsl:stylesheet>""".stripMargin
    val df = Seq(
      (1L, "<rec><name>ax</name><qty>5</qty></rec>"),
      (2L, "<rec><name>bx</name><qty>7</qty></rec>"),
      (3L, "<rec><unclosed>"),
      (4L, null: String)).toDF("id", "xml")
    val out = graft.operators.Records.transformXml(df, "xml", xslt)
      .select("id", "transformed", "transformed_error")
      .collect().sortBy(_.getLong(0))
    assert(out(0).getString(1).trim === "ax:5" && out(0).isNullAt(2))
    assert(out(1).getString(1).trim === "bx:7" && out(1).isNullAt(2))
    assert(out(2).isNullAt(1) && out(2).getString(2) != null)
    assert(out(3).isNullAt(1) && out(3).getString(2) === "null xml payload")
  }

  test("ngramJaccard: exact-boundary threshold pairs survive the positional filter") {
    // two docs with |a|=|b|=9 distinct grams and |a∩b|=8 → J = 8/10 = 0.8
    // exactly; at t=0.8 the float required-overlap bound rounds to 8.0000…x
    // without the epsilon and the ceil would demand 9. Strings of 11 chars
    // give 9 distinct 3-grams; sharing a 10-char run shares 8 grams.
    val docs = Seq((1L, "abcdefghijk"), (2L, "abcdefghijZ"))
      .toDF("doc_id", "text").withColumn("block", lit(0))
    val out = Dedup.ngramJaccard(docs, "doc_id", "text", "block",
      n = 3, threshold = 0.8)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 2L, 0.8)))
  }
}
