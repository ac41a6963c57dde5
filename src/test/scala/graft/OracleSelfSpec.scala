package graft

import java.sql.DriverManager

/** In-JVM replay of the driver's correctness gate: the same DuckDB that
  * adjudicates `CORRECTNESS_r{N}.json` runs here through its JDBC
  * driver (offline-cache find, the jsch pattern) — `SparkEntry.oracleSql`
  * executes against the same parquet the Spark queries read, and the
  * results are compared row-for-row with the selfcheck.py semantics
  * (columns sorted by name, rows sorted, floats to 1e-9 relative). A
  * representative slice of the catalog keeps the spec fast; the full
  * 166-oracle sweep stays with Verify + tools/selfcheck.py.
  *
  * This is also the second LIVE JDBC engine behind the ExecuteSQL
  * family (columnar/analytical, vs Derby's row store in IoSpec). */
class OracleSelfSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
  // one per family: TPC-H agg, the three r12 panels, both mixture
  // allocators, LM scoring, the composed pipeline, plain text analysis
  // — plus the r13 additions: the whitespace-contract fixture, the
  // record-path WRITE, the curation drop-reason rollup, and the PQ
  // pair (integer encode + ADC ranking replayed bit-exactly)
  private val picks = Seq(
    "q1_pricing_summary", "q_gopher_rules", "q_gopher_repetition",
    "q_c4_rules", "q_unimax_quota", "q_temperature_mix",
    "q_stupid_backoff", "q_curation_v2", "q_char_entropy",
    "q_token_count",
    "q_ws_contract", "q_record_update", "q_curation_report",
    "q_embed_pq", "q_pq_topk")

  private def canonCell(v: Any): String = v match {
    case null => "\u2400"
    case d: java.lang.Double =>
      if (d.isNaN) "NaN"
      else BigDecimal(d.doubleValue()).setScale(9, BigDecimal.RoundingMode.HALF_EVEN)
        .bigDecimal.stripTrailingZeros.toPlainString
    case f: java.lang.Float => canonCell(java.lang.Double.valueOf(f.doubleValue()))
    case b: java.math.BigDecimal => canonCell(java.lang.Double.valueOf(b.doubleValue()))
    case n: Number => n.longValue().toString
    case b: java.lang.Boolean => b.toString
    case other => other.toString
  }

  test("the DuckDB oracle reproduces Spark's results inside the JVM") {
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      tables.filter(t => new java.io.File(s"$sfDir/$t.parquet").exists())
        .foreach(t => st.execute(
          s"CREATE VIEW $t AS SELECT * FROM read_parquet('$sfDir/$t.parquet')"))
      for (name <- picks) {
        val sql = SparkEntry.oracleSql.getOrElse(name,
          fail(s"$name has no oracle entry"))
        // DuckDB side: columns sorted by name, every row canonicalized
        val rs = st.executeQuery(sql)
        val md = rs.getMetaData
        val wCols = (1 to md.getColumnCount).map(md.getColumnName)
        val wOrder = wCols.zipWithIndex.sortBy(_._1).map(_._2)
        val want = Iterator.continually(rs)
          .takeWhile(_.next())
          .map(r => wOrder.map(i => canonCell(r.getObject(i + 1))).toVector)
          .toVector.sorted(Ordering.by((v: Vector[String]) => v.mkString("\u0001")))
        // Spark side, same canonicalization
        val df = SparkEntry.queries(name)(spark, sfDir)
        val gCols = df.columns.toSeq
        assert(gCols.sorted == wCols.sorted,
          s"$name column sets differ: spark=$gCols oracle=$wCols")
        val gOrder = gCols.zipWithIndex.sortBy(_._1).map(_._2)
        val got = df.collect().toVector
          .map(r => gOrder.map(i => canonCell(r.get(i))).toVector)
          .sorted(Ordering.by((v: Vector[String]) => v.mkString("\u0001")))
        assert(got.size == want.size, s"$name row counts differ: ${got.size} vs ${want.size}")
        got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
          assert(g == w, s"$name first diff at sorted row $i:\n  spark =$g\n  oracle=$w")
        }
      }
    } finally conn.close()
  }

  test("ExecuteSQL/PutDatabaseRecord run live against DuckDB (columnar engine)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    val db = java.nio.file.Files.createTempDirectory("graft_duck")
      .resolve("t.duckdb").toString
    val url = s"jdbc:duckdb:$db"
    val df = (1L to 100L).map(i => (i, s"name$i", i * 1.5)).toDF("id", "name", "v")
    // UpdateDatabaseTable creates the DDL (Spark's own tableExists probe
    // trips on DuckDB's catalog error), then the executor-side
    // multi-connection append writes into one file-backed database
    // (DuckDB shares the instance across connections within a process)
    assert(graft.sources.Io.updateDatabaseTable(url, "items", df.schema)
      == Seq("id", "name", "v"))
    graft.sources.Io.writeJdbc(df.repartition(4), url, "items", mode = "append")
    val back = graft.sources.Io.readJdbc(spark, url, "items")
    assert(back.count() == 100)
    // GenerateTableFetch shape: the read fans out across range slices
    val part = graft.sources.Io.readJdbcPartitioned(
      spark, url, "items", "id", 1, 100, 4)
    assert(part.rdd.getNumPartitions == 4)
    // DuckDB's JDBC metadata surfaces the summed BIGINT as DECIMAL
    assert(part.agg(sum("id")).head.getAs[Number](0).longValue() == 5050L)
    // and plain JDBC sees what Spark wrote
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement()
        .executeQuery("SELECT count(*), round(avg(v), 2) FROM items")
      rs.next()
      assert(rs.getLong(1) == 100L && rs.getDouble(2) == 75.75)
    } finally c.close()
  }
}
