package graft

import org.apache.spark.sql.functions._
import graft.operators.Records
import graft.sources.Io

/** ExecuteSQL / PutDatabaseRecord against embedded Derby (the JDBC
  * driver shipped with this Spark distribution). */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url =
    s"jdbc:derby:${java.nio.file.Files.createTempDirectory("graft_derby")}/db;create=true"

  test("jdbc write + read roundtrip (ExecuteSQL / PutDatabaseRecord)") {
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.0)).toDF("id", "name", "score")
    Io.writeJdbc(df, url, "graft_t1")
    val back = Io.readJdbc(spark, url, "graft_t1")
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(back === Array((1L, "alpha", 1.5), (2L, "beta", -2.0)))
  }

  test("jdbc pushdown: dbtable can be a query") {
    val df = (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    Io.writeJdbc(df, url, "graft_t2")
    // Derby folds unquoted identifiers to uppercase; Spark writes quoted
    // lowercase columns, so the pushdown query must quote them too
    val filtered = Io.readJdbc(spark, url,
      """(SELECT "id", "v" FROM graft_t2 WHERE "id" <= 10) sub""")
    assert(filtered.count() == 10)
    assert(filtered.agg(sum("v")).as[Double].collect()(0) == (1 to 10).map(_ * 2.0).sum)
  }

  test("partitioned jdbc fetch slices ranges across partitions (ExecuteSQL fan-out)") {
    val df = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("id", "payload")
    Io.writeJdbc(df, url, "graft_t3")
    val fetched = Io.readJdbcPartitioned(spark, url, "graft_t3",
      partitionColumn = "\"id\"", lowerBound = 1L, upperBound = 1000L,
      numPartitions = 8)
    assert(fetched.rdd.getNumPartitions == 8)
    // every slice fetched rows and nothing was lost or duplicated
    val perPart = fetched.select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .groupBy("p").count().select("count").as[Long].collect()
    assert(perPart.length == 8 && perPart.sum == 1000L)
    assert(fetched.agg(sum("id")).as[Long].collect()(0) == 500500L)
  }

  test("generateTableFetch emits page SQL covering the table exactly; watermark pages only new rows (r17)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gtf")
    val state = s"$dir/state"
    val df = (1 to 100).map(i => (i.toLong, s"r$i")).toDF("id", "payload")
    Io.writeJdbc(df, url, "graft_gtf1")
    val pages = Io.generateTableFetch(spark, url, "graft_gtf1", "id",
      partitionSize = 30, statePath = state)
      .orderBy("page_index").as[(Long, String)].collect()
    assert(pages.length === 4, "ceil(100/30) pages")
    assert(pages.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(pages(1)._2 ===
      """SELECT * FROM graft_gtf1 WHERE "id" <= 100 ORDER BY "id" OFFSET 30 ROWS FETCH NEXT 30 ROWS ONLY""")
    // the pages, RUN against the database, reassemble the table exactly
    val fetched = pages.map { case (_, sql) =>
      Io.readJdbc(spark, url, s"($sql) graft_page").select("id").as[Long].collect().toSeq
    }
    assert(fetched.map(_.size).toSeq === Seq(30, 30, 30, 10))
    assert(fetched.flatten.sorted === (1L to 100L))
    // second trigger: only rows past the recorded watermark get pages
    Io.writeJdbc((1 to 110).map(i => (i.toLong, s"r$i")).toDF("id", "payload"),
      url, "graft_gtf1")
    val next = Io.generateTableFetch(spark, url, "graft_gtf1", "id",
      partitionSize = 30, statePath = state)
      .as[(Long, String)].collect()
    assert(next.length === 1)
    assert(next(0)._2.contains(""""id" > 100 AND "id" <= 110"""))
    val newRows = Io.readJdbc(spark, url, s"(${next(0)._2}) graft_page")
      .select("id").as[Long].collect().sorted
    assert(newRows === (101L to 110L))
    // drained table → no pages, state untouched
    assert(Io.generateTableFetch(spark, url, "graft_gtf1", "id",
      partitionSize = 30, statePath = state).count() === 0L)

    // flow vocabulary: GenerateTableFetch as a source node
    val flow =
      s"""{"flowContents": {"name": "gtf",
         |  "outputPorts": [{"identifier": "o", "name": "pages"}],
         |  "processors": [
         |    {"identifier": "g", "type": "GenerateTableFetch",
         |     "properties": {"JDBC Connection URL": "$url",
         |       "Table Name": "graft_gtf1", "Maximum-value Columns": "id",
         |       "Partition Size": "40"}}],
         |  "connections": [{"source": {"id": "g"}, "destination": {"id": "o"}}]}}""".stripMargin
    val out = FlowCompiler.compile(spark, flow, Map.empty)("pages")
    assert(out.count() === 3L, "stateless mode pages the whole table: ceil(110/40)")
  }

  test("generateTableFetch validates the watermark BEFORE page SQL or state (r18)") {
    def ddl(sqls: String*): Unit = {
      val c = java.sql.DriverManager.getConnection(url)
      try { val st = c.createStatement(); sqls.foreach(st.executeUpdate); st.close() }
      finally c.close()
    }
    // all-null watermark column with rows present: MAX() is NULL — must
    // throw a clear error, not NPE in meta.get(1).toString
    ddl("CREATE TABLE graft_gtf_null (\"id\" BIGINT, \"wm\" BIGINT)",
      "INSERT INTO graft_gtf_null VALUES (1, NULL), (2, NULL)")
    val e1 = intercept[IllegalArgumentException] {
      Io.generateTableFetch(spark, url, "graft_gtf_null", "wm", partitionSize = 10)
    }
    assert(e1.getMessage.contains("NULL"))
    // unsupported (varchar) max on the FIRST stateless trigger: rejected
    // immediately, never interpolated unquoted into page SQL
    ddl("CREATE TABLE graft_gtf_str (\"id\" BIGINT, \"wm\" VARCHAR(10))",
      "INSERT INTO graft_gtf_str VALUES (1, 'abc')")
    val e2 = intercept[IllegalArgumentException] {
      Io.generateTableFetch(spark, url, "graft_gtf_str", "wm", partitionSize = 10)
    }
    assert(e2.getMessage.contains("unsupported watermark"))
  }

  test("generateTableFetch temporal watermarks (r19, ADVICE): TIMESTAMP/DATE columns page with typed literals") {
    def ddl(sqls: String*): Unit = {
      val c = java.sql.DriverManager.getConnection(url)
      try { val st = c.createStatement(); sqls.foreach(st.executeUpdate); st.close() }
      finally c.close()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_gtf_ts")
    val state = s"$dir/state"
    ddl("CREATE TABLE graft_gtf_ts (\"id\" BIGINT, \"ts\" TIMESTAMP)",
      (1 to 25).map(i => f"(${i}, {ts '2026-01-01 00:00:$i%02d'})")
        .mkString("INSERT INTO graft_gtf_ts VALUES ", ", ", ""))
    val pages = Io.generateTableFetch(spark, url, "graft_gtf_ts", "ts",
      partitionSize = 10, statePath = state)
      .orderBy("page_index").as[(Long, String)].collect()
    assert(pages.length === 3, "ceil(25/10) pages")
    // the max interpolates as a TYPED quoted literal (the JDBC escape
    // form — portable across drivers; Derby rejects ANSI TIMESTAMP
    // '...' keywords), never raw
    assert(pages(0)._2.contains("\"ts\" <= {ts '2026-01-01 00:00:25"),
      s"typed timestamp literal expected in: ${pages(0)._2}")
    // the pages, RUN against the database, reassemble the table exactly
    val got = pages.flatMap { case (_, sql) =>
      Io.readJdbc(spark, url, s"($sql) graft_page").select("id").as[Long].collect()
    }
    assert(got.sorted === (1L to 25L))
    // second trigger: the persisted temporal watermark pages only NEW rows
    ddl((26 to 30).map(i => f"(${i}, {ts '2026-01-01 00:00:$i%02d'})")
      .mkString("INSERT INTO graft_gtf_ts VALUES ", ", ", ""))
    val next = Io.generateTableFetch(spark, url, "graft_gtf_ts", "ts",
      partitionSize = 10, statePath = state).as[(Long, String)].collect()
    assert(next.length === 1)
    assert(next(0)._2.contains("\"ts\" > {ts '2026-01-01 00:00:25"),
      s"state read-back must emit a typed literal lower bound: ${next(0)._2}")
    val newRows = Io.readJdbc(spark, url, s"(${next(0)._2}) graft_page")
      .select("id").as[Long].collect().sorted
    assert(newRows === (26L to 30L))
    // DATE watermark: same contract, DATE literal shape
    ddl("CREATE TABLE graft_gtf_dt (\"id\" BIGINT, \"dt\" DATE)",
      (1 to 9).map(i => s"(${i}, {d '2026-03-0$i'})")
        .mkString("INSERT INTO graft_gtf_dt VALUES ", ", ", ""))
    val dpages = Io.generateTableFetch(spark, url, "graft_gtf_dt", "dt",
      partitionSize = 5).orderBy("page_index").as[(Long, String)].collect()
    assert(dpages.length === 2)
    assert(dpages(0)._2.contains("\"dt\" <= {d '2026-03-09'}"),
      s"typed date literal expected in: ${dpages(0)._2}")
    val dgot = dpages.flatMap { case (_, sql) =>
      Io.readJdbc(spark, url, s"($sql) graft_page").select("id").as[Long].collect()
    }
    assert(dgot.sorted === (1L to 9L))
  }

  test("generateTableFetch identifier discipline (r18): quoted table round-trips; injection throws") {
    // a quoted mixed-case table name round-trips: validation accepts the
    // quoted form and the generated page SQL fetches through it
    val df = (1 to 25).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    Io.writeJdbc(df, url, "\"GraftMix\"")
    val pages = Io.generateTableFetch(spark, url, "\"GraftMix\"", "id",
      partitionSize = 10).orderBy("page_index").as[(Long, String)].collect()
    assert(pages.length === 3)
    val got = pages.flatMap { case (_, sql) =>
      Io.readJdbc(spark, url, s"($sql) graft_page").select("id").as[Long].collect()
    }
    assert(got.sorted === (1L to 25L))
    // malicious strings throw BEFORE any SQL is built — on the
    // FlowCompiler path this is flow-compile time
    intercept[IllegalArgumentException] {
      Io.generateTableFetch(spark, url, "t; DROP TABLE x", "id", 10)
    }
    intercept[IllegalArgumentException] {
      Io.generateTableFetch(spark, url, "graft_t1", "id\" FROM x --", 10)
    }
    intercept[IllegalArgumentException] {
      Io.generateTableFetch(spark, url, "graft_t1", "id", 10,
        columns = "a, b FROM evil")
    }
    val flow =
      s"""{"flowContents": {"name": "gtf-evil",
         |  "outputPorts": [{"identifier": "o", "name": "pages"}],
         |  "processors": [
         |    {"identifier": "g", "type": "GenerateTableFetch",
         |     "properties": {"JDBC Connection URL": "$url",
         |       "Table Name": "t; DROP TABLE x",
         |       "Maximum-value Columns": "id"}}],
         |  "connections": [{"source": {"id": "g"}, "destination": {"id": "o"}}]}}""".stripMargin
    val e = intercept[IllegalArgumentException] {
      FlowCompiler.compile(spark, flow, Map.empty)
    }
    assert(e.getMessage.contains("unsafe table reference"))
  }

  test("listJdbcTables enumerates tables through connection metadata (ListDatabaseTables)") {
    val df = Seq((1L, "x")).toDF("id", "v")
    Io.writeJdbc(df, url, "graft_list_a")
    Io.writeJdbc(df, url, "graft_list_b")
    val tables = Io.listJdbcTables(spark, url)
      .select("table").as[String].collect().map(_.toLowerCase).toSet
    assert(Set("graft_list_a", "graft_list_b").subsetOf(tables),
      s"missing listed tables in $tables")
    assert(Io.listJdbcTables(spark, url).columns.toSeq ===
      Seq("catalog", "schema", "table", "type"))
  }

  test("readJdbcIncremental fetches each row exactly once across runs (QueryDatabaseTable)") {
    val state = java.nio.file.Files.createTempDirectory("graft_qdt").toString + "/state"
    Io.writeJdbc(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), url, "graft_inc_t")
    val first = Io.readJdbcIncremental(spark, url, "graft_inc_t", "id", state)
    assert(first.select("id").as[Long].collect().sorted === Array(1L, 2L))
    // no new rows → empty, state untouched
    assert(Io.readJdbcIncremental(spark, url, "graft_inc_t", "id", state).count() === 0)
    // appended rows only
    Io.writeJdbc(Seq((3L, "c"), (4L, "d")).toDF("id", "v"), url, "graft_inc_t", mode = "append")
    val third = Io.readJdbcIncremental(spark, url, "graft_inc_t", "id", state)
    assert(third.select("id").as[Long].collect().sorted === Array(3L, 4L))
    assert(Io.readJdbcIncremental(spark, url, "graft_inc_t", "id", state).count() === 0)
  }

  test("readJdbcIncremental: rows committed between state advance and the caller's " +
       "action are neither duplicated nor lost (exactly-once under a live writer)") {
    val state = java.nio.file.Files.createTempDirectory("graft_qdt_live").toString + "/state"
    Io.writeJdbc(Seq((1L, "a")).toDF("id", "v"), url, "graft_inc_live")
    val slice1 = Io.readJdbcIncremental(spark, url, "graft_inc_live", "id", state)
    // state is now advanced; a live writer commits id=2 BEFORE the caller
    // ever acts on the returned frame (and between its repeated actions)
    Io.writeJdbc(Seq((2L, "b")).toDF("id", "v"), url, "graft_inc_live", mode = "append")
    // the slice was materialized before the advance: every action sees
    // the same rows — a lazy frame would re-run the JDBC query here,
    // return id=2 now AND fetch it again next run
    assert(slice1.select("id").as[Long].collect() === Array(1L))
    assert(slice1.select("id").as[Long].collect() === Array(1L))
    val slice2 = Io.readJdbcIncremental(spark, url, "graft_inc_live", "id", state)
    assert(slice2.select("id").as[Long].collect() === Array(2L))
    assert(Io.readJdbcIncremental(spark, url, "graft_inc_live", "id", state).count() === 0)
  }

  test("state swap never leaves a moment with no recoverable state") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft_state")
    val stateP = new Path(dir.resolve("s").toString)
    val fs = stateP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Io.writeStateAtomic(fs, stateP, "v1")
    assert(Io.readStateString(fs, stateP).contains("v1"))
    Io.writeStateAtomic(fs, stateP, "v2")
    assert(Io.readStateString(fs, stateP).contains("v2"))
    assert(!fs.exists(new Path(stateP.toString + ".old")), "aside cleaned up")
    // crash window 1: live was renamed aside, new never renamed in —
    // readers must still see the OLD value, not an empty/fresh state
    fs.rename(stateP, new Path(stateP.toString + ".old"))
    assert(Io.readStateString(fs, stateP).contains("v2"))
    // the next write self-recovers the aside and completes the swap
    Io.writeStateAtomic(fs, stateP, "v3")
    assert(Io.readStateString(fs, stateP).contains("v3"))
    assert(!fs.exists(new Path(stateP.toString + ".old")))
    // crash window 2: stale aside left after a completed rename-in
    fs.create(new Path(stateP.toString + ".old"), true).close()
    Io.writeStateAtomic(fs, stateP, "v4")
    assert(Io.readStateString(fs, stateP).contains("v4"))
    assert(!fs.exists(new Path(stateP.toString + ".old")))
  }

  test("tailFile returns appended complete lines once; truncation resets (TailFile)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tail")
    val f = dir.resolve("app.log")
    val state = dir.resolve("tail.state").toString
    def append(s: String) = java.nio.file.Files.write(f, s.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    append("one\ntwo\npart")
    val first = Io.tailFile(spark, f.toString, state)
    assert(first.as[String].collect() === Array("one", "two"),
      "partial trailing line must wait for completion")
    append("ial\nthree\n")
    val second = Io.tailFile(spark, f.toString, state)
    assert(second.as[String].collect() === Array("partial", "three"))
    assert(Io.tailFile(spark, f.toString, state).count() === 0)
    // rotation: smaller file restarts from the top
    java.nio.file.Files.write(f, "fresh\n".getBytes("UTF-8"))
    assert(Io.tailFile(spark, f.toString, state).as[String].collect() === Array("fresh"))
  }

  test("distributeLoad controls partitioning") {
    val df = (1 to 100).map(i => (i.toLong, i % 5)).toDF("id", "k")
    assert(Records.distributeLoad(df, 7).rdd.getNumPartitions == 7)
    val byKey = Records.distributeLoad(df, 5, Seq("k"))
    assert(byKey.rdd.getNumPartitions == 5)
    // co-location: all rows of one key land in one partition
    val parts = byKey.select(col("k"), spark_partition_id().as("p"))
      .distinct().groupBy("k").count().select("count").as[Long].collect()
    assert(parts.forall(_ == 1L))
  }

  test("updateDatabaseTable creates, evolves additively, and rejects unsafe identifiers") {
    import org.apache.spark.sql.types._
    val v1 = new StructType().add("id", LongType).add("name", StringType)
    // create from scratch
    assert(Io.updateDatabaseTable(url, "graft_evolve", v1) === Seq("id", "name"))
    Io.writeJdbc(Seq((1L, "a")).toDF("id", "name"), url, "graft_evolve", mode = "append")
    // evolve: only the new column is added, existing data survives
    val v2 = v1.add("score", DoubleType)
    assert(Io.updateDatabaseTable(url, "graft_evolve", v2) === Seq("score"))
    Io.writeJdbc(Seq((2L, "b", 9.5)).toDF("id", "name", "score"),
      url, "graft_evolve", mode = "append")
    val back = Io.readJdbc(spark, url, "graft_evolve")
      .orderBy("id").select("id", "name", "score")
      .as[(Long, String, Option[Double])].collect()
    assert(back === Array((1L, "a", None), (2L, "b", Some(9.5))))
    // idempotent when nothing is missing
    assert(Io.updateDatabaseTable(url, "graft_evolve", v2) === Seq.empty)
    // DDL injection guard
    intercept[IllegalArgumentException] {
      Io.updateDatabaseTable(url, "bad; DROP TABLE x", v1)
    }
  }

  test("convertCharset re-encodes payloads") {
    val df = Seq((1L, "héllo")).toDF("id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val latin = Records.convertCharset(df, "payload", "UTF-8", "ISO-8859-1", "latin")
    val (utf8len, latinlen) = latin
      .select(octet_length(col("payload")), octet_length(col("latin")))
      .as[(Int, Int)].collect()(0)
    assert(utf8len == 6 && latinlen == 5) // é is 2 bytes in UTF-8, 1 in latin-1
    val back = Records.convertCharset(latin, "latin", "ISO-8859-1", "UTF-8", "roundtrip")
      .select(col("roundtrip").cast("string")).as[String].collect()(0)
    assert(back == "héllo")
  }
}
