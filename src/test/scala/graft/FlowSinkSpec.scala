package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** r10 sink/JDBC/tail flow vocabulary: flows can now start at a
  * database or a tailed file and END in a real sink. Each test drives
  * the full flow-JSON → compile → persisted-bytes path. */
class FlowSinkSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def derbyUrl(tag: String): String =
    s"jdbc:derby:${Files.createTempDirectory(s"graft_flow_$tag")}/db;create=true"

  test("jdbc_sink flow: ExecuteSQL source → QueryRecord → PutFile parquet sink, read-back matches direct computation") {
    val out = QueriesText.qFlowSink(spark, sf)
      .orderBy("n_nationkey").collect().toSeq
    val direct = Tables.load(spark, sf, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
      .filter(col("n_regionkey") < 4)
      .orderBy("n_nationkey").collect().toSeq
    assert(out === direct)
    assert(out.nonEmpty)
    // the sink directory holds real parquet a separate consumer can read
    val key = sf.replaceAll("[^A-Za-z0-9._-]", "_")
    val sink = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_flow_sink_$key")
    val independent = spark.read.parquet(sink.toString).count()
    assert(independent === out.size.toLong)
  }

  test("jdbc_sink flow JSON round-trips through export") {
    val json = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/flows/jdbc_sink.json"), "UTF-8").mkString
    val f = FlowCompiler.parse(json)
    assert(FlowCompiler.parse(FlowCompiler.export(f)) === f)
  }

  test("PutDatabaseRecord sink writes over JDBC and downstream sees the table read-back") {
    val url = derbyUrl("pdbr")
    val flow = FlowCompiler.parse(
      """{"flowContents": {"name": "db_sink",
        |  "processors": [
        |    {"identifier": "put", "type": "PutDatabaseRecord",
        |     "properties": {"JDBC Connection URL": "#{url}",
        |                    "Table Name": "sunk", "Statement Type": "INSERT"}}],
        |  "inputPorts": [{"identifier": "i", "name": "rows"}],
        |  "outputPorts": [{"identifier": "o", "name": "stored"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "put"}},
        |    {"source": {"id": "put"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val out = FlowCompiler.compile(spark, flow, Map("rows" -> rows),
      Map("url" -> url))("stored")
    assert(out.orderBy("id").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // independently through plain JDBC — the write really happened
    val direct = graft.sources.Io.readJdbc(spark, url, "sunk")
    assert(direct.count() === 3L)
  }

  test("TailFile flow source reads appended complete lines incrementally across compiles") {
    val dir = Files.createTempDirectory("graft_flow_tail")
    val file = dir.resolve("app.log")
    val state = dir.resolve("tail.state").toString
    Files.writeString(file, "one\ntwo\npart")
    val json =
      s"""{"flowContents": {"name": "tail",
         |  "processors": [
         |    {"identifier": "t", "type": "TailFile",
         |     "properties": {"File to Tail": "$file", "State Path": "$state"}}],
         |  "inputPorts": [], "outputPorts": [{"identifier": "o", "name": "lines"}],
         |  "connections": [
         |    {"source": {"id": "t"}, "destination": {"id": "o"}}]}}""".stripMargin
    val first = FlowCompiler.compile(spark, json,
      Map.empty[String, org.apache.spark.sql.DataFrame])("lines")
      .as[String].collect().toSeq
    assert(first === Seq("one", "two")) // the partial line stays
    Files.writeString(file, "one\ntwo\npartial done\nthree\n")
    val second = FlowCompiler.compile(spark, json,
      Map.empty[String, org.apache.spark.sql.DataFrame])("lines")
      .as[String].collect().toSeq
    assert(second === Seq("partial done", "three")) // only the new bytes
  }

  test("QueryDatabaseTable flow source fetches incrementally across compiles") {
    val url = derbyUrl("qdt")
    graft.sources.Io.writeJdbc(
      Seq((1L, "x"), (2L, "y")).toDF("id", "v"), url, "src", "overwrite")
    val state = Files.createTempDirectory("graft_flow_qdt_state")
      .resolve("qdt.state").toString
    val json =
      s"""{"flowContents": {"name": "qdt",
         |  "processors": [
         |    {"identifier": "q", "type": "QueryDatabaseTable",
         |     "properties": {"JDBC Connection URL": "$url", "Table Name": "src",
         |                    "Maximum-value Columns": "id", "State Path": "$state"}}],
         |  "inputPorts": [], "outputPorts": [{"identifier": "o", "name": "rows"}],
         |  "connections": [
         |    {"source": {"id": "q"}, "destination": {"id": "o"}}]}}""".stripMargin
    def run(): Seq[Long] = FlowCompiler.compile(spark, json,
        Map.empty[String, org.apache.spark.sql.DataFrame])("rows")
      .select("id").as[Long].collect().toSeq.sorted
    assert(run() === Seq(1L, 2L))
    graft.sources.Io.writeJdbc(Seq((3L, "z")).toDF("id", "v"), url, "src", "append")
    assert(run() === Seq(3L)) // only past the watermark
    assert(run() === Seq.empty) // nothing new
  }

  test("ControlRate caps rows per compiled run") {
    val flow = FlowCompiler.parse(
      """{"flowContents": {"name": "cr",
        |  "processors": [
        |    {"identifier": "c", "type": "ControlRate",
        |     "properties": {"Maximum Rate": "5"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "capped"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "c"}},
        |    {"source": {"id": "c"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val out = FlowCompiler.compile(spark, flow,
      Map("in" -> spark.range(100).toDF("id")))("capped")
    assert(out.count() === 5L)
  }

  test("PutFile csv sink with partition columns lays out hive directories") {
    val dir = Files.createTempDirectory("graft_flow_putcsv").resolve("out").toString
    val flow = FlowCompiler.parse(
      s"""{"flowContents": {"name": "pf",
         |  "processors": [
         |    {"identifier": "p", "type": "PutFile",
         |     "properties": {"Directory": "$dir", "Output Format": "parquet",
         |                    "Partition Columns": "grp"}}],
         |  "inputPorts": [{"identifier": "i", "name": "in"}],
         |  "outputPorts": [{"identifier": "o", "name": "stored"}],
         |  "connections": [
         |    {"source": {"id": "i"}, "destination": {"id": "p"}},
         |    {"source": {"id": "p"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val rows = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    val out = FlowCompiler.compile(spark, flow, Map("in" -> rows))("stored")
    assert(out.count() === 3L)
    // hive layout: partition values became directories
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs === Array("grp=a", "grp=b"))
    // partition pruning works on the read-back path
    val pruned = spark.read.parquet(dir).filter(col("grp") === "a")
    assert(pruned.count() === 2L)
  }
}
