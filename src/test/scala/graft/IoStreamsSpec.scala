package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Io
import graft.streaming.Streams

class IoStreamsSpec extends SparkSpec {

  test("writeParquetBloom: footer carries bloom offsets for exactly the requested columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bloom").toString + "/t"
    val df = (0L until 5000L).map(i => (i, s"u$i", i % 7)).toDF("id", "name", "bucket")
    Io.writeParquetBloom(df, dir, Seq("id", "name"), ndv = 5000)
    // data round-trips
    assert(spark.read.parquet(dir).count() === 5000)
    assert(spark.read.parquet(dir).filter(col("id") === 4321L)
      .select("name").as[String].head() === "u4321")
    // footer: bloom offsets present for id+name, absent for bucket
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(part.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try {
      val cols = reader.getRowGroups.get(0).getColumns
      val offsets = (0 until cols.size).map { i =>
        val c = cols.get(i)
        c.getPath.toDotString -> (c.getBloomFilterOffset >= 0)
      }.toMap
      assert(offsets("id") && offsets("name"),
        s"requested columns must carry bloom filters: $offsets")
      assert(!offsets("bucket"), s"unrequested column must not: $offsets")
    } finally reader.close()
  }
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def sample = Seq(
    (1L, "alpha", 1.5), (2L, "beta", -2.25), (3L, "gamma", 0.0)
  ).toDF("id", "name", "score")

  test("csv roundtrip preserves values incl. doubles") {
    val dir = tmpDir("csv")
    Io.writeCsv(sample, dir)
    val back = Io.readCsv(spark, dir, schema)
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(back === sample.orderBy("id").as[(Long, String, Double)].collect())
  }

  test("jsonl roundtrip preserves values") {
    val dir = tmpDir("json")
    Io.writeJsonl(sample, dir)
    val back = Io.readJsonl(spark, dir, schema)
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(back.length == 3 && back(1)._2 == "beta")
  }

  test("xml file roundtrip preserves values") {
    val dir = tmpDir("xml")
    Io.writeXml(sample, dir, rowTag = "rec")
    val back = Io.readXml(spark, dir, "rec", schema)
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(back === sample.orderBy("id").as[(Long, String, Double)].collect())
  }

  test("partitioned parquet write creates hive layout and prunes") {
    val dir = tmpDir("part")
    Io.writeParquetPartitioned(sample.withColumn("bucket", col("id") % 2), dir, Seq("bucket"))
    val files = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("bucket="))
    assert(files.toSet == Set("bucket=0", "bucket=1"))
    val pruned = Io.readParquet(spark, dir).filter(col("bucket") === 1)
    assert(pruned.select("id").as[Long].collect().sorted === Array(1L, 3L))
    // partition filter must not appear as a data filter (pruned at source)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter ("), s"expected partition pruning, got:\n$plan")
  }

  test("compressed csv (gzip) reads back transparently") {
    val dir = tmpDir("gz")
    Io.writeCsv(sample, dir, compression = "gzip")
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".csv.gz")))
    assert(Io.readCsv(spark, dir, schema).count() == 3)
  }

  test("listFiles returns metadata without content column") {
    val dir = tmpDir("ls")
    Io.writeCsv(sample, dir)
    val ls = Io.listFiles(spark, dir, "*.csv")
    assert(ls.columns.toSet == Set("path", "size", "mtime"))
    assert(ls.count() >= 1)
    assert(ls.select(min("size")).as[Long].collect()(0) > 0)
  }

  // ---------------------------------------------------------- streaming
  test("file stream with windowed agg + watermark produces per-window counts") {
    val dir = tmpDir("stream_in")
    val eschema = StructType(Seq(
      StructField("ts", TimestampType), StructField("k", StringType),
      StructField("v", DoubleType)))
    // two windows of data
    Seq(
      """{"ts":"2024-01-01T00:00:10.000Z","k":"a","v":1.0}""",
      """{"ts":"2024-01-01T00:00:20.000Z","k":"a","v":2.0}""",
      """{"ts":"2024-01-01T00:01:10.000Z","k":"a","v":4.0}""",
      """{"ts":"2024-01-01T00:01:20.000Z","k":"b","v":8.0}"""
    ).zipWithIndex.foreach { case (line, i) =>
      Files.writeString(java.nio.file.Path.of(dir, s"f$i.json"), line + "\n")
    }
    val in = Streams.fileStream(spark, dir, eschema, maxFilesPerTrigger = 2)
    val agg = Streams.windowedAgg(in, "ts", "k", "v", "1 minute", "10 minutes")
    val q = Streams.toMemorySink(agg, "win_counts",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    q.processAllAvailable(); q.stop()
    val rows = spark.table("win_counts")
      .select(col("k"), col("cnt"), col("sum_value")).as[(String, Long, Double)]
      .collect().toSet
    assert(rows == Set(("a", 2L, 3.0), ("a", 1L, 4.0), ("b", 1L, 8.0)))
  }

  test("streaming dedupe drops duplicate keys within watermark") {
    val dir = tmpDir("dedup_in")
    val eschema = StructType(Seq(
      StructField("ts", TimestampType), StructField("k", StringType)))
    Seq(
      """{"ts":"2024-01-01T00:00:10.000Z","k":"x"}""" + "\n" +
      """{"ts":"2024-01-01T00:00:10.000Z","k":"x"}""",
      """{"ts":"2024-01-01T00:00:30.000Z","k":"y"}"""
    ).zipWithIndex.foreach { case (content, i) =>
      Files.writeString(java.nio.file.Path.of(dir, s"f$i.json"), content + "\n")
    }
    val in = Streams.fileStream(spark, dir, eschema)
    val q = Streams.toMemorySink(Streams.dedupe(in, "ts", Seq("k"), "1 hour"), "dedup_out")
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_out").select("k").as[String].collect().sorted === Array("x", "y"))
  }

  test("session windows merge events within gap") {
    val dir = tmpDir("sess_in")
    val eschema = StructType(Seq(
      StructField("ts", TimestampType), StructField("k", StringType)))
    Seq(
      """{"ts":"2024-01-01T00:00:00.000Z","k":"u"}""",
      """{"ts":"2024-01-01T00:00:30.000Z","k":"u"}""",   // same session (gap 1m)
      """{"ts":"2024-01-01T00:05:00.000Z","k":"u"}"""    // new session
    ).zipWithIndex.foreach { case (line, i) =>
      Files.writeString(java.nio.file.Path.of(dir, s"f$i.json"), line + "\n")
    }
    val in = Streams.fileStream(spark, dir, eschema)
    val agg = Streams.sessionWindowAgg(in, "ts", "k", "1 minute", "10 minutes")
    val q = Streams.toMemorySink(agg, "sessions",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    q.processAllAvailable(); q.stop()
    val counts = spark.table("sessions").select("n_events").as[Long].collect().sorted
    assert(counts === Array(1L, 2L))
  }

  test("transformWithState running stats accumulate per key (Spark 4 API)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, Double)]
      input.addData(("a", 1.0), ("a", 5.0), ("b", 2.0), ("a", 3.0))
      val stats = Streams.runningStatsTws(input.toDS())
      val q = stats.writeStream.format("memory").queryName("tws_stats")
        .outputMode("update").start()
      q.processAllAvailable(); q.stop()
      val last = spark.table("tws_stats").as[(String, Long, Double)].collect()
        .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2) }
      assert(last("a") == ("a", 3L, 5.0))
      assert(last("b") == ("b", 1L, 2.0))
    } finally {
      if (prev.nonEmpty)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
      else spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("mapGroupsWithState running stats accumulate per key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    input.addData(("a", 1.0), ("a", 5.0), ("b", 2.0), ("a", 3.0))
    val stats = Streams.runningStats(input.toDS())
    // Spark 4.1: FlatMapGroupsWithStateExec keeps requesting no-data
    // batches forever (even with NoTimeout) — disable them; they only
    // matter for event-time-timeout emission, which runningStats
    // doesn't use.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val q = stats.writeStream.format("memory").queryName("stats")
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    val last = spark.table("stats").as[(String, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2) }
    assert(last("a") == ("a", 3L, 5.0))
    assert(last("b") == ("b", 1L, 2.0))
  }
}
