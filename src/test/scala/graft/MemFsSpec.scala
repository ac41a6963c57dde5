package graft

import org.apache.spark.sql.types._
import graft.sources.{AvroIo, Io, MemFs}

/** Object-store seam (SURVEY 48n) exercised end-to-end: an in-process
  * Hadoop FileSystem stands in for s3a/gs/abfs behind the identical
  * FileSystem contract, so parquet + avro round-trips over `memfs://`
  * prove the operator layer is scheme-agnostic — including Spark's
  * commit protocol (temp dirs + renames) and parquet's seek-driven
  * footer reads. */
class MemFsSpec extends SparkSpec {
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.memfs.impl", classOf[MemFs].getName)

  test("parquet round-trips through an object-store path scheme") {
    MemFs.clear()
    val df = (1 to 1000).map(i => (i.toLong, s"row-$i", i * 1.5)).toDF("id", "name", "v")
      .repartition(4)
    df.write.parquet("memfs://bucket/warehouse/t1")
    val back = spark.read.parquet("memfs://bucket/warehouse/t1")
    assert(back.count() === 1000)
    assert(back.select("id", "name", "v").as[(Long, String, Double)].collect().sortBy(_._1)
      === df.select("id", "name", "v").as[(Long, String, Double)].collect().sortBy(_._1))
    // overwrite mode exercises recursive delete through the scheme
    df.limit(10).write.mode("overwrite").parquet("memfs://bucket/warehouse/t1")
    assert(spark.read.parquet("memfs://bucket/warehouse/t1").count() === 10)
  }

  test("partitioned parquet sink works on the object store (Io.writeParquet)") {
    MemFs.clear()
    val df = Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "a", "y")).toDF("id", "k", "part")
    Io.writeParquetPartitioned(df, "memfs://bucket/part_out", Seq("part"))
    val back = spark.read.parquet("memfs://bucket/part_out")
    assert(back.count() === 3)
    // partition pruning still works through the scheme
    assert(back.filter($"part" === "y").count() === 1)
  }

  test("listIncremental returns each file exactly once across scheduled runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_list_inc").toString
    val state = dir + "/.graft_list_state"
    def touch(name: String, mtime: Long): Unit = {
      val f = new java.io.File(dir, name)
      java.nio.file.Files.write(f.toPath, name.getBytes("UTF-8"))
      assert(f.setLastModified(mtime))
    }
    touch("a.txt", 1000000L); touch("b.txt", 2000000L)
    val first = Io.listIncremental(spark, dir, state)
    assert(first.select("path").as[String].collect().map(_.split('/').last).sorted
      === Array("a.txt", "b.txt"))
    // nothing new → empty second run
    assert(Io.listIncremental(spark, dir, state).count() === 0)
    // a file sharing the boundary mtime is still picked up (tie
    // handling), plus a strictly newer one; neither is re-listed after
    touch("c.txt", 2000000L); touch("d.txt", 3000000L)
    val third = Io.listIncremental(spark, dir, state)
    assert(third.select("path").as[String].collect().map(_.split('/').last).sorted
      === Array("c.txt", "d.txt"))
    assert(Io.listIncremental(spark, dir, state).count() === 0)
  }

  test("crash-safe state swap and MapCache run on the object-store scheme") {
    MemFs.clear()
    import org.apache.hadoop.fs.Path
    val stateP = new Path("memfs://bucket/state/inc.state")
    val fs = stateP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Io.writeStateAtomic(fs, stateP, "v1")
    Io.writeStateAtomic(fs, stateP, "v2")
    assert(Io.readStateString(fs, stateP).contains("v2"))
    // crash window (live renamed aside): readers still see v2 via memfs
    assert(fs.rename(stateP, new Path(stateP.toString + ".old")))
    assert(Io.readStateString(fs, stateP).contains("v2"))
    Io.writeStateAtomic(fs, stateP, "v3") // next writer heals
    assert(Io.readStateString(fs, stateP).contains("v3"))
    assert(!fs.exists(new Path(stateP.toString + ".old")))
    // MapCache generation log + compact swap over the same scheme
    val cache = "memfs://bucket/cache/seen"
    graft.operators.MapCache.put(Seq(("a", "1"), ("b", "2")).toDF("k", "v"), cache, "k", "v")
    graft.operators.MapCache.remove(Seq("b").toDF("k"), cache, "k")
    graft.operators.MapCache.compact(spark, cache)
    val entries = graft.operators.MapCache.entries(spark, cache)
      .as[(String, String)].collect().toMap
    assert(entries === Map("a" -> "1"))
  }

  test("AvroIo container files round-trip through the scheme (incl. rename-first commit)") {
    MemFs.clear()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "alpha"),
        org.apache.spark.sql.Row(2L, null),
        org.apache.spark.sql.Row(3L, "gamma")), 2), schema)
    AvroIo.writeAvro(df, "memfs://bucket/avro1")
    val back = AvroIo.readAvro(spark, "memfs://bucket/avro1", schema)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      === Array((1L, "alpha"), (2L, null), (3L, "gamma")))
    val meta = AvroIo.avroMetadata(spark, "memfs://bucket/avro1")
    assert(meta.count() === 2) // one container file per partition
  }
}
