package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.AvroIo

/** Avro container-file reader/writer over the bundled avro-core jars:
  * all supported primitive types + nulls must survive the roundtrip
  * bit-exactly, and the reader must parallelize over files. */
class AvroIoSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("flag", BooleanType, nullable = true),
    StructField("small", IntegerType, nullable = true),
    StructField("ratio_f", FloatType, nullable = true),
    StructField("ratio_d", DoubleType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("blob", BinaryType, nullable = true),
    StructField("day", DateType, nullable = true),
    StructField("at", TimestampType, nullable = true)))

  test("all primitive types + nulls roundtrip exactly") {
    val rows = Seq(
      Row(1L, true, 42, 1.5f, 2.25, "alpha", Array[Byte](1, 2, 3),
        Date.valueOf("2024-02-29"), Timestamp.valueOf("2024-02-29 12:34:56.123456")),
      Row(2L, null, null, null, null, null, null, null, null),
      Row(3L, false, -7, Float.MinPositiveValue, Double.MaxValue, "ünïcødé ☃",
        Array.emptyByteArray, Date.valueOf("1969-12-31"),
        Timestamp.valueOf("1969-12-31 23:59:59.999999")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = "/tmp/graft_avro_spec_types"
    AvroIo.writeAvro(df, dir)
    val back = AvroIo.readAvro(spark, dir, schema)
    assert(back.schema === schema)
    val a = df.collect().sortBy(_.getLong(0))
    val b = back.collect().sortBy(_.getLong(0))
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      // binary needs element-wise compare; Row.equals uses reference
      // equality for Array[Byte]
      (0 until schema.length).foreach { i =>
        (x.get(i), y.get(i)) match {
          case (p: Array[Byte], q: Array[Byte]) => assert(p.toSeq === q.toSeq)
          case (p, q) => assert(p === q, s"field ${schema(i).name}")
        }
      }
    }
  }

  test("writer emits one container file per partition; reader fans out") {
    import spark.implicits._
    val df = spark.range(0, 1000).select($"id").repartition(4)
    val dir = "/tmp/graft_avro_spec_parts"
    AvroIo.writeAvro(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length === 4)
    val back = AvroIo.readAvro(spark, dir,
      StructType(Seq(StructField("id", LongType, nullable = false))))
    assert(back.rdd.getNumPartitions > 1) // listing parallelized, not one task
    assert(back.as[Long].collect().sorted === (0L until 1000L).toArray)
  }

  test("Io.convert handles avro in both directions") {
    import spark.implicits._
    val src = "/tmp/graft_avro_convert_src"
    val mid = "/tmp/graft_avro_convert_mid"
    val out = "/tmp/graft_avro_convert_out"
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    graft.sources.Io.writeParquet(df, src)
    graft.sources.Io.convert(spark, src, "parquet", df.schema, mid, "avro")
    graft.sources.Io.convert(spark, mid, "avro", df.schema, out, "parquet")
    val back = spark.read.parquet(out).as[(Long, String)].collect().sortBy(_._1)
    assert(back === Array((1L, "a"), (2L, "b")))
  }

  test("avroMetadata reads schema/codec/record counts from headers only") {
    import spark.implicits._
    val df = spark.range(0, 1000).select($"id").repartition(4)
    val dir = "/tmp/graft_avro_spec_meta"
    AvroIo.writeAvro(df, dir)
    val meta = AvroIo.avroMetadata(spark, dir)
      .select("codec", "records").as[(String, Long)].collect()
    assert(meta.length === 4)
    assert(meta.forall(_._1 == "snappy"))
    assert(meta.map(_._2).sum === 1000L)
    val schemaJson = AvroIo.avroMetadata(spark, dir)
      .select("schema_json").as[String].head
    assert(schemaJson.contains("\"name\":\"id\""))
  }

  test("empty input roundtrips to an empty DataFrame (header-only files)") {
    import spark.implicits._
    val df = spark.range(0, 100).select($"id").filter($"id" < 0).repartition(2)
    val dir = "/tmp/graft_avro_spec_empty"
    AvroIo.writeAvro(df, dir)
    val back = AvroIo.readAvro(spark, dir,
      StructType(Seq(StructField("id", LongType, nullable = false))))
    assert(back.count() === 0)
  }

  test("reader resolves fields BY NAME: reordered/evolved container files land in the right columns") {
    import spark.implicits._
    // writer schema order (k, v); read with the columns swapped — Avro
    // schema resolution must match by name, not position
    val dir = "/tmp/graft_avro_spec_evolution"
    AvroIo.writeAvro(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    val swapped = StructType(Seq(
      StructField("v", StringType, nullable = true),
      StructField("k", LongType, nullable = false)))
    val back = AvroIo.readAvro(spark, dir, swapped)
      .select("k", "v").as[(Long, String)].collect().sortBy(_._1)
    assert(back === Array((1L, "a"), (2L, "b")))
    // a reader field ABSENT from the files takes its null default
    // (forward-compatible schema evolution), instead of transposing
    val widened = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("extra", StringType, nullable = true),
      StructField("v", StringType, nullable = true)))
    val rows = AvroIo.readAvro(spark, dir, widened)
      .select("k", "extra", "v").collect().sortBy(_.getLong(0))
    assert(rows.map(r => (r.getLong(0), r.get(1), r.getString(2))).toSeq ===
      Seq((1L, null, "a"), (2L, null, "b")))
  }

  test("early-terminated scans (limit) don't wedge the reader") {
    import spark.implicits._
    val dir = "/tmp/graft_avro_spec_limit"
    AvroIo.writeAvro(spark.range(0, 1000).select($"id"), dir)
    val schema = StructType(Seq(StructField("id", LongType, nullable = false)))
    // limit short-circuits before hasNext exhaustion; the task-completion
    // listener must close the file handle without breaking the scan
    assert(AvroIo.readAvro(spark, dir, schema).limit(5).count() === 5)
  }

  test("unsupported nested types are rejected with a clear error") {
    val nested = StructType(Seq(StructField("arr", ArrayType(LongType), nullable = true)))
    val err = intercept[IllegalArgumentException] {
      AvroIo.avroSchemaJson(nested, "r")
    }
    assert(err.getMessage.contains("unsupported type"))
  }

  // one 7-record container built straight with avro (independent of
  // AvroIo's writer), with a custom metadata key to transfer
  private def containerBytes(): Array[Byte] = {
    val s = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"k","type":"long"},{"name":"v","type":"string"}]}""".stripMargin)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](s))
    w.setMeta("graft.origin", "spec")
    w.create(s, bos)
    (1 to 7).foreach { i =>
      val rec = new org.apache.avro.generic.GenericData.Record(s)
      rec.put("k", i.toLong); rec.put("v", s"row$i")
      w.append(rec)
    }
    w.close()
    bos.toByteArray
  }

  test("splitAvro datafile mode: chunk boundaries, order, metadata transfer, determinism") {
    import spark.implicits._
    import graft.operators.Records
    val df = Seq((1L, containerBytes())).toDF("id", "content")
    val run = () => Records.splitAvro(df, "content", outputSize = 3)
      .orderBy("split_idx")
      .select("split_idx", "record_count", "split_data")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getAs[Array[Byte]](2)))
    val splits = run()
    assert(splits.map(s => (s._1, s._2)).toSeq == Seq((0, 3L), (1, 3L), (2, 1L)))
    // every split re-parses as a complete container; records concatenate
    // to the original stream in order and the metadata key survives
    val all = splits.flatMap { case (_, _, bytes) =>
      val rd = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
        new org.apache.avro.file.SeekableByteArrayInput(bytes),
        new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
      assert(rd.getMetaString("graft.origin") == "spec")
      val out = Iterator.continually(rd).takeWhile(_.hasNext).map(_.next()).toArray
      rd.close(); out
    }
    assert(all.map(_.get("k").asInstanceOf[Long]).toSeq == (1L to 7L))
    // deterministic bytes (fixed sync marker): two runs are identical
    val again = run()
    splits.zip(again).foreach { case ((_, _, a), (_, _, b)) =>
      assert(java.util.Arrays.equals(a, b), "split bytes differ between runs")
    }
  }

  test("splitAvro bare-record mode decodes with the known schema") {
    import spark.implicits._
    import graft.operators.Records
    val s = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"k","type":"long"},{"name":"v","type":"string"}]}""".stripMargin)
    val df = Seq((1L, containerBytes())).toDF("id", "content")
    val splits = Records.splitAvro(df, "content", outputSize = 4, bare = true)
      .orderBy("split_idx").select("record_count", "split_data")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(splits.map(_._1).toSeq == Seq(4L, 3L))
    val ks = splits.flatMap { case (n, bytes) =>
      val dec = org.apache.avro.io.DecoderFactory.get()
        .binaryDecoder(bytes, null)
      val rd = new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord](s)
      (1L to n).map(_ => rd.read(null, dec).get("k").asInstanceOf[Long])
    }
    assert(ks.toSeq == (1L to 7L))
  }

  test("splitAvro keeps malformed payloads as a null-split failure row") {
    import spark.implicits._
    import graft.operators.Records
    val df = Seq((1L, "not avro".getBytes), (2L, containerBytes()))
      .toDF("id", "content")
    val out = Records.splitAvro(df, "content", outputSize = 10)
      .select("id", "split_data").collect()
      .map(r => (r.getLong(0), r.isNullAt(1)))
    assert(out.toSet == Set((1L, true), (2L, false)))
  }

  test("SplitAvro compiles in a flow") {
    import spark.implicits._
    val flow = graft.FlowCompiler.parse(
      """{"flowContents": {
        |  "processors": [
        |    {"identifier": "s", "type": "SplitAvro",
        |     "properties": {"Output Size": "2"}}],
        |  "inputPorts": [{"identifier": "i", "name": "in"}],
        |  "outputPorts": [{"identifier": "o", "name": "out"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "s"}},
        |    {"source": {"id": "s"}, "destination": {"id": "o"}}]}}""".stripMargin)
    val in = Seq((1L, containerBytes())).toDF("id", "content")
    val out = graft.FlowCompiler.compile(spark, flow, Map("in" -> in))("out")
    assert(out.count() == 4) // 7 records / 2 per split
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("graft_avro_split"), plan)
  }
  test("ConvertRecord avro: bare-binary record codec round-trips and interops with avro-core (r16)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.Records
    val ddl = "id BIGINT, name STRING, score DOUBLE, flag BOOLEAN"
    val jsons = Seq(
      """{"id":1,"name":"alpha","score":1.5,"flag":true}""",
      """{"id":2,"name":null,"score":-0.25,"flag":false}""",
      """{"id":3,"name":"\u00fcn\u00efc\u00f8d\u00e9","score":0.0,"flag":null}""")
    val df = jsons.toDF("content")
    // json -> avro -> json: struct-level identity (json text may reorder)
    val toAvro = Records.convertRecordFormat(df, "content", "json", "avro", ddl, "abin")
    val back = Records.convertRecordFormat(toAvro, "abin", "avro", "json", ddl, "round")
    val a = back.select(from_json(col("content"), ddl, Map.empty[String, String]).as("s")).collect()
    val b = back.select(from_json(col("round"), ddl, Map.empty[String, String]).as("s")).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "avro round-trip must be struct-identical")
    // cross-gate 1: avro-core (driven directly by the SPEC, not our
    // expression) decodes OUR bytes
    val avroSchema = new org.apache.avro.Schema.Parser().parse(
      AvroIo.avroSchemaJson(StructType.fromDDL(ddl), "record"))
    val ours = toAvro.select("abin").as[Array[Byte]].collect()
    val reader = new org.apache.avro.generic.GenericDatumReader[
      org.apache.avro.generic.GenericRecord](avroSchema)
    val rec0 = reader.read(null,
      org.apache.avro.io.DecoderFactory.get().binaryDecoder(ours(0), null))
    assert(rec0.get("id") == 1L && rec0.get("name").toString == "alpha" &&
      rec0.get("score") == 1.5 && rec0.get("flag") == true)
    // cross-gate 2: OUR decoder reads bytes avro-core produced
    val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
    rec.put("id", 9L); rec.put("name", "from-avro-core")
    rec.put("score", 2.5); rec.put("flag", false)
    val bos = new java.io.ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(bos, null)
    new org.apache.avro.generic.GenericDatumWriter[
      org.apache.avro.generic.GenericRecord](avroSchema).write(rec, enc)
    enc.flush()
    val theirs = Seq(bos.toByteArray).toDF("abin")
    val decoded = Records.convertRecordFormat(theirs, "abin", "avro", "json", ddl, "j")
      .select("j").as[String].collect()(0)
    assert(spark.read.json(Seq(decoded).toDS).select("id", "name", "score", "flag")
      .as[(Long, String, Double, Boolean)].collect()(0) ==
      ((9L, "from-avro-core", 2.5, false)))
    // malformed bytes -> NULL failure row, never a throw
    val bad = Seq(Array[Byte](0x7F.toByte, 0x7F.toByte)).toDF("abin")
    assert(Records.convertRecordFormat(bad, "abin", "avro", "json", ddl, "j")
      .filter(col("j").isNull).count() == 1)
    // trailing garbage after a valid record (e.g. two concatenated
    // records) is malformed too — must route to failure, not decode
    // the prefix silently (r17)
    val withTrailing = Seq(bos.toByteArray ++ Array[Byte](1, 2, 3)).toDF("abin")
    assert(Records.convertRecordFormat(withTrailing, "abin", "avro", "json", ddl, "j")
      .filter(col("j").isNull).count() == 1)
    val twoConcat = Seq(bos.toByteArray ++ bos.toByteArray).toDF("abin")
    assert(Records.convertRecordFormat(twoConcat, "abin", "avro", "json", ddl, "j")
      .filter(col("j").isNull).count() == 1)
  }

}
