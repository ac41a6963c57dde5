package graft.sources

import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.avro.util.Utf8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file reader/writer — NiFi's default wire format
  * (ConvertRecord's AvroReader/AvroRecordSetWriter legs).
  *
  * This Spark distribution ships avro-core/avro-mapred but NOT the
  * spark-avro datasource module, so the container format is handled
  * directly: the writer emits one `part-NNNNN.avro` object-container
  * file per partition through the Hadoop FileSystem API (any fs scheme
  * Spark itself can write), the reader fans the file listing out across
  * the cluster and streams each file through GenericDatumReader. Both
  * sides are distributed — no driver materialization — and files are
  * the parallelism unit, the same contract as Spark's own avro source.
  *
  * Type mapping (both directions): boolean, int, long, float, double,
  * string, binary, date (logical date / int epoch-day), timestamp
  * (logical timestamp-micros / long). Nullable fields map to
  * `union(null, T)` with a null default. Nested structs/arrays/maps are
  * out of scope (NiFi flows overwhelmingly move flat records; nest via
  * JSON columns if needed).
  */
/** Hadoop Configuration is not java-serializable; this carries one into
  * task closures via Hadoop's own Writable form (the standard pattern —
  * Spark's internal equivalent is private[spark]). */
private[graft] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object AvroIo {

  /** Spark schema → Avro record schema (JSON form is what travels to
    * executors — avro Schema is not serializable before 1.12 across
    * all paths, and re-parsing per task is cheap). */
  private[graft] def avroSchemaJson(schema: StructType, recordName: String): String = {
    def prim(dt: DataType): String = dt match {
      case BooleanType => "\"boolean\""
      case IntegerType | ShortType | ByteType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case DateType => "{\"type\":\"int\",\"logicalType\":\"date\"}"
      case TimestampType => "{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}"
      case TimestampNTZType => "{\"type\":\"long\",\"logicalType\":\"local-timestamp-micros\"}"
      case other => throw new IllegalArgumentException(
        s"AvroIo supports flat primitive schemas; unsupported type ${other.catalogString}")
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null",${prim(f.dataType)}]""" else prim(f.dataType)
      val dflt = if (f.nullable) ",\"default\":null" else ""
      s"""{"name":"${f.name}","type":$t$dflt}"""
    }.mkString(",")
    s"""{"type":"record","name":"$recordName","fields":[$fields]}"""
  }

  /** Avro container files ← DataFrame: one file per partition, written
    * through the Hadoop FileSystem of `path` (overwrites the directory). */
  def writeAvro(df: DataFrame, path: String, codec: String = "snappy"): Unit = {
    val sparkSchema = df.schema
    val avroJson = avroSchemaJson(sparkSchema, "graft_record")
    val hconf = new SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dir = new Path(path)
    val fs = dir.getFileSystem(hconf.value)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    df.foreachPartition { rows: Iterator[Row] =>
      val ctx = TaskContext.get()
      val pid = ctx.partitionId()
      val schema = new Schema.Parser().parse(avroJson)
      val partFs = new Path(path).getFileSystem(hconf.value)
      // task-attempt-unique temp + rename: a task that dies mid-write
      // leaves only a .tmp (never a partial final file), and a retried
      // or speculative attempt re-produces identical bytes from the
      // same deterministic partition, so whichever rename lands last
      // yields a correct file. The bare create(dest) alternative
      // corrupts the partition on any retry at scale.
      val tmp = new Path(path, s".part-$pid-${ctx.taskAttemptId()}.avro.tmp")
      val dest = new Path(path, f"part-$pid%05d.avro")
      val out = partFs.create(tmp, true)
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(org.apache.avro.file.CodecFactory.fromString(codec))
      writer.create(schema, out)
      try {
        rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < sparkSchema.length) {
            rec.put(i, toAvro(r, i, sparkSchema.fields(i).dataType))
            i += 1
          }
          writer.append(rec)
        }
      } finally writer.close() // also closes the stream
      // rename-FIRST commit: a committed dest is never deleted, so a
      // killed speculative attempt can't drop an already-committed
      // partition file. Attempts produce identical bytes from the same
      // deterministic partition, so "dest already exists" IS success
      // (the twin won — just discard our tmp). Anything else is a real
      // commit failure and must fail the task loudly, not silently
      // succeed with no output.
      if (!partFs.rename(tmp, dest)) {
        if (partFs.exists(dest)) partFs.delete(tmp, false)
        else throw new java.io.IOException(
          s"AvroIo commit failed: rename $tmp -> $dest failed and no committed file exists")
      }
      ()
    }
  }

  /** ExtractAvroMetadata (NiFi): schema JSON + codec + record count of
    * each container file, WITHOUT deserializing records (the reader
    * skips blocks; counts come from block headers). One row per file. */
  def avroMetadata(spark: SparkSession, path: String): DataFrame = {
    val hconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(path)
    val fs = dir.getFileSystem(hconf.value)
    val files = fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted
    val parallelism = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    val rdd = spark.sparkContext.parallelize(files, parallelism).map { file =>
      val reader = new DataFileReader[GenericRecord](
        new FsInput(new Path(file), hconf.value),
        new GenericDatumReader[GenericRecord]())
      try {
        var n = 0L
        while (reader.hasNext) { // hops block to block via block counts
          n += reader.getBlockCount
          reader.nextBlock()
        }
        Row(file, reader.getSchema.toString, reader.getMetaString("avro.codec"), n)
      } finally reader.close()
    }
    spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("schema_json", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("codec", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("records", org.apache.spark.sql.types.LongType))))
  }

  /** DataFrame ← avro container files: the file listing parallelizes
    * across the cluster; each task streams its files record-by-record
    * (no whole-file buffering, so file size is bounded only by disk). */
  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val hconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(path)
    val fs = dir.getFileSystem(hconf.value)
    val files = fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString)
      .sorted
    val parallelism = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    val fields = schema.fields
    // reader (expected) schema derived from the Spark schema: Avro then
    // resolves writer fields BY NAME, so container files with a
    // different field order (schema evolution, files from NiFi or
    // another producer) land in the right columns instead of silently
    // transposing; missing nullable fields take their null default.
    val expectedJson = avroSchemaJson(schema, "graft_record")
    val rdd = spark.sparkContext.parallelize(files, parallelism).flatMap { file =>
      val expected = new Schema.Parser().parse(expectedJson)
      val reader = new DataFileReader[GenericRecord](
        new FsInput(new Path(file), hconf.value),
        new GenericDatumReader[GenericRecord](null, expected))
      // close on task completion too: an early-terminated scan
      // (limit/take, downstream short-circuit) never drives hasNext to
      // exhaustion, which would otherwise leak the handle for the
      // task's lifetime
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; reader.close() }
      val tc = TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeOnce())
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = !closed && reader.hasNext
          if (!h) closeOnce()
          h
        }
        def next(): Row = {
          val rec = reader.next()
          Row.fromSeq(fields.indices.map(i => fromAvro(rec.get(i), fields(i).dataType)))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  private def toAvro(r: Row, i: Int, dt: DataType): AnyRef =
    if (r.isNullAt(i)) null
    else dt match {
      case BooleanType => java.lang.Boolean.valueOf(r.getBoolean(i))
      case IntegerType => java.lang.Integer.valueOf(r.getInt(i))
      case ShortType => java.lang.Integer.valueOf(r.getShort(i).toInt)
      case ByteType => java.lang.Integer.valueOf(r.getByte(i).toInt)
      case LongType => java.lang.Long.valueOf(r.getLong(i))
      case FloatType => java.lang.Float.valueOf(r.getFloat(i))
      case DoubleType => java.lang.Double.valueOf(r.getDouble(i))
      case StringType => r.getString(i)
      case BinaryType => ByteBuffer.wrap(r.getAs[Array[Byte]](i))
      case DateType => r.get(i) match { // java.sql.Date or LocalDate per session conf
        case d: java.sql.Date => java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
        case d: java.time.LocalDate => java.lang.Integer.valueOf(d.toEpochDay.toInt)
        case other => throw new IllegalArgumentException(s"unexpected date value $other")
      }
      case TimestampType => r.get(i) match {
        case t: java.sql.Timestamp =>
          java.lang.Long.valueOf(t.getTime * 1000L + (t.getNanos / 1000L) % 1000L)
        case t: java.time.Instant =>
          java.lang.Long.valueOf(t.getEpochSecond * 1000000L + t.getNano / 1000L)
        case other => throw new IllegalArgumentException(s"unexpected timestamp value $other")
      }
      case TimestampNTZType => r.get(i) match { // session-zone-free wall time
        case t: java.time.LocalDateTime =>
          java.lang.Long.valueOf(
            t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L)
        case other => throw new IllegalArgumentException(s"unexpected ntz value $other")
      }
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }

  private def fromAvro(v: AnyRef, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => v match {
        case u: Utf8 => u.toString
        case s: String => s
        case other => other.toString
      }
      case BinaryType => v match {
        case b: ByteBuffer =>
          val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
        case a: Array[Byte] => a
        case other => throw new IllegalArgumentException(s"unexpected bytes value $other")
      }
      case DateType => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[java.lang.Integer].longValue()))
      case TimestampType =>
        val micros = v.asInstanceOf[java.lang.Long].longValue()
        val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        t
      case TimestampNTZType =>
        val micros = v.asInstanceOf[java.lang.Long].longValue()
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      case ShortType => v.asInstanceOf[java.lang.Integer].shortValue()
      case ByteType => v.asInstanceOf[java.lang.Integer].byteValue()
      case _ => v // boolean/int/long/float/double boxes pass through
    }
}
