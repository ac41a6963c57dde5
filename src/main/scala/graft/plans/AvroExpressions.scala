package graft.plans

import java.io.ByteArrayOutputStream

import org.apache.avro.file.{DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** SplitAvro (NiFi): split one Avro object-container payload into
  * `outputSize`-record chunks — the record-boundary splitter NiFi
  * flows use to turn bulk Avro drops into streamable units. Same
  * native-expression contract as [[BinaryExpressions.zipEntries]]:
  * per-record work inside ONE CodegenFallback expression, array-of-
  * struct output exploded by the operator wrapper, no driver
  * involvement, malformed payloads degrade to an EMPTY array (never
  * throw — the [[MediaExpressions]] discipline; route on
  * `split_count = 0` for NiFi's failure relationship).
  *
  * Both NiFi Output Strategies:
  *  - `bare = false` (Datafile): each chunk is a COMPLETE container
  *    file — writer schema + the source container's custom metadata
  *    keys (NiFi's Transfer Metadata) + the chunk's records. The sync
  *    marker is derived from md5(schema ‖ chunk index), so split
  *    bytes are DETERMINISTIC across runs/retries (DataFileWriter
  *    otherwise randomizes the marker per file — the ZipPack
  *    epoch-0-mtime issue in Avro form). Chunks are written
  *    uncompressed regardless of source codec: deterministic bytes,
  *    and re-compression is CompressContent's job downstream.
  *  - `bare = true` (Bare Record): the chunk's records binary-encoded
  *    back-to-back with no container framing (consumer must know the
  *    schema — NiFi's documented caveat verbatim).
  */
case class AvroSplit(child: Expression, outputSize: Int, bare: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(outputSize >= 1, "AvroSplit: outputSize must be >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("split_idx", IntegerType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("split_data", BinaryType, nullable = false))))
  override def prettyName: String = "graft_avro_split"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      val reader = new org.apache.avro.file.DataFileReader[GenericRecord](
        new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
      try {
        val schema = reader.getSchema
        // custom metadata keys survive into every split (NiFi's
        // Transfer Metadata); avro.* keys are container-managed
        val metaKeys = reader.getMetaKeys.toArray(Array.empty[String])
          .filterNot(_.startsWith("avro.")).sorted
        val meta = metaKeys.map(k => k -> reader.getMeta(k))
        val out = scala.collection.mutable.ArrayBuffer.empty[Any]
        val chunk = new scala.collection.mutable.ArrayBuffer[GenericRecord](outputSize)
        var idx = 0
        def flush(): Unit = if (chunk.nonEmpty) {
          val bos = new ByteArrayOutputStream(1024)
          if (bare) {
            val enc = EncoderFactory.get().binaryEncoder(bos, null)
            val w = new GenericDatumWriter[GenericRecord](schema)
            chunk.foreach(w.write(_, enc))
            enc.flush()
          } else {
            val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
            meta.foreach { case (k, v) => w.setMeta(k, v) }
            val sync = java.security.MessageDigest.getInstance("MD5")
              .digest((schema.toString + "#" + idx).getBytes("UTF-8"))
            w.create(schema, bos, sync) // deterministic marker
            chunk.foreach(w.append)
            w.close()
          }
          out += InternalRow(idx, chunk.length.toLong, bos.toByteArray)
          chunk.clear()
          idx += 1
        }
        while (reader.hasNext) {
          chunk += reader.next()
          if (chunk.length == outputSize) flush()
        }
        flush()
        new GenericArrayData(out.toArray)
      } finally reader.close()
    } catch {
      case _: java.io.IOException | _: RuntimeException =>
        new GenericArrayData(Array.empty[Any]) // malformed → empty, never throw
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-record Avro BINARY encode for ConvertRecord (r16): one
  * struct value → one bare Avro-binary record (no container framing —
  * NiFi's AvroRecordSetWriter at the record grain; the container form
  * is [[graft.sources.AvroIo.writeAvro]]). The schema derives from the
  * SAME DDL string the json/csv ConvertRecord branches use, through
  * [[graft.sources.AvroIo.avroSchemaJson]]'s flat-primitive mapping —
  * and InternalRow's physical primitives line up with Avro's logical
  * types directly (date = int days, timestamps = long micros), so the
  * converter is a per-field switch with no temporal object churn. */
case class AvroRecordEncode(child: Expression, schemaDdl: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_avro_encode"

  @transient private lazy val structType = StructType.fromDDL(schemaDdl)
  @transient private lazy val avroSchema = new org.apache.avro.Schema.Parser()
    .parse(graft.sources.AvroIo.avroSchemaJson(structType, "record"))
  @transient private lazy val writer =
    new GenericDatumWriter[GenericRecord](avroSchema)

  override protected def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
    structType.fields.zipWithIndex.foreach { case (f, i) =>
      val v: AnyRef =
        if (row.isNullAt(i)) null
        else f.dataType match {
          case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
          case IntegerType | DateType => java.lang.Integer.valueOf(row.getInt(i))
          case ShortType => java.lang.Integer.valueOf(row.getShort(i).toInt)
          case ByteType => java.lang.Integer.valueOf(row.getByte(i).toInt)
          case LongType | TimestampType | TimestampNTZType =>
            java.lang.Long.valueOf(row.getLong(i))
          case FloatType => java.lang.Float.valueOf(row.getFloat(i))
          case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
          case StringType => row.getUTF8String(i).toString
          case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
          case other => throw new IllegalArgumentException(
            s"ConvertRecord avro: unsupported type ${other.catalogString}")
        }
      rec.put(f.name, v)
    }
    val bos = new ByteArrayOutputStream(64)
    val enc = EncoderFactory.get().binaryEncoder(bos, null)
    writer.write(rec, enc)
    enc.flush()
    bos.toByteArray
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-record Avro binary decode (the Record Reader direction):
  * bare Avro-binary bytes → struct under the DDL schema. Malformed
  * payloads yield NULL (route on it — the failure relationship). */
case class AvroRecordDecode(child: Expression, schemaDdl: String)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val structType = StructType.fromDDL(schemaDdl)
  override def dataType: DataType = structType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avro_decode"

  @transient private lazy val avroSchema = new org.apache.avro.Schema.Parser()
    .parse(graft.sources.AvroIo.avroSchemaJson(structType, "record"))
  @transient private lazy val reader =
    new GenericDatumReader[GenericRecord](avroSchema)

  override protected def nullSafeEval(input: Any): Any =
    try {
      val bytes = input.asInstanceOf[Array[Byte]]
      val dec = org.apache.avro.io.DecoderFactory.get()
        .binaryDecoder(bytes, null)
      val rec = reader.read(null, dec)
      // A record with trailing bytes (two concatenated records, or
      // appended junk) is malformed, not a shorter valid record —
      // route it to failure (NULL) rather than decode silently.
      if (!dec.isEnd) return null
      val vals = structType.fields.zipWithIndex.map { case (f, i) =>
        val v = rec.get(i)
        if (v == null) null
        else f.dataType match {
          case StringType =>
            org.apache.spark.unsafe.types.UTF8String.fromString(v.toString)
          case BinaryType => v match {
            case b: java.nio.ByteBuffer =>
              val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
            case a: Array[Byte] => a
            case other => throw new IllegalArgumentException(
              s"unexpected bytes value $other")
          }
          case _ => v // int/long/float/double/boolean box straight through
        }
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        vals.asInstanceOf[Array[Any]])
    } catch { case _: RuntimeException | _: java.io.IOException => null }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AvroExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def avroSplit(c: Column, outputSize: Int, bare: Boolean = false): Column =
    ColumnBridge.column(AvroSplit(ColumnBridge.expression(c), outputSize, bare))
  def avroEncode(c: Column, schemaDdl: String): Column =
    ColumnBridge.column(AvroRecordEncode(ColumnBridge.expression(c), schemaDdl))
  def avroDecode(c: Column, schemaDdl: String): Column =
    ColumnBridge.column(AvroRecordDecode(ColumnBridge.expression(c), schemaDdl))
}
