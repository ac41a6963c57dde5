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

object AvroExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def avroSplit(c: Column, outputSize: Int, bare: Boolean = false): Column =
    ColumnBridge.column(AvroSplit(ColumnBridge.expression(c), outputSize, bare))
}
