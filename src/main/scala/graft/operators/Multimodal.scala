package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (SURVEY.md §2.4 #40).
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct. The Spark-side plumbing — schema, batched partition-wise
  * processing, deterministic partitioning — is real; the actual
  * image/audio DECODE is stubbed (this container has no codec libs)
  * behind [[decodeStub]], which produces a deterministic fake so tests
  * and plans are reproducible. Swap `decodeStub` for a real decoder
  * (e.g. a JNI/FFM codec or `mapInPandas` on PySpark clusters) without
  * touching anything else.
  */
object Multimodal {

  val metaType: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Wrap a content column as (payload binary, media struct). For real
    * media, width/height/… come from container headers; for text payloads
    * they're null. Narrow, codegen'd. */
  def toMedia(df: DataFrame, contentCol: String, modality: String): DataFrame =
    df.withColumn("payload", col(contentCol).cast("binary"))
      .withColumn("media", struct(
        lit(modality).as("modality"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("int").as("n_frames")))

  /** STUB — deterministic fake "decoded features": `dim` floats derived
    * from a rolling hash of the payload bytes. Replace with a real codec
    * for production. Runs batched per partition (the real decoder would
    * amortize model/codec init exactly here). */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val out = new Array[Float](dim)
    var j = 0
    var x = h
    while (j < dim) {
      x = x * 6364136223846793005L + 1442695040888963407L // splitmix-ish LCG
      out(j) = ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
      j += 1
    }
    out
  }

  /** Partition-wise feature extraction over the payload column: adds
    * `features array<float>`. The iterator shape is where a real decoder
    * would batch I/O / reuse buffers; the stub keeps the plumbing
    * (schema, encoder, per-partition init) identical. */
  def extractFeatures(spark: SparkSession, df: DataFrame,
                      payloadCol: String = "payload", dim: Int = 16): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      // per-partition init happens here (codec/model load in a real impl)
      it.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ decodeStub(payload, dim).toSeq)
      }
    }(enc)
  }

  /** Batched variant of [[extractFeatures]]: payloads are decoded in
    * groups of `batchSize` — the iterator shape a real codec/model wants
    * (amortized dispatch, contiguous buffers), mirroring `mapInPandas`
    * batch semantics on PySpark clusters. Output identical to the
    * per-row path. */
  def extractFeaturesBatched(spark: SparkSession, df: DataFrame,
                             payloadCol: String = "payload", dim: Int = 16,
                             batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would submit `batch` as one contiguous request
        val feats = batch.map(r => decodeStub(r.getAs[Array[Byte]](idx), dim))
        batch.iterator.zip(feats.iterator).map { case (r, f) =>
          Row.fromSeq(r.toSeq :+ f.toSeq)
        }
      }
    }(enc)
  }

  /** STUB resize marker for image payloads: records the intended target
    * size in the media struct (a real impl rewrites the payload). */
  def resizeStub(df: DataFrame, width: Int, height: Int): DataFrame =
    df.withColumn("media", col("media")
      .withField("width", lit(width))
      .withField("height", lit(height)))

  /** REAL (non-stub) header metadata: parse container headers
    * (PNG/JPEG/GIF/BMP/WAV) from the payload's first bytes — the
    * route/filter step that runs on every payload BEFORE any decode.
    * Native expression, one pass over the header region only. */
  def parseHeader(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.plans.MediaExpressions.mediaHeader(payload)

  /** Frame sampling plumbing for video payloads: one output row per
    * sampled frame index (every `stride`-th of `n_frames`). The real
    * decoder would attach frame bytes; the stub attaches the index. */
  def frameSample(df: DataFrame, nFramesCol: String, stride: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0)), lit(stride))))
}
