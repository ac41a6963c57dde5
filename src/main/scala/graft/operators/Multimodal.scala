package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (SURVEY.md §2.4 #40).
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct. Decode is REAL and JDK-only: `javax.imageio.ImageIO` for
  * PNG/JPEG/GIF/BMP pixels, `javax.sound.sampled` for WAV PCM — no
  * external codec jars. All decode work runs batched inside
  * `mapPartitions` with reusable row/sample buffers (the shape a heavier
  * codec or model runtime would want), and a payload that fails to
  * decode yields nulls, never an exception — one corrupt file among
  * billions must not fail the job.
  *
  * Reference behavior: NiFi media flows pair IdentifyMimeType with
  * metadata/feature extraction before routing; `parseHeader` (native
  * expression, header bytes only) is the cheap route/filter step and
  * [[decodeMedia]]/[[extractFeatures]] are the paid decode that runs
  * after filtering.
  */
object Multimodal {

  // ImageIO's default stream cache spills to disk temp files — at a
  // payload per row that is an fs metadata storm; decode in memory.
  ImageIO.setUseCache(false)

  /** Decompression-bomb guard: a corrupt/adversarial header can declare
    * e.g. 65500×65500 px, and letting ImageIO allocate that
    * BufferedImage throws OutOfMemoryError — an Error no
    * `catch Exception` contains, killing the executor. Every decode
    * path checks HEADER dimensions (reader metadata only, no pixel
    * allocation) against this cap first and bails to None above it.
    * 64 MP ≈ 256 MB of INT_RGB — roomy for real data, far below
    * task-killing. */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** Dimension-capped ImageIO read: header dims first, full decode only
    * when w*h fits [[MaxDecodePixels]]. Null when unreadable/oversized. */
  private def readImageCapped(payload: Array[Byte]): BufferedImage = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val w = reader.getWidth(0).toLong
        val h = reader.getHeight(0).toLong
        if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) null
        else reader.read(0)
      } finally reader.dispose()
    } finally iis.close()
  }

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

  // ------------------------------------------------------------- decode

  final case class DecodedImage(width: Int, height: Int, meanR: Double,
                                meanG: Double, meanB: Double, meanLum: Double)
  final case class DecodedAudio(sampleRate: Int, nFrames: Long,
                                durationS: Double, rms: Double)

  /** REAL image decode (JDK ImageIO: PNG/JPEG/GIF/BMP): verified pixel
    * dimensions plus per-channel means and BT.601 mean luminance,
    * accumulated through a reusable one-row buffer. None on anything
    * ImageIO can't decode. */
  def decodeImage(payload: Array[Byte]): Option[DecodedImage] = {
    if (payload == null || payload.length < 8) return None
    try {
      val img = readImageCapped(payload)
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      var sr = 0.0; var sg = 0.0; var sb = 0.0
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val px = rowBuf(x)
          sr += (px >>> 16) & 0xFF
          sg += (px >>> 8) & 0xFF
          sb += px & 0xFF
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * h
      val mr = sr / n; val mg = sg / n; val mb = sb / n
      Some(DecodedImage(w, h, mr, mg, mb, 0.299 * mr + 0.587 * mg + 0.114 * mb))
    } catch { case _: Exception => None }
  }

  /** REAL WAV PCM decode (JDK javax.sound.sampled): sample rate, frame
    * count, duration, and RMS amplitude of the normalized 16-bit signal,
    * streamed through a reusable frame buffer (payloads never fully
    * expanded to a sample array). None for non-PCM16 or undecodable. */
  def decodeWav(payload: Array[Byte]): Option[DecodedAudio] = {
    if (payload == null || payload.length < 44) return None
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) return None
        val le = !fmt.isBigEndian
        val buf = new Array[Byte](math.max(fmt.getFrameSize, 2) * 4096)
        var sumSq = 0.0
        var nSamp = 0L
        var read = ais.read(buf)
        while (read > 0) {
          var i = 0
          while (i + 1 < read) {
            val s =
              if (le) ((buf(i) & 0xFF) | (buf(i + 1) << 8)).toShort
              else (((buf(i) & 0xFF) << 8) | (buf(i + 1) & 0xFF)).toShort
            val v = s / 32768.0
            sumSq += v * v
            nSamp += 1
            i += 2
          }
          read = ais.read(buf)
        }
        if (nSamp == 0) return None
        val rate = fmt.getSampleRate.toInt
        val frames = nSamp / fmt.getChannels
        Some(DecodedAudio(rate, frames, frames.toDouble / rate,
          math.sqrt(sumSq / nSamp)))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  val decodedType: StructType = StructType(Seq(
    StructField("kind", StringType), // image | audio | null = undecodable
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType),
    StructField("mean_lum", DoubleType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_s", DoubleType),
    StructField("rms", DoubleType)))

  private def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private val nullDecoded: Row =
    Row(null, null, null, null, null, null, null, null, null, null, null)

  private def decodedRow(b: Array[Byte]): Row =
    if (isWav(b))
      decodeWav(b).map(a => Row("audio", null, null, null, null, null, null,
        a.sampleRate, a.nFrames, a.durationS, a.rms)).getOrElse(nullDecoded)
    else
      decodeImage(b).map(i => Row("image", i.width, i.height, i.meanR, i.meanG,
        i.meanB, i.meanLum, null, null, null, null)).getOrElse(nullDecoded)

  /** REAL decode operator: adds a `decoded` struct ([[decodedType]]) per
    * payload — verified pixel dims + channel means + luminance for
    * images, sample rate + frames + duration + RMS for WAV. Runs
    * partition-wise; a payload neither decoder accepts yields an
    * all-null struct (job never fails on corrupt bytes). */
  def decodeMedia(spark: SparkSession, df: DataFrame,
                  payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema.add(StructField("decoded", decodedType))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        Row.fromSeq(r.toSeq :+ decodedRow(r.getAs[Array[Byte]](idx)))
      }
    }(enc)
  }

  // ----------------------------------------------------------- features

  /** REAL feature extraction from payload bytes, `dim` floats:
    *  - decodable image → normalized luminance histogram (`dim` bins);
    *  - decodable WAV   → RMS energy envelope over `dim` equal windows;
    *  - anything else   → normalized byte-value histogram (`dim` bins) —
    *    a real signal (magic/encoding distribution), not a fake.
    * Deterministic; distinct payloads of different composition map to
    * distinct vectors. */
  def features(payload: Array[Byte], dim: Int): Array[Float] = {
    if (dim <= 0) return Array.emptyFloatArray // before the dim-sized alloc
    val out = new Array[Float](dim)
    if (payload == null || payload.isEmpty) return out
    if (isWav(payload)) {
      wavEnvelope(payload, dim) match {
        case Some(env) => return env
        case None      => ()
      }
    } else if (looksLikeImage(payload)) {
      luminanceHistogram(payload, dim) match {
        case Some(hist) => return hist
        case None       => ()
      }
    }
    // byte-value histogram: bin i counts bytes in [i*256/dim, (i+1)*256/dim)
    var i = 0
    while (i < payload.length) {
      out((payload(i) & 0xFF) * dim / 256) += 1f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) /= payload.length; j += 1 }
    out
  }

  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||            // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
      (b(0) == 'B' && b(1) == 'M'))

  private def luminanceHistogram(payload: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      val img = readImageCapped(payload)
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      val out = new Array[Float](dim)
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val px = rowBuf(x)
          val lum = (299 * ((px >>> 16) & 0xFF) + 587 * ((px >>> 8) & 0xFF) +
            114 * (px & 0xFF)) / 1000
          out(lum * dim / 256) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      var j = 0
      while (j < dim) { out(j) /= n; j += 1 }
      Some(out)
    } catch { case _: Exception => None }

  private def wavEnvelope(payload: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) return None
        val le = !fmt.isBigEndian
        val all = ais.readAllBytes() // payload-bounded; WAV already in memory
        val nSamp = all.length / 2
        if (nSamp == 0) return None
        val out = new Array[Float](dim)
        val cnt = new Array[Int](dim)
        var k = 0
        while (k < nSamp) {
          val i = k * 2
          val s =
            if (le) ((all(i) & 0xFF) | (all(i + 1) << 8)).toShort
            else (((all(i) & 0xFF) << 8) | (all(i + 1) & 0xFF)).toShort
          val v = (s / 32768.0).toFloat
          val bin = math.min(dim - 1, (k.toLong * dim / nSamp).toInt)
          out(bin) += v * v
          cnt(bin) += 1
          k += 1
        }
        var j = 0
        while (j < dim) {
          out(j) = if (cnt(j) > 0) math.sqrt(out(j) / cnt(j)).toFloat else 0f
          j += 1
        }
        Some(out)
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Partition-wise REAL feature extraction over the payload column:
    * adds `features array<float>` (see [[features]] for the per-modality
    * definition). Per-partition init happens in the `mapPartitions`
    * closure — where a heavier codec/model runtime would load once. */
  def extractFeatures(spark: SparkSession, df: DataFrame,
                      payloadCol: String = "payload", dim: Int = 16): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ features(payload, dim).toSeq)
      }
    }(enc)
  }

  /** Batched variant of [[extractFeatures]]: payloads are decoded in
    * groups of `batchSize` — the iterator shape a heavy codec/model
    * wants (amortized dispatch, contiguous buffers), mirroring
    * `mapInPandas` batch semantics on PySpark clusters. Output identical
    * to the per-row path. */
  def extractFeaturesBatched(spark: SparkSession, df: DataFrame,
                             payloadCol: String = "payload", dim: Int = 16,
                             batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val feats = batch.map(r => features(r.getAs[Array[Byte]](idx), dim))
        batch.iterator.zip(feats.iterator).map { case (r, f) =>
          Row.fromSeq(r.toSeq :+ f.toSeq)
        }
      }
    }(enc)
  }

  // ------------------------------------------------------------- resize

  /** REAL image resize: decodable image payloads are decoded (ImageIO),
    * scaled to `width`×`height` (bilinear), and re-encoded as PNG in
    * place; non-image payloads pass through untouched. If a `media`
    * struct column exists, its width/height/n_bytes are refreshed ONLY
    * on rows actually resized — a WAV or corrupt payload must not be
    * stamped with image dimensions it doesn't have. */
  def resizeImage(spark: SparkSession, df: DataFrame, width: Int, height: Int,
                  payloadCol: String = "payload"): DataFrame = {
    require(width > 0 && height > 0, "resize target must be positive")
    val idx = df.schema.fieldIndex(payloadCol)
    // media sub-field positions resolved by NAME at plan time (the
    // struct may be a superset or reordering of metaType)
    val mediaFields: Option[(Int, Int, Int, Int)] =
      df.schema.fieldNames.indexOf("media") match {
        case -1 => None
        case mi => df.schema(mi).dataType match {
          case t: StructType
            if Seq("n_bytes", "width", "height").forall(t.fieldNames.contains) =>
            Some((mi, t.fieldIndex("n_bytes"), t.fieldIndex("width"),
              t.fieldIndex("height")))
          case _ => None
        }
      }
    val enc = RowEncoder.encoderFor(df.schema)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val resized: Option[Array[Byte]] =
          try {
            val img =
              if (payload == null) null
              else readImageCapped(payload)
            if (img == null) None
            else {
              val dst = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              try {
                g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, width, height, null)
              } finally g.dispose()
              val bos = new ByteArrayOutputStream()
              ImageIO.write(dst, "png", bos)
              Some(bos.toByteArray)
            }
          } catch { case _: Exception => None }
        resized match {
          case None => r
          case Some(bytes) =>
            val base = r.toSeq.updated(idx, bytes)
            val withMedia = mediaFields match {
              case Some((mi, nbI, wI, hI)) if !r.isNullAt(mi) =>
                val m = r.getStruct(mi)
                base.updated(mi, Row.fromSeq(m.toSeq
                  .updated(nbI, bytes.length.toLong)
                  .updated(wI, width)
                  .updated(hI, height)))
              case _ => base
            }
            Row.fromSeq(withMedia)
        }
      }
    }(enc)
  }

  // -------------------------------------------------------------- synth

  /** Deterministic REAL PNG: `w`×`h` with red gradient `rBase + x` along
    * x and constant g/b — encoded by the same JDK ImageIO the decoder
    * reads back, so channel means have the closed form
    * (rBase + (w-1)/2, g, b). Test/oracle payload generator. */
  /** Deterministic REAL PNG with 2×2-constant blocks: 18×16 pixels
    * whose red channel is `cell(i, j)` for block (i, j) ∈ 9×8 (g/b
    * constant). Because every [[dHash64]] resample box aligns exactly
    * with one block, the box means ARE the cell values — which makes
    * the perceptual hash of these payloads closed-form for a SQL
    * oracle. Test/oracle payload generator. */
  def synthBlockPng(cell: (Int, Int) => Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(18, 16, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 18) {
        val r = cell(x / 2, y / 2) & 0xFF
        img.setRGB(x, y, (r << 16) | ((g & 0xFF) << 8) | (b & 0xFF))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Difference hash (dHash, Krawetz's public formulation): decode,
    * box-resample the luminance plane to a 9×8 grid (plain box means —
    * exact when boxes align with pixel blocks), and emit one bit per
    * horizontally adjacent pair: '1' iff lum(i+1, j) > lum(i, j).
    * Returned as a 64-char '0'/'1' string (bit k ⇒ i = k%8, j = k/8) —
    * engine-portable, no 64-bit sign pitfalls. None when undecodable
    * or smaller than the 9×8 grid. */
  def dHash64(payload: Array[Byte]): Option[String] = {
    if (payload == null || payload.length < 8) return None
    try {
      val img = readImageCapped(payload)
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w < 9 || h < 8) return None
      val grid = Array.ofDim[Double](8, 9)
      val rowBuf = new Array[Int](w)
      // accumulate exact box sums: pixel (x, y) belongs to grid cell
      // (gx, gy) with ranges [gx·w/9, (gx+1)·w/9) × [gy·h/8, (gy+1)·h/8)
      val counts = Array.ofDim[Long](8, 9)
      var y = 0
      while (y < h) {
        val gy = math.min(7, y * 8 / h)
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val gx = math.min(8, x * 9 / w)
          val px = rowBuf(x)
          val lum = 0.299 * ((px >>> 16) & 0xFF) + 0.587 * ((px >>> 8) & 0xFF) +
            0.114 * (px & 0xFF)
          grid(gy)(gx) += lum
          counts(gy)(gx) += 1
          x += 1
        }
        y += 1
      }
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < 8) {
        var i = 0
        while (i < 8) {
          val a = grid(j)(i) / counts(j)(i)
          val bl = grid(j)(i + 1) / counts(j)(i + 1)
          sb.append(if (bl > a) '1' else '0')
          i += 1
        }
        j += 1
      }
      Some(sb.toString)
    } catch { case _: Exception => None }
  }

  /** Image near-dup pairs by perceptual hash: [[dHash64]] per payload
    * (bounded mapPartitions decode, same posture as [[decodeMedia]]),
    * then band the 64-bit hash into four 16-bit substrings and join on
    * (band index, band value) — by pigeonhole, any pair within
    * `maxHamming` ≤ 3 shares at least one identical band, so banding
    * loses NOTHING at the default threshold and the output is the
    * EXACT global hamming-≤t pair set. Candidates verify with a
    * 64-position compare; pairs dedupe across bands. One shuffle on
    * the band key; candidate volume is governed by band collisions
    * (16-bit bands ⇒ 65536 buckets per band index). */
  /** Per-row [[dHash64]] over a binary payload column (bounded
    * mapPartitions decode, same posture as [[decodeMedia]]); rows that
    * fail to decode are dropped. Output: (id, dhash). */
  def dHashes(spark: SparkSession, df: DataFrame, idCol: String,
              payloadCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("p"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => dHash64(p).map(h => (id, h)) })
      .toDF("id", "dhash")
  }

  def imageNearDupPairs(spark: SparkSession, df: DataFrame, idCol: String,
                        payloadCol: String, maxHamming: Int = 3): DataFrame =
    hammingNearDupPairs(dHashes(spark, df, idCol, payloadCol), maxHamming)

  /** Banded near-dup pairs over ANY 64-char '0'/'1' hash column
    * (id, dhash) — shared by the image dHash and audio envelope-hash
    * paths. */
  def hammingNearDupPairs(hashed: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4x16-bit banding guarantees recall only to hamming 3; got $maxHamming")
    // candidates carry the hash as two packed 32-bit words, not the
    // 64-char string: the verify compare is then codegen'd
    // bit_count(xor) (~ns/pair) instead of an interpreted
    // split/zip_with lambda (~30 µs/pair — measured to dominate at a
    // few million candidates)
    //
    // r19: materialize the packed hashes BEFORE the banded self-join —
    // both join sides otherwise re-evaluate `hashed`, and for the
    // media callers `hashed` is the per-row payload DECODE (every GIF
    // frame / WAV sample walked), so the decode ran twice per query.
    // The checkpointed frame is (id, hash, 2 longs) per row — the
    // guide-§8 shape: move the heavy decode once, self-join the proxy.
    val packed = hashed.select(col("id"), col("dhash"),
      conv(substring(col("dhash"), 1, 32), 2, 10).cast("long").as("h1"),
      conv(substring(col("dhash"), 33, 32), 2, 10).cast("long").as("h2"))
      .localCheckpoint(true)
    val bands = packed.select(col("id"), col("h1"), col("h2"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), substring(col("dhash"), b * 16 + 1, 16).as("bv"))): _*))
        .as("bk"))
      .select(col("id"), col("h1"), col("h2"),
        col("bk.band").as("band"), col("bk.bv").as("bv"))
    val ham = (bit_count(col("a.h1").bitwiseXOR(col("b.h1"))) +
      bit_count(col("a.h2").bitwiseXOR(col("b.h2")))).cast("long")
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        ham.as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Envelope difference-hash for PCM16 WAV audio — the audio analog
    * of [[dHash64]]: decode (javax.sound, same path as [[decodeWav]]),
    * box-mean the ABSOLUTE sample amplitude into 65 equal frame boxes,
    * emit one bit per adjacent box pair: '1' iff env(i+1) > env(i).
    * Robust to gain-independent structure the way dHash is to
    * brightness: comparisons see only the envelope SHAPE. 64-char
    * '0'/'1' string; None when undecodable, non-PCM16, or shorter than
    * 65 frames. Box means are exact integers when boxes align with
    * constant-amplitude segments (the synth generator below), making
    * the bits closed-form for a SQL oracle. */
  def audioEnvelopeHash64(payload: Array[Byte]): Option[String] = {
    if (payload == null || payload.length < 44) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) return None
        val frames = in.getFrameLength
        if (frames < 65) return None
        val sums = new Array[Double](65)
        val counts = new Array[Long](65)
        val buf = new Array[Byte](4096)
        var frameIdx = 0L
        var read = in.read(buf)
        val le = !fmt.isBigEndian
        while (read > 0) {
          var o = 0
          while (o + 1 < read) {
            val lo = buf(o) & 0xFF; val hi = buf(o + 1) & 0xFF
            val s = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toInt
            val box = math.min(64L, frameIdx * 65L / frames).toInt
            sums(box) += math.abs(s)
            counts(box) += 1
            frameIdx += 1
            o += 2
          }
          read = in.read(buf)
        }
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i < 64) {
          val a = sums(i) / counts(i)
          val b = sums(i + 1) / counts(i + 1)
          sb.append(if (b > a) '1' else '0')
          i += 1
        }
        Some(sb.toString)
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Per-row [[audioEnvelopeHash64]] over a binary payload column
    * (bounded mapPartitions decode); undecodable rows drop. */
  def audioHashes(spark: SparkSession, df: DataFrame, idCol: String,
                  payloadCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("p"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => audioEnvelopeHash64(p).map(h => (id, h)) })
      .toDF("id", "dhash")
  }

  /** Audio near-dup pairs by envelope hash: [[audioEnvelopeHash64]] +
    * the shared lossless-at-hamming-3 banding
    * ([[hammingNearDupPairs]]). */
  def audioNearDupPairs(spark: SparkSession, df: DataFrame, idCol: String,
                        payloadCol: String, maxHamming: Int = 3): DataFrame =
    hammingNearDupPairs(audioHashes(spark, df, idCol, payloadCol), maxHamming)

  /** Temporal difference-hash for multi-frame video-like payloads
    * (animated GIF — the container this engine decodes for real): the
    * per-frame mean-luminance sequence box-means into 65 equal frame
    * boxes, one bit per adjacent pair ('1' iff lum(i+1) > lum(i)) —
    * the TEMPORAL analog of [[dHash64]]'s spatial compare, robust to
    * global brightness the way dHash is. Decodes every frame via
    * [[sampleGifFrames]] (stride 1); None when undecodable or shorter
    * than 65 frames. With exactly 65 frames each box IS one frame, so
    * the bits are closed-form for constant-color synthetic frames
    * ([[synthGif]]). */
  def videoFrameHash64(payload: Array[Byte]): Option[String] = {
    val frames = sampleGifFrames(payload, 1)
    val n = frames.length
    if (n < 65) return None
    val sums = new Array[Double](65)
    val counts = new Array[Long](65)
    frames.foreach { case (idx, _, _, _, mr, mg, mb) =>
      val box = math.min(64L, idx.toLong * 65L / n).toInt
      sums(box) += 0.299 * mr + 0.587 * mg + 0.114 * mb
      counts(box) += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < 64) {
      val a = sums(i) / counts(i)
      val b = sums(i + 1) / counts(i + 1)
      sb.append(if (b > a) '1' else '0')
      i += 1
    }
    Some(sb.toString)
  }

  /** Per-row [[videoFrameHash64]] over a binary payload column
    * (bounded mapPartitions decode); undecodable rows drop. */
  def videoHashes(spark: SparkSession, df: DataFrame, idCol: String,
                  payloadCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("p"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => videoFrameHash64(p).map(h => (id, h)) })
      .toDF("id", "dhash")
  }

  /** Video near-dup pairs by temporal hash — shared lossless banding
    * ([[hammingNearDupPairs]]). */
  def videoNearDupPairs(spark: SparkSession, df: DataFrame, idCol: String,
                        payloadCol: String, maxHamming: Int = 3): DataFrame =
    hammingNearDupPairs(videoHashes(spark, df, idCol, payloadCol), maxHamming)

  /** Deterministic REAL WAV with 65 constant-amplitude segments:
    * `framesPerSeg` frames of an alternating ±`amps(s)` square wave
    * per segment s — every [[audioEnvelopeHash64]] box aligns exactly
    * with one segment, so the box abs-means ARE the amplitudes and the
    * envelope hash of these payloads is closed-form for a SQL oracle.
    * Test/oracle payload generator. */
  def synthWavSegments(amps: Seq[Int], framesPerSeg: Int, rate: Int = 16000): Array[Byte] = {
    require(amps.length == 65, s"need 65 segment amplitudes, got ${amps.length}")
    val nFrames = 65 * framesPerSeg
    val dataLen = nFrames * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)
      .putShort(1)
      .putInt(rate)
      .putInt(rate * 2)
      .putShort(2)
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nFrames) {
      val amp = amps(i / framesPerSeg)
      out.putShort(if (i % 2 == 0) amp.toShort else (-amp).toShort)
      i += 1
    }
    out.array()
  }

  def synthPng(w: Int, h: Int, rBase: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((rBase + x) << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic REAL WAV (PCM16 LE mono): `nFrames` samples of an
    * alternating ±`amp` square wave at `rate` Hz — RMS is exactly
    * amp/32768. Test/oracle payload generator. */
  def synthWavSquare(rate: Int, nFrames: Int, amp: Int): Array[Byte] = {
    val dataLen = nFrames * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)            // PCM
      .putShort(1)            // mono
      .putInt(rate)
      .putInt(rate * 2)       // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nFrames) {
      out.putShort(if (i % 2 == 0) amp.toShort else (-amp).toShort)
      i += 1
    }
    out.array()
  }

  /** Deterministic REAL animated GIF: one solid-gray frame per entry in
    * `grays`, written by the JDK ImageIO sequence writer — the decoder
    * reads the exact gray levels back (solid frames quantize losslessly
    * to one palette entry). Test/oracle payload generator. */
  def synthGif(w: Int, h: Int, grays: Seq[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      grays.foreach { g =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g2 = img.createGraphics()
        try { g2.setColor(new java.awt.Color(g, g, g)); g2.fillRect(0, 0, w, h) }
        finally g2.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** REAL frame sampling decode: every `stride`-th frame of a
    * multi-frame payload (animated GIF; single-frame formats yield
    * frame 0), with per-frame pixel statistics. One reader per payload,
    * frames read on demand — only the SAMPLED frames are decoded.
    * Empty for undecodable payloads. */
  def sampleGifFrames(payload: Array[Byte], stride: Int): Seq[(Int, Int, Int, Int, Double, Double, Double)] = {
    if (payload == null || payload.length < 6 || stride <= 0) return Nil
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Nil
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          // collecting loop with a local bail-out flag — NOT a non-local
          // return from inside a closure, which would ride on deprecated
          // NonLocalReturnControl and be swallowed by any intermediate
          // Throwable handler
          val out = Seq.newBuilder[(Int, Int, Int, Int, Double, Double, Double)]
          var oversized = false
          var i = 0
          while (i < n && !oversized) {
            // header dims before pixel allocation (see MaxDecodePixels);
            // one oversized frame marks the whole payload undecodable
            if (reader.getWidth(i).toLong * reader.getHeight(i) > MaxDecodePixels)
              oversized = true
            else {
              val img = reader.read(i)
              val w = img.getWidth; val h = img.getHeight
              var sr = 0.0; var sg = 0.0; var sb = 0.0
              val rowBuf = new Array[Int](w)
              var y = 0
              while (y < h) {
                img.getRGB(0, y, w, 1, rowBuf, 0, w)
                var x = 0
                while (x < w) {
                  val px = rowBuf(x)
                  sr += (px >>> 16) & 0xFF; sg += (px >>> 8) & 0xFF; sb += px & 0xFF
                  x += 1
                }
                y += 1
              }
              val cnt = w.toDouble * h
              out += ((i, n, w, h, sr / cnt, sg / cnt, sb / cnt))
            }
            i += stride
          }
          if (oversized) Nil else out.result()
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => Nil }
  }

  /** Partition-wise REAL frame-sampling operator: one output row per
    * sampled frame — input columns + (frame_idx, n_frames, frame_w,
    * frame_h, mean_r, mean_g, mean_b). The decode-only-sampled-frames
    * contract is what survives video-scale payloads: cost is
    * frames/stride, not frames. */
  def decodeFrames(spark: SparkSession, df: DataFrame, stride: Int,
                   payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema
      .add(StructField("frame_idx", IntegerType))
      .add(StructField("n_frames", IntegerType))
      .add(StructField("frame_w", IntegerType))
      .add(StructField("frame_h", IntegerType))
      .add(StructField("mean_r", DoubleType))
      .add(StructField("mean_g", DoubleType))
      .add(StructField("mean_b", DoubleType))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        sampleGifFrames(r.getAs[Array[Byte]](idx), stride).map {
          case (i, n, w, h, mr, mg, mb) =>
            // Seq[Any]: a mixed Int/Double Seq literal would widen the
            // ints to Double and break the encoder's INT columns
            Row.fromSeq(r.toSeq ++ Seq[Any](i, n, w, h, mr, mg, mb))
        }
      }
    }(enc)
  }

  /** Header metadata (REAL, native expression): parse container headers
    * (PNG/JPEG/GIF/BMP/WAV) from the payload's first bytes — the
    * route/filter step that runs on every payload BEFORE any decode.
    * One pass over the header region only. */
  def parseHeader(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.plans.MediaExpressions.mediaHeader(payload)

  /** Frame sampling plumbing for video payloads: one output row per
    * sampled frame index (every `stride`-th of `n_frames`). */
  def frameSample(df: DataFrame, nFramesCol: String, stride: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0)), lit(stride))))
}
