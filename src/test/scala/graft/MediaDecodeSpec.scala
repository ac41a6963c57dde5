package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Real JDK media decode (§2.4 #40): ImageIO pixels / javax.sound PCM,
  * cross-checked against the header-only native expression. */
class MediaDecodeSpec extends SparkSpec {
  import spark.implicits._

  test("decoded image dims and channel means match the synthesized closed form") {
    // red gradient 50+x over 10×6, g=77, b=200
    val png = Multimodal.synthPng(10, 6, 50, 77, 200)
    val d = Multimodal.decodeImage(png).get
    assert(d.width == 10 && d.height == 6)
    assert(d.meanR == 50 + 4.5) // rBase + (w-1)/2, exact
    assert(d.meanG == 77.0 && d.meanB == 200.0)
    assert(d.meanLum == 0.299 * 54.5 + 0.587 * 77 + 0.114 * 200)
  }

  test("header parse and real decode agree on dimensions (png/bmp/gif/jpeg)") {
    val img = new BufferedImage(23, 11, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 11; x <- 0 until 23) img.setRGB(x, y, (x * 11 + y) << 8)
    val payloads = Seq("png", "bmp", "gif", "jpg").map { fmt =>
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"JDK cannot write $fmt")
      fmt -> bos.toByteArray
    }
    val df = payloads.toDF("fmt", "payload")
    val both = Multimodal.decodeMedia(spark, df)
      .select(col("fmt"), Multimodal.parseHeader(col("payload")).as("hdr"),
        col("decoded"))
      .select(col("fmt"), col("hdr.width").as("hw"), col("hdr.height").as("hh"),
        col("decoded.width").as("dw"), col("decoded.height").as("dh"),
        col("decoded.kind").as("kind"))
      .as[(String, Option[Int], Option[Int], Option[Int], Option[Int], String)]
      .collect()
    assert(both.length == 4)
    both.foreach { case (fmt, hw, hh, dw, dh, kind) =>
      assert(kind == "image", s"$fmt must decode")
      assert(dw.contains(23) && dh.contains(11), s"$fmt decoded dims")
      assert(hw == dw && hh == dh, s"$fmt header dims must equal decoded dims")
    }
  }

  test("wav decode: rate, frames, duration, exact square-wave rms; header agrees") {
    val wav = Multimodal.synthWavSquare(16000, 123, 8192)
    val a = Multimodal.decodeWav(wav).get
    assert(a.sampleRate == 16000 && a.nFrames == 123L)
    assert(a.rms == 8192 / 32768.0) // exactly 0.25
    assert(math.abs(a.durationS - 123.0 / 16000) < 1e-12)
    val hdr = Seq(Tuple1(wav)).toDF("payload")
      .select(Multimodal.parseHeader(col("payload")).as("h"))
      .select("h.format", "h.sample_rate", "h.channels", "h.bit_depth")
      .as[(String, Int, Int, Int)].head()
    assert(hdr == (("wav", 16000, 1, 16)))
  }

  test("resizeImage really rescales payload pixels; non-images pass through") {
    val df = Seq(
      (1L, Multimodal.synthPng(16, 8, 10, 20, 30)),
      (2L, "not an image".getBytes("UTF-8"))
    ).toDF("id", "payload")
    val out = Multimodal.resizeImage(spark, df, 4, 3)
      .select("id", "payload").as[(Long, Array[Byte])].collect().toMap
    val resized = Multimodal.decodeImage(out(1L)).get
    assert(resized.width == 4 && resized.height == 3)
    // constant g/b survive bilinear resampling exactly
    assert(resized.meanG == 20.0 && resized.meanB == 30.0)
    assert(new String(out(2L), "UTF-8") == "not an image")
    // media struct: only ACTUALLY resized rows get new dims — a WAV or
    // text payload must not be stamped as a width x height image
    val mixed = Seq(
      (1L, Multimodal.synthPng(16, 8, 10, 20, 30)),
      (2L, Multimodal.synthWavSquare(8000, 100, 4096)),
      (3L, "plain".getBytes("UTF-8"))
    ).toDF("id", "content")
    val withMedia = Multimodal.toMedia(mixed, "content", "mixed")
    val after = Multimodal.resizeImage(spark, withMedia, 4, 3)
      .select(col("id"), col("media.width"), col("media.height"), col("media.n_bytes"),
        octet_length(col("payload")).cast("long"))
      .as[(Long, Option[Int], Option[Int], Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(after(1L)._2.contains(4) && after(1L)._3.contains(3))
    assert(after(1L)._4 === after(1L)._5, "resized row's n_bytes refreshed")
    assert(after(2L)._2.isEmpty && after(2L)._3.isEmpty, "WAV keeps null dims")
    assert(after(3L)._2.isEmpty && after(3L)._3.isEmpty, "text keeps null dims")
  }

  test("corrupt and truncated payloads yield null decode, never an exception") {
    val junk = Array.tabulate(64)(i => (i * 37 + 11).toByte)
    val truncatedPng = Multimodal.synthPng(8, 8, 0, 0, 0).take(20)
    val df = Seq((1L, junk), (2L, truncatedPng), (3L, Array.empty[Byte]))
      .toDF("id", "payload")
    val kinds = Multimodal.decodeMedia(spark, df)
      .select("id", "decoded.kind").as[(Long, Option[String])].collect().toMap
    assert(kinds.values.forall(_.isEmpty))
  }

  test("animated GIF frame sampling decodes only the sampled frames, exactly") {
    val gif = Multimodal.synthGif(6, 3, Seq(10, 60, 110, 160))
    val frames = Multimodal.sampleGifFrames(gif, stride = 2)
    assert(frames.map(f => (f._1, f._2, f._3, f._4)) === Seq((0, 4, 6, 3), (2, 4, 6, 3)))
    assert(frames.map(_._5) === Seq(10.0, 110.0), "solid gray levels decode exactly")
    assert(frames.map(f => (f._6, f._7)) === Seq((10.0, 10.0), (110.0, 110.0)))
    // stride 1 decodes all four; single-frame formats yield frame 0
    assert(Multimodal.sampleGifFrames(gif, 1).map(_._1) === Seq(0, 1, 2, 3))
    val png = Multimodal.synthPng(5, 5, 20, 30, 40)
    assert(Multimodal.sampleGifFrames(png, 2).map(f => (f._1, f._2)) === Seq((0, 1)))
    // corrupt payloads yield no frames, never an exception
    assert(Multimodal.sampleGifFrames(Array.tabulate(32)(_.toByte), 2) === Nil)
    // operator form: rows explode per sampled frame
    val df = Seq((7L, gif)).toDF("id", "payload")
    val rows = Multimodal.decodeFrames(spark, df, stride = 3)
      .select("id", "frame_idx", "mean_r").as[(Long, Int, Double)].collect().sorted
    assert(rows === Array((7L, 0, 10.0), (7L, 3, 160.0)))
  }

  test("oversized header dims bail before pixel allocation (bomb guard)") {
    val png = Multimodal.synthPng(8, 8, 1, 2, 3)
    // patch IHDR to claim 65535 x 65535 (4.3 G pixels)
    val bomb = png.clone()
    bomb(16) = 0; bomb(17) = 0; bomb(18) = 0xFF.toByte; bomb(19) = 0xFF.toByte
    bomb(20) = 0; bomb(21) = 0; bomb(22) = 0xFF.toByte; bomb(23) = 0xFF.toByte
    assert(Multimodal.decodeImage(bomb).isEmpty, "must refuse, not allocate")
    // features falls back to the byte histogram rather than decoding
    val f = Multimodal.features(bomb, 8)
    assert(math.abs(f.sum - 1.0f) < 1e-6)
    // non-positive dims return empty instead of NegativeArraySizeException
    assert(Multimodal.features("x".getBytes("UTF-8"), -1).isEmpty)
    assert(Multimodal.features("x".getBytes("UTF-8"), 0).isEmpty)
  }

  test("features are real per-modality signals") {
    val dim = 8
    // solid black image → all luminance mass in bin 0
    val black = Multimodal.features(Multimodal.synthPng(6, 6, 0, 0, 0), dim)
    assert(black(0) == 1.0f && black.drop(1).forall(_ == 0f))
    // solid white → all mass in the top bin
    val white = Multimodal.features(Multimodal.synthPng(6, 6, 255 - 5, 255, 255), dim)
    assert(white(dim - 1) > 0.8f)
    // constant-amplitude square wave → flat RMS envelope at amp/32768
    val env = Multimodal.features(Multimodal.synthWavSquare(8000, 800, 16384), dim)
    assert(env.forall(v => math.abs(v - 0.5f) < 1e-6))
    // non-media → normalized byte histogram
    val text = Multimodal.features("aaab".getBytes("US-ASCII"), dim)
    assert(math.abs(text.sum - 1.0f) < 1e-6 && text(('a' / 32)) == 1.0f)
  }
}
