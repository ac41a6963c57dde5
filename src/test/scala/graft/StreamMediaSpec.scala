package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Route}
import graft.streaming.Streams

/** Multimodal + streaming composition: a binary file stream routed by
  * container format parsed from the first bytes — the
  * GetFile → IdentifyMimeType → RouteOnAttribute media flow as one
  * declarative streaming plan, no decode. */
class StreamMediaSpec extends SparkSpec {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("binary file stream routes by parsed media header") {
    val dir = Files.createTempDirectory("graft_media_stream")
    // 64x32 greyscale PNG header + a 22050 Hz mono WAV header + garbage
    Files.write(dir.resolve("a.png"),
      hex("89504E470D0A1A0A 0000000D 49484452 00000040 00000020 08 00 000000"))
    Files.write(dir.resolve("b.wav"),
      hex("52494646 24000000 57415645 666D7420 10000000 0100 0100 22560000 44AC0000 0200 1000"))
    Files.write(dir.resolve("c.bin"), "not media at all".getBytes)
    val parsed = Streams.binaryFileStream(spark, dir.toString)
      .withColumn("hdr", Multimodal.parseHeader(col("content")))
    val routed = Route.tagged(parsed, Seq(
        "image" -> col("hdr.format").isin("png", "jpeg", "gif", "bmp"),
        "audio" -> (col("hdr.format") === "wav")))
      .select(col("path"), col("route"), col("hdr.width").as("w"),
        col("hdr.sample_rate").as("rate"))
    val q = Streams.toMemorySink(routed, "media_stream")
    q.processAllAvailable(); q.stop()
    val rows = spark.table("media_stream")
      .select(element_at(split(col("path"), "/"), -1), col("route"), col("w"), col("rate"))
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), if (r.isNullAt(3)) -1 else r.getInt(3)))
      .toSet
    assert(rows === Set(
      ("a.png", "image", 64, -1),
      ("b.wav", "audio", -1, 22050),
      ("c.bin", "unmatched", -1, -1)))
  }
}
