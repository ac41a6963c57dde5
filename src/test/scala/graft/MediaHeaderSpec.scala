package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** graft_media_header: container header parsing on hand-crafted byte
  * arrays — happy paths, extra leading chunks/segments, and malformed /
  * truncated payloads (which must yield "unknown"/nulls, never throw). */
class MediaHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def parse(bytes: Array[Byte]): Row =
    Seq(bytes).toDF("payload")
      .select(Multimodal.parseHeader(col("payload")).as("h"))
      .select("h.*").head

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("png: IHDR width/height/depth, channels from color type") {
    // 800x600, bit depth 8, color type 2 (truecolor)
    val png = hex("89504E470D0A1A0A 0000000D 49484452 00000320 00000258 08 02 000000")
    assert(parse(png) === Row("png", 800, 600, null, 3, 8))
    // grey+alpha
    val ga = hex("89504E470D0A1A0A 0000000D 49484452 00000010 00000008 10 04 000000")
    assert(parse(ga) === Row("png", 16, 8, null, 2, 16))
  }

  test("gif: LE16 logical screen size, both 87a and 89a") {
    assert(parse(hex("474946383761 2001 E001 F70000")) === Row("gif", 288, 480, null, null, null))
    assert(parse(hex("474946383961 0A00 0500 F70000")) === Row("gif", 10, 5, null, null, null))
  }

  test("bmp: signed LE32 dims (top-down height reported as magnitude), bpp") {
    val bmp = hex("424D" + "00" * 12 + "28000000" + "40010000" + "F0FFFFFF" + "0100" + "2000")
    assert(parse(bmp) === Row("bmp", 320, 16, null, 4, 32)) // height -16 top-down
  }

  test("jpeg: SOF found after APP/comment segments; RST/standalone markers skipped") {
    val jpeg = hex("FFD8" +
      "FFE0 0010 4A46494600010100000100010000" + // APP0 JFIF
      "FFFE 0006 64756D70" +                      // COM segment
      "FFC2 0011 08 00F0 0140 03 011100 021101 031101") // progressive SOF2 320x240
    assert(parse(jpeg) === Row("jpeg", 320, 240, null, 3, 8))
  }

  test("wav: fmt chunk found after a preceding chunk; odd sizes padded") {
    val wav = hex("52494646 44000000 57415645" +
      "4A554E4B 03000000 AAAAAA 00" + // JUNK chunk, odd size 3 + pad
      "666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000")
    assert(parse(wav) === Row("wav", null, null, 44100, 2, 16))
  }

  test("malformed and truncated payloads degrade to unknown/nulls, never throw") {
    assert(parse(Array.emptyByteArray) === Row("unknown", null, null, null, null, null))
    assert(parse("not media".getBytes) === Row("unknown", null, null, null, null, null))
    // right magic, truncated body
    assert(parse(hex("89504E470D0A1A0A00")) === Row("png", null, null, null, null, null))
    assert(parse(hex("FFD8FFE0")) === Row("jpeg", null, null, null, null, null))
    assert(parse(hex("52494646040000005741564558")).getString(0) === "wav")
    // null payload → null struct
    val r = Seq((1L, null: Array[Byte])).toDF("id", "payload")
      .select(Multimodal.parseHeader(col("payload")).as("h")).head
    assert(r.isNullAt(0))
  }
}
