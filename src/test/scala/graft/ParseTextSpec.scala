package graft

import org.apache.spark.sql.functions._
import graft.operators.{Parse, Records}

class ParseTextSpec extends SparkSpec {
  import spark.implicits._

  test("countText counts lines, words, chars") {
    val df = Seq((1L, "one two\nthree"), (2L, ""), (3L, "a\n\nb ")).toDF("id", "text")
    val out = Records.countText(df, "text")
      .select("id", "n_lines", "n_words", "n_chars").as[(Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, 2L, 3L, 13L)))
    assert(out(1) == ((2L, 1L, 0L, 0L)))   // empty text: one (empty) line
    assert(out(2) == ((3L, 3L, 2L, 5L)))   // trailing blank line kept
  }

  test("encode/decode content round-trips base64 and hex") {
    val df = Seq((1L, "hello graft")).toDF("id", "payload")
    val enc = Records.encodeContent(
      Records.encodeContent(df, "payload", "base64", "b64"), "payload", "hex", "hx")
    val row = enc.select("b64", "hx").as[(String, String)].collect()(0)
    assert(row._1 == java.util.Base64.getEncoder.encodeToString("hello graft".getBytes("UTF-8")))
    assert(row._2.equalsIgnoreCase("hello graft".getBytes("UTF-8").map("%02x".format(_)).mkString))
    val rt = Records.decodeContent(enc, "b64", "base64", "back")
      .select(col("back").cast("string")).as[String].collect()(0)
    assert(rt == "hello graft")
    intercept[IllegalArgumentException](Records.encodeContent(df, "payload", "rot13"))
  }

  test("replaceWithMapping applies mappings in order") {
    val df = Seq((1L, "aa b")).toDF("id", "text")
    // "aa"->"b" first, then "b"->"c": order matters
    val out = Records.replaceWithMapping(df, "text", Seq("aa" -> "b", "b" -> "c"), "r")
      .select("r").as[String].collect()(0)
    assert(out == "c c")
  }

  test("routeText routes lines by first matching regex") {
    val df = Seq((1L, "has 7 digits\nno numerals here\nERROR: boom")).toDF("id", "text")
    val out = Records.routeText(df, "text",
        Seq("numbered" -> "[0-9]", "error" -> "^ERROR"))
      .select("line_no", "route").as[(Int, String)].collect().toSet
    assert(out === Set((0, "numbered"), (1, "unmatched"), (2, "error")))
  }

  test("splitJson explodes array elements with positions") {
    val df = Seq((1L, """[{"k":1},{"k":2},null]"""), (2L, """[5]""")).toDF("id", "arr")
    val out = Records.splitJson(df, "arr")
      .select("id", "pos", "element").as[(Long, Int, Option[String])].collect().toSet
    assert(out.contains((1L, 0, Some("""{"k":1}"""))))
    assert(out.contains((1L, 2, None)))
    assert(out.contains((2L, 0, Some("5"))))
  }

  test("removeField and renameField handle struct fields") {
    val df = Seq((1L, ("x", 2L, 3.0))).toDF("id", "m")
      .select(col("id"), col("m").cast("struct<a:string,b:bigint,c:double>"))
    val out = Records.renameField(Records.removeField(df, "m.c"), "m.a", "z")
    assert(out.select("m.*").columns.toSeq == Seq("b", "z"))
    assert(out.select("m.z").as[String].collect()(0) == "x")
    // top-level variants
    assert(Records.removeField(df, "m").columns.toSeq == Seq("id"))
    assert(Records.renameField(df, "id", "key").columns.contains("key"))
  }

  test("compileGrok builds capture regex; extractGrok extracts and nulls non-matches") {
    val (re, names) = Parse.compileGrok("%{INT:a} [%{WORD:b}] %{NUMBER}")
    assert(names == Seq("a", "b"))
    assert("42 [hi] 3.5".matches(re))
    assert(!"42 hi 3.5".matches(re))
    val df = Seq((1L, "7 [click] 1.5"), (2L, "garbage")).toDF("id", "line")
    val out = Parse.extractGrok(df, "line", "%{INT:a} [%{WORD:b}] %{NUMBER}")
      .select("id", "a", "b").as[(Long, Option[String], Option[String])].collect().sortBy(_._1)
    assert(out(0) == ((1L, Some("7"), Some("click"))))
    assert(out(1) == ((2L, None, None)))
    intercept[IllegalArgumentException](Parse.compileGrok("%{NOPE:x}"))
  }

  test("commonApacheLog composite parses an access-log line") {
    val line = """203.0.113.9 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326"""
    val df = Seq((1L, line)).toDF("id", "line")
    val out = Parse.extractGrok(df, "line", Parse.commonApacheLog)
      .select("clientip", "auth", "verb", "request", "response", "bytes")
      .as[(String, String, String, String, String, String)].collect()(0)
    assert(out == (("203.0.113.9", "frank", "GET", "/apache_pb.gif", "200", "2326")))
    val bad = Seq((1L, "not a log line")).toDF("id", "line")
    assert(Parse.extractGrok(bad, "line", Parse.commonApacheLog)
      .select("clientip").as[Option[String]].collect()(0).isEmpty)
  }

  test("parseSyslog parses pri/host/tag/pid/msg and derives facility/severity") {
    val df = Seq(
      (1L, "<13>Feb  5 12:00:00 web01 sshd[4242]: accepted key"),
      (2L, "Feb  5 12:00:00 web02 cron: job done"),   // no pri, no pid
      (3L, "not syslog at all")).toDF("id", "line")
    val out = Parse.parseSyslog(df, "line")
      .select("id", "pri", "facility", "severity", "sl_host", "sl_tag", "sl_pid", "sl_msg")
      .as[(Long, Option[Int], Option[Int], Option[Int], Option[String], Option[String], Option[Int], Option[String])]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, Some(13), Some(1), Some(5), Some("web01"), Some("sshd"), Some(4242), Some("accepted key"))))
    assert(out(1)._5 == Some("web02") && out(1)._2.isEmpty && out(1)._7.isEmpty
      && out(1)._8 == Some("job done"))
    assert(out(2)._5.isEmpty && out(2)._8.isEmpty)
  }

  test("pack/unpack round-trips groups with fragment order") {
    val df = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c")).toDF("g", "seq", "v")
    val packed = Records.pack(df, Seq("g"), "seq", Seq("v"))
    assert(packed.count() == 2)
    val back = Records.unpack(packed, "packed")
      .select("g", "frag_idx", "seq", "v").as[(Long, Int, Long, String)]
      .collect().toSet
    // fragments ordered by seq within each package
    assert(back === Set((1L, 0, 5L, "b"), (1L, 1, 10L, "a"), (2L, 0, 7L, "c")))
  }

  test("joltTransform shifts, nests, and defaults") {
    val df = Seq((1L, """{"a":{"b":"v1"},"n":7}"""), (2L, """{"n":9}""")).toDF("id", "j")
    val out = Records.joltTransform(df, "j",
        shift = Seq("$.a.b" -> "x.y", "$.n" -> "num"),
        defaults = Seq("x.y" -> "dflt", "tag" -> "t0"))
      .select("id", "jolted").as[(Long, String)].collect().toMap
    assert(out(1L) == """{"x":{"y":"v1"},"num":"7","tag":"t0"}""")
    assert(out(2L) == """{"x":{"y":"dflt"},"num":"9","tag":"t0"}""")
    // a missing source with no default is omitted from the output doc
    val omitted = Records.joltTransform(df, "j", Seq("$.nope" -> "gone", "$.n" -> "num"))
      .select("jolted").as[String].collect()(0)
    assert(omitted == """{"num":"7"}""")
    intercept[IllegalArgumentException] {
      Records.joltTransform(df, "j", Seq("$.a" -> "x", "$.n" -> "x.y"))
    }
  }

  test("encryptContent/decryptContent round-trip (AES-GCM)") {
    val key = "0123456789abcdef" // 16-byte AES key
    val df = Seq((1L, "secret payload")).toDF("id", "text")
    val enc = Records.encryptContent(df, "text", key)
    val rt = Records.decryptContent(enc, "encrypted", key)
      .select(col("decrypted").cast("string")).as[String].collect()(0)
    assert(rt == "secret payload")
    // ciphertext is bound to the key
    intercept[Exception] {
      Records.decryptContent(enc, "encrypted", "ffffffffffffffff")
        .select(col("decrypted")).collect()
    }
  }

  test("validateCsv flags arity and per-field violations") {
    val df = Seq(
      (1L, "10,alpha,O"),
      (2L, "x,beta,O"),      // key not numeric
      (3L, "11,gamma,Z"),    // bad status
      (4L, "12,delta")).toDF("id", "line") // arity
    val out = Parse.validateCsv(df, "line", ",", expectedFields = 3, Seq(
        (1, "key_numeric", f => f.rlike("^\\d+$")),
        (3, "status_known", f => f.isin("O", "F"))))
      .select("id", "is_valid", "violations")
      .as[(Long, Boolean, Seq[String])].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2)
    assert(!out(2L)._2 && out(2L)._3 == Seq("key_numeric"))
    assert(!out(3L)._2 && out(3L)._3 == Seq("status_known"))
    assert(!out(4L)._2 && out(4L)._3.contains("field_count")
      && out(4L)._3.contains("status_known")) // missing field 3
  }
}
