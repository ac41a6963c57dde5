package graft

import org.apache.spark.sql.functions._
import graft.functions.El
import graft.operators.{Parse, Records}

/** Generated-input robustness tests: deterministic pseudo-random inputs
  * driven through parse/encode surfaces in bulk — the style that caught
  * the unescapeCsv DOTALL bug. */
class GeneratedInputSpec extends SparkSpec {
  import spark.implicits._

  test("parseSyslog inverts a generated well-formed line, field by field") {
    val rnd = new scala.util.Random(11)
    val hosts = Seq("web-01", "db.internal", "10.0.0.7")
    val tags = Seq("sshd", "cron", "app2")
    val rows = (1 to 200).map { i =>
      val pri = rnd.nextInt(192)
      val host = hosts(rnd.nextInt(hosts.length))
      val tag = tags(rnd.nextInt(tags.length))
      val pid = rnd.nextInt(65536)
      val msg = s"event $i ok: code=${rnd.nextInt(1000)}"
      (s"<$pri>Oct 11 22:14:15 $host $tag[$pid]: $msg",
        pri, host, tag, pid, msg)
    }
    val parsed = Parse.parseSyslog(rows.toDF("line", "e_pri", "e_host", "e_tag", "e_pid", "e_msg"), "line")
    val bad = parsed.filter(
      col("pri") =!= col("e_pri") ||
      col("facility") =!= floor(col("e_pri") / 8) ||
      col("severity") =!= col("e_pri") % 8 ||
      col("sl_host") =!= col("e_host") ||
      col("sl_tag") =!= col("e_tag") ||
      col("sl_pid") =!= col("e_pid") ||
      col("sl_msg") =!= col("e_msg")).count()
    assert(bad === 0L)
  }

  test("parseCEF inverts generated headers and extension key-values") {
    val rnd = new scala.util.Random(19)
    val rows = (1 to 150).map { i =>
      val sev = rnd.nextInt(11)
      val sig = s"sig-${rnd.nextInt(900)}"
      val src = s"10.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}"
      val act = Seq("allow", "deny", "drop")(rnd.nextInt(3))
      (s"CEF:0|acme|fw|1.${i % 10}|$sig|blocked thing|$sev|src=$src act=$act cnt=$i",
        sig, sev.toString, src, act)
    }
    val parsed = Parse.parseCef(
      rows.toDF("line", "e_sig", "e_sev", "e_src", "e_act"),
      "line", Seq("src", "act"))
    val bad = parsed.filter(
      col("cef_vendor") =!= "acme" || col("cef_product") =!= "fw" ||
      col("cef_sig_id") =!= col("e_sig") || col("cef_severity") =!= col("e_sev") ||
      col("cef_src") =!= col("e_src") || col("cef_act") =!= col("e_act")).count()
    assert(bad === 0L)
  }

  test("base32/base64/hex encode-decode round-trip random binary payloads") {
    val rnd = new scala.util.Random(13)
    val payloads = (1 to 150).map { i =>
      (i.toLong, Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte))
    }
    val df = payloads.toDF("id", "payload")
    Seq("base32", "base64", "hex").foreach { enc =>
      val back = Records.decodeContent(
        Records.encodeContent(df, "payload", enc, "enc"), "enc", enc, "back")
        .select("id", "back").as[(Long, Array[Byte])].collect().toMap
      payloads.foreach { case (id, bytes) =>
        assert(java.util.Arrays.equals(back(id), bytes), s"$enc round-trip broke id=$id")
      }
    }
  }

  test("EL parser fuzz: malformed templates fail with a parse error, never a raw crash") {
    val rnd = new scala.util.Random(17)
    val pieces = Seq("${", "}", ":", "(", ")", "'", ",", "text", "lang", "toUpper",
      "append", "5", " ", "$$", "\\", "${lang}", "literal")
    var compiled = 0
    (1 to 500).foreach { _ =>
      val t = (1 to rnd.nextInt(8)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString
      try { El.compile(t); compiled += 1 }
      catch {
        case _: IllegalArgumentException => () // the designed parse error
        case e: org.apache.spark.sql.AnalysisException => () // unknown column, fine
        case e: Throwable =>
          fail(s"template '$t' crashed with ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    assert(compiled > 0, "generator never produced a valid template — weak fuzz")
  }
}
