package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

import graft.operators.Records
import graft.sources.Io

/** Round-5 operator additions: ForkRecord, LookupAttribute,
  * CryptographicHashAttribute, ValidateJson, GenerateFlowFile. */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  test("forkRecord flattens array elements and carries parent fields") {
    val df = Seq(
      (1L, "a", Seq((10L, "x"), (11L, "y"))),
      (2L, "b", Seq((20L, "z")))
    ).toDF("id", "tag", "recs")
    val forked = Records.forkRecord(df, "recs", Seq("id", "tag"))
    assert(forked.columns.toSeq === Seq("id", "tag", "fork_idx", "_1", "_2"))
    val rows = forked.orderBy("id", "fork_idx")
      .select("id", "tag", "fork_idx", "_1", "_2").as[(Long, String, Int, Long, String)].collect()
    assert(rows === Array((1L, "a", 0, 10L, "x"), (1L, "a", 1, 11L, "y"),
                          (2L, "b", 0, 20L, "z")))
  }

  test("forkRecord suffixes element fields that collide with parent fields") {
    val df = Seq((1L, Seq((7L, "x")))).toDF("id", "recs")
      .select(col("id"), transform(col("recs"),
        r => struct(r.getField("_1").as("id"), r.getField("_2").as("v"))).as("recs"))
    val forked = Records.forkRecord(df, "recs", Seq("id"))
    assert(forked.columns.contains("id_forked"))
    val r = forked.select("id", "id_forked", "v").as[(Long, Long, String)].head()
    assert(r === ((1L, 7L, "x")))
  }

  test("lookupAttribute maps hits, defaults misses, no join in the plan") {
    val df = Seq("en", "fr", "zh").toDF("lang")
    val out = Records.lookupAttribute(df, "lang",
      Map("en" -> "germanic", "fr" -> "romance"), "family", Some("other"))
    assert(out.orderBy("lang").as[(String, String)].collect() ===
      Array(("en", "germanic"), ("fr", "romance"), ("zh", "other")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), "static map lookup must not plan a join")
  }

  test("lookupAttribute without a default leaves misses null") {
    val out = Records.lookupAttribute(Seq("zz").toDF("k"),
      "k", Map("a" -> "b"), "v")
    assert(out.select("v").as[Option[String]].head().isEmpty)
  }

  test("hashAttributes digests each column; unknown algo rejected") {
    val df = Seq(("s1", "en")).toDF("source", "lang")
    val out = Records.hashAttributes(
      Records.hashAttributes(df, Seq("source"), "md5"), Seq("lang"), "sha256")
    val r = out.select("source_hash", "lang_hash").as[(String, String)].head()
    // reference digests computed with java.security.MessageDigest
    def hex(algo: String, s: String) =
      java.security.MessageDigest.getInstance(algo)
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r._1 === hex("MD5", "s1"))
    assert(r._2 === hex("SHA-256", "en"))
    intercept[IllegalArgumentException] {
      Records.hashAttributes(df, Seq("source"), "crc32")
    }
  }

  test("validateJson routes parse failures and missing required fields to invalid") {
    val schema = new StructType().add("k", LongType)
    val df = Seq(
      ("ok",      """{"k": 5}"""),
      ("missing", """{"x": 1}"""),
      ("broken",  """"k": 5}"""),
      ("knull",   """{"k": null}""")
    ).toDF("case", "doc")
    val out = Records.validateJson(df, "doc", schema, Seq("k"))
      .select("case", "route").as[(String, String)].collect().toMap
    assert(out === Map("ok" -> "valid", "missing" -> "invalid",
                       "broken" -> "invalid", "knull" -> "invalid"))
  }

  test("validateJson with no required fields only checks parseability") {
    val schema = new StructType().add("k", LongType)
    val out = Records.validateJson(
        Seq("""{"x": 1}""", "nope").toDF("doc"), "doc", schema, Nil)
      .select("route").as[String].collect().sorted
    assert(out === Array("invalid", "valid"))
  }

  test("extractEmailHeaders: case-insensitive names, folding, first occurrence wins, body ignored") {
    val msg = "Received: a\r\nreceived: b\r\nSUBJECT: hello\r\n world\r\nFrom: x@y.z\r\n" +
      "\r\nSubject: decoy body line\r\n"
    val out = graft.operators.Parse.extractEmailHeaders(
        Seq(msg).toDF("msg"), "msg", Seq("Subject", "From", "Received", "X-Missing"))
      .select("email_subject", "email_from", "email_received", "email_x_missing")
      .as[(String, String, String, Option[String])].head()
    assert(out._1 === "hello world")   // unfolded continuation
    assert(out._2 === "x@y.z")
    assert(out._3 === "a")             // first occurrence, case-insensitive
    assert(out._4.isEmpty)             // absent header is null, not ""
  }

  test("waitRelease routes signaled keys success, keeps schema, handles empty signals") {
    val waiting = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val signals = Seq(2L, 2L, 3L).toDF("sk") // duplicates collapse
    val out = Records.waitRelease(waiting, signals, Seq("k" -> "sk"))
    assert(out.columns.toSeq === Seq("k", "v", "route"))
    assert(out.orderBy("k").select("k", "route").as[(Long, String)].collect() ===
      Array((1L, "wait"), (2L, "success"), (3L, "success")))
    val none = Records.waitRelease(waiting, signals.filter(lit(false)), Seq("k" -> "sk"))
    assert(none.select("route").as[String].collect().forall(_ == "wait"))
  }

  test("retryFlowFile seeds a missing counter, treats null as zero, routes on budget") {
    val noCounter = Records.retryFlowFile(Seq("x").toDF("v"), maxRetries = 1)
    assert(noCounter.select("flowfile_retries", "route").as[(Int, String)].head() ===
      ((1, "retry")))
    val withNull = Seq(("a", Some(3)), ("b", None), ("c", Some(1)))
      .toDF("v", "flowfile_retries")
    val out = Records.retryFlowFile(withNull, maxRetries = 3)
      .select("v", "flowfile_retries", "route").as[(String, Int, String)].collect().sortBy(_._1)
    assert(out === Array(("a", 4, "retries_exceeded"), ("b", 1, "retry"), ("c", 2, "retry")))
  }

  test("macContent matches RFC 4231 HMAC-SHA256 test vectors; verifyMac routes tampering") {
    // RFC 4231 test case 2: key "Jefe", data "what do ya want for nothing?"
    val key = "Jefe".getBytes("UTF-8")
    val df = Seq("what do ya want for nothing?").toDF("content")
    val mac = Records.macContent(df, "content", key)
      .select("content_mac").as[String].head()
    assert(mac.toLowerCase ===
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
    // verification leg: intact row routes success, tampered content fails
    val signed = Records.macContent(df, "content", key)
    assert(Records.verifyMac(signed, "content", "content_mac", key)
      .select("route").as[String].head() === "success")
    val tampered = signed.withColumn("content", lit("what do ya want for nothing!"))
    assert(Records.verifyMac(tampered, "content", "content_mac", key)
      .select("route").as[String].head() === "failure")
    // wrong key fails too
    assert(Records.verifyMac(signed, "content", "content_mac", "nope".getBytes("UTF-8"))
      .select("route").as[String].head() === "failure")
  }

  test("base32 encode matches RFC 4648 vectors; decode round-trips and rejects junk") {
    val vectors = Seq(
      "" -> "", "f" -> "MY======", "fo" -> "MZXQ====", "foo" -> "MZXW6===",
      "foob" -> "MZXW6YQ=", "fooba" -> "MZXW6YTB", "foobar" -> "MZXW6YTBOI======")
    val df = vectors.map(_._1).toDF("content")
    val enc = Records.encodeContent(df, "content", "base32", "b32")
      .select("content", "b32").as[(String, String)].collect().toMap
    vectors.foreach { case (in, want) => assert(enc(in) === want, s"encode '$in'") }
    val rt = Records.decodeContent(
        Records.encodeContent(df, "content", "base32", "b32"), "b32", "base32", "back")
      .select(col("content"), col("back").cast("string"))
      .as[(String, String)].collect()
    assert(rt.forall { case (a, b) => a == b })
    val err = intercept[Exception] {
      Records.decodeContent(Seq("not-base32!").toDF("b32"), "b32", "base32", "x").collect()
    }
    def mentionsBase32(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("base32")) || mentionsBase32(t.getCause))
    assert(mentionsBase32(err))
  }

  test("MapCache: put/fetch last-write-wins, tombstones, compact") {
    val path = java.nio.file.Files.createTempDirectory("graft-mapcache").toString + "/cache"
    graft.operators.MapCache.put(
      Seq(("a", "1"), ("b", "2")).toDF("k", "v"), path, "k", "v")
    graft.operators.MapCache.put(
      Seq(("a", "9"), ("c", "3")).toDF("k", "v"), path, "k", "v") // a overwritten
    graft.operators.MapCache.remove(Seq("b").toDF("k"), path, "k") // b tombstoned
    def fetchAll() = graft.operators.MapCache.fetch(
        Seq("a", "b", "c", "zz").toDF("k"), path, "k")
      .orderBy("k").select("k", "cached").as[(String, Option[String])].collect()
    val got = fetchAll()
    assert(got === Array(("a", Some("9")), ("b", None), ("c", Some("3")), ("zz", None)))
    // broadcast on the fetch plan, probe side not shuffled for the join
    val plan = graft.operators.MapCache.fetch(Seq("a").toDF("k"), path, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    // compact rewrites to one live generation with identical fetch results
    graft.operators.MapCache.compact(spark, path)
    assert(fetchAll() === got)
    val gens = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("gen="))
    assert(gens.toSeq === Seq("gen=0"))
  }

  test("RecordPath: nested fields, indexes, wildcards, map keys; plan-time typo check") {
    import graft.functions.RecordPath
    val df = Seq((1L, "x")).toDF("id", "tag").select(col("id"),
      struct(col("tag").as("t"),
             array(lit(10L), lit(20L), lit(30L)).as("ns"),
             array(struct(lit("a").as("w"), lit(1L).as("n")),
                   struct(lit("b").as("w"), lit(2L).as("n"))).as("recs"),
             map(lit("k1"), lit("v1")).as("m")).as("rec"))
    val out = df.select(
      RecordPath.compile("/rec/t").as("t"),
      RecordPath.compile("/rec/ns[1]").as("second"),
      RecordPath.compile("/rec/ns[-1]").as("last"),
      RecordPath.compile("/rec/ns[9]").as("oob"),
      RecordPath.compile("/rec/recs[*]/w").as("ws"),
      RecordPath.compile("/rec/m['k1']").as("v1"),
      RecordPath.compile("/rec/m['nope']").as("vmiss"))
      .as[(String, Long, Long, Option[Long], Seq[String], String, Option[String])].head()
    assert(out === (("x", 20L, 30L, None, Seq("a", "b"), "v1", None)))
    // a typo'd struct field fails ANALYSIS, not silently null
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(RecordPath.compile("/rec/typo")).collect()
    }
    intercept[IllegalArgumentException] { RecordPath.compile("no-slash") }
  }

  test("detectDuplicate routes against the cache across runs and records new keys") {
    import graft.operators.Dedup
    val path = java.nio.file.Files.createTempDirectory("graft-detect").toString + "/cache"
    val run1 = Dedup.detectDuplicate(
      Seq("a", "b", "a").toDF("k"), path, "k", runTag = "run1")
    // first sight of every key (in-batch repeat still non-duplicate)
    assert(run1.select("route").as[String].collect().forall(_ == "non-duplicate"))
    val run2 = Dedup.detectDuplicate(
        Seq("a", "c").toDF("k"), path, "k", runTag = "run2")
      .orderBy("k").select("k", "route").as[(String, String)].collect()
    assert(run2 === Array(("a", "duplicate"), ("c", "non-duplicate")))
    // cache now holds all three keys
    val cached = graft.operators.MapCache.entries(spark, path)
      .orderBy("key").as[(String, String)].collect()
    assert(cached === Array(("a", "run1"), ("b", "run1"), ("c", "run2")))
  }

  test("generate is deterministic, partitioned as asked, and collision-free") {
    val a = Io.generate(spark, 100, buckets = 4, parts = 8)
    assert(a.rdd.getNumPartitions === 8)
    val rows = a.orderBy("id").as[(Long, String, Long)].collect()
    assert(rows.length === 100)
    assert(rows.map(_._1).toSeq === (0L until 100L))
    assert(rows.forall { case (id, _, b) => b === id % 4 })
    assert(rows.map(_._2).distinct.length === 100)
    // regeneration is bit-identical
    val b = Io.generate(spark, 100, buckets = 4, parts = 8)
      .orderBy("id").as[(Long, String, Long)].collect()
    assert(rows === b)
  }
}
