package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Ann, Records}

class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seedBase: Int) = {
    (0 until n).map { i =>
      val r = new scala.util.Random(seedBase + i)
      (i.toLong, Array.fill(dim)(r.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
  }

  test("IVF top-k achieves nontrivial recall vs exact") {
    val corpus = randVecs(300, 16, 23)
    val queries = corpus.filter(col("vec_id") < 5)
    val exact = Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Ann.ivfTopK(spark, corpus, queries, 10, nCells = 8, nProbe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("IVF with Lloyd-refined centroids is deterministic and keeps recall") {
    val corpus = randVecs(300, 16, 23)
    val queries = corpus.filter(col("vec_id") < 5)
    val exact = Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def run() = Ann.ivfTopK(spark, corpus, queries, 10, nCells = 8, nProbe = 4, lloydIters = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val a = run(); val b = run()
    assert(a == b, "refined IVF must be deterministic across runs")
    val recall = (exact intersect a).size.toDouble / exact.size
    assert(recall >= 0.5, s"refined IVF recall too low: $recall")
  }

  test("IVF large-query path: shuffle join matches the broadcast path exactly") {
    val corpus = randVecs(300, 16, 23)
    val queries = corpus.filter(col("vec_id") < 40) // "large" query set
    def run(bcast: Boolean) =
      Ann.ivfTopK(spark, corpus, queries, 5, nCells = 8, nProbe = 4,
        broadcastQueries = bcast)
    assert(run(true).collect().map(_.toSeq).toSet ===
           run(false).collect().map(_.toSeq).toSet,
      "both join strategies must return identical neighbors")
    // the hint really comes off: with auto-broadcast disabled (as at
    // scale, where the query side exceeds the threshold) the unhinted
    // path plans a shuffle join while the hinted path still broadcasts
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1")
    try {
      val shuffled = run(false).queryExecution.executedPlan.toString
      assert(!shuffled.contains("BroadcastHashJoin"),
        "large-query path must not broadcast once the side is over-threshold")
      assert(shuffled.contains("SortMergeJoin") || shuffled.contains("ShuffledHashJoin"),
        s"expected a shuffle join, got:\n$shuffled")
      assert(run(true).queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "hinted path keeps the broadcast")
    } finally spark.conf.set(thresholdKey, saved)
  }

  test("int8 quantization bounds reconstruction error and preserves top-k") {
    import graft.functions.VectorFunctions
    val corpus = randVecs(200, 16, 31)
    val rec = corpus.select(col("vec_id"),
      col("embedding"),
      VectorFunctions.dequantize8(VectorFunctions.quantize8(col("embedding"))).as("r"))
    // per-component error <= scale/2 = max|x|/254
    val maxErr = rec.select(max(aggregate(
        zip_with(col("embedding"), col("r"), (a, b) => abs(a.cast("double") - b)),
        lit(0.0), (acc, v) => greatest(acc, v)))).as[Double].collect()(0)
    assert(maxErr <= 0.5 / 254 + 1e-9, s"reconstruction error too large: $maxErr")
    // ranking preserved: exact top-10 vs reconstructed top-10 recall
    val queries = corpus.filter(col("vec_id") < 5)
    val exact = Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recD = rec.select(col("vec_id"), col("r").cast("array<float>").as("embedding"))
    val approx = Ann.bruteForceTopK(recD, recD.filter(col("vec_id") < 5), 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized top-k recall too low: $recall")
  }

  test("gzip compress/decompress round-trips content and shrinks repetitive payloads") {
    val df = Seq((1L, "abc " * 500), (2L, "short")).toDF("id", "text")
    val packed = Records.compress(df.withColumn("payload", col("text").cast("binary")), "payload", "gz")
    val sizes = packed.select(col("id"), octet_length(col("payload")).as("raw"),
                              octet_length(col("gz")).as("packed"))
      .as[(Long, Int, Int)].collect()
      .map { case (id, a, b) => id -> (a, b) }.toMap
    assert(sizes(1L)._2 < sizes(1L)._1 / 10, "repetitive payload should compress >10x")
    val back = Records.decompress(packed, "gz", "restored")
      .select(col("id"), col("restored").cast("string")).as[(Long, String)].collect().toMap
    assert(back(1L) == "abc " * 500 && back(2L) == "short")
  }

  test("zstd/lz4/snappy compress round-trips (NiFi's remaining CompressContent codecs)") {
    val df = Seq((1L, "abc " * 500), (2L, "short"), (3L, "")).toDF("id", "text")
      .withColumn("payload", col("text").cast("binary"))
    for (codec <- Seq("zstd", "lz4", "snappy")) {
      val packed = Records.compress(df, "payload", "packed", codec)
      val back = Records.decompress(packed, "packed", "restored", codec)
        .select(col("id"), col("restored").cast("string")).as[(Long, String)].collect().toMap
      assert(back(1L) == "abc " * 500 && back(2L) == "short" && back(3L) == "",
        s"codec $codec round-trip failed")
      val shrunk = packed.filter(col("id") === 1L)
        .select(octet_length(col("packed"))).as[Int].head
      assert(shrunk < 2000, s"codec $codec: repetitive 2000B payload should shrink, got $shrunk")
    }
    intercept[IllegalArgumentException] { Records.compress(df, "payload", "x", "brotli") }
  }

  test("executeStreamCommand pipes records through an external process per partition") {
    val df = Seq("alpha", "bravo", "charlie").toDF("line").repartition(2)
    val upper = Records.executeStreamCommand(df, "line", Seq("tr", "a-z", "A-Z"))
      .as[String].collect().sorted
    assert(upper === Array("ALPHA", "BRAVO", "CHARLIE"))
    // a filtering command may emit fewer rows — that's the contract
    val filtered = Records.executeStreamCommand(df, "line", Seq("grep", "a"))
      .as[String].collect().sorted
    assert(filtered === Array("alpha", "bravo", "charlie").filter(_.contains("a")))
  }

  test("unpackZip explodes archive entries into rows (UnpackContent)") {
    def zip(entries: (String, String)*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("dir/")) // skipped
      z.closeEntry()
      entries.foreach { case (n, body) =>
        z.putNextEntry(new java.util.zip.ZipEntry(n))
        z.write(body.getBytes("UTF-8")); z.closeEntry()
      }
      z.close(); bos.toByteArray
    }
    val df = Seq((1L, zip("a.txt" -> "alpha", "sub/b.txt" -> "beta")),
                 (2L, zip("c.txt" -> "gamma"))).toDF("id", "archive")
    val out = Records.unpackZip(df, "archive")
      .select(col("id"), col("entry_name"), col("entry_data").cast("string"))
      .as[(Long, String, String)].collect().toSet
    assert(out === Set((1L, "a.txt", "alpha"), (1L, "sub/b.txt", "beta"),
                       (2L, "c.txt", "gamma")))
  }

  test("mergeArchive/unpackArchive: zip and tar round-trip with the fragment contract; deterministic bytes") {
    // multi-entry groups incl. an EMPTY payload, real binary bytes
    // (every value 0..255), and a nested/non-ASCII name
    val binary = (0 until 256).map(_.toByte).toArray
    val rows = Seq(
      (1L, 0L, "a.txt", "alpha".getBytes("UTF-8")),
      (1L, 1L, "sub/π.bin", binary),
      (1L, 2L, "empty", Array.emptyByteArray),
      (2L, 0L, "solo.txt", "solo".getBytes("UTF-8"))
    ).toDF("grp", "ord", "name", "content")
    for (format <- Seq("zip", "tar")) {
      val merged = Records.mergeArchive(rows, Seq("grp"), "ord", "name", "content", format)
      assert(merged.count() === 2)
      // round-trip: every (grp, name, bytes) survives; fragment
      // attributes follow NiFi's contract (index = position, count =
      // entries in the parent archive)
      val back = Records.unpackArchive(merged, "archive", format)
        .select(col("grp"), col("fragment_index"), col("fragment_count"),
          col("entry_name"), col("entry_data"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getAs[Array[Byte]](4).toSeq)).toSet
      assert(back === Set(
        (1L, 0L, 3L, "a.txt", "alpha".getBytes("UTF-8").toSeq),
        (1L, 1L, 3L, "sub/π.bin", binary.toSeq),
        (1L, 2L, 3L, "empty", Seq.empty),
        (2L, 0L, 1L, "solo.txt", "solo".getBytes("UTF-8").toSeq)),
        s"$format round-trip mismatch")
      // determinism: re-merging yields byte-identical archives
      val a1 = merged.filter(col("grp") === 1).select("archive").as[Array[Byte]].head()
      val a2 = Records.mergeArchive(rows, Seq("grp"), "ord", "name", "content", format)
        .filter(col("grp") === 1).select("archive").as[Array[Byte]].head()
      assert(java.util.Arrays.equals(a1, a2), s"$format merge must be deterministic")
    }
    // tar headers are REAL ustar: magic at 257, checksum validates, and
    // the JDK-independent parse comes back through unpackZip's sibling
    val tar = Records.mergeArchive(rows, Seq("grp"), "ord", "name", "content", "tar")
      .filter(col("grp") === 2).select("archive").as[Array[Byte]].head()
    assert(new String(tar, 257, 5, "UTF-8") === "ustar", "ustar magic missing")
    val stored = Integer.parseInt(new String(tar, 148, 6, "UTF-8"), 8)
    val sum = (0 until 512).map(i => if (i >= 148 && i < 156) ' '.toInt else tar(i) & 0xFF).sum
    assert(stored === sum, "ustar checksum must validate")
    // zip interop: our packed zip opens with the JDK's own reader
    val zipBytes = Records.mergeArchive(rows, Seq("grp"), "ord", "name", "content", "zip")
      .filter(col("grp") === 2).select("archive").as[Array[Byte]].head()
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(zipBytes))
    val e = zin.getNextEntry
    assert(e.getName === "solo.txt")
  }

  test("archive flow vocabulary: MergeContent tar + UnpackContent tar compile in a flow") {
    val json =
      """{"flowContents": {"name": "archive-edge",
        |  "processors": [
        |    {"identifier": "m", "type": "MergeContent",
        |     "properties": {"Merge Format": "tar", "Group Columns": "grp",
        |       "Order Column": "ord", "Name Column": "name",
        |       "Content Column": "content", "Output Column": "archive"}},
        |    {"identifier": "u", "type": "UnpackContent",
        |     "properties": {"Packaging Format": "tar", "Content Column": "archive"}}],
        |  "inputPorts": [{"identifier": "i", "name": "files"}],
        |  "outputPorts": [{"identifier": "o", "name": "entries"}],
        |  "connections": [
        |    {"source": {"id": "i"}, "destination": {"id": "m"}},
        |    {"source": {"id": "m"}, "destination": {"id": "u"}},
        |    {"source": {"id": "u"}, "destination": {"id": "o"}}]}}""".stripMargin
    val in = Seq((1L, 0L, "x.txt", "xx".getBytes("UTF-8")),
                 (1L, 1L, "y.txt", "yy".getBytes("UTF-8")))
      .toDF("grp", "ord", "name", "content")
    val out = graft.FlowCompiler.compile(spark, json, Map("files" -> in))("entries")
      .select("entry_name", "entry_data").collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), "UTF-8"))).toSet
    assert(out === Set(("x.txt", "xx"), ("y.txt", "yy")))
    // the committed flow compiles and round-trips the same input
    val committed = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/flows/archive_roundtrip.json"), "UTF-8").mkString
    val ports = graft.FlowCompiler.compile(spark, committed, Map("files" -> in))
    assert(ports("archives").count() === 1)
    val entries = ports("entries").select("entry_name").as[String].collect().toSet
    assert(entries === Set("x.txt", "y.txt"))
  }

  test("updateField sets nested struct fields in place (UpdateRecord)") {
    val df = Seq((1L, ("alpha", 10))).toDF("id", "rec")
      .select(col("id"), col("rec").cast("struct<name:string,qty:int>"))
    val updated = Records.updateField(df, "rec.qty", lit(99))
    assert(updated.select("rec.name", "rec.qty").as[(String, Int)].head === ("alpha", 99))
    // absent field is CREATED; top-level path replaces the column
    val widened = Records.updateField(df, "rec.note", lit("new"))
    assert(widened.select("rec.note").as[String].head === "new")
    assert(widened.select("rec.name").as[String].head === "alpha")
    val replaced = Records.updateField(df, "id", lit(7L))
    assert(replaced.select("id").as[Long].head === 7L)
  }

  test("RecordPath.update writes through arrays and maps (UpdateRecord full paths)") {
    import graft.functions.RecordPath
    val df = Seq((1L, Seq(("a", 1L), ("b", 2L), ("c", 3L)), Map("k" -> 10L)))
      .toDF("id", "tags0", "props")
      .select(col("id"),
        transform(col("tags0"), e =>
          struct(e.getField("_1").as("name"), e.getField("_2").as("rank"))).as("tags"),
        col("props"))
    // wildcard: every element gets the new field
    val flagged = RecordPath.update(df, "/tags[*]/flag", col("id") > 0)
    assert(flagged.select(expr("forall(tags, t -> t.flag)")).as[Boolean].head())
    // indexed set (negative = from the end) only touches that element
    val ranked = RecordPath.update(df, "/tags[-1]/rank", lit(99L))
    assert(ranked.select(expr("transform(tags, t -> t.rank)"))
      .as[Seq[Long]].head() === Seq(1L, 2L, 99L))
    // map upsert: new key added, existing key overwritten
    val upserted = RecordPath.update(
      RecordPath.update(df, "/props['k2']", lit(20L)), "/props['k']", lit(0L))
    assert(upserted.select(element_at(col("props"), "k"),
      element_at(col("props"), "k2")).as[(Long, Long)].head() === ((0L, 20L)))
  }

  test("RecordPath functions (r18): string subset, nesting, parse-time rejection, flow wiring") {
    import graft.functions.RecordPath.compileExpr
    val df = Seq(("  Ada Lovelace  ", "1-URGENT", "F"))
      .toDF("name", "prio", "status")
      .select(struct(col("name"), col("prio"), col("status")).as("rec"))
    def one(e: String): String =
      df.select(compileExpr(e).cast("string")).as[String].head()
    assert(one("toUpperCase(/rec/status)") === "F")
    assert(one("trim(/rec/name)") === "Ada Lovelace")
    // nested calls compose
    assert(one("toLowerCase(trim(/rec/name))") === "ada lovelace")
    assert(one("concat(/rec/status, '-', substringBefore(/rec/prio, '-'))") === "F-1")
    // substring: 0-based, end exclusive, negatives from the end
    assert(one("substring(/rec/prio, 2, 5)") === "URG")
    assert(one("substring(/rec/prio, -6, -1)") === "URGEN")
    assert(one("substring(/rec/prio, 3, 2)") === "", "inverted range clamps empty")
    // not-found rule: the whole string comes back
    assert(one("substringAfter(/rec/status, 'x')") === "F")
    assert(one("substringBefore(/rec/status, 'x')") === "F")
    assert(one("replace(/rec/prio, '-', '_')") === "1_URGENT")
    assert(one("replaceRegex(/rec/prio, '[A-Z]+', 'u')") === "1-u")
    // pad never truncates
    assert(one("padLeft(/rec/status, 3)") === "__F")
    assert(one("padRight(/rec/prio, 3, '*')") === "1-URGENT")
    // literal args with commas/parens inside quotes survive the split
    assert(one("replace(/rec/prio, '-', ', (')") === "1, (URGENT")
    // config-time strictness: unknown fn / bad arity / bad regex throw
    intercept[IllegalArgumentException] { compileExpr("frobnicate(/rec/name)") }
    intercept[IllegalArgumentException] { compileExpr("substring(/rec/name, 1)") }
    intercept[IllegalArgumentException] { compileExpr("replaceRegex(/rec/name, '[', 'x')") }
    intercept[IllegalArgumentException] { compileExpr("padLeft(/rec/name, 3, '')") }
    // EvaluateRecordPath flow node accepts the function grammar
    val flow =
      """{"flowContents": {"name": "rpf",
        |  "inputPorts": [{"identifier": "in", "name": "recs"}],
        |  "outputPorts": [{"identifier": "out", "name": "tagged"}],
        |  "processors": [
        |    {"identifier": "p", "type": "EvaluateRecordPath",
        |     "properties": {"tag": "concat(toUpperCase(/rec/status), '-', /rec/prio)"}}],
        |  "connections": [
        |    {"source": {"id": "in"}, "destination": {"id": "p"}},
        |    {"source": {"id": "p"}, "destination": {"id": "out"}}]}}""".stripMargin
    val got = FlowCompiler.compile(spark, flow, Map("recs" -> df))("tagged")
      .select("tag").as[String].head()
    assert(got === "F-1-URGENT")
  }

  test("parseXml extracts schema fields from an XML column") {
    val df = Seq(
      (1L, "<rec><name>alpha</name><qty>3</qty></rec>"),
      (2L, "<rec><name>beta</name><qty>7</qty></rec>")
    ).toDF("id", "xml")
    val schema = StructType(Seq(StructField("name", StringType), StructField("qty", IntegerType)))
    val out = Records.parseXml(df, "xml", schema)
      .select("id", "name", "qty").as[(Long, String, Int)].collect().toSet
    assert(out == Set((1L, "alpha", 3), (2L, "beta", 7)))
  }
}
