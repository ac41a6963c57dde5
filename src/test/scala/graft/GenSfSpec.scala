package graft

import org.apache.spark.sql.functions._

class GenSfSpec extends SparkSpec {
  import spark.implicits._

  test("generated tables carry the driver schema (names + types) and are deterministic") {
    val dirA = java.nio.file.Files.createTempDirectory("gensf_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("gensf_b").toString
    GenSf.generate(spark, dirA, 0.02)
    GenSf.generate(spark, dirB, 0.02)
    val driverSf = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings")) {
      val gen = Tables.load(spark, dirA, t)
      val drv = Tables.load(spark, driverSf, t)
      // names + dataTypes must agree; nullability legitimately differs
      // (Encoders mark primitives non-null, the driver writer doesn't)
      assert(gen.schema.map(f => (f.name, f.dataType)) ===
             drv.schema.map(f => (f.name, f.dataType)), s"schema mismatch on $t")
      // pure-function-of-id generation: two runs are row-identical
      val ha = gen.orderBy(gen.columns.map(col): _*)
        .select(md5(to_json(struct(gen.columns.map(col): _*))))
        .as[String].collect().mkString("|").hashCode
      val genB = Tables.load(spark, dirB, t)
      val hb = genB.orderBy(genB.columns.map(col): _*)
        .select(md5(to_json(struct(genB.columns.map(col): _*))))
        .as[String].collect().mkString("|").hashCode
      assert(ha === hb, s"non-deterministic generation on $t")
    }
    // events goes through Tables.events on both sides (the driver file is
    // TIMESTAMP(NANOS), the generated one LONG nanos — both must land as
    // a µs timestamp with the same surrounding columns)
    val ge = Tables.events(spark, dirA)
    val de = Tables.events(spark, driverSf)
    assert(ge.schema.map(f => (f.name, f.dataType)) ===
           de.schema.map(f => (f.name, f.dataType)))
    assert(ge.count() === 2000L)
    assert(ge.agg(min(year(col("ts"))), max(year(col("ts"))))
      .as[(Int, Int)].head() === ((2024, 2024)))
  }

  test("generated documents keep the dup structure the dedup operators key on") {
    val dir = java.nio.file.Files.createTempDirectory("gensf_docs").toString
    GenSf.generate(spark, dir, 0.2) // 1000 docs
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    assert(n === 1000L)
    val distinct = docs.select(md5(col("text"))).distinct().count()
    // exact dups exist but are rare (driver: 8 per 5000)
    assert(distinct < n && n - distinct < 20)
    // the vocabulary is exactly the driver's 31 words
    val vocab = docs.select(explode(split(col("text"), " "))).distinct()
      .as[String].collect().toSet
    assert(vocab === GenSf.DocVocab.toSet)
  }

  test("exact-dup docs duplicate the target's FINAL text, even a mutated target") {
    // scan driver-side (pure function, no Spark): every doc whose text
    // matches an EARLIER doc exactly is a planted exact dup; at least
    // one such pair must duplicate a target that itself took a mutation
    // branch (text != its own base words) — the case the base-words
    // copy bug silently broke
    val firstByText = scala.collection.mutable.HashMap.empty[String, Long]
    var dupPairs = 0
    var dupOfMutated = 0
    var id = 0L
    while (id < 120000L) {
      val t = GenSf.docText(id)
      firstByText.get(t) match {
        case Some(first) =>
          dupPairs += 1
          if (t != GenSf.docBaseWords(first).mkString(" ")) dupOfMutated += 1
        case None => firstByText(t) = id
      }
      id += 1
    }
    assert(dupPairs > 100, s"expected planted exact dups, found $dupPairs")
    assert(dupOfMutated > 0,
      "no exact dup targets a mutated doc — dup branch is copying base words")
  }
}
