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
}
