package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin produces the same rows as a plain join") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, s"row$i"))
      .toDF("k", "payload") // key 1 is hot
    val small = Seq((1L, "hot"), (2L, "cold"), (77L, "x")).toDF("k", "label")
    val plain = big.join(small, Seq("k")).select("k", "payload", "label")
      .as[(Long, String, String)].collect().toSet
    val salted = Scale.saltedJoin(big, small, Seq("k"), saltFactor = 8)
      .select("k", "payload", "label").as[(Long, String, String)].collect().toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedJoin left join preserves unmatched big rows exactly once") {
    val big = (1 to 100).map(i => (i.toLong, s"row$i")).toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two")).toDF("k", "label")
    val out = Scale.saltedJoin(big, small, Seq("k"), saltFactor = 4, how = "left")
    assert(out.count() == 100)
    assert(out.filter(col("label").isNull).count() == 98)
  }

  test("saltedJoin rejects small-side-preserving join types") {
    val df = Seq((1L, "a")).toDF("k", "v")
    for (how <- Seq("right", "full", "full_outer", "right_outer"))
      intercept[IllegalArgumentException](
        Scale.saltedJoin(df, df, Seq("k"), saltFactor = 4, how = how))
  }

  test("bucketed tables join without a shuffle") {
    val a = (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
    val b = (1 to 500).map(i => (i.toLong, s"s$i")).toDF("k", "vb")
    for (t <- Seq("graft_bucket_a", "graft_bucket_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(loc)
      }
    }
    Scale.writeBucketed(a, "graft_bucket_a", Seq("k"), 4)
    Scale.writeBucketed(b, "graft_bucket_b", Seq("k"), 4)
    val joined = Scale.readTable(spark, "graft_bucket_a")
      .join(Scale.readTable(spark, "graft_bucket_b"), Seq("k"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$p")
    assert(joined.count() == 500)
  }
}
