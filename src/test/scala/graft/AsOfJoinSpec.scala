package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of join picks greatest right ts <= left ts per key") {
    val left = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L), (4L, "a", 15L))
      .toDF("id", "k", "t")
    val right = Seq(("a", 5L, "r1"), ("a", 15L, "r2"), ("b", 50L, "r3"))
      .toDF("k", "t", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("r1"))        // 5 <= 10 < 15
    assert(out(2L).contains("r2"))        // 15 <= 20
    assert(out(4L).contains("r2"))        // equal ts matches (<=)
    assert(out(3L).isEmpty)               // no right row <= 5 for key b
  }

  test("as-of join keeps all left rows and columns") {
    val left = Seq((1L, "a", 10L, "x")).toDF("id", "k", "t", "extra")
    val right = Seq(("a", 1L, 9.9)).toDF("k", "t", "score")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("score"))
    assert(out.columns.toSet == Set("k", "t", "id", "extra", "asof_score"))
    val row = out.select("id", "extra", "asof_score").as[(Long, String, Double)].collect()(0)
    assert(row == (1L, "x", 9.9))
  }
}
