package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Gates for the r12 quality-signal adds: CharEntropy's exact values on
  * hand-computable distributions (including astral-plane codepoints, so
  * the codepoint iteration is pinned, not a UTF-16 unit walk), and the
  * CCNet tercile bucketing's ordering semantics on a synthetic
  * perplexity column. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def ent(s: String): Double =
    Seq(s).toDF("t").select(TextAnalysis.charEntropy(col("t")))
      .collect().head.getDouble(0)

  test("charEntropy exact values") {
    assert(ent("aaaa") == 0.0)
    assert(math.abs(ent("abab") - 1.0) < 1e-12)
    assert(math.abs(ent("abcd") - 2.0) < 1e-12)
    assert(ent("") == 0.0)
    // 2 distinct codepoints, uniform — astral symbols (surrogate pairs)
    // count as ONE codepoint each
    assert(math.abs(ent("😀😁😀😁") - 1.0) < 1e-12)
    // skewed: counts 3,1 over 4 chars: 2 - (3*log2(3))/4 = 0.8113
    assert(math.abs(ent("aaab") - (2.0 - 3.0 * math.log(3.0) / math.log(2.0) / 4.0)) < 1e-12)
  }

  test("charEntropy is null-safe and narrow") {
    val df = Seq(Some("abc"), None).toDF("t")
      .select(TextAnalysis.charEntropy(col("t")).as("e"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("ccnet-style percentile cuts split a known distribution into ordered terciles") {
    // 90 docs with ppl 1..90: cuts at ~30.67/60.33 → 31/30/29 split
    val ppl = (1 to 90).map(i => (i.toLong, i.toDouble)).toDF("doc_id", "p")
    val cuts = ppl.agg(
      percentile(col("p"), lit(1.0 / 3)).as("c1"),
      percentile(col("p"), lit(2.0 / 3)).as("c2"))
    val bucketed = ppl.crossJoin(broadcast(cuts))
      .select(col("p"),
        when(col("p") <= col("c1"), "head")
          .when(col("p") <= col("c2"), "middle")
          .otherwise("tail").as("bucket"))
      .collect()
    val byBucket = bucketed.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getDouble(0)).sorted).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket("head").max < byBucket("middle").min)
    assert(byBucket("middle").max < byBucket("tail").min)
    // tercile sizes within 1 of n/3
    assert(byBucket.values.forall(v => math.abs(v.size - 30) <= 1))
  }
}
