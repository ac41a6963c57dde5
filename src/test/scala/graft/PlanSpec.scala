package graft

/** Plan-regression specs: the physical plans the 100 TB posture depends
  * on (pushdown, pruning, broadcasts, single-shuffle windows) must not
  * silently degrade. */
class PlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  test("q1: shipdate filter pushed to parquet, columns pruned") {
    val p = planOf("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$p")
    assert(!p.contains("l_orderkey"), "unused column not pruned from scan")
  }

  test("q5: dimension joins are broadcast") {
    val p = planOf("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in q5:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q5 must not degenerate to a nested-loop join")
  }

  test("q6: all predicates pushed to the scan, zero hash-partition shuffles") {
    val p = planOf("q6_forecast_revenue")
    // assert each pushed filter independently — the concatenated prefix
    // is brittle against harmless optimizer ordering changes
    for (f <- Seq("IsNotNull(l_shipdate)", "IsNotNull(l_discount)", "IsNotNull(l_quantity)"))
      assert(p.contains(f), s"filter $f not pushed:\n$p")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"),
      s"scan not pruned to the 4 used columns:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"scan-agg must reduce without a hash shuffle:\n$p")
  }

  test("q14/q19: part dim broadcasts, fact side never sort-merges") {
    for (q <- Seq("q14_promo_revenue", "q19_disjunctive_revenue")) {
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: part not broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q: fact side must not sort-merge:\n$p")
    }
  }

  test("q8: every dimension broadcasts; only the two fact joins may shuffle") {
    val p = planOf("q8_market_share")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 5,
      s"q8 dims must all broadcast (part/supplier/nation x2/region):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q8 must not degenerate to a nested-loop join:\n$p")
    assert("SortMergeJoin".r.findAllIn(p).size <= 2,
      s"q8: only lineitem-orders and -customer may sort-merge:\n$p")
  }

  test("q4: correlated EXISTS decorrelates to a left-semi join") {
    val p = planOf("q4_order_priority")
    assert(p.contains("LeftSemi"), s"EXISTS must decorrelate to a semi join:\n$p")
    assert(!p.toLowerCase.contains("insubquery"),
      s"no per-row subquery execution allowed:\n$p")
    // the order-date window still pushes to the orders scan
    assert(p.contains("IsNotNull(o_orderdate)"), s"date filter not pushed:\n$p")
  }

  test("q21: EXISTS + NOT EXISTS decorrelate to one semi and one anti join") {
    val p = planOf("q21_waiting_supplier")
    assert(p.contains("LeftSemi"), s"EXISTS must decorrelate to a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must decorrelate to an anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q21 must stay hash-joined:\n$p")
  }

  test("q17: the per-part average decorrelates to an aggregate joined back, never per row") {
    val p = planOf("q17_small_quantity")
    // the correlated scalar subquery must appear as a joined aggregate
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"per-part avg must plan as an aggregate:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q17 must stay hash-joined:\n$p")
  }

  test("q22: NOT EXISTS anti-joins; the balance threshold is one scalar subquery") {
    val df = SparkEntry.queries("q22_global_sales")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"NOT EXISTS must decorrelate to an anti join:\n$p")
    assert(p.contains("Subquery"), s"threshold should plan as a scalar subquery:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q22 must stay hash-joined:\n$p")
  }

  test("q13: ON-clause filter keeps the join LEFT OUTER (zero-order customers survive)") {
    val p = planOf("q13_customer_dist")
    assert(p.contains("LeftOuter"), s"q13 must outer-join:\n$p")
  }

  test("q15: the max-revenue scalar subquery plans once, not per row") {
    val df = SparkEntry.queries("q15_top_supplier")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Subquery"), s"scalar subquery expected in plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q15 must stay hash-joined:\n$p")
  }

  test("q2: regional-min scalar subquery decorrelates to an aggregate joined back") {
    val p = planOf("q2_min_cost_supplier")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"per-part regional min must plan as an aggregate:\n$p")
    assert(!p.toLowerCase.contains("insubquery"),
      s"no per-row subquery execution allowed:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q2 must stay hash-joined:\n$p")
  }

  test("q9: all three dims broadcast; LIKE-filtered part prunes before the join") {
    val p = planOf("q9_product_profit")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"q9 dims (part/supplier/nation) must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q9 must not degenerate to a nested-loop join:\n$p")
  }

  test("q11: the total-value threshold plans as one scalar subquery, not per group") {
    val df = SparkEntry.queries("q11_important_stock")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Subquery"), s"threshold should plan as a scalar subquery:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q11 must stay hash-joined:\n$p")
  }

  test("q12: shipdate window pushes to the lineitem scan under the fact-fact join") {
    val p = planOf("q12_ship_priority")
    assert(p.contains("IsNotNull(l_shipdate)"), s"date filter not pushed:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q12 must stay hash-joined:\n$p")
  }

  test("q16: NOT IN on a non-nullable key plans as a plain anti join, not null-aware nested-loop") {
    val p = planOf("q16_part_suppliers")
    assert(p.contains("LeftAnti"), s"NOT IN must decorrelate to an anti join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q16 must not fall back to the null-aware nested-loop form:\n$p")
  }

  test("q20: both subquery levels decorrelate — semi join outside, aggregate join inside") {
    val p = planOf("q20_promising_supplier")
    assert(p.contains("LeftSemi"), s"IN must decorrelate to a semi join:\n$p")
    assert(!p.toLowerCase.contains("insubquery"),
      s"no per-row subquery execution allowed:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q20 must stay hash-joined:\n$p")
  }

  test("q_lookup_record: both lookups broadcast, fact side never shuffles") {
    val p = planOf("q_lookup_record")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, s"lookups not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), "lookup must not sort-merge the fact side")
  }

  test("q_rolling_window: single shuffle (no self-join)") {
    val p = planOf("q_rolling_window")
    assert(!p.contains("Join"), s"rolling window must not join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one shuffle:\n$p")
  }

  test("q_asof_join: union+window, no range join") {
    val p = planOf("q_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of must not plan a range cross-join:\n$p")
    assert(p.contains("Window"), "as-of should use a window")
  }

  test("no query in the catalog plans a Cartesian product") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      val p = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct")) Some(q) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("q_ip_lookup: range join broadcasts the ranges, never shuffles the facts") {
    val p = planOf("q_ip_lookup")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"range join must be a broadcast nested loop:\n$p")
    assert(!p.contains("CartesianProduct"), "range join degenerated to cartesian")
    assert(!p.contains("Exchange hashpartitioning"),
      s"fact side of the range join must not shuffle:\n$p")
  }

  test("whole-stage codegen covers the q1 aggregation") {
    // AQE prints codegen spans only in the final (executed) plan
    val df = SparkEntry.queries("q1_pricing_summary")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen'd operators print with the "*(stageId)" marker
    assert(p.contains("*(1)") && p.contains("*(2)"),
      s"aggregation stages not codegen'd:\n$p")
  }

  test("per-record parse/transform queries stay narrow (zero exchanges)") {
    // one regex/codec pass per record — any Exchange here would be a
    // 100 TB regression
    for (q <- Seq("q_count_text", "q_encode_content", "q_replace_mapping",
                  "q_extract_grok", "q_parse_syslog", "q_validate_csv",
                  "q_record_fields")) {
      val p = planOf(q)
      assert(!p.contains("Exchange"), s"$q must not shuffle:\n$p")
    }
  }

  test("ngramJaccard verify joins are hash joins, not nested loops") {
    val p = planOf("q_dedup_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"prefix-filtered jaccard must not nested-loop:\n$p")
  }

  test("q_chunk_docs: chunking is purely narrow (zero exchanges)") {
    val p = planOf("q_chunk_docs")
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }

  test("q_bm25_search: query-term sides broadcast; no sort-merge, no cartesian") {
    val p = planOf("q_bm25_search")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"terms/df/qt sides must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"bm25 must stay broadcast-joined:\n$p")
  }

  test("q_bloom_dedup: the probe is a native bloom expression; candidates anti-join") {
    val p = planOf("q_bloom_dedup")
    assert(p.contains("might_contain"), s"bloom probe must be in-plan:\n$p")
    assert(p.contains("LeftAnti"), s"candidate sliver must anti-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bloom dedup must stay hash-joined:\n$p")
  }

  test("q_bloom_dedup probe: single sharded expression, one hash per row — " +
       "no per-branch when-chain rehash (r11 verdict fix)") {
    val p = planOf("q_bloom_dedup")
    val probes = "graft_sharded_bloom_might_contain".r.findAllMatchIn(p).size
    assert(probes >= 1, s"sharded probe expression missing:\n$p")
    // the r11 shape dispatched via CASE WHEN pmod(xxhash64(key), S) per
    // branch; the native expression reuses its one hash child for both
    // shard dispatch (array index) and membership probe
    assert(!p.contains("pmod(xxhash64"),
      s"shard dispatch must live inside the expression, not a pmod chain:\n$p")
    val hashes = "xxhash64".r.findAllMatchIn(p).size
    assert(hashes <= probes,
      s"one xxhash64 per probe site, found $hashes for $probes probes:\n$p")
  }

  test("q_token_budget_mix: corpus shuffles ONCE on (bucket, source) — " +
       "deterministic md5 buckets, broadcast offsets, no range exchange") {
    val p = planOf("q_token_budget_mix")
    assert(!p.toLowerCase.contains("rangepartitioning"),
      s"bucket split must be the deterministic md5 key space, never " +
      s"repartitionByRange's sampled (RDD-id-seeded) boundaries:\n$p")
    // the big side's window must be keyed by (bucket, source) — a
    // window partitioned by source alone is the per-source single
    // reducer this operator exists to avoid (the offsets side's
    // per-source window runs over <= numBuckets rows, post-agg)
    assert(p.contains("windowspecdefinition(__mix_bucket"),
      s"corpus running sum must partition by (__mix_bucket, source):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the (source, bucket) offsets join must broadcast the tiny side:\n$p")
    val corpusShuffles = "Exchange hashpartitioning\\(__mix_bucket".r.findAllMatchIn(p).size
    assert(corpusShuffles == 1,
      s"the full corpus must shuffle exactly once (found $corpusShuffles):\n$p")
  }

  test("q_dedup_minhash_capped: the bucket-size window is keyed on the band-join " +
       "keys, so its exchange satisfies the join at shuffle scale") {
    val p = planOf("q_dedup_minhash_capped")
    val winSpecs = "windowspecdefinition\\(([^,]+), ([^,]+),".r.findAllMatchIn(p).toSeq
    assert(winSpecs.nonEmpty, s"bucket-count window missing:\n$p")
    winSpecs.foreach { m =>
      assert(m.group(1).startsWith("band_id") && m.group(2).startsWith("band_hash"),
        s"cap window must partition by (band_id, band_hash) = the join keys:\n$p")
    }
    // every hash exchange the cap adds is on the band keys themselves —
    // ENSURE_REQUIREMENTS reuses it for a shuffle-hash band join at
    // scale (here at sf0.001 the join side broadcasts instead)
    val hashExchanges = "Exchange hashpartitioning\\((\\w+)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(hashExchanges.forall(k => k.startsWith("band_id") || k.startsWith("id_a")),
      s"cap must not introduce exchanges on non-join keys, got $hashExchanges:\n$p")
  }

  test("q_embed_kmeans: assignment is narrow — only the centroid update shuffles") {
    val p = planOf("q_embed_kmeans")
    // exchanges may appear for the tiny centroid merge (k·dim rows) and
    // the seed TakeOrdered; the corpus itself must never hash-shuffle:
    // the assignment is a broadcast cross of a 1-row packed-centroid
    // table, so no SortMergeJoin anywhere
    assert(!p.contains("SortMergeJoin"), s"kmeans must not shuffle-join the corpus:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"packed centroids must broadcast:\n$p")
  }

  test("clusters label-propagation join flips broadcast -> shuffle with the gate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, min}
    val pairs = (1L to 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val labels = edges.groupBy(col("src").as("id"))
      .agg(min("dst").as("cluster"))
    val on = graft.operators.Dedup.propagateOnce(edges, labels, useBroadcast = true)
      .queryExecution.sparkPlan.toString
    assert(on.contains("BroadcastHashJoin"), s"gate on but no broadcast:\n$on")
    // with the hint withheld AND auto-broadcast disabled (the 100 TB
    // regime: label table too big to collect), the planner must pick a
    // non-broadcast join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val off = graft.operators.Dedup.propagateOnce(edges, labels, useBroadcast = false)
        .queryExecution.sparkPlan.toString
      assert(!off.contains("BroadcastHashJoin"), s"gate off but still broadcast:\n$off")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("clusters round plan: edges never reshuffle, one exchange post-aggregation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, min}
    // materialized inputs, as inside clusters() (edges persisted, labels
    // checkpointed) — the plan then shows only the round's own work
    val pairs = (1L to 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .localCheckpoint(true)
    val labels = edges.groupBy(col("src").as("id"))
      .agg(min("dst").as("cluster")).localCheckpoint(true)
    // executedPlan (not sparkPlan): exchanges are inserted by
    // EnsureRequirements during physical preparation
    val p = graft.operators.Dedup.propagateOnce(edges, labels, useBroadcast = true)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"round join not broadcast:\n$p")
    // exactly one hash exchange: the post-join partial-agg shuffle of
    // per-node rows. A second exchange would mean the full edge list
    // reshuffles every round — the at-scale killer.
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one shuffle in a CC round:\n$p")
  }
}
