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

  test("packSequences: offset-chunk packing per shard, docs never split") {
    val cap = 100L
    val docs = Seq(
      (1L, 0L, 40L), (2L, 0L, 40L), (3L, 0L, 40L), (4L, 0L, 90L),
      (11L, 1L, 60L), (12L, 1L, 60L), (13L, 1L, 150L), (14L, 1L, 10L)
    ).toDF("doc_id", "shard", "n_tok")
    val packed = graft.operators.Scale
      .packSequences(docs, "shard", "doc_id", "n_tok", cap)
      .select("shard", "pack_id", "doc_id", "n_tok")
      .as[(Long, Long, Long, Long)].collect()
    val byPack = packed.groupBy(p => (p._1, p._2)).view
      .mapValues(_.map(_._3).sorted.toSeq).toMap
    // shard 0 offsets: 0,40,80,120 -> doc 3 STARTS before the 100
    // boundary so it joins pack 0 (pack may run over by the straddler)
    assert(byPack((0L, 0L)) === Seq(1L, 2L, 3L))
    assert(byPack((0L, 1L)) === Seq(4L))
    // shard 1 offsets: 0,60,120,270 -> the oversized doc 13 spans packs
    // 1..2 but is assigned where it starts; doc 14 starts in pack 2
    assert(byPack((1L, 0L)) === Seq(11L, 12L))
    assert(byPack((1L, 1L)) === Seq(13L))
    assert(byPack((1L, 2L)) === Seq(14L))
    // invariants: packs are contiguous runs, and every pack's first doc
    // starts inside that pack's token window
    packed.groupBy(p => (p._1, p._2)).foreach { case ((shard, pack), ds) =>
      val inShard = packed.filter(_._1 == shard).sortBy(_._3)
      val firstDoc = ds.map(_._3).min
      val start = inShard.takeWhile(_._3 != firstDoc).map(_._4).sum
      assert(start >= pack * cap && start < (pack + 1) * cap,
        s"pack ($shard,$pack) first doc starts at offset $start")
    }
  }

  test("packSequences matches the cumulative-offset reference on random corpora") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      (i.toLong, (i % 11).toLong, (rnd.nextInt(120) + 1).toLong)
    }
    val cap = 97L
    val got = graft.operators.Scale
      .packSequences(rows.toDF("doc_id", "shard", "n_tok"), "shard", "doc_id", "n_tok", cap)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    // reference: per shard, pack = floor(prior-cumulative-size / cap)
    val expected = rows.groupBy(_._2).flatMap { case (_, docs) =>
      docs.sortBy(_._1).scanLeft(((-1L), 0L)) { case ((_, acc), (id, _, n)) =>
        (id, acc + n)
      }.drop(1).zip(docs.sortBy(_._1)).map { case ((id, cum), (_, _, n)) =>
        id -> (cum - n) / cap
      }
    }
    assert(got === expected)
  }

  test("sampleStratified keeps deterministic per-stratum fractions") {
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    val kept = graft.operators.Scale
      .sampleStratified(df, "id", "src", Map("a" -> 0.5), defaultRate = 0.1)
      .select("id", "src").as[(Long, String)].collect()
    val aKept = kept.count(_._2 == "a")
    val bKept = kept.count(_._2 == "b")
    // id%100<50 over evens of 0..999: exactly half of stratum a
    assert(aKept === 250 && bKept === 50)
    // deterministic: the same call yields the same rows
    val again = graft.operators.Scale
      .sampleStratified(df, "id", "src", Map("a" -> 0.5), defaultRate = 0.1)
      .select("id", "src").as[(Long, String)].collect()
    assert(kept.sorted === again.sorted)
    intercept[IllegalArgumentException] {
      graft.operators.Scale.sampleStratified(df, "id", "src", Map("a" -> 1.5))
    }
  }

  test("globalShuffle: exact permutation, reproducible, seed-sensitive") {
    val df = (0L until 500L).map(i => (i, s"doc$i")).toDF("id", "body")
    val a = Scale.globalShuffle(df, "id", "epoch1", numPartitions = 7)
    val rows = a.select("id", "pos").as[(Long, Long)].collect()
    // positions are exactly 0..n-1 (a permutation, no gaps/dupes)
    assert(rows.map(_._2).sorted.toSeq === (0L until 500L))
    // every column survives
    assert(a.columns.toSeq === Seq("id", "body", "pos"))
    // reproducible: same seed gives the identical assignment
    val b = Scale.globalShuffle(df, "id", "epoch1", numPartitions = 3)
      .select("id", "pos").as[(Long, Long)].collect()
    assert(rows.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq)
    // a different seed is a genuinely different permutation
    val c = Scale.globalShuffle(df, "id", "epoch2", numPartitions = 7)
      .select("id", "pos").as[(Long, Long)].collect()
    assert(rows.sortBy(_._1).map(_._2).toSeq !== c.sortBy(_._1).map(_._2).toSeq)
    // and matches the reference permutation computed driver-side
    val expected = (0L until 500L).sortBy { i =>
      val k = java.security.MessageDigest.getInstance("MD5")
        .digest(s"epoch1:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (k, i)
    }.zipWithIndex.map { case (id, p) => id -> p.toLong }.toMap
    rows.foreach { case (id, p) => assert(p === expected(id)) }
  }

  test("partition-count config parsing tolerates non-numeric platform values") {
    // platforms with auto-optimized shuffle set shuffle.partitions to
    // e.g. "auto" (OSS Spark's int-conf validation rejects it at set
    // time, so the conf itself can't be faked here) — the parse must
    // fall back, not NumberFormatException
    var fallbackUsed = 0
    def fb: Int = { fallbackUsed += 1; 7 }
    assert(Scale.parsePartitions("32", fb) === 32)
    assert(fallbackUsed === 0) // by-name fallback untouched on the numeric path
    assert(Scale.parsePartitions("auto", fb) === 7)
    assert(Scale.parsePartitions("", fb) === 7)
    assert(Scale.parsePartitions("-4", fb) === 7)
    assert(Scale.parsePartitions(" 16 ", fb) === 16)
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

  /** The naive per-source-window reference tokenBudgetSample must match:
    * per source, docs in (md5(seed:id), id) order keep while cumulative
    * tokens stay within budget. */
  private def budgetReference(rows: Seq[(Long, String, Long)],
                              budgets: Map[String, Long],
                              seed: String): Set[Long] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.filter(r => budgets.contains(r._2)).groupBy(_._2).flatMap {
      case (src, docs) =>
        var cum = 0L
        docs.sortBy(r => (md5hex(s"$seed:${r._1}"), r._1)).flatMap { r =>
          cum += r._3
          if (cum <= budgets(src)) Some(r._1) else None
        }
    }.toSet
  }

  test("tokenBudgetSample: equals the per-source-window reference at any partitioning") {
    val rng = new scala.util.Random(7)
    val rows = (1L to 400L).map(i =>
      (i, s"s${rng.nextInt(5)}", 1L + rng.nextInt(50)))
    val budgets = Map("s0" -> 300L, "s1" -> 0L, "s2" -> 10000L, "s3" -> 777L)
    val expected = budgetReference(rows, budgets, "t1")
    val df = rows.toDF("doc_id", "source", "n_tok")
    for (parts <- Seq(1, 3, 16)) {
      val got = Scale.tokenBudgetSample(df.repartition(parts % 5 + 1),
          "doc_id", "source", "n_tok", budgets, "t1", numBuckets = parts)
        .select("doc_id").as[Long].collect().toSet
      assert(got == expected, s"mismatch at numPartitions=$parts")
    }
    // budget semantics double-check: kept token sums within budget and
    // maximal (the reference already encodes it, but assert directly)
    val kept = Scale.tokenBudgetSample(df, "doc_id", "source", "n_tok",
        budgets, "t1")
      .groupBy("source").agg(sum("n_tok").as("toks"))
      .as[(String, Long)].collect().toMap
    kept.foreach { case (src, toks) => assert(toks <= budgets(src)) }
    assert(!kept.contains("s1") && !kept.contains("s4"),
      "zero-budget and unbudgeted sources must be dropped")
  }

  test("tokenBudgetSample rejects reserved columns and empty budgets") {
    val df = Seq((1L, "a", 2L)).toDF("doc_id", "source", "n_tok")
    intercept[IllegalArgumentException](
      Scale.tokenBudgetSample(df, "doc_id", "source", "n_tok", Map.empty, "x"))
    intercept[IllegalArgumentException](
      Scale.tokenBudgetSample(df.withColumn("__mix_key", lit(1)),
        "doc_id", "source", "n_tok", Map("a" -> 1L), "x"))
    intercept[IllegalArgumentException](
      Scale.tokenBudgetSample(df, "doc_id", "source", "n_tok",
        Map("a" -> -1L), "x"))
  }

  test("unimaxQuota: water level fills capped sources then re-shares") {
    // per-source token sums: A=10, B=20, C=100; caps ×2 → 20, 40, 200
    val df = Seq(("A", 4L), ("A", 6L), ("B", 20L), ("C", 60L), ("C", 40L))
      .toDF("src", "tok")
    // B=60: u walks 20, 20, 0 → θ=20; A capped AT the level, B/C levelled
    val q = Scale.unimaxQuota(df, "src", "tok", totalBudget = 60L, maxEpochs = 2.0)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("quota_tokens"), r.getAs[Boolean]("capped"))).toMap
    assert(q("A") == (20.0, true))
    assert(q("B") == (20.0, false))
    assert(q("C") == (20.0, false))
    assert(q.values.map(_._1).sum == 60.0) // budget exactly consumed
  }

  test("temperatureQuota: sqrt shares oversample small sources — the UniMax contrast") {
    val df = Seq(("A", 100L), ("B", 400L)).toDF("src", "tok")
    // weights √100=10, √400=20 → shares 1/3, 2/3 of B=330
    val q = Scale.temperatureQuota(df, "src", "tok", totalBudget = 330L)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("share"), r.getAs[Double]("quota_tokens"),
          r.getAs[Double]("epochs_used"))).toMap
    assert(q("A") == (10.0 / 30, 330.0 * (10.0 / 30), 330.0 * (10.0 / 30) / 100))
    assert(q("B") == (20.0 / 30, 330.0 * (20.0 / 30), 330.0 * (20.0 / 30) / 400))
    assert(q("A")._3 > 1.0) // the small source oversamples past 1 epoch
    assert(q("B")._3 < 1.0) // while the large one under-fills
    intercept[IllegalArgumentException](
      Scale.temperatureQuota(df, "src", "tok", 330L, alpha = 1.5))
  }

  test("unimaxQuota: under-filled budget degrades to caps (ran out of data)") {
    val df = Seq(("A", 10L), ("B", 20L), ("C", 100L)).toDF("src", "tok")
    val q = Scale.unimaxQuota(df, "src", "tok", totalBudget = 1000L, maxEpochs = 2.0)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("quota_tokens"), r.getAs[Double]("epochs_used"),
          r.getAs[Boolean]("capped"))).toMap
    assert(q("A") == (20.0, 2.0, true))
    assert(q("B") == (40.0, 2.0, true))
    assert(q("C") == (200.0, 2.0, true))
  }

  test("doremiWeights: excess loss upweights, smoothing floors, weights sum to 1") {
    // domain A has headroom (excess 2), B a little (0.5), C none
    // (negative excess — clipped to 0 by the paper's rectification)
    val df = Seq(("A", 2.0), ("A", 2.0), ("B", 0.5), ("C", -1.0), ("C", -3.0))
      .toDF("dom", "x")
    val w = Scale.doremiWeights(df, "dom", "x", eta = 1.0, iters = 5,
        smoothing = 0.01)
      .collect().map(r => r.getAs[String]("domain") ->
        (r.getAs[Double]("excess"), r.getAs[Double]("weight"),
          r.getAs[Double]("avg_weight"))).toMap
    assert(w("A")._1 == 2.0 && w("B")._1 == 0.5 && w("C")._1 == 0.0)
    // monotone in excess, both final and averaged
    assert(w("A")._2 > w("B")._2 && w("B")._2 > w("C")._2)
    assert(w("A")._3 > w("B")._3 && w("B")._3 > w("C")._3)
    // each step renormalizes: final and averaged weights sum to 1
    assert(math.abs(w.values.map(_._2).sum - 1.0) < 1e-12)
    assert(math.abs(w.values.map(_._3).sum - 1.0) < 1e-12)
    // the smoothing floor: no weight below c/S even for zero-excess C
    assert(w("C")._2 >= 0.01 / 3 - 1e-15)
    // more steps concentrate more mass on the headroom domain
    val w1 = Scale.doremiWeights(df, "dom", "x", eta = 1.0, iters = 1,
        smoothing = 0.01)
      .collect().map(r => r.getAs[String]("domain") -> r.getAs[Double]("weight")).toMap
    assert(w("A")._2 > w1("A"))
    intercept[IllegalArgumentException](
      Scale.doremiWeights(df, "dom", "x", eta = 0.0))
    intercept[IllegalArgumentException](
      Scale.doremiWeights(df, "dom", "x", iters = 0))
    intercept[IllegalArgumentException](
      Scale.doremiWeights(df, "dom", "x", smoothing = 1.0))
  }

  test("doremiWeights is bitwise invariant to input partitioning") {
    // quarter-step values: every partial sum is exactly representable,
    // so the one order-sensitive reduction (the per-domain mean's
    // partial aggregation) is exact and the bitwise claim is testable;
    // everything downstream is ordered-window accumulation by design
    val rows = (1 to 400).map(i => (s"d${i % 7}", (i % 13) * 0.25 - 1.0))
    val a = Scale.doremiWeights(rows.toDF("dom", "x").repartition(1), "dom", "x")
      .orderBy("domain").collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    val b = Scale.doremiWeights(rows.toDF("dom", "x").repartition(11), "dom", "x")
      .orderBy("domain").collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    assert(a.toSeq == b.toSeq) // exact equality — ordered normalizer accumulation
  }
}
