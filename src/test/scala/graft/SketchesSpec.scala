package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Mergeable HLL sketches: estimates track exact distinct counts, and
  * the union rollup equals sketching the raw data directly — the
  * property that lets a 100 TB pipeline pre-aggregate once and answer
  * every coarser rollup from sketches. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def events = (0 until 20000).map { i =>
    // day in 0..9, source in 0..3, user ids overlapping across days
    (i % 10, s"s${i % 4}", s"user${i % 1327}")
  }.toDF("day", "source", "user")

  private val sf = "/root/testdata/sf0.001"

  test("approxDistinct within 2% of exact per group") {
    val approx = Sketches.approxDistinct(events, Seq("source"), "user")
      .as[(String, Long)].collect().toMap
    val exact = events.groupBy("source").agg(countDistinct("user").as("d"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.02,
        s"group $k: approx $ap vs exact $ex")
    }
  }

  test("rollup of per-(day,source) sketches equals sketching raw data") {
    val fine = Sketches.hllBySegment(events, Seq("day", "source"), "user")
    val rolled = Sketches.hllRollup(fine, Seq("source"))
      .select(col("source"), Sketches.hllEstimate(col("hll")).cast("long").as("est"))
      .as[(String, Long)].collect().toMap
    val direct = Sketches.hllBySegment(events, Seq("source"), "user")
      .select(col("source"), Sketches.hllEstimate(col("hll")).cast("long").as("est"))
      .as[(String, Long)].collect().toMap
    // merge-then-estimate must EQUAL estimate-of-direct-sketch: HLL
    // union is lossless over register maxima, not an approximation of
    // an approximation
    assert(rolled === direct)
  }

  test("theta corpusOverlap estimates |A|, |B|, intersection and jaccard") {
    // A = users 0..9999, B = users 5000..14999 → overlap 5000, jaccard 1/3
    val a = (0 until 10000).map(i => s"u$i").toDF("k").repartition(4)
    val b = (5000 until 15000).map(i => s"u$i").toDF("k").repartition(3)
    val r = Sketches.corpusOverlap(a, b, "k")
      .as[(Long, Long, Long, Double)].head
    assert(math.abs(r._1 - 10000).toDouble / 10000 <= 0.03, s"|A| ${r._1}")
    assert(math.abs(r._2 - 10000).toDouble / 10000 <= 0.03, s"|B| ${r._2}")
    assert(math.abs(r._3 - 5000).toDouble / 5000 <= 0.06, s"overlap ${r._3}")
    assert(math.abs(r._4 - 1.0 / 3) <= 0.03, s"jaccard ${r._4}")
    // disjoint corpora → ~zero overlap
    val d = Sketches.corpusOverlap(
      Seq("x1", "x2", "x3").toDF("k"), Seq("y1", "y2").toDF("k"), "k")
      .as[(Long, Long, Long, Double)].head
    assert(d._3 === 0L && d._4 === 0.0)
  }

  test("theta corpusDifference estimates |A \\ B|") {
    // A = 0..9999, B = 5000..14999 → A\B = 5000
    val a = (0 until 10000).map(i => s"u$i").toDF("k").repartition(4)
    val b = (5000 until 15000).map(i => s"u$i").toDF("k").repartition(3)
    val r = Sketches.corpusDifference(a, b, "k").as[(Long, Long, Long)].head
    assert(math.abs(r._3 - 5000).toDouble / 5000 <= 0.06, s"a_not_b ${r._3}")
    // B fully covers A → nothing new
    val covered = Sketches.corpusDifference(
      Seq("x1", "x2").toDF("k"), Seq("x1", "x2", "x3").toDF("k"), "k")
      .as[(Long, Long, Long)].head
    assert(covered._3 === 0L)
  }

  test("HLL sketch aggregation works on a watermarked stream") {
    // streaming distinct-users per window: the sketch agg is just
    // another Tungsten aggregate, so it composes with watermark state
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Timestamp)]
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    ms.addData(("u1", ts(10)), ("u2", ts(20)), ("u1", ts(30)), // window 0
               ("u3", ts(70)), ("u3", ts(80)))                 // window 1
    val agged = ms.toDF.toDF("user", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(hll_sketch_agg(col("user")).as("hll"))
      .select(col("window.start").as("w"),
        hll_sketch_estimate(col("hll")).cast("long").as("users"))
    // Complete mode: with all data preloaded the watermark never passes
    // the windows, so Append would emit nothing before the query stops
    val q = graft.streaming.Streams.toMemorySink(agged, "hll_stream",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    q.processAllAvailable(); q.stop()
    val rows = spark.table("hll_stream")
      .select(date_format(col("w"), "mm").cast("int"), col("users"))
      .as[(Int, Long)].collect().toMap
    assert(rows === Map(0 -> 2L, 1 -> 1L))
  }

  test("KLL quantile sketch tracks exact percentiles within rank tolerance") {
    // uniform 0..99999 shuffled across partitions: quantile q ≈ 100000q
    val vals = scala.util.Random.shuffle((0 until 100000).toVector)
      .map(_.toDouble).toDF("v").repartition(8)
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val got = Sketches.quantileSketch(vals, "v", qs)
      .as[(Double, Double)].collect().toMap
    qs.foreach { q =>
      val expected = q * 100000
      // 1.7% normalized RANK error at k=200 → value error ~1700 on uniform
      assert(math.abs(got(q) - expected) <= 2500,
        s"q=$q got ${got(q)} expected ~$expected")
    }
    // empty input → NaN values, not a crash
    val empty = Sketches.quantileSketch(vals.filter(col("v") < 0), "v", Seq(0.5))
      .as[(Double, Double)].head
    assert(empty._2.isNaN)
  }

  test("theta/KLL merge is two-level: driver collects ≤√P group sketches") {
    // 36 input partitions → ≤6 group sketches reach the driver; the
    // per-partition merge happens inside executors (the 100 TB posture:
    // ~800k partitions → ~900 driver blobs, not 800k)
    val df = (0 until 50000).map(i => s"u${i % 4000}").toDF("k").repartition(36)
    val g = Sketches.thetaGroupSketches(df, "k", 14)
    assert(g.length <= 6 && g.nonEmpty, s"got ${g.length} group sketches for 36 partitions")
    // 4000 distinct < 2^14 nominal entries → every sketch is in EXACT
    // mode, so the two-level union estimate is exactly the distinct
    // count regardless of merge grouping
    import org.apache.datasketches.theta.{SetOperation, Sketches => DsSketches}
    val u = SetOperation.builder().setLogNominalEntries(14).buildUnion()
    g.foreach(b => u.union(DsSketches.wrapCompactSketch(
      org.apache.datasketches.memory.Memory.wrap(b))))
    assert(math.round(u.getResult.getEstimate) === 4000L)

    val vals = (0 until 10000).map(_.toDouble).toDF("v").repartition(25)
    val kg = Sketches.kllGroupSketches(vals, "v", 200)
    assert(kg.length <= 5 && kg.nonEmpty, s"got ${kg.length} KLL group sketches for 25 partitions")
  }

  test("global rollup from fine segments matches exact total distinct within 2%") {
    val fine = Sketches.hllBySegment(events, Seq("day"), "user")
    val total = Sketches.hllRollup(fine, Nil)
      .select(Sketches.hllEstimate(col("hll")).cast("long")).as[Long].head
    val exact = events.select(countDistinct("user")).as[Long].head
    assert(math.abs(total - exact).toDouble / exact <= 0.02,
      s"rolled $total vs exact $exact")
  }

  test("frequentItems under eviction: guarantees hold on a skewed stream") {
    // zipf-ish: item i appears ~N/i times; distinct (1000) >> maxMapSize (32)
    val rows = (1 to 1000).flatMap(i => Seq.fill(2000 / i)(s"item$i"))
    val df = rows.toDF("v").repartition(13)
    val n = rows.size.toLong
    val exact = rows.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val out = Sketches.frequentItems(df, "v", maxMapSize = 32)
      .as[(String, Long, Long, Long, Long)].collect()
    val maxErr = out.head._5
    // eviction really happened, and the error stays within the
    // documented ~3.5n/maxMapSize Misra-Gries purge bound
    assert(maxErr > 0 && maxErr <= 3.5 * n / 32, s"max_error $maxErr")
    // NO_FALSE_NEGATIVES: every item above the sketch's own error bound reported
    val reported = out.map(_._1).toSet
    exact.filter(_._2 > maxErr).keys.foreach(k =>
      assert(reported.contains(k), s"missing heavy hitter $k (maxErr $maxErr)"))
    // bounds bracket the exact count, interval <= max_error
    out.foreach { case (item, est, lb, ub, _) =>
      val ex = exact(item)
      assert(lb <= ex && ex <= ub, s"$item: exact $ex outside [$lb,$ub]")
      assert(est >= lb && est <= ub && (ub - lb) <= maxErr)
    }
  }

  test("frequentItems with no eviction is exact") {
    val rows = (1 to 20).flatMap(i => Seq.fill(i * 3)(s"w$i"))
    val out = Sketches.frequentItems(rows.toDF("v").repartition(7), "v", 64)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.length === 20)
    out.foreach { case (item, est, lb, ub, me) =>
      assert(est === item.drop(1).toInt * 3 && lb === est && ub === est && me === 0L)
    }
  }

  test("bloomAntiJoin is row-identical to a plain left_anti join") {
    val docs = Tables.documents(spark, sf)
    val history = docs.filter($"doc_id" % 3 === 0).select($"text")
    val incoming = docs.select($"doc_id", $"text")
    // tight fpp AND a sloppy one: both must be exact, only the join
    // input size differs
    for (fpp <- Seq(0.01, 0.5)) {
      val got = Sketches.bloomAntiJoin(incoming, history, "text", fpp = fpp)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val want = incoming.join(history.distinct(), Seq("text"), "left_anti")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got === want, s"fpp=$fpp")
    }
  }

  test("bloomMightContain: no false negatives over the build set") {
    val keys = (1L to 500L).map(i => s"k$i")
    val bloom = Sketches.bloomBytes(keys.toDF("k"), "k", 500, 0.03)
    val hits = keys.toDF("k")
      .filter(Sketches.bloomMightContain(bloom, $"k")).count()
    assert(hits === 500L)
  }

  test("sharded bloom: per-blob size shrinks ~×S; exact sizing needs no count") {
    val keys = (1L to 4000L).map(i => s"key$i").toDF("k")
    val single = Sketches.bloomBytes(keys, "k", 4000L, 0.01)
    for (s <- Seq(4, 16)) {
      val blobs = Sketches.shardedBloomBytes(keys, "k", shards = s, fpp = 0.01)
      assert(blobs.size === s) // 4000 hashes populate every shard
      // exact per-shard sizing: each blob is ~1/S of the single filter
      // (shard counts vary ±, allow 2×/S as the ceiling)
      val maxBlob = blobs.values.map(_.length).max
      assert(maxBlob.toLong * s < single.length.toLong * 2,
        s"S=$s maxBlob=$maxBlob single=${single.length}")
      // no false negatives through the sharded probe
      val misses = keys.filter(
        !Sketches.shardedMightContain(blobs, s, $"k")).count()
      assert(misses === 0L)
    }
  }

  test("bloomAntiJoin: shards with no history keys are definite-new") {
    // 2 history keys over 64 shards → ≥62 shards absent; every incoming
    // row in an absent shard must pass through as new.
    val history = Seq("h1", "h2").toDF("text")
    val incoming = ((1 to 200).map(i => s"n$i") ++ Seq("h1", "h2")).toDF("text")
    val got = Sketches.bloomAntiJoin(incoming, history, "text", shards = 64)
      .as[String].collect().sorted.toSeq
    assert(got === (1 to 200).map(i => s"n$i").sorted)
  }

  test("frequentItems: non-power-of-two maxMapSize fails on the driver") {
    val df = Seq("a", "b").toDF("v")
    val e = intercept[IllegalArgumentException] {
      Sketches.frequentItems(df, "v", maxMapSize = 48)
    }
    assert(e.getMessage.contains("power of two"))
  }
}
