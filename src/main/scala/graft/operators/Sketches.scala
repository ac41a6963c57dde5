package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregation — THE 100 TB pre-aggregation pattern:
  * sketch once per fine-grained segment (partition/day/source), persist
  * the binary sketches, then answer any coarser rollup by UNIONING
  * sketches instead of rescanning raw data. Spark 4 bundles Apache
  * DataSketches HLL natively (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`), so everything here stays inside Tungsten
  * aggregation — no UDAFs.
  *
  * NiFi parity: the CalculateRecordStats / QueryRecord COUNT(DISTINCT)
  * use cases at a scale where exact distinct is a full shuffle of all
  * keys; error is ~1.6%/sqrt(2^lgK) (≈0.8% at the lgK=14 default).
  */
object Sketches {

  /** Per-segment HLL sketches: one binary sketch per (segment, slice).
    * Persist this table; rollups never touch the raw data again. */
  def hllBySegment(df: DataFrame, segmentCols: Seq[String], valueCol: String,
                   lgK: Int = 14): DataFrame =
    df.groupBy(segmentCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Roll segment sketches up to coarser keys by sketch UNION — the
    * merge is associative and commutative, so any partial aggregation
    * order (map-side combine, AQE re-plan) gives identical sketches. */
  def hllRollup(sketches: DataFrame, rollupCols: Seq[String]): DataFrame =
    sketches.groupBy(rollupCols.map(col): _*)
      .agg(hll_union_agg(col("hll")).as("hll"))

  /** Distinct-count estimate column from a sketch column. */
  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** End-to-end convenience: estimated distinct `valueCol` per
    * `groupCols`, sketch-accurate (~0.8% at default lgK). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     lgK: Int = 14): DataFrame =
    hllBySegment(df, groupCols, valueCol, lgK)
      .select(groupCols.map(col) :+
        hll_sketch_estimate(col("hll")).cast("long").as("approx_distinct"): _*)

  // ------------------------------------------------- theta set algebra

  /** Two-level executor-side merge: per-partition blobs are shuffled
    * into ~√P groups and merged INSIDE executors; the driver collects
    * only the ≤√P group results. At 100 TB (~800k input partitions)
    * that is ~900 sketches to the driver instead of 800k — the merge
    * work itself stays distributed. */
  private def groupMerged(parts: org.apache.spark.sql.Dataset[Array[Byte]],
                          mergeGroup: Iterator[Array[Byte]] => Array[Byte])
      : Array[Array[Byte]] = {
    val p = math.max(1, parts.rdd.getNumPartitions)
    val groups = math.max(1, math.round(math.sqrt(p.toDouble)).toInt)
    parts.repartition(groups)
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty else Iterator.single(mergeGroup(it))
      }(org.apache.spark.sql.Encoders.BINARY)
      .collect()
  }

  /** One compact Theta sketch per partition of `valueCol` (strings),
    * merged executor-side to ≤√P group sketches. Theta sketches support
    * INTERSECTION, which HLL cannot — the tool for corpus-overlap
    * questions ("how much of source B is already in source A?") without
    * a full distinct-join. Executor-side work is a single hash-update
    * stream per partition; only ~KB-sized group sketches reach the
    * driver. */
  private[graft] def thetaGroupSketches(df: DataFrame, valueCol: String,
                                        lgK: Int): Array[Array[Byte]] = {
    import org.apache.datasketches.theta.{SetOperation, UpdateSketch, Sketches => DsSketches}
    val parts = df.select(col(valueCol)).mapPartitions { rows: Iterator[org.apache.spark.sql.Row] =>
      val sk = UpdateSketch.builder().setLogNominalEntries(lgK).build()
      rows.foreach(r => if (!r.isNullAt(0)) sk.update(r.getString(0)))
      Iterator.single(sk.compact().toByteArray)
    }(org.apache.spark.sql.Encoders.BINARY)
    groupMerged(parts, { it =>
      val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      it.foreach(b => u.union(DsSketches.wrapCompactSketch(
        org.apache.datasketches.memory.Memory.wrap(b))))
      u.getResult.toByteArray
    })
  }

  // -------------------------------------------------- KLL quantiles

  /** Per-partition KLL sketches merged executor-side to ≤√P group
    * sketches (same two-level posture as [[thetaGroupSketches]]). */
  private[graft] def kllGroupSketches(df: DataFrame, valueCol: String,
                                      k: Int): Array[Array[Byte]] = {
    import org.apache.datasketches.kll.KllDoublesSketch
    val parts = df.select(col(valueCol).cast("double")).mapPartitions { rows: Iterator[org.apache.spark.sql.Row] =>
      val sk = KllDoublesSketch.newHeapInstance(k)
      rows.foreach(r => if (!r.isNullAt(0)) sk.update(r.getDouble(0)))
      Iterator.single(sk.toByteArray)
    }(org.apache.spark.sql.Encoders.BINARY)
    groupMerged(parts, { it =>
      val m = KllDoublesSketch.newHeapInstance(k)
      it.foreach(b => m.merge(KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(b))))
      m.toByteArray
    })
  }

  /** Mergeable quantiles: one KLL sketch per partition of `valueCol`
    * (doubles), merged in two levels (executor groups → driver),
    * evaluated at `quantiles`. Completes the sketch family (HLL:
    * distinct counts, Theta: set algebra, KLL: distributions): unlike
    * `approx_percentile`, KLL sketches can be persisted per segment and
    * MERGED for any later rollup without rescanning — same
    * KB-sized-state posture as [[corpusOverlap]]. Returns one row per
    * requested quantile: (quantile, value). Normalized rank error ~1.7%
    * at the default k=200. */
  def quantileSketch(df: DataFrame, valueCol: String,
                     quantiles: Seq[Double], k: Int = 200): DataFrame = {
    import org.apache.datasketches.kll.KllDoublesSketch
    require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1),
      "quantiles must be in [0,1]")
    val spark = df.sparkSession
    val groups = kllGroupSketches(df, valueCol, k)
    val merged = KllDoublesSketch.newHeapInstance(k)
    groups.foreach { p =>
      merged.merge(KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(p)))
    }
    import spark.implicits._
    if (merged.isEmpty) quantiles.map(q => (q, Double.NaN)).toDF("quantile", "value")
    else quantiles.map(q => (q, merged.getQuantile(q))).toDF("quantile", "value")
  }

  /** Corpus overlap: estimated |A|, |B|, |A∩B| and Jaccard of the
    * distinct `valueCol` sets of two DataFrames (e.g. document
    * fingerprints of two sources, before committing to a full cross-
    * corpus dedup). Distributed sketching AND merging: executors union
    * per-partition sketches within √P groups; the driver only
    * union/intersects the ≤√P group results (KBs each). Returns one
    * row: (distinct_a, distinct_b, overlap, jaccard). */
  def corpusOverlap(a: DataFrame, b: DataFrame, valueCol: String,
                    lgK: Int = 14): DataFrame = {
    import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketches => DsSketches}
    val spark = a.sparkSession
    def unionOf(parts: Array[Array[Byte]]): CompactSketch = {
      val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      parts.foreach(p => u.union(DsSketches.wrapCompactSketch(
        org.apache.datasketches.memory.Memory.wrap(p))))
      u.getResult
    }
    val ua = unionOf(thetaGroupSketches(a, valueCol, lgK))
    val ub = unionOf(thetaGroupSketches(b, valueCol, lgK))
    val inter: Intersection = SetOperation.builder().buildIntersection()
    inter.intersect(ua); inter.intersect(ub)
    val est = (ua.getEstimate, ub.getEstimate, inter.getResult.getEstimate)
    val jac = if (est._1 + est._2 - est._3 <= 0) 0.0
              else est._3 / (est._1 + est._2 - est._3)
    import spark.implicits._
    Seq((math.round(est._1), math.round(est._2), math.round(est._3), jac))
      .toDF("distinct_a", "distinct_b", "overlap", "jaccard")
  }

  /** Corpus difference — the remaining Theta set operation (A-not-B):
    * estimated distinct values of `valueCol` present in `a` but NOT in
    * `b` ("how much NEW data does this source add?" before committing
    * to an ingest). Same two-level sketch posture as [[corpusOverlap]].
    * Returns one row: (distinct_a, distinct_b, a_not_b). */
  def corpusDifference(a: DataFrame, b: DataFrame, valueCol: String,
                       lgK: Int = 14): DataFrame = {
    import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches => DsSketches}
    val spark = a.sparkSession
    def unionOf(parts: Array[Array[Byte]]): CompactSketch = {
      val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      parts.foreach(p => u.union(DsSketches.wrapCompactSketch(
        org.apache.datasketches.memory.Memory.wrap(p))))
      u.getResult
    }
    val ua = unionOf(thetaGroupSketches(a, valueCol, lgK))
    val ub = unionOf(thetaGroupSketches(b, valueCol, lgK))
    val diff = SetOperation.builder().buildANotB().aNotB(ua, ub)
    import spark.implicits._
    Seq((math.round(ua.getEstimate), math.round(ub.getEstimate),
         math.round(diff.getEstimate)))
      .toDF("distinct_a", "distinct_b", "a_not_b")
  }

  // ---------------------------------------------- frequent items (MG)

  /** Heavy hitters over `valueCol` via the DataSketches frequent-items
    * sketch (Misra-Gries family): per-partition sketches of `maxMapSize`
    * counters merge executor-side to ≤√P groups ([[groupMerged]]), the
    * driver merges only the group blobs — a top-token / hot-key answer
    * at 100 TB without the full (token → exact count) shuffle.
    *
    * Guarantees (NO_FALSE_NEGATIVES): every item with true frequency
    * > the sketch's reported `max_error` is present, and
    * lower ≤ exact ≤ upper with upper − lower ≤ max_error (max_error ≈
    * 3.5·n/maxMapSize worst-case under purging/merging, 0 when nothing
    * ever evicted). In the no-eviction regime every estimate is EXACT
    * and partition-order-independent — which is what lets a SQL oracle
    * check the query form on the bounded-vocabulary corpus while the
    * spec exercises the eviction regime.
    *
    * Returns (item, estimate, lower_bound, upper_bound, max_error),
    * one row per reported item. */
  def frequentItems(df: DataFrame, valueCol: String, maxMapSize: Int): DataFrame = {
    // DataSketches ItemsSketch requires a power-of-two map size; fail
    // clearly on the driver instead of an opaque
    // SketchesArgumentException inside an executor task.
    require(maxMapSize > 0 && Integer.bitCount(maxMapSize) == 1,
      s"frequentItems: maxMapSize must be a power of two, got $maxMapSize")
    import org.apache.datasketches.common.ArrayOfStringsSerDe
    import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
    val spark = df.sparkSession
    val serde = new ArrayOfStringsSerDe()
    val parts = df.select(col(valueCol)).mapPartitions { rows: Iterator[org.apache.spark.sql.Row] =>
      val sk = new ItemsSketch[String](maxMapSize)
      rows.foreach(r => if (!r.isNullAt(0)) sk.update(r.getString(0)))
      Iterator.single(sk.toByteArray(new ArrayOfStringsSerDe()))
    }(org.apache.spark.sql.Encoders.BINARY)
    val merged = new ItemsSketch[String](maxMapSize)
    groupMerged(parts, { it =>
      val g = new ItemsSketch[String](maxMapSize)
      it.foreach(b => g.merge(ItemsSketch.getInstance(
        org.apache.datasketches.memory.Memory.wrap(b), new ArrayOfStringsSerDe())))
      g.toByteArray(new ArrayOfStringsSerDe())
    }).foreach(b => merged.merge(ItemsSketch.getInstance(
      org.apache.datasketches.memory.Memory.wrap(b), serde)))
    import spark.implicits._
    val maxErr = merged.getMaximumError
    merged.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound, maxErr))
      .toSeq.toDF("item", "estimate", "lower_bound", "upper_bound", "max_error")
  }

  // ------------------------------------------- bloom-prefiltered anti

  /** Serialized Bloom filter over xxhash64(`keyCol`) of `df`: built
    * per-partition (spark-sketch `BloomFilter`, the same implementation
    * Spark's runtime row-level filtering uses), merged executor-side to
    * ≤√P groups, final OR on the driver. Size the filter for the build
    * side: ~1.2 GB at 10⁹ keys / 1% fpp — past broadcast comfort,
    * shard the build side and run this per shard. */
  private[graft] def bloomBytes(df: DataFrame, keyCol: String,
                                expectedItems: Long, fpp: Double): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    def ser(bf: BloomFilter): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray
    }
    val parts = df.select(xxhash64(col(keyCol))).mapPartitions { rows: Iterator[org.apache.spark.sql.Row] =>
      val bf = BloomFilter.create(expectedItems, fpp)
      rows.foreach(r => if (!r.isNullAt(0)) bf.putLong(r.getLong(0)))
      Iterator.single(ser(bf))
    }(org.apache.spark.sql.Encoders.BINARY)
    val merged = org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
    groupMerged(parts, { it =>
      val g = BloomFilter.create(expectedItems, fpp)
      it.foreach(b => g.mergeInPlace(BloomFilter.readFrom(b)))
      ser(g)
    }).foreach(b => merged.mergeInPlace(
      org.apache.spark.util.sketch.BloomFilter.readFrom(b)))
    ser(merged)
  }

  /** Predicate Column: does the serialized bloom possibly contain
    * xxhash64(`key`)? Uses Catalyst's native `BloomFilterMightContain`
    * (codegen'd, deserializes the filter once per task) — the exact
    * expression Spark's own runtime filters inject. */
  def bloomMightContain(bloom: Array[Byte], key: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloom, org.apache.spark.sql.types.BinaryType),
      XxHash64(Seq(ColumnBridge.expression(key)), 42L)))
  }

  /** Per-shard Bloom blobs over `shards` xxhash64 hash ranges: shard
    * s gets ONE filter over the keys with pmod(xxhash64(key), S) = s,
    * sized for that shard's OWN key count — the build is a plain
    * groupBy-shard aggregation of 12-byte (shard, hash) rows, so
    * nothing corpus-proportional ever materializes per input
    * partition. This removes the unsharded build's 100×-scale
    * ceiling, where each of P partitions allocated (and shipped) a
    * filter sized for the GLOBAL key count — ~1.2 GB each at 10⁹
    * keys / 1% fpp — because Bloom OR-merge requires equal bit arrays.
    * Here each blob is ×S smaller and a shard's filter is built
    * exactly once.
    *
    * Sizing: with `expectedItems > 0` each shard filter is created
    * upfront at expectedItems/S and the group streams (no buffering);
    * otherwise the group buffers its 8-byte hashes and creates an
    * EXACTLY-sized filter — no pre-count action over the history
    * side. At 10⁹ keys / S=64 the buffer is 16M longs ≈ 128 MB per
    * group task, bounded by choosing S for the target scale.
    *
    * Returns shard → serialized blob; shards with no keys are absent
    * (their probes are definitely-new). */
  private[graft] def shardedBloomBytes(df: DataFrame, keyCol: String,
                                       shards: Int, fpp: Double,
                                       expectedItems: Long = -1L): Map[Int, Array[Byte]] = {
    import org.apache.spark.util.sketch.BloomFilter
    require(shards > 0, s"shardedBloomBytes: shards must be > 0, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    def ser(bf: BloomFilter): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray
    }
    df.select(xxhash64(col(keyCol)).as("h"))
      .select(pmod(col("h"), lit(shards.toLong)).cast("int").as("shard"), col("h"))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val bf =
          if (expectedItems > 0) {
            val b = BloomFilter.create(
              math.max(64L, expectedItems / shards), fpp)
            it.foreach(t => b.putLong(t._2))
            b
          } else {
            val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
            it.foreach(t => buf += t._2)
            val b = BloomFilter.create(math.max(1L, buf.length.toLong), fpp)
            buf.foreach(b.putLong)
            b
          }
        (shard, ser(bf))
      }
      .collect().toMap
  }

  /** Probe Column for a sharded bloom: ONE xxhash64 per probed row —
    * [[graft.plans.ShardedBloomMightContain]] reuses the single hash
    * for both the shard dispatch (array index, replacing r11's
    * S-branch when-chain that re-evaluated pmod(xxhash64, S) per
    * branch) and the membership probe. Keys landing in an absent
    * shard are definite misses. */
  private[graft] def shardedMightContain(blobs: Map[Int, Array[Byte]],
                                         shards: Int, key: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.ShardedBloomMightContain(blobs, shards,
      XxHash64(Seq(ColumnBridge.expression(key)), 42L)))
  }

  /** EXACT incremental anti-join with a Bloom pre-filter — the 100 TB
    * "which of today's records are genuinely new?" primitive. Rows
    * whose key hash misses the history bloom are definitely new (a
    * bloom has no false negatives) and never enter the join; only the
    * `fpp` false-positive sliver plus true duplicates anti-join the
    * history table. The result is row-identical to
    * `incoming.join(history, keys, "left_anti")` (hash collisions can
    * only ADD a candidate, and the exact anti-join then removes real
    * matches), but the join input shrinks from |incoming| to
    * ~|dups| + fpp·|incoming|. Null keys: treated like any value
    * (xxhash64 of null hashes the seed; the anti-join's null-safe
    * semantics are the plain Spark ones — anti keeps null-keyed rows).
    *
    * The filter is built SHARDED ([[shardedBloomBytes]]): `shards`
    * hash-range filters, each sized for its own shard's exact key
    * count — so no global expectedItems is needed (passing one merely
    * skips the per-group buffering) and no partition ever allocates a
    * global-sized bit array. Choose `shards` so historyKeys/shards
    * fits a task comfortably (64 shards ⇒ ~16M keys/shard at 10⁹).
    *
    * Plan-size ceiling (inherent to ANY plan-resident filter): the
    * S blobs together are still ~one global filter's bytes, shipped
    * once per task closure as expression references — ~1.2 GB at 10⁹
    * keys / 1 % fpp. Below ~10⁸ history keys (~120 MB) that is the
    * fastest shape; beyond it, skip the bloom and use the
    * DataFrame-join fallback — pre-bucket BOTH sides on
    * pmod(xxhash64(key), S) and run the plain co-partitioned
    * `left_anti` join (identical rows, filters never enter the
    * plan; the bloom's only job was shrinking that join's probe
    * side, which at that scale it no longer pays for). */
  def bloomAntiJoin(incoming: DataFrame, history: DataFrame, keyCol: String,
                    expectedItems: Long = -1L, fpp: Double = 0.01,
                    shards: Int = 32): DataFrame = {
    val blobs = shardedBloomBytes(history, keyCol, shards, fpp, expectedItems)
    val might = shardedMightContain(blobs, shards, col(keyCol))
    val definiteNew = incoming.filter(!might)
    val candidates = incoming.filter(might)
      .join(history.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definiteNew.unionByName(candidates)
  }
}
