package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew/layout utilities for the 100 TB posture (SURVEY.md §5):
  * salting for skewed join keys, bucketing for shuffle-free repeated
  * joins. */
object Scale {

  /** Salted join for skewed keys: the big (skewed) side gets a
    * deterministic salt in [0, saltFactor); the small side is exploded
    * saltFactor× so every (key, salt) bucket finds its match. Turns one
    * hot partition into `saltFactor` even ones. Use when AQE's skew
    * splitting isn't enough (e.g. a single key holding >GB). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int, how: String = "inner"): DataFrame = {
    // Only big-side-preserving modes are sound: the small side is
    // exploded saltFactor×, so any mode that emits UNMATCHED small rows
    // ("right"/"full"/right_semi/right_anti) would emit each of them
    // saltFactor times. Each big row carries exactly one salt, so
    // inner/left/left_semi/left_anti emit big rows exactly once.
    val allowed = Set("inner", "left", "left_outer", "leftouter",
                      "left_semi", "leftsemi", "semi",
                      "left_anti", "leftanti", "anti")
    require(allowed.contains(how.toLowerCase.replace(" ", "")),
      s"saltedJoin: join type '$how' would duplicate unmatched small-side rows " +
      s"${saltFactor}x; use one of $allowed (swap sides for right-preserving joins)")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", how).drop("__salt")
  }

  /** Broadcast range join: enrich a big fact stream against a SMALL
    * interval table (IP→geo ranges, tier thresholds, time buckets) —
    * `value ∈ [startCol, endCol]`. The ranges side is broadcast, so the
    * big side is never shuffled and Catalyst plans
    * BroadcastNestedLoopJoin with the band predicate pushed into the
    * probe — the only formulation that survives 100 TB on the fact side
    * (a shuffle range-join would re-partition the big side for nothing;
    * a cross join would explode). Ranges must stay broadcast-size. */
  def broadcastRangeJoin(big: DataFrame, ranges: DataFrame,
                         value: org.apache.spark.sql.Column,
                         startCol: String, endCol: String,
                         how: String = "inner"): DataFrame = {
    // Materialize `value` in a projection BELOW the join: a nested-loop
    // join re-evaluates its condition per (row × range) pair, so an
    // expensive probe expression (regex, parsing) left inline would run
    // |ranges|× per row (measured 6× slower on the IP-lookup bench).
    big.withColumn("__range_v", value)
      .join(broadcast(ranges),
        col("__range_v") >= col(startCol) && col("__range_v") <= col(endCol), how)
      .drop("__range_v")
  }

  /** Bucketed write: pre-shuffles once at write time so every future
    * join/agg on `bucketCols` is shuffle-free (Spark reads bucket
    * layout from the catalog). `table` lands in the session warehouse. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Training-sequence packing (LLM pipeline): concat-and-chunk — view
    * each shard's documents (in `orderCol` order) as one concatenated
    * token stream and chunk it at `maxTokens` boundaries; a document
    * goes to the pack where its cumulative offset STARTS, so documents
    * are never split and a pack may run over by less than the
    * straddling document's length (segment oversized docs upstream
    * with `Records.segment` if a hard cap matters). This offset rule is
    * what makes the assignment ONE window expression — strict
    * close-the-bin greedy packing is inherently sequential. Sharding is
    * what makes it 100 TB-shaped: each shard packs independently under
    * one window partition (no global sort), parallelism = number of
    * shards; pick shards >> executors and dimension shard size so one
    * shard's docs fit one task. Documents with the same
    * (shard, `packCol`) concatenate into one training sequence
    * downstream. */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
                    tokenCountCol: String, maxTokens: Long,
                    packCol: String = "pack_id"): DataFrame =
    Records.binPack(df, Seq(shardCol), orderCol, tokenCountCol, maxTokens, packCol)

  /** Deterministic global corpus shuffle (LLM pipeline): every training
    * epoch wants the corpus in a different but REPRODUCIBLE order. The
    * shuffle key is `md5(seed || ':' || id)` — engine-agnostic, so the
    * same (seed, corpus) yields the same permutation anywhere, and a new
    * epoch is just a new seed. `posCol` gets the row's exact position in
    * that order: this is `row_number() OVER (ORDER BY key)`, but the
    * naive window puts every row through ONE partition — instead we
    * range-partition on the key (the same sampled-boundary exchange a
    * global sort uses), sort within partitions, and let `zipWithIndex`
    * add each partition's global offset (a tiny per-partition count job
    * whose shuffle stage is reused, not re-run). No single-partition
    * stage anywhere, so it survives 100 TB. Ties (md5 collisions) are
    * broken by `idCol`, keeping the total order fully deterministic. */
  def globalShuffle(df: DataFrame, idCol: String, seed: String,
                    posCol: String = "pos", numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val key = "__shuffle_key"
    require(!df.columns.contains(posCol),
      s"globalShuffle: input already has a '$posCol' column — pass posCol")
    require(!df.columns.contains(key),
      s"globalShuffle: input already has a '$key' column")
    val keyed = df.withColumn(key,
      md5(concat(lit(seed + ":"), col(idCol).cast("string")).cast("binary")))
    val parts = if (numPartitions > 0) numPartitions
      else parsePartitions(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions"),
        math.max(df.rdd.getNumPartitions, 1))
    val sorted = keyed.repartitionByRange(parts, col(key), col(idCol))
      .sortWithinPartitions(key, idCol)
    val schema = sorted.schema.add(posCol, LongType, nullable = false)
    val withPos = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(withPos, schema).drop(key)
  }

  /** Parse a partition-count config value, falling back (by-name, so the
    * fallback plan conversion only runs when needed) when the platform
    * sets a non-numeric value — e.g. "auto" under vendor auto-optimized
    * shuffle — or a non-positive one. */
  private[graft] def parsePartitions(raw: String, fallback: => Int): Int =
    scala.util.Try(raw.trim.toInt).toOption.filter(_ > 0).getOrElse(fallback)

  /** Stratified mixture sampling (LLM pipeline): keep a deterministic
    * per-stratum fraction of rows — the "mix sources at fixed ratios"
    * step of corpus assembly. Selection is `idCol % modulus <
    * rate*modulus`, so it is reproducible across runs/engines (no RNG),
    * survives repartitioning, and is expressible in any SQL oracle.
    * Strata absent from `rates` keep `defaultRate`. Narrow — one
    * codegen'd filter, no shuffle. */
  def sampleStratified(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double = 0.0,
                       modulus: Int = 100): DataFrame = {
    require(modulus > 0, "modulus must be positive")
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    // rate granularity is 1/modulus — a positive rate that rounds to a
    // zero threshold would silently drop its whole stratum, so fail
    // loudly and tell the caller to raise the modulus
    def thresholdOf(rate: Double, what: String): Long = {
      val t = math.round(rate * modulus)
      require(rate == 0.0 || t >= 1,
        s"$what rate $rate is below the 1/$modulus granularity — raise `modulus`")
      t
    }
    val threshold = rates.foldLeft(
      lit(thresholdOf(defaultRate, "default")): org.apache.spark.sql.Column) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(thresholdOf(rate, s"stratum '$stratum'")))
          .otherwise(acc)
    }
    df.filter(pmod(col(idCol), lit(modulus)) < threshold)
  }

  /** Token-budget mixture assembly (LLM pipeline): the "fill each
    * source's token quota" step of corpus mixing — keep, per source, the
    * prefix of a seeded deterministic document order whose cumulative
    * `tokenCol` stays within that source's budget (rows from sources
    * absent in `budgets` are dropped). Selection = `running_sum(tokens)
    * OVER (PARTITION BY source ORDER BY md5(seed:id), id) <= budget`, so
    * any SQL engine reproduces it — but the naive window puts each
    * source through ONE reducer, which dies when one domain holds
    * terabytes. Instead, a prefix-sum decomposition over a
    * DETERMINISTIC key-space split: the md5 key's leading 16 bits place
    * every row in one of `numBuckets` ordered buckets (uniform, because
    * md5 is; monotone with the key's string order, because lowercase hex
    * sorts bytewise) — NOT `repartitionByRange`, whose sampled
    * boundaries are seeded by the physical RDD id and therefore differ
    * between the two passes over this plan (measured at sf0.1: rows near
    * boundaries swapped partitions between the totals job and the window
    * job, mis-keying every later offset). Pass 1 aggregates
    * per-(source, bucket) token totals — ≤ sources×buckets rows, tiny
    * next to the corpus — and converts them to preceding-bucket offsets
    * with a per-source window over ≤ `numBuckets` rows. Pass 2 computes
    * each row's LOCAL running sum under a (bucket, source) window — max
    * window size ≈ source_rows/buckets regardless of source skew — joins
    * the offsets back on (source, bucket), and filters local+offset
    * against the budget. Exact global per-source running sums with no
    * driver collect, no sampling, and no per-source bottleneck.
    *
    * PRECONDITION: `idCol` must be unique per row (a doc_id). The
    * order key is md5(seed:id), so duplicate ids are window PEERS —
    * under the default RANGE frame each peer receives their combined
    * running sum, diverging from the sequential semantics documented
    * above (and from any tie-broken oracle). Uniqueness is not
    * validated here: a validation pass would cost a full extra
    * aggregation over the corpus on every call — dedupe upstream
    * ([[graft.operators.Dedup]]) or synthesize a unique id first. */
  def tokenBudgetSample(df: DataFrame, idCol: String, sourceCol: String,
                        tokenCol: String, budgets: Map[String, Long],
                        seed: String, numBuckets: Int = 0): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetSample: budgets must be non-empty")
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val key = "__mix_key"; val bkt = "__mix_bucket"; val tot = "__mix_tot"
    val cum = "__mix_cum"; val off = "__mix_off"; val bud = "__mix_budget"
    Seq(key, bkt, tot, cum, off, bud).foreach(c =>
      require(!df.columns.contains(c), s"tokenBudgetSample: column '$c' reserved"))
    val spark = df.sparkSession
    // derived default clamps to the 16-bit key space (a cluster with
    // shuffle.partitions > 8192 degrades to 65536 buckets rather than
    // failing); the require still rejects explicit out-of-range values
    val b = if (numBuckets > 0) numBuckets
      else math.min(65536,
        8 * parsePartitions(spark.conf.get("spark.sql.shuffle.partitions"), 32))
    require(b >= 1 && b <= 65536,
      s"tokenBudgetSample: numBuckets $b outside [1, 65536] (16 key bits)")
    val budgetCol = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (src, bg)) => when(col(sourceCol) === src, lit(bg)).otherwise(acc)
    }
    val keyed = df
      .withColumn(bud, budgetCol)
      .filter(col(bud).isNotNull)
      .withColumn(key,
        md5(concat(lit(seed + ":"), col(idCol).cast("string")).cast("binary")))
      // leading 16 key bits -> bucket in [0, b): key16*b is < 2^32, exact
      // in the double division, and cast truncates = floor for positives
      .withColumn(bkt,
        (conv(substring(col(key), 1, 4), 16, 10).cast("long") * b / 65536)
          .cast("int"))
    // pass 1: per-(source, bucket) totals -> preceding-bucket offsets.
    // The relation is ≤ sources×numBuckets rows and each per-source
    // window spans ≤ numBuckets rows — distributed, no collect.
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col(bkt))
    val offsets = keyed.groupBy(col(sourceCol), col(bkt))
      .agg(sum(col(tokenCol).cast("long")).as(tot))
      .withColumn(off, sum(col(tot)).over(wOff) - col(tot))
      .drop(tot)
    // pass 2: local running sum (window bounded by one bucket×source
    // slice) + offset = exact global per-source running sum in (key, id)
    // order. AQE broadcasts the offsets side at runtime when small.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(bkt), col(sourceCol)).orderBy(col(key), col(idCol))
    keyed
      .withColumn(cum, sum(col(tokenCol).cast("long")).over(w))
      .join(offsets, Seq(sourceCol, bkt))
      .filter(col(cum) + col(off) <= col(bud))
      .drop(key, bkt, cum, off, bud)
  }

  /** UniMax budget allocation (Chung et al. 2023, ICLR, "UniMax: Fairer
    * and More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): split a total token budget across sources by
    * WATER-FILLING under a per-source epoch cap — small sources
    * contribute at most `maxEpochs` passes over their own corpus, and
    * the budget they cannot absorb is re-shared uniformly among the
    * larger ones (the fairness fix over temperature sampling, which
    * over-samples tiny sources and starves mid-sized ones).
    *
    * Closed form instead of the paper's iterative loop: with caps
    * sorted ascending (prefix = Σ preceding caps, r = 1-based rank of
    * L sources), u_r = (B − prefix_r)/(L − r + 1) rises while sources
    * are capped and falls after, so the water level θ = max_r u_r and
    * quota_s = min(cap_s, θ) — rank-tie order cannot change the output.
    * When Σcap < B every source is capped and the budget under-fills
    * (the paper's behavior: you ran out of unique data at that epoch
    * bound).
    *
    * Scale: one map-side-combined aggregation reduces the corpus to S =
    * #sources rows; the single-partition window that follows is over
    * those S rows only (thousands at most for any real corpus mix), not
    * the corpus — this is the same "reduce THEN window" discipline as
    * [[tokenBudgetSample]]'s offsets side. Returns one row per source:
    * n_tokens, cap_tokens, quota_tokens, epochs_used, capped. */
  /** Temperature-scaled source mixture (the multilingual-pretraining
    * standard UniMax was built to fix — mBERT/XLM-R style): sampling
    * share p_s ∝ n_s^α with α ∈ (0, 1], quota_s = B·p_s. Small sources
    * get oversampled past 1 epoch (epochs_used > 1 is exactly the
    * failure [[unimaxQuota]]'s cap prevents — run both and diff).
    *
    * α = 0.5 (the default) uses `sqrt`, which IEEE-754 requires to be
    * CORRECTLY rounded — so an independent engine reproduces the
    * weights bitwise. Any other α goes through `pow`, which is only
    * faithfully rounded and may differ between libms in the last ulp;
    * callers choosing other α accept rounding-boundary risk in exact
    * cross-engine compares. The weight total is accumulated in
    * ascending-source order (running-sum window, then max) so the
    * double sum is order-deterministic, same discipline as
    * [[graft.plans.CharEntropy]].
    *
    * Scale: the corpus reduces to S = #sources rows in one map-side-
    * combined agg before any window — see [[unimaxQuota]]. */
  def temperatureQuota(df: DataFrame, sourceCol: String, tokenCol: String,
                       totalBudget: Long, alpha: Double = 0.5): DataFrame = {
    require(totalBudget >= 0, "temperatureQuota: totalBudget must be >= 0")
    require(alpha > 0 && alpha <= 1, "temperatureQuota: alpha must be in (0, 1]")
    val W = org.apache.spark.sql.expressions.Window
    val bySrc = W.orderBy(col("source"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val all = W.partitionBy(lit(1))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val nD = col("n_tokens").cast("double")
    df.groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokenCol).cast("long")).as("n_tokens"))
      .withColumn("__w", if (alpha == 0.5) sqrt(nD) else pow(nD, alpha))
      .withColumn("__cum", sum(col("__w")).over(bySrc))
      .withColumn("__total", max(col("__cum")).over(all))
      .withColumn("share", col("__w") / col("__total"))
      .withColumn("quota_tokens", lit(totalBudget.toDouble) * col("share"))
      .withColumn("epochs_used",
        col("quota_tokens") / greatest(nD, lit(1.0)))
      .select("source", "n_tokens", "share", "quota_tokens", "epochs_used")
  }

  def unimaxQuota(df: DataFrame, sourceCol: String, tokenCol: String,
                  totalBudget: Long, maxEpochs: Double): DataFrame = {
    require(totalBudget >= 0, "unimaxQuota: totalBudget must be >= 0")
    require(maxEpochs > 0, "unimaxQuota: maxEpochs must be > 0")
    val sizes = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokenCol).cast("long")).as("n_tokens"))
      .withColumn("cap_tokens", col("n_tokens").cast("double") * maxEpochs)
    // S-row relation from here on: global window over sources is cheap
    val byCap = org.apache.spark.sql.expressions.Window
      .orderBy(col("cap_tokens"), col("source"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    sizes
      .withColumn("__r", row_number().over(byCap))
      .withColumn("__prefix",
        coalesce(sum(col("cap_tokens")).over(
          byCap.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0.0)))
      .withColumn("__L", count(lit(1)).over(all))
      .withColumn("__u",
        (lit(totalBudget.toDouble) - col("__prefix")) /
          (col("__L") - col("__r") + 1).cast("double"))
      .withColumn("__theta", max(col("__u")).over(all))
      .withColumn("quota_tokens", least(col("cap_tokens"), col("__theta")))
      .withColumn("epochs_used",
        col("quota_tokens") / greatest(col("n_tokens").cast("double"), lit(1.0)))
      .withColumn("capped", col("cap_tokens") <= col("__theta"))
      .select("source", "n_tokens", "cap_tokens", "quota_tokens",
        "epochs_used", "capped")
  }

  /** DoReMi domain reweighting (Xie et al. 2023, NeurIPS, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"
    * Algorithm 1): multiplicative-weights update over domains driven
    * by per-example EXCESS LOSS (how much worse the proxy model does
    * than the reference on that domain — the headroom signal),
    * completing the mixture family next to [[temperatureQuota]]
    * (size^α), [[unimaxQuota]] (epoch-capped water-filling) and
    * [[graft.operators.Dsir]] (example-level importance): per step
    * α′_i = α_i · exp(η·λ_i) with λ_i the domain's mean CLIPPED excess
    * (max(ℓ_proxy − ℓ_ref, 0), the paper's rectification), normalized
    * and smoothed toward uniform, α ← (1−c)·α′/Σα′ + c/S. Output is
    * both the final α and the across-steps average ᾱ — the paper's
    * actual deliverable (its Algorithm 1 returns the per-step
    * average).
    *
    * Offline determinization: the published procedure recomputes
    * per-domain excess each step from the training proxy; with a
    * FIXED scorer (the documented offline analog — any of the §2.4 LM
    * proxies) λ is constant across steps, so `iters` here replays the
    * exact multiplicative-weights recursion with constant gain. The
    * recursion is NOT closed-form once smoothing mixes uniform mass
    * back in each step, so it is unrolled — `iters` window passes
    * over an S-row relation.
    *
    * Scale: one map-side-combined aggregation reduces the corpus to
    * S = #domains rows; every MW step is a window over those S rows
    * only ("reduce THEN window", the [[unimaxQuota]] discipline).
    * Determinism: the normalizer Σα′ accumulates in ascending-domain
    * order (running-sum window + max — the [[temperatureQuota]]
    * device), so double sums are order-deterministic and the output
    * reproduces bitwise across runs and partitionings. */
  def doremiWeights(df: DataFrame, domainCol: String, excessCol: String,
                    eta: Double = 1.0, iters: Int = 4,
                    smoothing: Double = 1e-3): DataFrame = {
    require(eta > 0, "doremiWeights: eta must be > 0")
    require(iters >= 1, "doremiWeights: iters must be >= 1")
    require(smoothing >= 0 && smoothing < 1,
      "doremiWeights: smoothing must be in [0, 1)")
    val W = org.apache.spark.sql.expressions.Window
    val byDom = W.orderBy(col("domain"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val all = W.partitionBy(lit(1))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    var cur = df
      .groupBy(col(domainCol).as("domain"))
      .agg(avg(greatest(col(excessCol).cast("double"), lit(0.0))).as("excess"))
      .withColumn("__S", count(lit(1)).over(all).cast("double"))
      .withColumn("alpha", lit(1.0) / col("__S"))
      .withColumn("__sumAlpha", lit(0.0))
    var t = 0
    while (t < iters) {
      cur = cur
        .withColumn("__up", col("alpha") * exp(lit(eta) * col("excess")))
        .withColumn("__cum", sum(col("__up")).over(byDom))
        .withColumn("__z", max(col("__cum")).over(all))
        .withColumn("alpha",
          lit(1.0 - smoothing) * col("__up") / col("__z") +
            lit(smoothing) / col("__S"))
        .withColumn("__sumAlpha", col("__sumAlpha") + col("alpha"))
        .drop("__up", "__cum", "__z")
      t += 1
    }
    cur.select(col("domain"), col("excess"),
      col("alpha").as("weight"),
      (col("__sumAlpha") / iters).as("avg_weight"))
  }
}
