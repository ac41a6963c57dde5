package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family: NiFi DeduplicateRecord/DetectDuplicate plus the
  * LLM-training-data near-dup suite (SURVEY.md §2.4).
  *
  * Scale posture: every near-dup variant is BLOCKED — candidate pairs
  * are generated only inside small buckets (LSH bands, SimHash chunks,
  * explicit blocking keys), never via an unblocked cross join. The
  * quadratic term is bounded by bucket size, and every join key is a
  * hash — uniform by construction, so no skew salting needed.
  */
object Dedup {

  /** Exact dedup: keep one canonical row per key (smallest tieBreaker).
    * One shuffle on the content hash. */
  def exact(df: DataFrame, contentCol: String, tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(contentCol)), col(contentCol))
      .orderBy(col(tieBreaker))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** DetectDuplicate (NiFi's cache-backed form): route each row
    * `duplicate`/`non-duplicate` against a persistent [[MapCache]] of
    * previously-seen keys, then record this batch's new keys back into
    * the cache — so duplicates are detected ACROSS runs, not just
    * within one batch (cache the run id as the value for provenance).
    * In-batch repeats of an unseen key all route non-duplicate, as in
    * NiFi (the cache write happens after the batch's routing decision).
    * Cache contract (dimension-sized, single writer) is MapCache's.
    * Streaming form: [[graft.streaming.Streams.dedupe]]. */
  def detectDuplicate(df: DataFrame, cachePath: String, keyCol: String,
                      runTag: String = "seen",
                      routeCol: String = "route"): DataFrame = {
    val routed = MapCache.fetch(df, cachePath, keyCol, "__cached")
      .withColumn(routeCol,
        when(col("__cached").isNotNull, lit("duplicate")).otherwise(lit("non-duplicate")))
      .drop("__cached")
      // route BEFORE the cache write lands. Eager localCheckpoint pins
      // the whole routed batch in executor storage — batch size is
      // bounded by what executors hold (the per-trigger/per-run batch
      // contract), not by the corpus; don't feed an unbounded scan here.
      .localCheckpoint(true)
    MapCache.put(
      routed.filter(col(routeCol) === "non-duplicate")
        .select(col(keyCol)).distinct().withColumn("__v", lit(runTag)),
      cachePath, keyCol, "__v")
    routed
  }

  /** Exact-dedup summary: per content hash, the keeper id + copy count.
    * groupBy gets map-side partial aggregation (unlike a window). */
  def exactSummary(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(contentCol).cast("binary")).as(s"${contentCol}_md5"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("copies"))

  /** Character shingles (n-grams) as a distinct array. */
  private[graft] def charShingles(c: Column, n: Int): Column =
    array_distinct(transform(sequence(lit(1), greatest(length(c) - (n - 1), lit(1))),
      i => c.substr(i, lit(n))))

  /** Word (token) array. */
  private[graft] def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** MinHash signature — native single-pass expression
    * (graft.plans.MinHashSignature); deterministic, seeded. */
  private[graft] def minHashSig(text: Column, shingleN: Int, numHashes: Int): Column =
    graft.plans.TextHashExpressions.minHashSig(text, shingleN, numHashes)

  /** LSH banding of a (id, sig) frame: one row per (id, band_id,
    * band_hash) where band_hash = xxhash64 of the signature's band
    * slice. Shared, byte-identical arithmetic between the inline
    * [[minHashLsh]] and the persistent [[LshIndex]] — the parity pin
    * between the two rests on this being ONE expression. */
  private[operators] def bandHashes(sig: DataFrame, bands: Int, rows: Int): DataFrame =
    sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * rows + 1, lit(rows)))))).as(Seq("band_id", "band_hash")))

  /** MinHash + LSH near-duplicate PAIRS.
    *
    * shingle(n) → signature(numHashes) → split into `bands` bands →
    * explode (band_id, band_hash, id) → self-join inside identical
    * buckets → verify estimated Jaccard (signature agreement) ≥
    * threshold. Shuffle: one explode-groupBy on (band_id, band_hash) —
    * at 100 TB the bucket join carries only colliding candidates, and
    * the verify step compares fixed-size signatures (not documents).
    *
    * `maxBucket` (0 = uncapped) is the 100×-scale knob, adjudicated by
    * MEASUREMENT in r11 (tools/NOTES_r11_minhash.md): band-bucket
    * population grows with the corpus wherever many documents share a
    * band signature (boilerplate in real corpora; the bounded synthetic
    * vocabulary amplifies it), so candidate pairs from those HOT
    * buckets grow as n² — the m100→m300 probe measured 8.8× candidate
    * pairs for 3× docs while true output pairs grew 3.1×, and each
    * excess candidate drags two ~256 B signatures through the verify
    * joins. Buckets larger than `maxBucket` are SKIPPED, shedding two
    * pair classes: (a) cross products of unrelated documents that share
    * one corpus-common band signature — the overwhelmingly-verify-FALSE
    * bulk; (b) pairs inside exact-duplicate mega-clusters (identical
    * docs collide identically in EVERY band, so all their buckets go
    * hot together) — those belong to the exact-dedup stage
    * ([[exact]]), which every curation pipeline runs first. A genuine
    * NEAR-dup pair still meets in the bands where its docs' slightly-
    * differing signatures land in population-typical buckets.
    * Exact-equality spec at small scale (no bucket reaches the cap →
    * identical output) + measured recall at m100 in
    * tools/NOTES_r11_minhash.md.
    *
    * Output: id_a < id_b, est_jaccard.
    */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 5, numHashes: Int = 64, bands: Int = 8,
                 threshold: Double = 0.6, maxBucket: Int = 0): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    // signatures are reused three times (banding + both sides of the
    // verify join) — localCheckpoint materializes them once (~256 B/doc,
    // MEMORY_AND_DISK). Unlike persist(), the blocks are released by the
    // ContextCleaner once the returned plan is unreachable — repeated
    // calls in a long-lived session don't accumulate cached blocks.
    val sig = df.select(col(idCol).as("id"),
        minHashSig(col(textCol), shingleN, numHashes).as("sig"))
      .localCheckpoint(true)
    // band_hash = hash of the signature slice for each band; candidates
    // carry ONLY ids through the bucket join and are deduped BEFORE the
    // (64-element) signature comparison — a pair colliding in k bands
    // costs one verify, not k
    val bandedAll = bandHashes(sig, bands, rows)
    // hot-bucket cap as a WINDOW count: one shuffle on the same
    // (band_id, band_hash) key the self-join needs anyway — no second
    // aggregate relation, no join, no broadcast of a bucket table
    val banded =
      if (maxBucket <= 0) bandedAll
      else bandedAll
        .withColumn("graft_bucket_sz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("band_id", "band_hash")))
        .filter(col("graft_bucket_sz") <= maxBucket)
        .drop("graft_bucket_sz")
    val candidates = banded.as("a").join(banded.as("b"), Seq("band_id", "band_hash"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
                            (x, y) => when(x === y, 1).otherwise(0)),
                   lit(0), (acc, v) => acc + v)
          / lit(numHashes.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** SimHash (64-bit) per document + banded near-dup pairs at hamming
    * distance ≤ maxHamming. Bands: the 64 bits are split into
    * (maxHamming+1) chunks — a pair within the distance bound differs in
    * ≤ maxHamming bits, so it must agree exactly on ≥1 chunk
    * (pigeonhole), and bucketing on chunks finds ALL such pairs. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      graft.plans.TextHashExpressions.simHash64(col(textCol)).as("simhash"))

  /** Near-dup pairs from simhash values via chunk bucketing. The chunk
    * count is DERIVED from maxHamming (maxHamming+1 bands) so the pair
    * set is complete for any bound — not just ≤3. Larger bounds mean
    * narrower chunks → bigger buckets → more candidate pairs to verify. */
  def simHashPairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64), got $maxHamming")
    val nBands = maxHamming + 1
    // balanced partition of the 64 bits: chunk b = bits
    // [floor(b*64/n), floor((b+1)*64/n)) — every chunk non-empty for
    // n ≤ 64 (an empty chunk would make every pair collide)
    val chunkCols = (0 until nBands).map { b =>
      val lo = b * 64 / nBands
      val hi = (b + 1) * 64 / nBands
      val w = hi - lo
      val mask = if (w >= 64) -1L else (1L << w) - 1L
      call_function("shiftright", col("simhash"), lit(lo)).bitwiseAND(lit(mask))
    }
    val chunked = sigs.select(col("id"), col("simhash"),
      posexplode(array(chunkCols: _*)).as(Seq("chunk_id", "chunk_val")))
    val a = chunked.select(col("chunk_id"), col("chunk_val"),
                           col("id").as("id_a"), col("simhash").as("sim_a"))
    val b = chunked.select(col("chunk_id"), col("chunk_val"),
                           col("id").as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("chunk_id", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** N-gram Jaccard near-dup within explicit blocks (e.g. same source /
    * language / length bucket), with AllPairs-style PREFIX FILTERING
    * (Bayardo et al., WWW'07; Xiao et al. PPJoin): candidate pairs come
    * from an inverted index over each document's prefix — its
    * (n − ⌈t·n⌉ + 1) globally RAREST grams under the total order
    * (doc_frequency, gram) — instead of a block-wide cross join.
    *
    * Completeness: arrays viewed in that global order, if J(a,b) ≥ t the
    * globally-smallest common gram must sit inside BOTH prefixes (if it
    * escaped a's prefix, all common grams would lie in a's suffix of
    * size ⌈t·|a|⌉−1 < ⌈t·max(|a|,|b|)⌉ ≤ |a∩b| — contradiction). So the
    * prefix join loses no qualifying pair, while the quadratic term is
    * bounded by rare-gram bucket sizes, not block sizes — the property
    * that survives blocks of millions of docs at 100 TB.
    *
    * `maxGramDf` is the boilerplate valve: grams appearing in more than
    * `cap` documents are removed from the GRAM SPACE itself (prefix,
    * verify, and both Jaccard denominators), making the result exact
    * Jaccard over the remaining DISCRIMINATIVE grams. Rare-prefix
    * filtering is complete but its candidate volume is Σ_gram df² over
    * prefix grams — when gram diversity stops growing with the corpus
    * (boilerplate-heavy or template text; the r7 mult=30 scale-proof hit
    * this on the bounded synthetic vocabulary: every gram's df grows
    * linearly with the corpus and the exact form goes quadratic), even
    * the rarest grams saturate. Ultra-common grams carry no dup signal
    * — two documents sharing ONLY boilerplate are not near-duplicates —
    * so capping bounds every inverted-index bucket at `cap` and restores
    * linear candidate growth. None (default) = exact/uncapped. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String, blockCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxGramDf: Option[Int] = None): DataFrame = {
    // debug-only stage probe: materializes intermediates to attribute
    // wall time (changes pipelining; NEVER on outside GRAFT_CC_DEBUG)
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    def probe(label: String, d: DataFrame): DataFrame =
      if (!dbg) d else {
        val t0 = System.nanoTime()
        val out = d.localCheckpoint(true)
        println(f"[nj] $label ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=${out.count()}")
        out
      }
    // grams = sorted distinct 64-bit shingle hashes (native expression);
    // Jaccard over hashed grams equals string-gram Jaccard up to a
    // ~|S|²/2⁶⁴ collision probability
    val gAll = df.select(col(blockCol).as("block"), col(idCol).as("id"),
                      graft.plans.TextHashExpressions.hashedShingles(col(textCol), n).as("grams"))
      .withColumn("n_grams", size(col("grams")))
    val g = (maxGramDf match {
      case None => gAll
      case Some(cap) =>
        // rebuild each doc's gram array on the capped space: one linear
        // df aggregation + one co-partitioned rebuild (both shuffles on
        // gram/doc keys). sort_array restores the sorted-distinct
        // contract sortedIntersectAtLeast requires; docs with no
        // surviving gram drop out (they cannot pair).
        val keep = gAll.select(explode(col("grams")).as("gram"))
          .groupBy("gram").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap).select("gram")
        gAll.select(col("block"), col("id"), explode(col("grams")).as("gram"))
          .join(keep, "gram")
          .groupBy("block", "id")
          .agg(sort_array(collect_list(col("gram"))).as("grams"))
          .withColumn("n_grams", size(col("grams")))
    }).localCheckpoint(true) // reused by prefix indexing + both verify sides
    if (dbg) println(s"[nj] g rows=${g.count()}")
    // global doc-frequency per gram — rarity ranking only; jaccard math
    // below stays on the exact hashed-gram sets. (An explicit broadcast
    // of this table was A/B-measured at sf0.1 and REVERTED: the
    // materialization barrier cost more than the saved probe-side
    // shuffle; AQE already converts the join to broadcast at runtime
    // when the gram table is small.)
    val gramDf = g.select(explode(col("grams")).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df_cnt"))
    // per-doc prefix: the p rarest grams, p = n_grams − ceil(t·n_grams) + 1
    val wRare = Window.partitionBy("id").orderBy(col("df_cnt"), col("gram"))
    val prefixes = probe("prefixes", g.select(col("block"), col("id"), col("n_grams"),
        explode(col("grams")).as("gram"))
      .join(gramDf, "gram")
      .withColumn("rare_rank", row_number().over(wRare))
      .filter(col("rare_rank") <=
        col("n_grams") - ceil(col("n_grams") * threshold) + lit(1))
      .select(col("block"), col("gram"), col("id"), col("n_grams"),
        col("rare_rank").as("pos")))
    // candidates: docs sharing a prefix gram in the same block. Pruned
    // BEFORE the distinct by (a) the size prefilter (J ≤ min/max) and
    // (b) PPJoin's positional filter: a match at positions (i, j) of the
    // two rarity-sorted gram lists bounds the overlap by
    // 1 + min(n_a − i, n_b − j); occurrences that can't reach the
    // required ⌈t/(1+t)·(n_a+n_b)⌉ are dropped. Completeness holds
    // because a qualifying pair's FIRST common gram always passes the
    // bound — later (redundant) occurrences are what get pruned, which
    // is most of the bucket-join output on high-similarity corpora.
    // epsilon inside the ceil mirrors the verify stage's minus-1 slack:
    // the float product t/(1+t)·(n_a+n_b) can round a hair ABOVE the
    // exact rational bound (e.g. t=0.8, sum=63 → 28.000…4 → ceil 29 vs
    // true 28), which would prune exact-boundary qualifying pairs before
    // verify ever sees them
    val required = ceil(lit(threshold / (1 + threshold)) *
      (col("a.n_grams") + col("b.n_grams")) - lit(1e-9))
    val cand = prefixes.as("a").join(prefixes.as("b"), Seq("block", "gram"))
      .filter(col("a.id") < col("b.id"))
      .filter(least(col("a.n_grams"), col("b.n_grams")).cast("double") /
              greatest(col("a.n_grams"), col("b.n_grams")) >= threshold)
      .filter(lit(1) + least(col("a.n_grams") - col("a.pos"),
                             col("b.n_grams") - col("b.pos")) >= required)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val cand2 = probe("candidates", cand)
    // verify: exact intersection over the full sorted-hash arrays; union
    // is derived (|a|+|b|-|a∩b|), not computed. The merge aborts early
    // (-1) once J ≥ t is unreachable — required = ⌈t/(1+t)·(|a|+|b|)⌉,
    // minus 1 of slack so float-boundary pairs still get exact counts
    // for the jaccard filter below.
    cand2
      .join(g.select(col("id").as("id_a"), col("block"), col("grams").as("g_a"),
                     col("n_grams").as("n_a")), "id_a")
      .join(g.select(col("id").as("id_b"), col("grams").as("g_b"),
                     col("n_grams").as("n_b")), "id_b")
      .withColumn("inter",
        graft.plans.TextHashExpressions.sortedIntersectAtLeast(col("g_a"), col("g_b"),
          greatest(ceil(lit(threshold / (1 + threshold)) * (col("n_a") + col("n_b")))
            .cast("int") - 1, lit(0))).cast("double"))
      .select(col("block"), col("id_a"), col("id_b"),
              (col("inter") / (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Benchmark-contamination detection: corpus documents sharing at
    * least `minShared` character n-gram shingles with any benchmark
    * document (train/test decontamination). Inverted-index join on
    * shingle hash — the benchmark side (eval sets: small) is BROADCAST,
    * the corpus explodes to |corpus|×|shingles| rows but never
    * self-joins. hashedShingles arrays are distinct, so the match count
    * IS the exact intersection size. Output: (corpus_id, bench_id,
    * shared).
    *
    * `maxShingleDf` caps each shingle's CORPUS document frequency:
    * shingles appearing in more corpus docs are boilerplate, carry no
    * contamination signal, and are exactly what makes the exact join
    * quadratic when the benchmark grows with the corpus (the r7 sf1
    * scale-proof measured the uncapped form at 50x for 10x data —
    * Σ_sh df_corpus·df_bench; see plans/PLANS.md). The cap restricts
    * the BENCHMARK side to corpus-rare shingles, so each broadcast
    * shingle matches ≤ cap corpus docs and the join output is ≤
    * |bench shingles|·cap — linear in the corpus. The intersection only
    * counts shingles present on both sides, so filtering one side is
    * exact w.r.t. the capped semantics. None = exact/uncapped. */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String,
                    shingleN: Int = 12, minShared: Int = 5,
                    maxShingleDf: Option[Int] = None): DataFrame = {
    def shingled(df: DataFrame, idAlias: String): DataFrame =
      df.select(col(idCol).as(idAlias),
        explode(graft.plans.TextHashExpressions.hashedShingles(col(textCol), shingleN)).as("sh"))
    val bench = maxShingleDf match {
      case None => shingled(benchmark, "bench_id")
      case Some(cap) =>
        // one linear map-side-combined aggregation over the exploded
        // corpus; the surviving-shingle set co-partitions with the
        // bench explode on sh (no broadcast of the big rare set)
        val rare = shingled(corpus, "__df_id").groupBy("sh")
          .agg(count(lit(1)).as("__df")).filter(col("__df") <= cap)
          .select("sh")
        shingled(benchmark, "bench_id").join(rare, "sh")
    }
    shingled(corpus, "corpus_id")
      .join(broadcast(bench), "sh")
      .filter(col("corpus_id") =!= col("bench_id"))
      .groupBy("corpus_id", "bench_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Connected components over near-dup PAIRS → cluster ids: the step
    * that turns pairwise similarity into keep/drop decisions. Iterative
    * min-label propagation on DataFrames (alternating large-star-ish
    * contraction): each round every node adopts the smallest label in
    * its neighborhood; converges in O(log n) rounds for dedup-shaped
    * graphs (small components). Shuffles on node id per round — no
    * driver-side graph.
    *
    * Input: (id_a, id_b) pairs. Output: (id, cluster) where cluster =
    * the component's minimum member id. Singleton docs aren't listed
    * (their cluster is themselves). `roundProbe` receives each round's
    * pre-checkpoint propagate DataFrame (for plan capture — see
    * tools/PlanAudit); the default is a no-op.
    */
  def clusters(pairs: DataFrame, maxIter: Int = 10,
               roundProbe: (Int, DataFrame) => Unit = (_, _) => ()): DataFrame = {
    // The pair source is typically EXPENSIVE (LSH/prefix-filter
    // pipelines); materialize it ONCE before fanning out — each union
    // branch below re-executes its subtree otherwise (no common-subplan
    // reuse across unions; measured 4× pair-gen in the cluster bench).
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      if (debug) println(f"[cc] $label ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val p = timed("pairs materialize")(pairs.localCheckpoint(true))
    // SELF-LOOPS are added so "min over neighborhood" includes the
    // node's own label — one broadcast join per round instead of two.
    // One explode scan, NOT a 4-way union (4 scans), and NO distinct:
    // duplicate edges cannot change a min-aggregation, so the dedup
    // shuffle would only buy a narrower per-round join probe — measured
    // a net loss at sf0.1 and a full extra shuffle of 4|pairs| rows at
    // any scale.
    val edges = p.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")),
        struct(col("id_a").as("src"), col("id_a").as("dst")),
        struct(col("id_b").as("src"), col("id_b").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // label table = one row per node — orders of magnitude smaller than
    // the edge list, so it's BROADCAST into every iteration join (the
    // edge list never reshuffles). The hint is SIZE-GATED: one row per
    // node at ~48 B (two longs + row overhead), hinted only while the
    // estimate fits the session's autoBroadcastJoinThreshold. Past that
    // the hint is dropped and the planner/AQE picks a shuffle join —
    // the path a 100 TB run with billions of paired docs must take, or
    // the driver OOMs collecting the broadcast.
    // Each round's result is localCheckpoint'ed: iterative plans
    // otherwise accumulate lineage and re-execute prior rounds inside
    // broadcast jobs (observed 10×-per-round blowup). For fault-tolerant
    // production runs set a checkpoint dir and swap for .checkpoint().
    var labels = timed("edges + init labels")(
      edges.groupBy(col("src").as("id"))
        .agg(min("dst").as("cluster"))
        .localCheckpoint(true))
    // convergence via the label-sum invariant: every label move is
    // strictly downward, so the total is monotone decreasing and the
    // fixpoint is exactly "sum unchanged" — no compare-join needed.
    // (Σ ids must fit a long: fine up to ~10⁹ nodes with ~10⁹ ids;
    // beyond that switch the probe back to a changed-count.)
    def labelSum(df: DataFrame): Long = {
      val r = df.agg(sum("cluster")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0) // null ⟺ empty graph
    }
    // node count is fixed across rounds (propagate preserves the id set),
    // so the broadcast gate is decided once — fused into the first sum
    // job (both scan the just-checkpointed label blocks)
    val firstAgg = labels.agg(sum("cluster"), count(lit(1))).head()
    var prevSum = if (firstAgg.isNullAt(0)) 0L else firstAgg.getLong(0)
    val useBroadcast = shouldBroadcastLabels(firstAgg.getLong(1),
      pairs.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m"))
    def hinted(df: DataFrame): DataFrame = if (useBroadcast) broadcast(df) else df
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val t0 = System.nanoTime()
      // each node adopts min over its closed neighborhood (self-loops
      // make that include its own label). Materialized ONCE per round:
      // the jumps below reference it from both the stream and broadcast
      // side, and without the checkpoint each reference would re-execute
      // the edge join.
      // the probe sees the PRE-checkpoint round plan (localCheckpoint
      // severs lineage, so snapshots taken after the fact show only
      // `Scan ExistingRDD`); planning is shared with the checkpoint run
      val pre = propagateOnce(edges, labels, useBroadcast)
      roundProbe(iter + 1, pre)
      val propagated = pre.localCheckpoint(true)
      // Convergence is checked on the PROPAGATED table: every move is
      // strictly downward, so an unchanged sum means propagate was the
      // identity — and a propagate fixpoint IS the answer (if an edge
      // (u,v) had labels L(u) < L(v), v's closed-neighborhood min would
      // beat L(v); so labels are constant per component, and since
      // label values are always member ids bounded below by the
      // component minimum, that constant is the minimum). The final
      // round then skips the pointer jumps entirely.
      val sumP = labelSum(propagated)
      if (sumP == prevSum) {
        labels = propagated
        converged = true
      } else {
        // ...then pointer-jumps twice through its label's label (path
        // halving; two hops per round → half the rounds for long
        // chains). Both jumps run over the materialized label table.
        def jump(df: DataFrame): DataFrame = {
          val ptr = df.select(col("id").as("cluster"), col("cluster").as("cluster2"))
          df.as("x").join(hinted(ptr), Seq("cluster"), "left")
            .select(col("id"),
              least(col("cluster"), coalesce(col("cluster2"), col("cluster"))).as("cluster"))
        }
        val next = jump(jump(propagated)).localCheckpoint(true)
        val newSum = labelSum(next)
        labels = next
        prevSum = newSum
      }
      iter += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(f"[cc] round $iter ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
          f"sum=$prevSum converged=$converged")
    }
    edges.unpersist()
    labels
  }

  /** One min-label propagation round: every node adopts the minimum
    * label over its closed neighborhood (self-loops included upstream).
    * Package-private and checkpoint-free so PlanSpec can assert the
    * join strategy actually flips with the broadcast gate — clusters()
    * itself localCheckpoints each round, which severs the lineage the
    * plan snapshots would otherwise show. */
  private[graft] def propagateOnce(edges: DataFrame, labels: DataFrame,
                                   useBroadcast: Boolean): DataFrame = {
    val lbl = labels.withColumnRenamed("id", "dst")
      .withColumnRenamed("cluster", "dst_cluster")
    edges.join(if (useBroadcast) broadcast(lbl) else lbl, "dst")
      .groupBy(col("src").as("id"))
      .agg(min("dst_cluster").as("cluster"))
  }

  /** Generic size gate for broadcast hints on tables whose row count is
    * known (already materialized): rows × estimated bytes/row must fit
    * the configured autoBroadcastJoinThreshold; a non-positive threshold
    * (e.g. "-1", broadcast disabled) always refuses. Pure so the gate
    * itself is unit-testable. */
  private[graft] def shouldBroadcast(nRows: Long, rowBytes: Long,
                                     thresholdConf: String): Boolean = {
    val trimmed = thresholdConf.trim
    if (trimmed.startsWith("-")) return false // "-1" = broadcast disabled
    val bytes =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(trimmed)
      catch { case _: Throwable => 10L * 1024 * 1024 }
    bytes > 0 && nRows * rowBytes <= bytes
  }

  /** clusters() label-table gate: one row per node at ~48 estimated
    * bytes (two longs + unsafe-row overhead). */
  private[graft] def shouldBroadcastLabels(nNodes: Long, thresholdConf: String): Boolean =
    shouldBroadcast(nNodes, 48L, thresholdConf)

  /** Keep/drop materialization: remove every near-duplicate except its
    * cluster's minimum-id representative. */
  def dropNearDuplicates(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = clusters(pairs).filter(col("id") =!= col("cluster")).select("id")
    df.join(losers.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }

  /** Cross-corpus boilerplate line removal (CCNet/RefinedWeb-style
    * preprocessing): a line occurring in ≥ minDocFreq distinct documents
    * is boilerplate (headers, nav, cookie banners, legal footers) and is
    * dropped from EVERY document; per-doc line order is preserved in the
    * rebuilt text. Shuffles: one hash-groupBy for line doc-frequency
    * (map-side combine on the line hash — uniform key), one anti-join,
    * one per-doc rebuild. Lines travel as 64-bit hashes through the
    * frequency pass; full strings only cross the wire for the rebuild.
    * Output: (idCol, clean_text, n_kept). */
  def dropBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
                           minDocFreq: Long): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("__line_no", "__line")))
    val boiler = lines.groupBy(xxhash64(col("__line")).as("__lh"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select("__lh")
    lines.join(boiler, xxhash64(col("__line")) === col("__lh"), "left_anti")
      .groupBy(idCol)
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__line_no"), col("__line")))),
          x => x.getField("__line")), "\n").as("clean_text"),
        count(lit(1)).as("n_kept"))
  }

  /** Exact substring-span dedup (the "repeated 50-token span" pass of
    * training-data dedup, à la Lee et al. 2022 — here over whitespace
    * tokens): flag every `spanTokens`-token window whose exact text
    * recurs in ≥ `minDocs` distinct documents. Window enumeration is
    * NARROW (slice over each doc's token array, ~n_tokens rows per
    * doc); ONE shuffle groups identical spans (map-side partial
    * countDistinct), and the flag join rides the same span key, so at
    * 100 TB the cost is two exchanges of (span, id) pairs — never an
    * all-pairs comparison. Output: one row per flagged occurrence
    * (idCol, pos, span, n_docs); mask or cut the spans downstream with
    * the positions. */
  /** (id, pos, span): every `spanTokens`-token window of every doc long
    * enough to have one. Narrow — slice over the token array. */
  private def spanWindows(df: DataFrame, idCol: String, textCol: String,
                          spanTokens: Int): DataFrame =
    df.select(col(idCol), graft.functions.TextAnalysis.wsTokens(col(textCol)).as("__ts"))
      .filter(size(col("__ts")) >= spanTokens)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), size(col("__ts")) - spanTokens),
          i => array_join(slice(col("__ts"), i + 1, lit(spanTokens)), " ")))
          .as(Seq("pos", "span")))

  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     spanTokens: Int, minDocs: Int = 2): DataFrame = {
    require(spanTokens > 0 && minDocs >= 2, "spanTokens > 0, minDocs >= 2")
    // r10 shuffle-byte fix, EXACT output unchanged: grouping the raw
    // windows BY SPAN TEXT shipped ~k·wordlen bytes per window through
    // two shuffles, and the r10 m100 sweep measured that flat against
    // partition count (121.8 s at 32 partitions, 121.0 s at 256 —
    // tools/NOTES_r10_spans.md) — byte-bound, not spill-bound. Now the
    // corpus-wide pass keys on xxhash64(span) (8 B through the shuffle)
    // and only the CANDIDATE windows — those whose hash recurs across
    // docs, i.e. ~the dup fraction — carry text into the exact confirm.
    // A hash collision can only ADD a candidate, never flag one: the
    // per-span exact countDistinct below is computed on real text, so
    // the flagged set is identical to the all-text form (Round3Spec
    // pins equality; the DuckDB oracle is text-exact).
    val wins = spanWindows(df, idCol, textCol, spanTokens)
      .withColumn("__sh", xxhash64(col("span")))
    val candHashes = wins.groupBy("__sh")
      .agg(countDistinct(col(idCol)).as("__nh"))
      .filter(col("__nh") >= minDocs)
      .select("__sh")
    // Every join side here scales with the corpus (windows, recurring
    // hashes, confirmed spans), so all three joins pin to shuffle-hash:
    // the keys are 8 B (or the bounded candidate span text), and a
    // planner/AQE broadcast of any side is a driver-collect cliff at
    // scale (observed at m300: AQE re-planning flipped a build side to
    // the 90M-row window relation and aborted on
    // spark.driver.maxResultSize).
    val cand = wins.join(candHashes.hint("shuffle_hash"), "__sh")
    val exact = cand.groupBy("span")
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    cand.join(exact.hint("shuffle_hash"), "span")
      .select(col(idCol), col("pos"), col("span"), col("n_docs"))
  }

  /** Cut the spans [[duplicateSpans]] flags: rebuild each document's
    * token stream with every token covered by a flagged window removed
    * (overlapping windows union naturally — coverage is per token
    * index). Same scale shape as the flag pass plus one anti-join of
    * (id, token_idx) pairs and a per-doc ordered rebuild. Output:
    * (idCol, clean_text, n_kept). `clean_text` is the kept tokens
    * joined with single spaces — the rebuild is TOKEN-level, so
    * original whitespace (newlines, tabs, runs of spaces) normalizes
    * away even in docs with nothing cut; a doc whose EVERY token is
    * covered emits no row (fully-boilerplate documents drop, the
    * dedup-pipeline intent). */
  def cutDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                        spanTokens: Int, minDocs: Int = 2): DataFrame = {
    // The cut pass never needs the span TEXT downstream, so the flag
    // pass keys on xxhash64(span): the span string from spanWindows is
    // hashed in the same projection that built it (map stage) and only
    // 8-byte keys cross both shuffles (vs full window text in
    // [[duplicateSpans]]). At bench scale this measures flat (sf0.1 is
    // stage-overhead-bound); the win is shuffle BYTES — ~k·wordlen per
    // window down to 8 B — which is what dominates at corpus scale. A
    // hash collision can only OVER-cut: ~n²/2⁶⁵ spans corpus-wide
    // (≈0.03 spans at a trillion windows) — exactness-critical flagging
    // stays on [[duplicateSpans]].
    val winsH = spanWindows(df, idCol, textCol, spanTokens)
      .select(col(idCol), col("pos"), xxhash64(col("span")).as("__sh"))
    val repeated = winsH.groupBy("__sh")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("__sh")
    // same corpus-scaled-sides posture as [[duplicateSpans]]: pin
    // shuffle-hash so no planner/AQE pass can broadcast either side
    val covered = winsH.join(repeated.hint("shuffle_hash"), "__sh")
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + spanTokens - 1)).as("__idx"))
      .distinct()
    val allToks = df.select(col(idCol),
      posexplode(graft.functions.TextAnalysis.wsTokens(col(textCol)))
        .as(Seq("__idx", "__tok")))
    // `covered` is O(corpus tokens of dup docs) BY CONSTRUCTION — one
    // row per covered token index — so it is never broadcastable at
    // scale; pin the anti-join to shuffle-hash (post-distinct stats
    // under-estimated it at m300 and an aggressive broadcast threshold
    // planned an >8 GB broadcast that killed the join).
    allToks.join(covered.hint("shuffle_hash"), Seq(idCol, "__idx"), "left_anti")
      .groupBy(idCol)
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__idx"), col("__tok")))),
          x => x.getField("__tok")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
  }

  /** Embedding-cosine near-dup with IVF-cell blocking — the scale path
    * for semantic dedup when no bounded user blocking key exists.
    *
    * [[embeddingCosine]] with a FIXED-cardinality block column is
    * quadratic within blocks as the corpus grows (measured 85× cost at
    * 30× data in the r7 scale sweep). Here blocks are IVF cells from
    * the shared [[Ann]] centroid machinery: `nCells` hash-picked
    * corpus vectors (optionally Lloyd-refined), every vector assigned
    * to its `nProbe` nearest centroids (multi-probe, so boundary pairs
    * straddling a cell edge still meet in a shared cell), exact cosine
    * only within co-assigned cells. Sizing `nCells ∝ n` with fixed
    * `nProbe` keeps expected candidate pairs ≈ n²·nProbe²/(2·nCells)
    * — LINEAR in n, and the cell id is a uniform shuffle key.
    *
    * Output: distinct (id_a < id_b, cos_sim) pairs — a pair found in
    * several shared cells appears once. Approximate by design: a pair
    * whose members share no probed cell is not compared (recall is
    * spec-gated against the exact form; raise `nProbe` to trade cost
    * for recall).
    */
  def embeddingCosineIvf(spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, nCells: Int = 16, nProbe: Int = 2,
                         lloydIters: Int = 0, maxBroadcastCells: Int = 64): DataFrame = {
    import spark.implicits._
    val corpus = df.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("embedding"))
    // Cell counts up to `maxBroadcastCells` keep the exact flat scan
    // against a driver-collected centroid array — bounded, and the path
    // every oracle-SF config and recall gate runs. Larger counts (cells
    // sized ∝ corpus — the 100 TB posture) switch to the DataFrame-
    // resident assignment: centroids never materialize in one JVM, only
    // the √C coarse anchors broadcast, and the assignment is pinned
    // row-identical to [[Ann.assignCells]]'s hierarchical branch.
    val assigned =
      if (nCells <= maxBroadcastCells) {
        val init: Array[(Int, Array[Float])] = corpus
          .orderBy(xxhash64(col("vec_id")), col("vec_id"))
          .limit(nCells)
          .as[(Long, Array[Float])].collect().sortBy(_._1)
          .zipWithIndex.map { case ((_, v), i) => (i, v) }
        val cents =
          if (lloydIters > 0) Ann.refineCentroids(spark, corpus, init, lloydIters) else init
        val bc = spark.sparkContext.broadcast(cents)
        Ann.assignCells(spark, corpus, bc, nProbe).toDF("id", "v", "cell")
      } else {
        Ann.assignCellsDistributed(spark, corpus, nCells, nProbe, lloydIters)
          .toDF("id", "v", "cell")
      }
    val a = assigned.select(col("cell"), col("id").as("id_a"), col("v").as("v_a"))
    val b = assigned.select(col("cell"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorFunctions.cosine(col("v_a"), col("v_b")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .distinct()
  }

  /** Embedding-cosine near-dup within blocks (label / IVF cell). */
  def embeddingCosine(df: DataFrame, idCol: String, vecCol: String, blockCol: String,
                      threshold: Double): DataFrame = {
    val v = df.select(col(blockCol).as("block"), col(idCol).as("id"), col(vecCol).as("v"))
    val a = v.select(col("block"), col("id").as("id_a"), col("v").as("v_a"))
    val b = v.select(col("block"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        graft.functions.VectorFunctions.cosine(col("v_a"), col("v_b")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
