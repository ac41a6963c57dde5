package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions

/** Approximate/exact nearest-neighbor search over embedding columns
  * (SURVEY.md §2.4 #34–35).
  *
  * Scale design: the query set is assumed small (≪ corpus) and is
  * BROADCAST; the corpus is never shuffled in full. The exact path
  * computes per-partition top-k with a bounded heap and shuffles only
  * `partitions × queries × k` candidate rows for the final merge. The
  * LSH path prunes the corpus to same-bucket candidates first.
  */
object Ann {

  /** Exact brute-force cosine top-k, declarative form: broadcast-join
    * corpus × queries, then per-query window. Selection orders by
    * (round(sim,6) DESC, vec_id ASC) — fully deterministic and
    * reproducible by an external engine. Use for modest corpora or as
    * the oracle for the approximate paths. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val cand = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"),
                                          col("embedding").as("q_vec"))))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(VectorFunctions.cosine(col("embedding"), col("q_vec")), 6).as("cos_sim"))
      .filter(!isnan(col("cos_sim"))) // zero-norm vectors: undefined sim, excluded
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk").cast("long").as("rk"))
  }

  /** Exact brute-force top-k, scale form: per-partition bounded heaps via
    * mapPartitions (no global materialization of the candidate matrix),
    * then a narrow merge. Output identical to [[bruteForceTopK]] —
    * per-partition pruning uses the same (rounded sim, id) composite key
    * as the final selection, so no candidate that could win globally is
    * dropped locally. */
  def bruteForceTopKPartitioned(spark: SparkSession, corpus: DataFrame,
                                queries: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val qs: Array[(Long, Array[Float])] = queries
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(qs)
    val partial = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val queries = bc.value
        // per query: bounded min-heap keyed by (rounded sim asc, id desc)
        // so the worst kept candidate is on top
        val ord = Ordering.by[(Double, Long, Double), (Double, Long)] {
          case (r, id, _) => (-r, id)
        }
        val heaps = Array.fill(queries.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Long, Double)](ord))
        it.foreach { case (id, vec) =>
          var qi = 0
          while (qi < queries.length) {
            val (qid, qv) = queries(qi)
            if (qid != id) {
              var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
              val n = math.min(vec.length, qv.length)
              while (i < n) {
                val x = vec(i).toDouble; val y = qv(i).toDouble
                dot += x * y; na += x * x; nb += y * y; i += 1
              }
              val denom = math.sqrt(na) * math.sqrt(nb)
              // zero-norm vector → sim undefined (NaN): skip, mirroring the
              // declarative path's isnan filter (and BigDecimal(NaN) throws)
              if (denom > 0.0) {
                val sim = dot / denom
                val r = BigDecimal(sim).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                val h = heaps(qi)
                if (h.size < k) h.enqueue((r, id, sim))
                else {
                  val (wr, wid, _) = h.head
                  if (r > wr || (r == wr && id < wid)) { h.dequeue(); h.enqueue((r, id, sim)) }
                }
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (r, id, _) => (queries(qi)._1, id, r) }
        }
      }.toDF("query_id", "vec_id", "cos_sim")
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    partial.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk").cast("long").as("rk"))
  }

  /** IVF (inverted-file) approximate top-k: cells = `nCells` hash-picked
    * corpus vectors as centroids (deterministic — no RNG state, no
    * training job); every corpus vector is assigned to its nearest
    * centroid once, queries probe their `nProbe` nearest cells. The
    * search join touches only corpus rows in probed cells — at scale
    * cell assignment is one narrow pass and the per-query candidate set
    * shrinks by ~nProbe/nCells. `lloydIters > 0` refines the centroids
    * with that many deterministic k-means iterations
    * ([[refineCentroids]]) — better-balanced cells, higher recall per
    * probe, at one assignment pass per iteration.
    *
    * Query-set scale: with `broadcastQueries = true` (default) the
    * probed query side is broadcast — right when queries are
    * dimension-table-sized. For LARGE query sets (corpus-vs-corpus
    * retrieval, dataset joins) pass `false`: both sides then SHUFFLE on
    * the cell id and the join never ships the query set to every
    * executor — the fully-distributed path, no driver or broadcast
    * bound on either side. Results are identical. */
  def ivfTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4, lloydIters: Int = 0,
              broadcastQueries: Boolean = true, assignLevels: Int = 2): DataFrame = {
    import spark.implicits._
    require(assignLevels == 2 || assignLevels == 3,
      s"assignLevels must be 2 or 3, got $assignLevels")
    val init: Array[(Int, Array[Float])] = corpus
      .select(col("vec_id").cast("long"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nCells)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .zipWithIndex.map { case ((_, v), i) => (i, v) }
    val centroids =
      if (lloydIters > 0) refineCentroids(spark, corpus, init, lloydIters) else init
    val bc = spark.sparkContext.broadcast(centroids)

    // assignLevels = 3 routes through the cube-root hierarchy
    // ([[assignCells3]]) — the ≥10⁹-vector escape; crossover documented
    // there. Default stays the 2-level scan.
    def cells(df: DataFrame, idAlias: String, vecAlias: String, probes: Int): DataFrame =
      (if (assignLevels == 3) assignCells3(spark, df, bc, probes)
       else assignCells(spark, df, bc, probes)).toDF(idAlias, vecAlias, "cell")

    val c = cells(corpus, "vec_id", "c_vec", 1)
    val q = cells(queries, "query_id", "q_vec", nProbe)
    val qSide = if (broadcastQueries) broadcast(q) else q
    val cand = c.join(qSide, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(VectorFunctions.cosine(col("c_vec"), col("q_vec")), 6).as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk").cast("long").as("rk"))
  }

  /** Nearest-centroid assignment by cosine, `probes` cells per vector.
    * One narrow pass over the data against broadcast centroids.
    *
    * Past 64 centroids the per-row scan goes HIERARCHICAL: the first
    * √C centroids double as coarse anchors, every centroid joins its
    * nearest anchor's group, and a row scans the √C anchors plus the
    * groups of its best few anchors — ~2√C cosines per row instead of
    * C. With cells sized ∝ corpus that turns the assignment stage from
    * n²-with-a-small-constant into n·√n (measured: the flat scan
    * dominated the m100 sweep). Small cell counts keep the exact flat
    * scan, so every oracle-SF config and the recall gates see
    * IDENTICAL assignment. */
  private[graft] def assignCells(spark: SparkSession, df: DataFrame,
                          bc: org.apache.spark.broadcast.Broadcast[Array[(Int, Array[Float])]],
                          probes: Int): Dataset[(Long, Array[Float], Int)] = {
    import spark.implicits._
    df.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cents = bc.value
        def cos(vec: Array[Float], cv: Array[Float]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          val n = math.min(vec.length, cv.length)
          while (i < n) {
            val x = vec(i).toDouble; val y = cv(i).toDouble
            dot += x * y; na += x * x; nb += y * y; i += 1
          }
          dot / (math.sqrt(na) * math.sqrt(nb))
        }
        if (cents.length <= 64) {
          it.flatMap { case (id, vec) =>
            cents.map { case (ci, cv) => (ci, cos(vec, cv)) }
              .sortBy { case (ci, s) => (-s, ci) }.take(probes)
              .map { case (ci, _) => (id, vec, ci) }
          }
        } else {
          val coarseN = math.ceil(math.sqrt(cents.length.toDouble)).toInt
          val coarse = cents.take(coarseN) // hash-picked → already a random sample
          // each centroid joins its nearest coarse anchor's group
          val groups = Array.fill(coarseN)(Vector.newBuilder[(Int, Array[Float])])
          cents.foreach { case (ci, cv) =>
            var best = 0; var bestS = Double.NegativeInfinity; var a = 0
            while (a < coarseN) {
              val s = cos(cv, coarse(a)._2)
              if (s > bestS) { bestS = s; best = a }
              a += 1
            }
            groups(best) += ((ci, cv))
          }
          val grouped = groups.map(_.result())
          // probe enough anchors that the true nearest cells are very
          // likely in a scanned group; bounded by the anchor count
          val coarseProbe = math.min(coarseN, math.max(4, probes * 2))
          it.flatMap { case (id, vec) =>
            val anchors = (0 until coarseN)
              .map(a => (a, cos(vec, coarse(a)._2)))
              .sortBy { case (a, s) => (-s, a) }.take(coarseProbe)
            anchors.iterator.flatMap { case (a, _) => grouped(a) }
              .map { case (ci, cv) => (ci, cos(vec, cv)) }.toSeq
              .sortBy { case (ci, s) => (-s, ci) }.take(probes)
              .map { case (ci, _) => (id, vec, ci) }
          }
        }
      }
  }

  /** Three-level hierarchical assignment (r13, verdict stretch #7 —
    * the documented escape for ≥10⁹ vectors): anchors at C^(1/3) and
    * C^(2/3), so a row scans C^(1/3) level-1 anchors, the level-2
    * groups of its best few, then the centroid groups of the level-2
    * winners — O(C^(1/3)·d) cosines per row instead of the 2-level
    * form's O(√C·d). With IVF-dedup cells sized ∝ corpus (C = n/125)
    * that turns the assignment term from n^1.5 into n^(4/3).
    *
    * Same anchor choice (hash-picked prefix), same (score DESC, index
    * ASC) tie-breaks and the same [[cosJvm]] arithmetic as the 2-level
    * branch. The two hierarchies prune DIFFERENTLY, so the outputs are
    * NOT row-identical (each approximates the flat scan); the honest
    * pin is FLAT-ASSIGNMENT RECALL, and with this form's wider
    * per-tier funnels (p2 = max(8, 4p) mid-tier groups, p1 =
    * max(8, 2·p2) anchors — sized so the candidate cell mass
    * p2·C^(1/3) matches the 2-level form's 4·√C at spec scale) the
    * measured recall matches or beats 2-level at every spec config
    * (128/256 cells × 1/2 probes: 0.86/0.83/0.85/0.81 vs
    * 0.82/0.79/0.85/0.79 — DedupAnnSpec).
    *
    * Crossover (per-row cosine counts, p = probes): 2-level ≈
    * (1 + max(4,2p))·√C; 3-level ≈ (1 + p1 + p2)·C^(1/3) =
    * (1 + 24 + 8)·C^(1/3) at p=1 — equal near C ≈ (33/5)⁶ ≈ 8×10⁴
    * cells ≈ 10⁷ vectors at n/125 cells; below that the 2-level form's
    * smaller constants win, far above it the cube root dominates
    * (at C = 10⁷ — 10⁹ vectors — per-row cosines drop from ~1.6×10⁴
    * to ~7×10³, and the gap widens as C^(1/6)). */
  private[graft] def assignCells3(spark: SparkSession, df: DataFrame,
                          bc: org.apache.spark.broadcast.Broadcast[Array[(Int, Array[Float])]],
                          probes: Int): Dataset[(Long, Array[Float], Int)] = {
    import spark.implicits._
    df.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cents = bc.value
        val c = cents.length
        val n1 = math.max(1, math.ceil(math.cbrt(c.toDouble)).toInt)
        val n2 = math.max(n1, math.ceil(math.pow(c.toDouble, 2.0 / 3.0)).toInt)
        val l1 = cents.take(n1)            // hash-picked → uniform sample
        val l2 = cents.take(n2)
        // level-2 anchors under their nearest level-1 anchor
        val g1 = Array.fill(n1)(Vector.newBuilder[Int]) // indexes into l2
        var j = 0
        while (j < n2) {
          var best = 0; var bestS = Double.NegativeInfinity; var a = 0
          while (a < n1) {
            val s = cosJvm(l2(j)._2, l1(a)._2)
            if (s > bestS) { bestS = s; best = a }
            a += 1
          }
          g1(best) += j
          j += 1
        }
        val l1groups = g1.map(_.result())
        // centroids under their nearest level-2 anchor
        val g2 = Array.fill(n2)(Vector.newBuilder[(Int, Array[Float])])
        cents.foreach { case (ci, cv) =>
          var best = 0; var bestS = Double.NegativeInfinity; var a = 0
          while (a < n2) {
            val s = cosJvm(cv, l2(a)._2)
            if (s > bestS) { bestS = s; best = a }
            a += 1
          }
          g2(best) += ((ci, cv))
        }
        val l2groups = g2.map(_.result())
        // wider per-tier funnels than the 2-level form's max(4, 2p):
        // each pruning stage loses recall, so the mid tier keeps enough
        // groups that the CANDIDATE CELL MASS (p2 · C/n2 ≈ p2 · C^(1/3))
        // matches the 2-level form's (coarseProbe · √C ≈ 4√C) at spec
        // scale while both constants stay O(1) in C
        val p3 = probes
        val p2 = math.min(n2, math.max(8, p3 * 4))
        val p1 = math.min(n1, math.max(8, p2 * 2))
        it.flatMap { case (id, vec) =>
          val a1 = (0 until n1).map(a => (a, cosJvm(vec, l1(a)._2)))
            .sortBy { case (a, s) => (-s, a) }.take(p1)
          val a2 = a1.iterator.flatMap { case (a, _) => l1groups(a) }
            .map(b => (b, cosJvm(vec, l2(b)._2))).toSeq
            .sortBy { case (b, s) => (-s, b) }.take(p2)
          a2.iterator.flatMap { case (b, _) => l2groups(b) }
            .map { case (ci, cv) => (ci, cosJvm(vec, cv)) }.toSeq
            .sortBy { case (ci, s) => (-s, ci) }.take(p3)
            .map { case (ci, _) => (id, vec, ci) }
        }
      }
  }

  /** The shared per-pair cosine: floats widened to double, one fused
    * dot/norm/norm accumulation in index order — the SAME arithmetic
    * (same operation order, so bit-identical results) as
    * [[graft.plans.CosineSimilarity]]'s codegen loop. Keeping the two
    * in lockstep is what lets the distributed assignment path below
    * mix in-JVM anchor scans with expression-computed candidate scores
    * and still match [[assignCells]] row-for-row. */
  private[graft] def cosJvm(vec: Array[Float], cv: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(vec.length, cv.length)
    while (i < n) {
      val x = vec(i).toDouble; val y = cv(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** DataFrame-resident centroid assignment — the no-driver-bound
    * analog of [[assignCells]]'s hierarchical branch, for cell counts
    * sized ∝ corpus (IVF dedup blocking, where `nCells = n/125` grows
    * without bound). The full centroid set NEVER materializes in one
    * JVM: only the ⌈√C⌉ coarse anchors are collected and broadcast
    * (√C grows as √n — ~3k anchors at 10⁹ vectors, a few MB). Stages:
    *
    *   1. centroids = the `nCells` hash-picked corpus rows, kept as a
    *      DataFrame keyed by their own vec_id (cell identity);
    *   2. anchors = the ⌈√C⌉ smallest-keyed centroids (the pick is by
    *      hash, so the keys are a uniform sample) — the ONLY collect;
    *   3. each centroid joins its nearest anchor's group — one narrow
    *      pass against the broadcast anchors;
    *   4. each row fans out to its best `coarseProbe` anchors (narrow
    *      pass), shuffle-joins the anchor-grouped centroid table on
    *      the anchor id (√C distinct keys; AQE splits skewed anchors),
    *      and keeps its `probes` best cells by (cos DESC, cell key).
    *      The ranking window sees only (id, cell, score) triples —
    *      ~24 B/row — and the winners re-join the corpus by id, so
    *      vectors cross exactly two shuffles (fan-out + re-join), never
    *      the candidate stream.
    *
    * Anchor choice, `coarseProbe`, tie-breaks, and the double-precision
    * cosine ([[cosJvm]] ≡ [[graft.plans.CosineSimilarity]]) all mirror
    * [[assignCells]]'s hierarchical branch, so the assignment is
    * IDENTICAL row-for-row (DedupAnnSpec pins the equality) — this path
    * changes WHERE the centroids live, not what is computed.
    * `lloydIters` refines the DataFrame-resident centroids with the
    * same deterministic sorted-accumulation means as
    * [[refineCentroids]]; empty cells keep their previous vector.
    *
    * Output columns: (vec_id, embedding, cell) with `cell` = the
    * centroid's key (Long). */
  private[graft] def assignCellsDistributed(spark: SparkSession, df: DataFrame,
      nCells: Int, probes: Int, lloydIters: Int = 0): DataFrame = {
    import spark.implicits._
    val base = df.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val coarseN = math.ceil(math.sqrt(nCells.toDouble)).toInt

    def assignOnce(cents: DataFrame, p: Int): DataFrame = {
      val anchors: Array[(Long, Array[Float])] = cents
        .orderBy(col("cell")).limit(coarseN)
        .as[(Long, Array[Float])].collect()
      val bcA = spark.sparkContext.broadcast(anchors)
      val centGrouped = cents.as[(Long, Array[Float])].mapPartitions { it =>
        val as = bcA.value
        it.map { case (ck, cv) =>
          var best = 0; var bestS = Double.NegativeInfinity; var a = 0
          while (a < as.length) {
            val s = cosJvm(cv, as(a)._2)
            if (s > bestS) { bestS = s; best = a }
            a += 1
          }
          (best, ck, cv)
        }
      }.toDF("anchor", "cell", "cvec")
      val coarseProbe = math.min(coarseN, math.max(4, p * 2))
      val rowAnchors = base.as[(Long, Array[Float])].mapPartitions { it =>
        val as = bcA.value
        it.flatMap { case (id, vec) =>
          as.indices.map(a => (a, cosJvm(vec, as(a)._2)))
            .sortBy { case (a, s) => (-s, a) }.take(coarseProbe)
            .map { case (a, _) => (a, id, vec) }
        }
      }.toDF("anchor", "id", "v")
      val cand = rowAnchors.join(centGrouped, Seq("anchor"))
        .select(col("id"), col("cell"),
          graft.plans.CosineSimilarity(col("v"), col("cvec")).as("s"))
      val w = Window.partitionBy("id").orderBy(col("s").desc, col("cell"))
      val chosen = cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= p)
        .select(col("id").as("vec_id"), col("cell"))
      base.join(chosen, Seq("vec_id"))
        .select(col("vec_id"), col("embedding"), col("cell"))
    }

    var centDf = base
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cvec"))
    for (_ <- 0 until lloydIters) {
      val means = assignOnce(centDf, 1)
        .as[(Long, Array[Float], Long)]
        .groupByKey(_._3)
        .flatMapSortedGroups(col("vec_id")) { (cell: Long, rows: Iterator[(Long, Array[Float], Long)]) =>
          var sums: Array[Double] = null
          var n = 0L
          rows.foreach { case (_, vec, _) =>
            if (sums == null) sums = new Array[Double](vec.length)
            var i = 0
            while (i < math.min(vec.length, sums.length)) { sums(i) += vec(i); i += 1 }
            n += 1
          }
          Iterator.single((cell, sums.map(s => (s / n).toFloat)))
        }.toDF("cell", "mvec")
      // empty cells keep their previous centroid; localCheckpoint
      // truncates the per-iteration lineage (distributed, no driver)
      centDf = centDf.join(means, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("mvec"), col("cvec")).as("cvec"))
        .localCheckpoint()
    }
    assignOnce(centDf, probes)
  }

  /** Deterministic Lloyd refinement of the IVF centroids: each
    * iteration reassigns every corpus vector to its nearest centroid
    * and replaces the centroid with the cell mean. Per-cell sums stream
    * over the group SORTED by vec_id (flatMapSortedGroups), so the
    * float accumulation order — and therefore the refined centroids —
    * are identical across runs and partitionings. Empty cells keep
    * their previous centroid. Cost: one assignment pass + one
    * `nCells`-row collect per iteration. */
  private[operators] def refineCentroids(spark: SparkSession, corpus: DataFrame,
                                         init: Array[(Int, Array[Float])],
                                         iters: Int): Array[(Int, Array[Float])] = {
    import spark.implicits._
    var cents = init
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val stats: Array[(Int, Array[Double], Long)] = assignCells(spark, corpus, bc, 1)
        .groupByKey(_._3)
        .flatMapSortedGroups(col("_1")) { (cell: Int, rows: Iterator[(Long, Array[Float], Int)]) =>
          var sums: Array[Double] = null
          var n = 0L
          rows.foreach { case (_, vec, _) =>
            if (sums == null) sums = new Array[Double](vec.length)
            var i = 0
            while (i < math.min(vec.length, sums.length)) { sums(i) += vec(i); i += 1 }
            n += 1
          }
          Iterator.single((cell, sums, n))
        }.collect()
      val byCell = stats.map(s => s._1 -> s).toMap
      cents = cents.map { case (ci, old) =>
        byCell.get(ci) match {
          case Some((_, sums, n)) if n > 0 => (ci, sums.map(s => (s / n).toFloat))
          case _                           => (ci, old)
        }
      }
    }
    cents
  }

  /** LSH-bucketed approximate top-k: corpus and queries are bucketed by
    * `tables` independent random-hyperplane signatures of `bits` bits;
    * candidates = corpus rows sharing a bucket with the query in any
    * table. Exact cosine + top-k over candidates only. Recall grows with
    * `tables`, cost shrinks with `bits`. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bits: Int = 8, tables: Int = 4): DataFrame = {
    // The table index is folded into the bucket value ((t << bits) | b):
    // bucket domains of different hash tables are disjoint, so the join
    // below only matches rows bucketed by the SAME table — without the
    // fold, the small shared [0, 2^bits) domain made corpus rows from
    // table i collide with query rows from table j, inflating the
    // candidate set ~tables× past design.
    def bucketed(df: DataFrame, idAlias: String, vecAlias: String): DataFrame =
      df.select(col("vec_id").as(idAlias), col("embedding").as(vecAlias),
        explode(array((0 until tables).map(t =>
          VectorFunctions.hyperplaneBucket(col("embedding"), bits, seed = t * 7919)
            + lit(t.toLong << bits)): _*))
          .as("bucket"))
    val c = bucketed(corpus, "vec_id", "c_vec")
    val q = bucketed(queries, "query_id", "q_vec")
    val cand = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(VectorFunctions.cosine(col("c_vec"), col("q_vec")), 6).as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"), col("rk").cast("long").as("rk"))
  }
}
