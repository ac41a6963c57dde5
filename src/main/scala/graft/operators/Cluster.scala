package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._


/** Embedding-corpus clustering (SURVEY.md §2.4): deterministic k-means
  * over int8-quantized vectors. Clustering is the curation primitive
  * behind cluster-balanced sampling and SemDeDup-style per-cluster
  * dedup (Abbas et al. 2023); this re-expresses classic Lloyd
  * iteration (Lloyd 1982) as a fully distributed Spark plan — no
  * driver-side centroid materialization at any k.
  *
  * Determinism/portability design: vectors are first quantized to int8
  * codes ([[graft.functions.VectorFunctions.quantize8]] semantics —
  * floor-based half-up, engine
  * identical), and centroids are kept as UNNORMALIZED integer sum
  * vectors — cosine is scale-invariant, so argmax against the sum
  * equals argmax against the mean while every dot/norm stays an EXACT
  * integer (dim 64 × int8 codes × cluster sums ≪ 2⁵³ up to ~10⁷ rows
  * per cluster). The nearest-centroid compare is therefore
  * bit-identical across engines and partitionings, which is what lets
  * a SQL oracle replay the full iteration exactly.
  */
object Cluster {

  /** K-means cluster assignment after `iters` assignment passes
    * (centroids update between passes; `iters = 2` ⇒ assign → update →
    * assign). Seeds = the `k` smallest-id vectors' code vectors;
    * cluster label = the seed's id. Empty clusters simply vanish (both
    * engines drop them identically).
    *
    * Plan shape: centroids live in a k-row DataFrame that BROADCASTS
    * into the corpus (no collect); assignment is a broadcast join +
    * `max_by` aggregate (map-side combinable — the shuffle carries one
    * row per vector, not one per (vector, centroid)); the centroid
    * update is a posexplode → sum by (cluster, dim) → rebuild (k·dim
    * rows after partial aggregation). For k past broadcast range, swap
    * the assignment join for [[Ann.assignCellsDistributed]]'s
    * anchor-grouped two-level shape — the math here is already
    * centroid-location-agnostic.
    *
    * Output: (`idCol`, cluster, sim) — `sim` = cosine against the final
    * centroid, rounded to 6 decimals for display; ranking happens on
    * the raw exact-integer cosine with ties broken by cluster id.
    */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters > 0, s"kmeansAssign: need k>0, iters>0; got k=$k iters=$iters")
    // Codes live as integer-VALUED array<double> end-to-end: every sum
    // and dot stays exact (≪2⁵³), and the assignment lambda below runs
    // cast-free. Quantization is the native single-pass
    // [[graft.plans.Quantize8Codes]] — the interpreted HOF form
    // re-folds the max-abs aggregate per element (measured 6.9 s vs
    // 0.3 s over 60k×64, then ~6 µs/row·site as the m300 linear term;
    // tools/NOTES_r10_kmeans.md).
    val codes = df.select(col(idCol).cast("long").as("id"),
      graft.plans.Quantize8Codes(col(vecCol)).as("c"))
    var cents = codes.orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("c").as("cv"))

    // Assignment is NARROW: the k centroids pack into a single-row
    // array that broadcasts, and the argmax runs inside the row via
    // higher-order functions — corpus rows never shuffle to be
    // assigned. array_max over (sim, -cid, cid) structs = max cosine,
    // ties to the smallest cluster id (collect_list order can't matter
    // — max is order-invariant).
    def assign(cs: DataFrame): DataFrame = {
      val packed = cs.agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))
      codes.crossJoin(broadcast(packed))
        .select(col("id"), col("c"),
          array_max(transform(col("cents"), cc =>
            struct(
              // Zero vectors make cosine 0/0 = NaN, and NaN sorts
              // ABOVE every double in the struct compare — a degenerate
              // centroid would silently capture all rows. nanvl pins
              // such pairs to -2 (below the cosine range), mirroring
              // Ann.bruteForceTopKPartitioned's denom>0 guard.
              nanvl(graft.plans.CosineSimilarity(col("c"), cc.getField("cv")),
                lit(-2.0)).as("sim"),
              (-cc.getField("cid")).as("neg"),
              cc.getField("cid").as("cid")))).as("best"))
        .select(col("id"), col("c"), col("best.cid").as("cid"), col("best.sim").as("sim"))
    }

    var assigned = assign(cents)
    val spark = df.sparkSession
    import spark.implicits._
    for (_ <- 1 until iters) {
      // Centroid update as ONE streamed pass: per-partition dense
      // accumulators (mapPartitions — the documented Catalyst exit,
      // same as Ann's refinement) emit ≤k partial-sum vectors each,
      // which then merge relationally. The naive
      // posexplode-the-assignment form multiplied rows ×dim UNDER the
      // live argmax projection and re-evaluated the interpreted
      // nearest-centroid lambda per exploded row (measured 23 s vs 1 s
      // at 60k×64); materializing the assignment first just moved the
      // cost into corpus-sized block writes. Here the argmax streams
      // once per row, nothing corpus-sized materializes, and the sums
      // stay exact integers (order-independent). The k-row centroid
      // table localCheckpoints so pass i never replays inside pass i+1.
      val partials = assigned.select(col("cid"), col("c"))
        .as[(Long, Array[Double])]
        .mapPartitions { it =>
          val acc = scala.collection.mutable.LongMap.empty[Array[Double]]
          it.foreach { case (cid, c) =>
            val a = acc.getOrElseUpdate(cid, new Array[Double](c.length))
            var i = 0
            while (i < c.length) { a(i) += c(i); i += 1 }
          }
          acc.iterator
        }.toDF("cid", "partial")
      cents = partials
        .select(col("cid"), posexplode(col("partial")).as(Seq("pos", "v")))
        .groupBy("cid", "pos").agg(sum(col("v")).as("s"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos").as("p"), col("s").as("v")))),
          x => x.getField("v")).as("cv"))
        .localCheckpoint()
      assigned = assign(cents)
    }
    // DuckDB-faithful rounding (round(x·10⁶)/10⁶) for the display col.
    assigned.select(col("id").as(idCol), col("cid").as("cluster"),
      (round(col("sim") * 1e6) / 1e6).as("sim"))
  }

  /** Cluster-balanced sampling: keep at most `perCluster` rows per
    * cluster, chosen by a seeded md5 permutation of the id (the same
    * engine-portable pseudo-random order [[Scale.globalShuffle]] uses)
    * — the downsampling step of cluster-balanced curation (over-dense
    * clusters are capped, rare clusters survive whole). One shuffle on
    * the cluster key; for a pathologically dominant cluster, pre-salt
    * the window or use [[Scale.saltedJoin]]'s posture — the sample is
    * order-defined, so any partitioning of the SAME cluster ordering
    * yields the same keep set. */
  def balancedSample(assigned: DataFrame, idCol: String, clusterCol: String,
                     perCluster: Int, seed: String): DataFrame = {
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(md5(concat(lit(seed + ":"), col(idCol).cast("string"))), col(idCol))
    assigned.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= perCluster).drop("rk")
  }
}
