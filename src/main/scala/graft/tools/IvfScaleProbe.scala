package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Ann, Dedup}

/** r12 m1000-decade adjudication probe for q_embed_neardup_ivf /
  * q_semantic_dedup_ivf: separates the two cost terms of the IVF
  * near-dup so wall-time growth is attributed by COUNTS and per-stage
  * walls, not inferred —
  *
  *   1. the candidate-pair term Σ_cells C(sz,2): designed LINEAR in n
  *      (cells ∝ n, fixed probe), measured here from the assignment's
  *      own cell populations (an aggregate, no join);
  *   2. the ASSIGNMENT term: the two-level hierarchical scan costs
  *      O(n·√C·d) per pass (coarse anchors + anchor-group refine), so
  *      with C ∝ n it is n^1.5 by design — at a 10× decade that is
  *      10·√10 ≈ 31.6× the work. This probe times the assignment pass
  *      alone to show whether the decade's wall growth is exactly that
  *      term (environment-independent prediction: ~31.6×) or something
  *      unexplained.
  *
  * Usage: `sbt "runMain graft.tools.IvfScaleProbe <sfDir>"`
  * Config mirrors QueriesLlm.ivfConfig (cells = n/125, probe = 2 past
  * the oracle SFs).
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val cells = math.max(16L, n / 125L).toInt
    val probe = if (n <= 5000) 6 else 2
    val corpus = emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))

    // stage 1: assignment only (the O(n·√C·d) term)
    val (assigned, tAssign) = timed {
      val a = Ann.assignCellsDistributed(spark, corpus, cells, probe)
        .toDF("id", "v", "cell").localCheckpoint(true)
      a
    }
    val aRows = assigned.count()
    // candidate pairs the self-join would emit, from cell populations
    val pairsOf = (col("count") * (col("count") - 1) / 2).cast("long")
    val cellStats = assigned.groupBy("cell").count().agg(
      count(lit(1)).as("n_cells_hit"),
      max(col("count")).as("max_cell"),
      sum(pairsOf).as("cand_pairs")).collect()(0)

    // stage 2: the full operator (assignment + pair join + verify)
    val (outPairs, tFull) = timed {
      Dedup.embeddingCosineIvf(spark, emb, "vec_id", "embedding", 0.35,
        nCells = cells, nProbe = probe).count()
    }
    println(s"""{"sf":"$sfDir","n":$n,"cells":$cells,"probe":$probe,""" +
      s""""assigned_rows":$aRows,"cells_hit":${cellStats.getLong(0)},""" +
      s""""max_cell":${cellStats.getLong(1)},"cand_pairs":${cellStats.getLong(2)},""" +
      s""""out_pairs":$outPairs,""" +
      f""""t_assign":$tAssign%.1f,"t_full":$tFull%.1f}""")
    spark.stop()
  }
}
