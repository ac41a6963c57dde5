package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GenSf
import graft.operators.{Ann, Pq}

/** r18 receipt: recall of the SERVED path (Pq IVF-PQ + exact rerank,
  * the QueryVectorIndex defaults) under the new `auto` sizing
  * (`Pq.autoCells` = max(16, min(n/125, 4·√n)), probes auto = 2 past
  * 40 cells) — measured on GAUSSIAN unit vectors, the worst case for
  * IVF (no cluster structure to exploit), at one corpus size per auto
  * regime. Output: recall@5 vs brute-force exact for probes 1/2/4/6.
  * Usage: `sbt "runMain graft.tools.AutoSizingRecallProbe [n ...]"`. */
object AutoSizingRecallProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(200000L)
    val dim = 32
    for (n <- sizes; shape <- Seq("gaussian", "clustered")) {
      // gaussian = NO structure (IVF's theoretical worst case: a random
      // point's neighbors scatter across many cells); clustered = the
      // shape real embedding corpora have (n/1000 centers, sigma 0.15
      // around each — points of one cluster land in one or two cells)
      val nClusters = math.max(64L, n / 1000L)
      val corpus = spark.range(n).map { i =>
        val r = GenSf.rng(s"recall_$shape", i)
        val v =
          if (shape == "gaussian") Array.fill(dim)(r.nextGaussian().toFloat)
          else {
            val c = GenSf.rng("recall_center", i % nClusters)
            Array.fill(dim)((c.nextGaussian() + 0.15 * r.nextGaussian()).toFloat)
          }
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
        (i, v.map(_ / norm))
      }.toDF("vec_id", "embedding").localCheckpoint(true)
      val queries = corpus.filter(col("vec_id") % (n / 48) === 1)
        .limit(48).localCheckpoint(true)
      val exact = Ann.bruteForceTopK(corpus, queries, 5)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      val cells = Pq.autoCells(n)
      val autoProbe = if (cells <= 40) 6 else 2
      // two quantization configs: the flow DEFAULTS (4-bit raw-vector
      // PQ, rerank 3 — sized for near-dup/self-retrieval, where the
      // query sits ON a corpus point) vs the ANN-SERVING config the
      // knobs support (RESIDUAL encoding + 8-bit codebooks + rerank
      // 10 — the classic FAISS IVF-PQ shape)
      for ((cfg, m, kc, res, rer) <- Seq(
          ("defaults", 4, 16, false, 3), ("ann", 8, 256, true, 10),
          ("ann_deep", 8, 256, true, 200))) {
        val dir = java.nio.file.Files.createTempDirectory(s"graft_recall_$n").toString
        Pq.buildIndex(spark, corpus, dir, nCells = cells, m = m, kCodes = kc,
          residual = res, trainIters = if (res) 2 else 0, lloydIters = 1)
        for (probe <- Seq(2, 16, 64)) {
          val got = Pq.searchIndex(spark, dir, queries, k = 5, nProbe = probe,
              rerankFactor = rer, rerankCorpus = Some(corpus))
            .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
          val r = (exact intersect got).size.toDouble / exact.size
          val tag = if (probe == autoProbe && cfg == "defaults") "  <- auto" else ""
          println(f"n=$n shape=$shape cfg=$cfg%-8s cells=$cells probe=$probe%-3d " +
            f"coverage=${probe.toDouble / cells}%.4f recall@5=$r%.3f$tag")
        }
      }
    }
    spark.stop()
  }
}
