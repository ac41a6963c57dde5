package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Pq

/** r15 receipt for residual IVF-PQ at scale (SURVEY 35i): build wall
  * of the v1 (raw) layout vs the v2 (residual + trained codebook +
  * Lloyd-refined cells) layout at 200k vectors, and the serve wall
  * from each — the claim receipted: the v2 build pays a bounded
  * multiple (the extra residual pass + trainIters/lloydIters passes,
  * each one scan), and SERVING cost is layout-independent (same code
  * bytes per vector, same probe shape; the residual path adds one
  * model-sized offset per (query, cell)).
  *
  * Run: sbt "runMain graft.tools.PqResidualProbe <out.json>" */
object PqResidualProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("tools/pq_residual_probe_r15.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val dir = "/tmp/graft_pqprobe_m100"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists())
      graft.GenSf.generate(spark, dir, 100, only = Set("embeddings"))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val nCells = math.max(16, (n / 1000).toInt)
    val queries = emb.filter(col("vec_id") < 64)
    val points = Seq(
      ("v1_raw", false, 0, 0),
      ("v2_residual_trained", true, 5, 3)
    ).map { case (label, residual, trainIters, lloydIters) =>
      val idx = s"/tmp/graft_pqres_idx_$label"
      val (_, tBuild) = time {
        Pq.buildIndex(spark, emb, idx, nCells = nCells,
          residual = residual, trainIters = trainIters, lloydIters = lloydIters)
      }
      val serveWalls = (0 until 3).map { _ =>
        val (_, w) = time {
          Pq.searchIndex(spark, idx, queries, k = 10, nProbe = 4).count()
        }
        f"$w%.2f"
      }
      s"""{"layout":"$label","build_sec":${f"$tBuild%.2f"},""" +
        s""""serve_64q_sec":[${serveWalls.mkString(",")}]}"""
    }
    val json = s"""{"probe":"pq_residual_r15","n_vectors":$n,"n_cells":$nCells,""" +
      s""""points":[${points.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
