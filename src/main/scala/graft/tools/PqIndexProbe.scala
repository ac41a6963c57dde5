package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Pq

/** r14 receipt for the persistent IVF-PQ index (SURVEY 35g): the
  * build-once/search-many contract as numbers — index build wall vs
  * repeated query-batch walls served FROM the persisted layout, at two
  * corpus decades. The claim being receipted: query-batch cost is
  * independent of index-BUILD cost (no re-encoding per batch), and
  * serving reads only the probed cell partitions. Run:
  *   sbt "runMain graft.tools.PqIndexProbe <out.json>" */
object PqIndexProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("tools/pq_index_probe_r14.json")
    val mults = if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
                else Seq(10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val results = mults.map { mult =>
      val dir = s"/tmp/graft_pqprobe_m$mult" // shared with PqProbe
      if (!new java.io.File(s"$dir/embeddings.parquet").exists())
        graft.GenSf.generate(spark, dir, mult, only = Set("embeddings"))
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val idx = s"/tmp/graft_pqindex_m$mult"
      val nCells = math.max(16, (n / 1000).toInt)
      val tBuild = time {
        Pq.buildIndex(spark, emb, idx, nCells = nCells)
      }
      // three successive query batches served from the SAME files
      val batchWalls = (0 until 3).map { b =>
        val queries = emb.filter(col("vec_id") % 1000 === b).limit(16)
        time { Pq.searchIndex(spark, idx, queries, k = 10, nProbe = 4).count() }
      }
      f"""{"mult":$mult,"n_vectors":$n,"n_cells":$nCells,"build_sec":$tBuild%.2f,""" +
        s""""search_batch_sec":[${batchWalls.map(w => f"$w%.2f").mkString(",")}]}"""
    }
    val json = s"""{"probe":"pq_index_r14","points":[${results.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
