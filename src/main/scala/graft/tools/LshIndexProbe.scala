package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.LshIndex

/** r15 receipt for the persistent MinHash-LSH index (SURVEY 32c): the
  * build-once/serve-many contract at two corpus decades — build wall
  * (one signature pass + one banding write) vs the wall of serving a
  * fixed-size incoming batch from the persisted layout (which never
  * re-shingles the corpus), plus the incremental append wall. The
  * claim receipted: serve cost tracks the BATCH (and its bucket
  * collisions), not the corpus; append cost tracks the INCREMENT.
  * Hot-bucket cap 64 as adjudicated in tools/NOTES_r11_minhash.md
  * (the synthetic corpus's bounded vocabulary makes band buckets
  * collide far more than real corpora — the cap sheds the
  * verify-FALSE bulk).
  *
  * Run: sbt "runMain graft.tools.LshIndexProbe <out.json>" */
object LshIndexProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("tools/lsh_index_probe_r15.json")
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
    val results = Seq(10, 100).map { mult =>
      val dir = s"/tmp/graft_lshprobe_m$mult"
      if (!new java.io.File(s"$dir/documents.parquet").exists())
        graft.GenSf.generate(spark, dir, mult, only = Set("documents"))
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val n = docs.count()
      val idx = s"/tmp/graft_lshidx_m$mult"
      val (_, tBuild) = time {
        LshIndex.buildIndex(spark, docs, idx)
      }
      // a fixed 1000-doc incoming batch (recycled text, fresh ids) —
      // the DetectDuplicate gate shape; wall should track the batch
      val batch = docs.filter(col("doc_id") < 1000)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      val serveWalls = (0 until 3).map { _ =>
        val (_, w) = time {
          LshIndex.searchIndex(spark, idx, batch, threshold = 0.7, maxBucket = 64).count()
        }
        f"$w%.2f"
      }
      // incremental ingest of the same 1000 docs
      val (_, tAppend) = time { LshIndex.appendToIndex(spark, idx, batch) }
      s"""{"mult":$mult,"n_docs":$n,"build_sec":${f"$tBuild%.2f"},""" +
        s""""serve_1k_sec":[${serveWalls.mkString(",")}],"append_1k_sec":${f"$tAppend%.2f"}}"""
    }
    val json = s"""{"probe":"lsh_index_r15","points":[${results.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
