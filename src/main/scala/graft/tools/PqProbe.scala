package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Pq

/** r13 scale receipt for the PQ family: encode + ADC search walls at
  * two corpus decades (GenSf embeddings at mult 10 and 100 → 20k and
  * 200k vectors), so the linear-in-n claim of SURVEY 35e/35f carries a
  * measured ratio like every other dedup/ANN row. Run:
  *   sbt "runMain graft.tools.PqProbe <out.json>"
  * (generates its own embeddings under /tmp — embeddings-only GenSf
  * subsets, the NOTES_r12_m1000 pattern). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("tools/pq_probe_r13.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val results = Seq(10, 100).map { mult =>
      val dir = s"/tmp/graft_pqprobe_m$mult"
      if (!new java.io.File(s"$dir/embeddings.parquet").exists())
        graft.GenSf.generate(spark, dir, mult, only = Set("embeddings"))
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      emb.cache(); val n = emb.count()
      val queries = emb.filter(col("vec_id") < 16)
      val tEnc = time {
        Pq.encode(emb, "vec_id", "embedding").agg(count(lit(1))).collect()
      }
      val tAdc = time {
        Pq.adcTopK(spark, emb, queries, k = 10, rerankFactor = 4).count()
      }
      val tIvf = time {
        Pq.ivfAdcTopK(spark, emb, queries, k = 10,
          nCells = math.max(16, (n / 1000).toInt), nProbe = 4).count()
      }
      emb.unpersist()
      f"""{"mult":$mult,"n_vectors":$n,"encode_sec":$tEnc%.2f,"adc_topk_sec":$tAdc%.2f,"ivfpq_topk_sec":$tIvf%.2f}"""
    }
    val json = s"""{"probe":"pq_r13","points":[${results.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
