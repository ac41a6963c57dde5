package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables}
import graft.operators.Dedup

/** Scratch: measure embeddingCosineIvf recall vs exact global pairs. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, d)
    val exact = {
      val v = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          graft.functions.VectorFunctions.cosine(col("a.v"), col("b.v")).as("cos_sim"))
        .filter(col("cos_sim") >= 0.35)
        .select("id_a", "id_b").cache()
    }
    val nExact = exact.count()
    for (cells <- Seq(8, 16, 32); probe <- Seq(2, 4, 6); lloyd <- Seq(0, 2)) {
      val ivf = Dedup.embeddingCosineIvf(spark, emb, "vec_id", "embedding", 0.35,
        nCells = cells, nProbe = probe, lloydIters = lloyd).select("id_a", "id_b")
      val found = ivf.count()
      val hit = ivf.join(exact, Seq("id_a", "id_b")).count()
      println(f"cells=$cells%3d probe=$probe lloyd=$lloyd  found=$found%4d  recall=${hit.toDouble / nExact}%.3f  (exact=$nExact)")
    }
    spark.stop()
  }
}
