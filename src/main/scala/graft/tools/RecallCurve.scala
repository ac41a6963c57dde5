package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GenSf
import graft.operators.Ann

/** Scratch: recall@10 curve over nProbe on the GenSf embedding population. */
object RecallCurve {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val corpus = (0L until 2000L).map { i =>
      val r = GenSf.rng("emb", i)
      val v = Array.fill(64)(r.nextGaussian().toFloat)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i, v.map(_ / norm))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 16)
    val exact = Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    for (lloyd <- Seq(0, 2); probe <- Seq(2, 4, 6, 8, 12)) {
      val approx = Ann.ivfTopK(spark, corpus, queries, 10,
          nCells = 16, nProbe = probe, lloydIters = lloyd)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      val r = (exact intersect approx).size.toDouble / exact.size
      println(f"lloyd=$lloyd probe=$probe recall@10=$r%.3f")
    }
    spark.stop()
  }
}
