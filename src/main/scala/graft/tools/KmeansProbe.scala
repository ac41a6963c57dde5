package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** Scratch stage-timing probe for Cluster.kmeansAssign (not part of
  * the driver contract): times quantize, seed, assignment, and update
  * separately at the SPARK_GRAFT_SF_DIR scale. */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[kmeans] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val df = Tables.embeddings(spark, sfDir)
    val codes = df.select(col("vec_id").cast("long").as("id"),
      VectorFunctions.quantize8(col("embedding")).getField("codes")
        .cast("array<double>").as("c"))
    time("quantize count") { codes.count() }
    val mat = time("quantize checkpoint") { codes.localCheckpoint(true) }
    val cents = time("seed") {
      mat.orderBy(col("id")).limit(8)
        .select(col("id").as("cid"), col("c").as("cv")).localCheckpoint(true)
    }
    val packed = cents.agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))
    val a1 = mat.crossJoin(broadcast(packed))
      .select(col("id"), col("c"),
        array_max(transform(col("cents"), cc =>
          struct(graft.plans.CosineSimilarity(col("c"), cc.getField("cv")).as("sim"),
            (-cc.getField("cid")).as("neg"), cc.getField("cid").as("cid")))).as("best"))
      .select(col("id"), col("c"), col("best.cid").as("cid"), col("best.sim").as("sim"))
    val a1m = time("assign1 checkpoint") { a1.localCheckpoint(true) }
    val upd = a1m.select(col("cid"), posexplode(col("c")).as(Seq("pos", "v")))
      .groupBy("cid", "pos").agg(sum(col("v")).as("s"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos").as("p"), col("s").as("v")))),
        x => x.getField("v")).as("cv"))
    val updM = time("update checkpoint") { upd.localCheckpoint(true) }
    val packed2 = updM.agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))
    val a2 = mat.crossJoin(broadcast(packed2))
      .select(col("id"),
        array_max(transform(col("cents"), cc =>
          struct(graft.plans.CosineSimilarity(col("c"), cc.getField("cv")).as("sim"),
            (-cc.getField("cid")).as("neg"), cc.getField("cid").as("cid")))).as("best"))
    time("assign2 count") { a2.count() }
    spark.stop()
  }
}

/** Times the real operator end-to-end (count action, like Bench). */
object KmeansOpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (iters <- Seq(1, 2); r <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.operators.Cluster.kmeansAssign(
        graft.Tables.embeddings(spark, sfDir), "vec_id", "embedding", 8, iters).count()
      println(f"[op] iters=$iters rep$r n=$n ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
