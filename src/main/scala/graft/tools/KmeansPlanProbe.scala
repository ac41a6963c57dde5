package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

object KmeansPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[kp] $l%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val df = graft.Tables.embeddings(spark, "/tmp/gensf_m30")
    val codes = df.select(col("vec_id").cast("long").as("id"),
      VectorFunctions.quantize8(col("embedding")).getField("codes")
        .cast("array<double>").as("c"))
    def assign(cs: org.apache.spark.sql.DataFrame) = {
      val packed = cs.agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))
      codes.crossJoin(broadcast(packed))
        .select(col("id"), col("c"),
          array_max(transform(col("cents"), cc =>
            struct(graft.plans.CosineSimilarity(col("c"), cc.getField("cv")).as("sim"),
              (-cc.getField("cid")).as("neg"), cc.getField("cid").as("cid")))).as("best"))
        .select(col("id"), col("c"), col("best.cid").as("cid"), col("best.sim").as("sim"))
    }
    val cents0 = codes.orderBy(col("id")).limit(8)
      .select(col("id").as("cid"), col("c").as("cv"))
    val assigned1 = assign(cents0)
    time("assign1 count") { assigned1.count() }
    time("assign1 count again") { assigned1.count() }
    val partials = assigned1.select(col("cid"), col("c"))
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
    time("partials count") { partials.count() }
    val cents1 = partials
      .select(col("cid"), posexplode(col("partial")).as(Seq("pos", "v")))
      .groupBy("cid", "pos").agg(sum(col("v")).as("s"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos").as("p"), col("s").as("v")))),
        x => x.getField("v")).as("cv"))
    val cM = time("cents1 checkpoint") { cents1.localCheckpoint() }
    val assigned2 = assign(cM)
    time("assign2 count") { assigned2.count() }
    spark.stop()
  }
}

object KmeansArgmaxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ap] $l%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val df = graft.Tables.embeddings(spark, "/tmp/gensf_m30")
    val codes = df.select(col("vec_id").cast("long").as("id"),
      VectorFunctions.quantize8(col("embedding")).getField("codes")
        .cast("array<double>").as("c")).localCheckpoint()
    time("codes materialize (done above)") { codes.count() }
    val cents0 = codes.orderBy(col("id")).limit(8)
      .select(col("id").as("cid"), col("c").as("cv"))
    val packed = cents0.agg(collect_list(struct(col("cid"), col("cv"))).as("cents")).localCheckpoint()
    val joined = codes.crossJoin(broadcast(packed))
    time("join + sum(size(cents))") {
      joined.select(sum(size(col("cents")))).collect() }
    time("one cosine vs first centroid") {
      joined.select(sum(graft.plans.CosineSimilarity(col("c"),
        col("cents").getItem(0).getField("cv")))).collect() }
    time("transform 8 cosines, array_max plain") {
      joined.select(sum(array_max(transform(col("cents"), cc =>
        graft.plans.CosineSimilarity(col("c"), cc.getField("cv")))))).collect() }
    time("transform 8 struct, array_max struct") {
      joined.select(sum(array_max(transform(col("cents"), cc =>
        struct(graft.plans.CosineSimilarity(col("c"), cc.getField("cv")).as("sim"),
          (-cc.getField("cid")).as("neg"), cc.getField("cid").as("cid")))).getField("sim"))).collect() }
    time("quantize inline (no checkpoint) 1 cosine") {
      df.select(col("vec_id").cast("long").as("id"),
        VectorFunctions.quantize8(col("embedding")).getField("codes")
          .cast("array<double>").as("c"))
        .crossJoin(broadcast(packed))
        .select(sum(graft.plans.CosineSimilarity(col("c"),
          col("cents").getItem(0).getField("cv")))).collect() }
    spark.stop()
  }
}
