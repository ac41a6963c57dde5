package graft.tools

import org.apache.spark.sql.SparkSession

object CutProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = graft.SparkEntry.queries("q_cut_spans")(spark, "/tmp/gensf_m300")
      val p = df.queryExecution.executedPlan.toString
      println("[cutprobe] PLAN:")
      p.split("\n").foreach(l => println("[cutprobe] " + l.take(200)))
      val n = df.count(); println(s"[cutprobe] ok n=$n")
    } catch { case t: Throwable =>
      println(s"[cutprobe] FAILED: ${t.getClass.getName}: ${t.getMessage}")
      t.printStackTrace()
    }
    spark.stop()
  }
}
