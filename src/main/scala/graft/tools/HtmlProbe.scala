package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale receipt for the r16 HTML stage-0 (39e): wrap every document
  * in the q_html_extract boilerplate page and FORCE the full jusText
  * extraction (sum(length(main_text)) — a bare count() would let
  * Catalyst prune the projection and measure the parquet footer), at
  * each decade dataset passed on the command line. Expectation for a
  * zero-exchange narrow map: wall scales ~linearly with rows and the
  * per-doc cost is flat.
  *
  * Usage: `sbt "runMain graft.tools.HtmlProbe <out.json> <dir1> <dir2> ..."`
  */
object HtmlProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: HtmlProbe <out.json> <dir>...")
    val out = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = args.drop(1).map { dir =>
      val docs = graft.Tables.documents(spark, dir)
      val n = docs.count()
      def run(): (Long, Double) = {
        val t0 = System.nanoTime()
        val total = docs
          .select(col("doc_id"), graft.QueriesLlm.htmlWrap(withPara2 = true).as("html"))
          .select(graft.plans.HtmlFunctions.mainText(col("html"), useStoplist = false)
            .as("main_text"))
          .agg(sum(length(col("main_text"))).cast("long")).head().getLong(0)
        (total, (System.nanoTime() - t0) / 1e9)
      }
      run() // warm
      val reps = (1 to 3).map(_ => run())
      val wall = reps.map(_._2).sorted.apply(1) // median
      val bytes = reps.head._1
      f"""{"dir":"$dir","docs":$n,"extracted_chars":$bytes,"wall_sec":$wall%.2f,"docs_per_sec":${(n / wall).toLong}}"""
    }
    val json = s"""{"probe":"html_extract_r16","runs":[${results.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
