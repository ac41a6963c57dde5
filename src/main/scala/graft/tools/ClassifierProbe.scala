package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextClassifier

/** r14 scale receipt for the classifier family (SURVEY 37u/36a): the
  * gradient shuffle is (featureIdx, doc, grad) per iteration — linear
  * by ARGUMENT; this probe makes it linear by RECEIPT (the 57b
  * pattern): per-iteration wall time AND measured shuffle-write bytes
  * at three corpus decades (GenSf documents at mult 10/30/100 → 5k,
  * 15k, 50k docs), for both the binary word-tf trainer and the
  * multinomial char-ngram langid trainer. Run:
  *   sbt "runMain graft.tools.ClassifierProbe <out.json>" */
object ClassifierProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("tools/classifier_probe_r14.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = 4
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var shufWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shufWrite += m.shuffleWriteMetrics.bytesWritten
      }
    })
    def measured[A](f: => A): (Double, Long) = {
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      shufWrite = 0L
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      (wall, shufWrite)
    }

    val results = Seq(10, 30, 100).map { mult =>
      val dir = s"/tmp/graft_clfprobe_m$mult"
      if (!new java.io.File(s"$dir/documents.parquet").exists())
        graft.GenSf.generate(spark, dir, mult, only = Set("documents"))
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.cache(); val n = docs.count()
      // binary quality head: the q_quality_classifier config (tf label)
      val toks = graft.functions.TextAnalysis.wsTokens(lower(col("text")))
      val labeled = docs.withColumn("label",
        (size(filter(toks, t => t === "data")).cast("double") /
          greatest(size(toks), lit(1)) > 0.04).cast("int"))
      val (wBin, bBin) = measured {
        TextClassifier.train(labeled, "doc_id", "text", "label",
          dim = 1 << 12, iters = iters)
      }
      // multinomial char-ngram langid head (5 labels in the corpus)
      val (wMul, bMul) = measured {
        TextClassifier.trainMultinomial(docs, "doc_id", "text", "lang",
          dim = 1 << 13, iters = iters)
      }
      docs.unpersist()
      f"""{"mult":$mult,"n_docs":$n,"iters":$iters,""" +
        f""""binary_sec_per_iter":${wBin / iters}%.2f,"binary_shuffle_mb_per_iter":${bBin / iters / 1e6}%.2f,""" +
        f""""multinomial_sec_per_iter":${wMul / iters}%.2f,"multinomial_shuffle_mb_per_iter":${bMul / iters / 1e6}%.2f}"""
    }
    val json = s"""{"probe":"classifier_r14","points":[${results.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
