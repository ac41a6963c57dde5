package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.UnigramLm

/** r13 scale receipt for the unigram-LM trainer (SURVEY 38i): training
  * cost on the BpeProbe synthetic corpus at two vocabulary-size points
  * and two corpus decades — the claim under test is the SentencePiece
  * split (corpus cost = ONE word-count shuffle; training cost scales
  * with the DISTINCT-WORD table and vocab, not the corpus).
  * Run: sbt "runMain graft.tools.UlmProbe <out.json>" */
object UlmProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("tools/ulm_probe_r13.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def corpus(numWords: Int, repeat: Int) = {
      val rows = (0 until numWords).flatMap { i =>
        val r = new java.util.SplittableRandom(0x9E3779B97F4A7C15L * (i + 1))
        val len = 3 + r.nextInt(10)
        val w = (0 until len).map(_ => ('a' + r.nextInt(26)).toChar).mkString
        Seq.fill(math.max(1, math.min(50, numWords / (i + 1))) * repeat)(w)
      }
      rows.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // same distinct vocabulary, 1x vs 10x corpus occurrences: the
    // corpus decade should cost only the word-count shuffle delta
    val points = for ((numWords, repeat, vocab) <- Seq(
        (20000, 1, 2000), (20000, 1, 8000), (20000, 10, 8000)))
      yield {
        val docs = corpus(numWords, repeat).cache()
        val nRows = docs.count()
        val dt = time {
          UnigramLm.train(docs, "text", vocabSize = vocab).count()
        }
        docs.unpersist()
        f"""{"distinct_words":$numWords,"corpus_rows":$nRows,"vocab":$vocab,"train_sec":$dt%.2f}"""
      }
    val json = s"""{"probe":"ulm_r13","points":[${points.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
