package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.WordPiece

/** r15 probe: WordPiece training at a realistic merge count — the
  * [[BpeProbe]] question asked of the new trainer, PLUS the
  * WordPiece-specific cost driver BPE doesn't have: every merge
  * changes its own symbols' counts (the score denominators), so the
  * incremental trainer eagerly re-pushes every pair adjacent to a
  * changed symbol. Early merges touch high-degree char symbols —
  * this probe prices that re-push traffic at k = 125…1000 against
  * the per-job distributed recount at k = 25…100, and pins
  * fast==distributed sequence equality + the prefix property.
  *
  * Run: sbt "runMain graft.tools.WordPieceProbe <out.json> [numWords]"
  */
object WordPieceProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("tools/wordpiece_probe_r15.json")
    val numWords = if (args.length > 1) args(1).toInt else 20000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the BpeProbe corpus generator, verbatim: deterministic Zipf-ish
    // pseudo-words so the two probes price the same workload
    val rows = (0 until numWords).flatMap { i =>
      val r = new java.util.SplittableRandom(0x9E3779B97F4A7C15L * (i + 1))
      val len = 3 + r.nextInt(10)
      val w = (0 until len).map(_ => ('a' + r.nextInt(26)).toChar).mkString
      val f = math.max(1, math.min(50, numWords / (i + 1)))
      Seq.fill(f)(w)
    }
    val docs = rows.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    docs.cache().count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def seqOf(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank")
        .as[(Int, String, String, String, Long, Long, Long)].collect().toSeq

    val fastKs = Seq(125, 250, 500, 1000)
    val fast = fastKs.map { k =>
      val (m, dt) = time(seqOf(WordPiece.learnVocabFast(docs, "text", k)))
      (k, dt, m)
    }
    val slowKs = Seq(25, 50, 100)
    val slow = slowKs.map { k =>
      val (m, dt) = time(seqOf(WordPiece.learnVocab(docs, "text", k)))
      (k, dt, m)
    }

    val f100 = seqOf(WordPiece.learnVocabFast(docs, "text", 100))
    require(f100 == slow.last._3, "fast != distributed at k=100")
    require(fast.head._3 == fast.last._3.take(125), "fast prefix property violated")

    val slopes = fast.sliding(2).map { case Seq((k1, t1, _), (k2, t2, _)) =>
      f"""{"from":$k1,"to":$k2,"sec_per_merge":${(t2 - t1) / (k2 - k1)}%.6f}"""
    }.mkString("[", ",", "]")
    val slowPerMerge = slow.map { case (k, dt, _) =>
      f"""{"k":$k,"total_sec":$dt%.2f,"sec_per_merge":${dt / k}%.4f}"""
    }.mkString("[", ",", "]")
    val fastTotals = fast.map { case (k, dt, _) =>
      f"""{"k":$k,"total_sec":$dt%.2f}""" }.mkString("[", ",", "]")

    val json =
      s"""{"probe":"wordpiece_r15","num_distinct_words":$numWords,
         |"corpus_rows":${rows.size},
         |"fast_totals":$fastTotals,
         |"fast_slopes":$slopes,
         |"distributed":$slowPerMerge,
         |"equality":"fast==distributed at k=100; fast k=125 is a prefix of k=1000"}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
