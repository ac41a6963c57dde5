package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Bpe

/** r13 probe (verdict r12 task 4): BPE training at a REALISTIC merge
  * count. The catalog's q_bpe_merges proves 10-24 merges; a real
  * vocabulary is 32k. The catalog corpus can't exercise that (its
  * 31-word vocabulary exhausts after ~200 merges), so the probe
  * synthesizes a deterministic Zipf-ish corpus with enough distinct
  * words for 1k+ merges and measures:
  *
  *  1. learnMergesFast (incremental statistics) total time at
  *     k = 125, 250, 500, 1000 — a FLAT per-merge cost shows as the
  *     time-vs-k slope staying constant (each run re-trains from
  *     scratch, so time(k) ≈ setup + k·cost_per_merge).
  *  2. learnMerges (one Spark job per merge) at k = 25, 50, 100 —
  *     enough to price the per-job scheduler latency the incremental
  *     form removes; extrapolating job-cost × 32k is the argument.
  *  3. Sequence equality fast-vs-distributed at k = 100, and the
  *     prefix property of the fast form (first 125 of the k=1000 run
  *     == the k=125 run).
  *
  * Run: sbt "runMain graft.tools.BpeProbe <out.json> [numWords]"
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("tools/bpe_probe_r13.json")
    val numWords = if (args.length > 1) args(1).toInt else 20000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic corpus: numWords distinct pseudo-words (3-12 chars,
    // 26-letter alphabet), frequency ~ 1/rank (Zipf) capped at 50 —
    // one row per occurrence so wordFreq's groupBy does the counting
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
      df.orderBy("rank").as[(Int, String, String, Long)].collect().toSeq

    val fastKs = Seq(125, 250, 500, 1000)
    val fast = fastKs.map { k =>
      val (m, dt) = time(seqOf(Bpe.learnMergesFast(docs, "text", k)))
      (k, dt, m)
    }
    val slowKs = Seq(25, 50, 100)
    val slow = slowKs.map { k =>
      val (m, dt) = time(seqOf(Bpe.learnMerges(docs, "text", k)))
      (k, dt, m)
    }

    // equality + prefix pins (probe-level; BpeSpec pins them in `sbt test`)
    val f100 = seqOf(Bpe.learnMergesFast(docs, "text", 100))
    require(f100 == slow.last._3, "fast != distributed at k=100")
    require(fast.head._3 == fast.last._3.take(125), "fast prefix property violated")

    // per-merge slopes from consecutive fast runs: (t2-t1)/(k2-k1)
    val slopes = fast.sliding(2).map { case Seq((k1, t1, _), (k2, t2, _)) =>
      f"""{"from":$k1,"to":$k2,"sec_per_merge":${(t2 - t1) / (k2 - k1)}%.6f}"""
    }.mkString("[", ",", "]")
    val slowPerMerge = slow.map { case (k, dt, _) =>
      f"""{"k":$k,"total_sec":$dt%.2f,"sec_per_merge":${dt / k}%.4f}"""
    }.mkString("[", ",", "]")
    val fastTotals = fast.map { case (k, dt, _) =>
      f"""{"k":$k,"total_sec":$dt%.2f}""" }.mkString("[", ",", "]")

    val json =
      s"""{"probe":"bpe_r13","num_distinct_words":$numWords,
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
