package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Plan + shuffle audit: for every SparkEntry query, snapshot the
  * optimizer's formatted plan and the POST-AQE executed plan, and
  * account actual shuffle bytes via a SparkListener. Artifacts land in
  * `plans/` (one .txt per query + PLANS.md index) — the repo-visible
  * evidence for SURVEY.md §5's shuffle-budget claims.
  *
  * Usage: `sbt "runMain graft.tools.PlanAudit [sfDir] [outDir]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outDir = Paths.get(if (args.length > 1) args(1) else "plans")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-query shuffle accounting: reset before each query, read after
    @volatile var shufWrite = 0L
    @volatile var shufRead = 0L
    @volatile var spill = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufWrite += m.shuffleWriteMetrics.bytesWritten
          shufRead += m.shuffleReadMetrics.totalBytesRead
          spill += m.diskBytesSpilled
        }
      }
    })

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // reset FIRST: operators with internal materialization
      // (localCheckpoint rounds) do real work at construction time
      shufWrite = 0L; shufRead = 0L; spill = 0L
      val df = fn(spark, sfDir)
      // collect() (not count()) so Catalyst can't prune the plan down to
      // row counting and under-report shuffles — and it runs through the
      // Dataset's own QueryExecution, so the post-AQE plan is final
      val n = df.collect().length
      // listener events are posted async — drain before reading counters
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      val exec = df.queryExecution
      val formatted = exec.explainString(ExplainMode.fromString("formatted"))
      val finalPlan = exec.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(finalPlan).size
      val cartesian = finalPlan.contains("CartesianProduct")
      // codegen'd operators print with a `*(id)` prefix in the plan tree
      val wholeStage = "\\*\\(\\d+\\)".r.findAllIn(finalPlan).toSet.size
      Files.write(outDir.resolve(s"$name.txt"),
        (s"== $name (sf=$sfDir, rows=$n) ==\n\n--- formatted (pre-execution) ---\n" +
         formatted + "\n--- executed (post-AQE) ---\n" + finalPlan)
          .getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      spark.catalog.clearCache()
      (name, n, exchanges, wholeStage, cartesian, shufWrite, shufRead, spill)
    }

    // Iterative-algorithm blind spot: q_dedup_cluster.txt shows only
    // `Scan ExistingRDD` (localCheckpoint severs lineage). Re-run the
    // clustering with the round probe so the committed snapshot shows
    // the REAL per-round join shape (broadcast-vs-shuffle, exchange
    // count) the 100 TB posture depends on.
    {
      val rounds = new StringBuilder
      rounds.append(s"== q_dedup_cluster per-round propagate plans (sf=$sfDir) ==\n")
      rounds.append("Captured pre-checkpoint each round; labels rows stay constant,\n")
      rounds.append("so round 1's shape is every round's shape.\n")
      val pairs = graft.QueriesLlm.dedupClusterPairs(spark, sfDir)
      graft.operators.Dedup.clusters(pairs, maxIter = 50, roundProbe = (round, df) => {
        rounds.append(s"\n--- round $round (pre-checkpoint, pre-AQE physical) ---\n")
        rounds.append(df.queryExecution.sparkPlan.toString)
      }).collect()
      Files.write(outDir.resolve("q_dedup_cluster_rounds.txt"),
        rounds.toString.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      spark.catalog.clearCache()
    }

    val md = new StringBuilder
    md.append("# Plan audit\n\n")
    md.append(s"Scale factor dir: `$sfDir`; `local[$cpus]`, AQE on. ")
    md.append("Shuffle bytes are actuals from task metrics for the single run of each query ")
    md.append("(driver-side listener; cache cleared between queries). ")
    md.append("Per-query plans: `plans/<query>.txt` (formatted + post-AQE executed).\n\n")
    md.append("| query | rows | exchanges | codegen spans | shuffle write | shuffle read | spill |\n")
    md.append("| --- | --- | --- | --- | --- | --- | --- |\n")
    def human(b: Long): String =
      if (b >= (1L << 20)) f"${b / 1048576.0}%.1f MiB"
      else if (b >= 1024) f"${b / 1024.0}%.1f KiB"
      else s"$b B"
    for ((name, n, ex, ws, cart, sw, sr, sp) <- rows) {
      val flag = if (cart) " ⚠ cartesian" else ""
      md.append(s"| $name$flag | $n | $ex | $ws | ${human(sw)} | ${human(sr)} | ${human(sp)} |\n")
    }
    val total = rows.map(_._6).sum
    md.append(s"\nTotal shuffle write across all ${rows.size} queries: ${human(total)}.\n")
    // the audit owns only the table; the hand-written scale adjudication
    // ("## Scaling" onward — r7/r9/r10 measurement history) survives
    // regeneration verbatim
    val plansPath = outDir.resolve("PLANS.md")
    if (Files.exists(plansPath)) {
      val existing = new String(Files.readAllBytes(plansPath), "UTF-8")
      val at = existing.indexOf("\n## Scaling")
      if (at >= 0) md.append(existing.substring(at))
    }
    Files.write(plansPath, md.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    println(s"[planaudit] wrote ${rows.size} plans + PLANS.md to $outDir")
    spark.stop()
  }
}
