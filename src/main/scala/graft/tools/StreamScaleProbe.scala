package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** One-shot streaming-state scale measurement (results adjudicated in
  * plans/PLANS.md §Scaling): Streams.dedupe and runningStatsTws against
  * 1M+ GenSf-shaped event keys on the RocksDB provider, reporting
  * per-epoch state-store rows, memory, and throughput. The gating spec
  * (StreamStateScaleSpec) runs a smaller shape in CI; this main is the
  * full-size evidence run. */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val nKeys = if (args.nonEmpty) args(0).toInt else 1000000
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def metrics(q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Long) = {
      val p = q.lastProgress
      if (p == null || p.stateOperators.isEmpty) (-1L, -1L)
      else (p.stateOperators.map(_.numRowsTotal).sum,
            p.stateOperators.map(_.memoryUsedBytes).sum)
    }

    // --- dedupe: 3 epochs of nKeys GenSf-shaped event keys, watermark 10 s
    {
      val ms = MemoryStream[(String, java.sql.Timestamp)](16)
      val deduped = Streams.dedupe(ms.toDF.toDF("key", "ts"), "ts", Seq("key"), "10 seconds")
      val q = deduped.writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("probe-dedupe").toString)
        .start()
      for (epoch <- 0 until 3) {
        val base = 1700000000000L + epoch * 1000000L
        val t0 = System.nanoTime()
        // GenSf event-key shape: type + entity id (uniform, no skew)
        ms.addData((0 until nKeys).map { i =>
          (s"evt${i % 5}_u${epoch}_${i}", new java.sql.Timestamp(base + (i % 1000)))
        })
        q.processAllAvailable()
        ms.addData(Seq((s"tick$epoch", new java.sql.Timestamp(base + 20000L))))
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        val (rows, mem) = metrics(q)
        println(f"DEDUPE epoch=$epoch keys=$nKeys dt=$dt%.1fs " +
          f"(${nKeys / dt}%.0f rows/s) stateRows=$rows stateMemMB=${mem / 1e6}%.1f")
      }
      q.stop()
    }

    // --- transformWithState: nKeys keys with a 5 s TTL
    {
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      val ms = MemoryStream[(String, Double)](16)
      val stats = Streams.runningStatsTws(ms.toDS(), ttlMs = 5000L)
      val q = stats.writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("probe-tws").toString)
        .outputMode("update").start()
      val t0 = System.nanoTime()
      ms.addData((0 until nKeys).map(i => (s"key$i", i.toDouble)))
      q.processAllAvailable()
      val dt = (System.nanoTime() - t0) / 1e9
      val (rows, mem) = metrics(q)
      println(f"TWS populate keys=$nKeys dt=$dt%.1fs (${nKeys / dt}%.0f rows/s) " +
        f"stateRows=$rows stateMemMB=${mem / 1e6}%.1f")
      Thread.sleep(5500L)
      ms.addData(Seq(("key0", 1.0))); q.processAllAvailable()
      ms.addData(Seq(("key1", 1.0))); q.processAllAvailable()
      val (rows2, mem2) = metrics(q)
      println(f"TWS after-TTL stateRows=$rows2 stateMemMB=${mem2 / 1e6}%.1f")
      q.stop()
    }
    spark.stop()
  }
}
