package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Streaming state at scale (RocksDB provider): the batch catalog has an
  * empirical scale proof (plans/PLANS.md §Scaling); this suite is the
  * streaming counterpart. It measures state-store growth through the
  * query-progress metrics and gates the property that matters at 100 TB:
  * WATERMARK EVICTION (dedupe) and TTL EXPIRY (transformWithState)
  * keep state proportional to the live horizon, not to stream history.
  */
class StreamStateScaleSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(key, "")
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally if (prev.nonEmpty) spark.conf.set(key, prev) else spark.conf.unset(key)
  }

  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long = {
    val p = q.lastProgress
    if (p == null || p.stateOperators.isEmpty) -1L
    else p.stateOperators.map(_.numRowsTotal).sum
  }

  test("dedupe state is bounded by the watermark horizon, not stream history") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val keysPerEpoch = 60000
      val ms = MemoryStream[(String, java.sql.Timestamp)](16)
      val deduped = Streams.dedupe(ms.toDF.toDF("key", "ts"), "ts", Seq("key"), "10 seconds")
      val q = deduped.writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("dedupe-scale").toString)
        .start()
      val perEpochRows = (0 until 3).map { epoch =>
        // epochs are 1000 s apart — far past the 10 s watermark delay, so
        // each epoch's keys are evictable once the next epoch arrives
        val base = 1700000000000L + epoch * 1000000L
        val rows = (0 until keysPerEpoch).map { i =>
          (s"k${epoch}_$i", new java.sql.Timestamp(base + (i % 1000)))
        }
        ms.addData(rows)
        q.processAllAvailable()
        // one empty commit so eviction from the advanced watermark lands
        // in the store metrics deterministically
        ms.addData(Seq((s"tick$epoch", new java.sql.Timestamp(base + 20000L))))
        q.processAllAvailable()
        stateRows(q)
      }
      q.stop()
      // State after each epoch must stay ~one horizon's worth of keys:
      // without eviction it would be cumulative (120k, 180k by epoch 2).
      perEpochRows.foreach { n =>
        assert(n >= 0, "no state metrics reported")
        assert(n <= keysPerEpoch * 1.5,
          s"state not bounded by watermark horizon: $n rows (epochs hold $keysPerEpoch)")
      }
      // and it must not grow epoch-over-epoch beyond noise
      assert(perEpochRows.last <= perEpochRows.head * 1.5 + 1000,
        s"state grew across epochs: $perEpochRows")
    }
  }

  test("transformWithState at 100k+ keys: throughput recorded, TTL form bounds state") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val nKeys = 120000
      val ms = MemoryStream[(String, Double)](16)
      // ProcessingTime mode keeps requesting no-data batches (to fire
      // TTL/timers), so processAllAvailable never settles on an idle
      // stream — same contract as the MGWS test; disable them here
      val prevNoData = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      // TTL'd running stats: idle keys expire after 2 s of processing time
      val stats = Streams.runningStatsTws(ms.toDS(), ttlMs = 2000L)
      val q = stats.writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("tws-scale").toString)
        .outputMode("update").start()
      val t0 = System.nanoTime()
      ms.addData((0 until nKeys).map(i => (s"key$i", i.toDouble)))
      q.processAllAvailable()
      val dtSec = (System.nanoTime() - t0) / 1e9
      val populated = stateRows(q)
      assert(populated >= nKeys,
        s"expected >= $nKeys state rows after first batch, got $populated")
      info(f"transformWithState: $nKeys keys in $dtSec%.1f s " +
        f"(${nKeys / dtSec}%.0f keys/s), state rows = $populated")
      // let the TTL lapse, then touch ONE key: expired keys must leave
      // the primary state column family
      Thread.sleep(2500L)
      ms.addData(Seq(("key0", 1.0)))
      q.processAllAvailable()
      ms.addData(Seq(("key1", 1.0)))
      q.processAllAvailable()
      val after = stateRows(q)
      q.stop()
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
      assert(after < nKeys / 2,
        s"TTL did not evict idle keys: $after rows still in state (was $populated)")
    }
  }
}
