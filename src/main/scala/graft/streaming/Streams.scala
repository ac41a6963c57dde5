package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType, TimestampType}

/** (Capability reference: NiFi 2.7 continuous flows as deployed by
  * /root/reference/dev.nifi.yaml:1; Zookeeper-coordinated NiFi
  * clustering maps to Spark's own driver/executor model.)
  *
  * Structured Streaming operators — the NiFi continuous-flow side
  * (TailFile/ListenTCP/ConsumeKafka feeds, ControlRate back-pressure,
  * DetectDuplicate state, rolling windows), Spark-first.
  *
  * Micro-batch + watermark state is the scale posture: state stores are
  * per-key partitioned and RocksDB-backed on real clusters; every op
  * here bounds its state with a watermark or timeout.
  */
object Streams {

  /** TailFile/ListFile-as-stream: new files in `dir` become records.
    * `maxFilesPerTrigger` is the ControlRate knob (bounds per-batch
    * intake so one big backlog can't blow executor memory). */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
                 format: String = "json", maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .format(format).load(dir)

  /** Binary media file stream (GetFile over a media drop directory):
    * each arriving file becomes one row (path, modificationTime, length,
    * content binary) — pair with `Multimodal.parseHeader` to route by
    * container format without decoding. */
  def binaryFileStream(spark: SparkSession, dir: String,
                       maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(StructType(Seq( // binaryFile's fixed schema (streaming requires it stated)
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .format("binaryFile").load(dir)

  /** Deterministic synthetic stream (rate source) — ListenX stand-in for
    * tests/demos; `rowsPerSecond` is the ControlRate knob. */
  def rateStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()

  /** ListenTCP: newline-delimited records from a TCP socket, one `value`
    * string column. Pipe into [[graft.operators.Parse.parseSyslog]] for
    * ListenSyslog semantics. (Spark's socket source is single-receiver —
    * at scale front it with a distributed log; the operator surface
    * stays the same.) */
  def socketStream(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** Windowed aggregation with a watermark (AttributeRollingWindow /
    * windowed QueryRecord): per (key, window) counts + sums. Watermark
    * bounds state: windows older than `delay` are finalized + evicted. */
  def windowedAgg(df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
                  windowDur: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum_value"))

  /** DetectDuplicate: drop records whose key was already seen within the
    * watermark horizon. State is bounded by the watermark (NiFi's cache
    * TTL equivalent). */
  def dedupe(df: DataFrame, tsCol: String, keyCols: Seq[String], delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Session windows (gap-based), declarative: Spark's session_window
    * merges events closer than `gap` into one window per key. */
  def sessionWindowAgg(df: DataFrame, tsCol: String, keyCol: String,
                       gap: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))

  /** Custom keyed state via mapGroupsWithState: running per-key count +
    * max-value — the escape hatch for semantics session_window/window
    * can't express (NiFi's stateful processors). Input: (key, value)
    * pairs. NOTE: with ProcessingTimeTimeout the MGWS operator always
    * requests another no-data batch (to fire timeouts), so
    * `processAllAvailable()` never settles on an idle stream — run test
    * / drain-style queries with
    * `spark.sql.streaming.noDataMicroBatches.enabled=false`. */
  def runningStats(ds: Dataset[(String, Double)]): Dataset[(String, Long, Double)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (String, Long, Double)](
        GroupStateTimeout.ProcessingTimeTimeout) {
        case (key, rows, state: GroupState[(Long, Double)]) =>
          if (state.hasTimedOut) {
            val (n, mx) = state.get
            state.remove()
            (key, n, mx)
          } else {
            val (n0, mx0) = state.getOption.getOrElse((0L, Double.MinValue))
            var n = n0; var mx = mx0
            rows.foreach { case (_, v) => n += 1; if (v > mx) mx = v }
            state.update((n, mx))
            state.setTimeoutDuration("30 seconds")
            (key, n, mx)
          }
      }
  }

  /** Spark 4-native custom state: same running stats via
    * `transformWithState` (the successor API to mapGroupsWithState —
    * typed per-key state handles, TTL support, no no-data-batch
    * surprises). Requires the RocksDB state store provider. */
  def runningStatsTws(ds: Dataset[(String, Double)],
                      ttlMs: Long = -1L): Dataset[(String, Long, Double)] = {
    import ds.sparkSession.implicits._
    val timeMode =
      if (ttlMs > 0) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    ds.groupByKey(_._1)
      .transformWithState(new RunningStatsProcessor(ttlMs), timeMode,
        OutputMode.Update())
  }

  /** MonitorActivity: inactivity detection per key in EVENT time. Emits
    * `(key, "inactive", lastSeenMs)` when the watermark passes
    * lastSeen + threshold with no new records, and
    * `(key, "activity.restored", tsMs)` on resumption — NiFi
    * MonitorActivity's one-flowfile-per-transition contract. Requires
    * the RocksDB state store provider (transformWithState). */
  def monitorActivity(ds: Dataset[(String, java.sql.Timestamp)],
                      thresholdMs: Long, delay: String): Dataset[(String, String, Long)] = {
    import ds.sparkSession.implicits._
    ds.toDF("key", "ts").withWatermark("ts", delay)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new MonitorActivityProcessor(thresholdMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Streaming near-dup dedup (single-band SimHash): drop records whose
    * 64-bit SimHash agrees with an already-seen one on the top
    * `prefixBits` (highest-vote bits) within the watermark horizon. A
    * streaming relaxation of [[graft.operators.Dedup.simHashPairs]]:
    * one band ⇒ recall < 1 (bounded by prefix agreement), but state
    * stays one key per retained record and the op composes with any
    * downstream batch verify. */
  def dedupeNearSimhash(df: DataFrame, textCol: String, tsCol: String,
                        delay: String, prefixBits: Int = 48): DataFrame = {
    require(prefixBits > 0 && prefixBits <= 64, "prefixBits in (0, 64]")
    df.withColumn("__band",
        shiftright(graft.plans.TextHashExpressions.simHash64(col(textCol)),
                   64 - prefixBits))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(Seq("__band"))
      .drop("__band")
  }

  /** Stream-stream interval join — the Wait/Notify + JoinEnrichment
    * correlation pattern on two LIVE streams: a left record joins right
    * records with the same key whose event time lands within
    * ±`withinSec` of its own. Both sides are watermarked, so Spark can
    * bound the buffered join state (evict once the watermark passes the
    * interval) — state growth is O(in-flight window), not O(stream).
    * Key/timestamp columns MAY share names across the two sides (the
    * right side is renamed internally; a shared key name appears once in
    * the output, a shared ts name comes back as `<name>__r`). All OTHER
    * column names must be disjoint. */
  def joinWithinInterval(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTs: String, rightTs: String,
                         delay: String, withinSec: Int): DataFrame = {
    // col(name) against two streams that share `name` is an ambiguous
    // reference — rename the right side's key/ts before the join
    val keyCollide = rightKey == leftKey
    val tsCollide = rightTs == leftTs
    val rk = if (keyCollide) rightKey + "__r" else rightKey
    val rts = if (tsCollide) rightTs + "__r" else rightTs
    var r0 = right
    if (keyCollide) r0 = r0.withColumnRenamed(rightKey, rk)
    if (tsCollide) r0 = r0.withColumnRenamed(rightTs, rts)
    val l = left.withWatermark(leftTs, delay)
    val r = r0.withWatermark(rts, delay)
    val joined = l.join(r, col(leftKey) === col(rk) &&
      col(rts) >= col(leftTs) - expr(s"INTERVAL $withinSec SECONDS") &&
      col(rts) <= col(leftTs) + expr(s"INTERVAL $withinSec SECONDS"))
    if (keyCollide) joined.drop(rk) else joined // equal values — keep one
  }

  /** Start a query into an in-memory table (tests/interactive). */
  def toMemorySink(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append()): StreamingQuery =
    df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()

  /** Production file sink: exactly-once parquet append with checkpoint
    * (PutFile for streams). */
  def toParquetSink(df: DataFrame, path: String, checkpoint: String,
                    trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append()).trigger(trigger).start()

  /** Idempotent streaming JDBC upsert sink (PutDatabaseRecord on a
    * stream): each micro-batch delete+inserts its rows keyed on
    * `keyCols` inside one transaction per partition, so a replayed
    * batch (restart recovery) overwrites instead of duplicating —
    * effectively-once for keyed output. Rows within a batch must be
    * key-unique (dedupe upstream, e.g. `Records.topNPerKey` k=1).
    * The target table must exist with matching quoted column names. */
  def toJdbcUpsertSink(df: DataFrame, url: String, table: String,
                       keyCols: Seq[String], checkpoint: String): StreamingQuery = {
    val cols = df.schema.fieldNames.toSeq
    val keyIdx = keyCols.map(cols.indexOf)
    require(keyIdx.forall(_ >= 0), s"keyCols $keyCols must be in ${cols}")
    val delSql = s"DELETE FROM $table WHERE " +
      keyCols.map(c => s""""$c" = ?""").mkString(" AND ")
    val insSql = s"INSERT INTO $table (${cols.map(c => s""""$c"""").mkString(", ")})" +
      s" VALUES (${cols.map(_ => "?").mkString(", ")})"
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
          if (rows.nonEmpty) {
            val conn = java.sql.DriverManager.getConnection(url)
            try {
              conn.setAutoCommit(false)
              val del = conn.prepareStatement(delSql)
              val ins = conn.prepareStatement(insSql)
              rows.foreach { r =>
                keyIdx.zipWithIndex.foreach { case (ci, pi) =>
                  del.setObject(pi + 1, r.get(ci)) }
                del.addBatch()
                cols.indices.foreach(i => ins.setObject(i + 1, r.get(i)))
                ins.addBatch()
              }
              del.executeBatch(); ins.executeBatch()
              conn.commit()
            } catch {
              case e: Throwable =>
                // roll back the open transaction so close() doesn't
                // reject (Derby throws on close-with-active-txn, which
                // would MASK the real micro-batch failure cause)
                try conn.rollback() catch { case s: Throwable => e.addSuppressed(s) }
                throw e
            } finally {
              try conn.close()
              catch { case _: Throwable => () } // original exception wins
            }
          }
        }
        ()
      }
      .start()
  }
}
