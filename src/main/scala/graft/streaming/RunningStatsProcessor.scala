package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key running (count, max) with a typed ValueState handle — the
  * transformWithState form of [[Streams.runningStats]]. State layout is
  * explicit; `ttlMs > 0` sets a TTLConfig so idle keys expire from the
  * store exactly like NiFi's cache-expiry — the knob that bounds state
  * on unbounded key domains (requires TimeMode.ProcessingTime). */
class RunningStatsProcessor(ttlMs: Long = -1L)
    extends StatefulProcessor[String, (String, Double), (String, Long, Double)] {

  @transient private var state: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val ttl = if (ttlMs > 0) new TTLConfig(java.time.Duration.ofMillis(ttlMs))
              else TTLConfig.NONE
    state = getHandle.getValueState[(Long, Double)](
      "stats", Encoders.product[(Long, Double)], ttl)
  }

  override def handleInputRows(key: String, rows: Iterator[(String, Double)],
                               timers: TimerValues): Iterator[(String, Long, Double)] = {
    val (n0, mx0) = if (state.exists()) state.get() else (0L, Double.MinValue)
    var n = n0; var mx = mx0
    rows.foreach { case (_, v) => n += 1; if (v > mx) mx = v }
    state.update((n, mx))
    Iterator.single((key, n, mx))
  }
}
