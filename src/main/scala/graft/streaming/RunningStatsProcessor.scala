package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key running (count, max) with a typed ValueState handle — the
  * transformWithState form of [[Streams.runningStats]]. State layout is
  * explicit and TTL-able; a production variant would set a TTLConfig to
  * bound state exactly like NiFi's cache-expiry. */
class RunningStatsProcessor
    extends StatefulProcessor[String, (String, Double), (String, Long, Double)] {

  @transient private var state: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[(Long, Double)](
      "stats", Encoders.product[(Long, Double)], TTLConfig.NONE)
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
