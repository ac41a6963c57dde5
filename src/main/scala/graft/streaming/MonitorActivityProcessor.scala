package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** NiFi MonitorActivity, transformWithState form: emits an
  * `(key, "inactive", lastSeenMs)` marker once no record for the key has
  * arrived for `thresholdMs` (event time — the timer fires when the
  * WATERMARK passes lastSeen + threshold, so detection is deterministic
  * under replay), and `(key, "activity.restored", tsMs)` when records
  * resume after an inactive marker.
  *
  * State per key: last-seen event time + inactive flag + one timer —
  * O(keys), bounded exactly like NiFi's monitored-flow state.
  */
class MonitorActivityProcessor(thresholdMs: Long)
    extends StatefulProcessor[String, (String, java.sql.Timestamp), (String, String, Long)] {

  @transient private var lastSeen: ValueState[Long] = _
  @transient private var inactive: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    lastSeen = getHandle.getValueState[Long](
      "lastSeen", Encoders.scalaLong, TTLConfig.NONE)
    inactive = getHandle.getValueState[Boolean](
      "inactive", Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[(String, java.sql.Timestamp)],
                               timers: TimerValues): Iterator[(String, String, Long)] = {
    val maxTs = rows.map(_._2.getTime).max
    val restored =
      if (inactive.exists() && inactive.get()) Iterator.single((key, "activity.restored", maxTs))
      else Iterator.empty
    inactive.update(false)
    val last = math.max(if (lastSeen.exists()) lastSeen.get() else 0L, maxTs)
    lastSeen.update(last)
    // slide the single inactivity timer to lastSeen + threshold
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    getHandle.registerTimer(last + thresholdMs)
    restored
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[(String, String, Long)] = {
    inactive.update(true)
    Iterator.single((key, "inactive", if (lastSeen.exists()) lastSeen.get() else 0L))
  }
}
