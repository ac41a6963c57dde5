package graft

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Lightweight provenance — the NiFi data-provenance pillar mapped to
  * Spark's QueryExecutionListener: every completed action records what
  * ran (action name, duration, physical plan digest, fan-out). NiFi
  * tracks per-FlowFile lineage; at 100 TB the per-record form is the
  * wrong grain — per-ACTION lineage with the full physical plan (which
  * encodes every source path and operator) is what a Spark-native
  * engine can keep cheaply. Pair with the Spark event log for history
  * server replay.
  */
object Provenance {

  case class Event(tsMillis: Long, action: String, durationNs: Long,
                   succeeded: Boolean, planDigest: String, planSummary: String)

  final class Listener extends QueryExecutionListener {
    private[Provenance] val events = new ConcurrentLinkedQueue[Event]()

    private def digest(qe: QueryExecution): (String, String) = {
      val plan = qe.executedPlan.toString
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(plan.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (hex, plan.linesIterator.take(12).mkString("\n"))
    }

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val (hex, summary) = digest(qe)
      events.add(Event(System.currentTimeMillis(), funcName, durationNs, succeeded = true, hex, summary))
    }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = {
      val (hex, summary) = digest(qe)
      events.add(Event(System.currentTimeMillis(), funcName, durationNs = -1L, succeeded = false, hex, summary))
    }
  }

  /** Attach a provenance listener to the session. */
  def enable(spark: SparkSession): Listener = {
    val l = new Listener
    spark.listenerManager.register(l)
    l
  }

  def disable(spark: SparkSession, l: Listener): Unit =
    spark.listenerManager.unregister(l)

  /** The recorded events as a DataFrame (queryable like any table). */
  def log(spark: SparkSession, l: Listener): DataFrame = {
    import spark.implicits._
    l.events.asScala.toSeq.toDF()
  }

  /** Drain the listener's buffered events into a persistent parquet log
    * (append) — NiFi's provenance REPOSITORY. Returns the number of
    * events flushed. The in-memory queue empties atomically via poll,
    * so concurrent new events are kept for the next flush, and a flush
    * of nothing writes nothing. Call periodically (or at action
    * boundaries); the log is an ordinary parquet table, so history
    * accumulates across sessions and restarts. */
  def flush(spark: SparkSession, l: Listener, dir: String): Int = {
    import spark.implicits._
    val drained = Iterator.continually(l.events.poll()).takeWhile(_ != null).toSeq
    if (drained.nonEmpty)
      drained.toDF().coalesce(1).write.mode("append").parquet(dir)
    drained.size
  }

  /** Query the persistent provenance log — NiFi's lineage-search
    * surface. Filters: events at/after `sinceMillis`, by exact `action`
    * name, by physical-plan `planDigest` ("which runs executed exactly
    * this plan?"). All filters push down to the parquet scan. */
  def query(spark: SparkSession, dir: String,
            sinceMillis: Long = 0L,
            action: Option[String] = None,
            planDigest: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    var df = spark.read.parquet(dir).filter(col("tsMillis") >= sinceMillis)
    action.foreach(a => df = df.filter(col("action") === a))
    planDigest.foreach(h => df = df.filter(col("planDigest") === h))
    df
  }

  // ------------------------------------------------------- streaming

  /** Per-micro-batch lineage for continuous flows (NiFi provenance is
    * continuous; QueryExecutionListener only sees batch actions). One
    * event per completed micro-batch: which query, which batch, how
    * many rows, from which sources into which sink. */
  case class StreamEvent(tsMillis: Long, queryId: String, runId: String,
                         queryName: String, batchId: Long, numInputRows: Long,
                         sources: Seq[String], sink: String)

  final class StreamListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
    private[Provenance] val events = new ConcurrentLinkedQueue[StreamEvent]()
    override def onQueryStarted(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      events.add(StreamEvent(System.currentTimeMillis(),
        p.id.toString, p.runId.toString, Option(p.name).getOrElse(""),
        p.batchId, p.numInputRows,
        p.sources.toSeq.map(_.description), p.sink.description))
    }
  }

  /** Attach a per-micro-batch provenance listener to the session's
    * stream manager. */
  def enableStreaming(spark: SparkSession): StreamListener = {
    val l = new StreamListener
    spark.streams.addListener(l)
    l
  }

  def disableStreaming(spark: SparkSession, l: StreamListener): Unit =
    spark.streams.removeListener(l)

  /** Drain buffered stream events into a persistent parquet log —
    * same contract as [[flush]]. */
  def flushStream(spark: SparkSession, l: StreamListener, dir: String): Int = {
    import spark.implicits._
    val drained = Iterator.continually(l.events.poll()).takeWhile(_ != null).toSeq
    if (drained.nonEmpty)
      drained.toDF().coalesce(1).write.mode("append").parquet(dir)
    drained.size
  }

  /** Query the streaming provenance log by time/query name. */
  def queryStream(spark: SparkSession, dir: String,
                  sinceMillis: Long = 0L,
                  queryName: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    var df = spark.read.parquet(dir).filter(col("tsMillis") >= sinceMillis)
    queryName.foreach(n => df = df.filter(col("queryName") === n))
    df
  }
}
