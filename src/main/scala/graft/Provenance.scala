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

  /** `tags` carries the run's observed-metric names → row counts: flow
    * outputs compiled by [[FlowCompiler.compileWithLineage]] observe
    * themselves as `graft_flow:<flow>:<port>`, so an action's event
    * names WHICH flow output it materialized (join to the lineage
    * manifest for the processors behind it). */
  case class Event(tsMillis: Long, action: String, durationNs: Long,
                   succeeded: Boolean, planDigest: String, planSummary: String,
                   tags: Map[String, Long] = Map.empty)

  final class Listener extends QueryExecutionListener {
    private[Provenance] val events = new ConcurrentLinkedQueue[Event]()
    // dirs this listener's own flushes write to: their save actions are
    // NOT provenance (the repository logging its own writes would both
    // race flush's drained-queue contract and grow the log per flush)
    private[Provenance] val selfDirs =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

    private def digest(qe: QueryExecution): (String, String) = {
      val plan = qe.executedPlan.toString
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(plan.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (hex, plan.linesIterator.take(12).mkString("\n"))
    }

    private def tagsOf(qe: QueryExecution): Map[String, Long] =
      try qe.observedMetrics.map { case (name, row) =>
        val rows = if (row.schema.fieldNames.contains("rows"))
          row.getAs[Long]("rows") else -1L
        name -> rows
      }.toMap
      catch { case _: Exception => Map.empty }

    /** True only for an actual WRITE whose destination resolves inside a
      * registered self dir. A plan-string substring test here would also
      * drop provenance for queries that merely READ the log, and for
      * writes to sibling paths sharing the dir as a prefix ("/tmp/prov"
      * vs "/tmp/prov2") — both are legitimate provenance. */
    private def isSelfWrite(qe: QueryExecution): Boolean =
      try {
        val written: Option[String] = qe.analyzed.collectFirst {
          case c: org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand =>
            c.outputPath.toString
        }
        written.exists { out =>
          val outN = out.stripSuffix("/")
          selfDirs.asScala.exists { d =>
            // registered dirs may be bare paths; outputPath is a Hadoop
            // URI (file:/…) — compare on the path component
            val dN = new org.apache.hadoop.fs.Path(d).toUri.getPath.stripSuffix("/")
            val oN = new org.apache.hadoop.fs.Path(outN).toUri.getPath.stripSuffix("/")
            oN == dN || oN.startsWith(dN + "/")
          }
        }
      } catch { case _: Exception => false }

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      if (isSelfWrite(qe)) return
      val (hex, summary) = digest(qe)
      events.add(Event(System.currentTimeMillis(), funcName, durationNs, succeeded = true,
        hex, summary, tagsOf(qe)))
    }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = {
      if (isSelfWrite(qe)) return
      val (hex, summary) = digest(qe)
      events.add(Event(System.currentTimeMillis(), funcName, durationNs = -1L, succeeded = false,
        hex, summary, tagsOf(qe)))
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
    l.selfDirs.add(dir) // the flush write itself is not provenance
    val drained = Iterator.continually(l.events.poll()).takeWhile(_ != null).toSeq
    if (drained.nonEmpty)
      drained.toDF().coalesce(1).write.mode("append").parquet(dir)
    drained.size
  }

  /** NiFi `SiteToSiteProvenanceReportingTask` analog (r16): ship the
    * buffered provenance queue to a REMOTE input port over
    * site-to-site — the reporting-task pillar next to the repository
    * ([[flush]]) and the search surface ([[query]]). One FlowFile per
    * event: attributes carry the searchable fields (action, ts,
    * planDigest, mime.type) the way NiFi's task exposes event fields,
    * content is the full JSON record; all events of a tick travel in
    * ONE transaction. `remote` is a base URL (`http://host:port`) or,
    * with `raw = true`, `host:port` for the socket transport. The
    * queue drains only on a CONFIRMED transaction — a failed send
    * re-queues every event for the next tick (at-least-once, the
    * ConsumePOP3 commit discipline). Returns events shipped. */
  def reportProvenance(l: Listener, remote: String, portName: String,
                       raw: Boolean = false): Int = {
    val drained = Iterator.continually(l.events.poll()).takeWhile(_ != null).toVector
    if (drained.isEmpty) return 0
    def js(s: String) = graft.streaming.Ws.jsonStr(s)
    val files = drained.map { e =>
      val tags = e.tags.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${js(k)}:$v" }.mkString("{", ",", "}")
      val json = s"""{"tsMillis":${e.tsMillis},"action":${js(e.action)},""" +
        s""""durationNs":${e.durationNs},"succeeded":${e.succeeded},""" +
        s""""planDigest":${js(e.planDigest)},"planSummary":${js(e.planSummary)},""" +
        s""""tags":$tags}"""
      (Map("provenance.action" -> e.action,
           "provenance.tsMillis" -> e.tsMillis.toString,
           "provenance.planDigest" -> e.planDigest,
           "mime.type" -> "application/json"),
       json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    try {
      if (raw) {
        val hp = remote.stripPrefix("raw://").split(":")
        require(hp.length == 2 && hp(1).forall(_.isDigit),
          s"reportProvenance: raw remote must be host:port, got '$remote'")
        graft.streaming.SiteToSiteRaw.sendRaw(hp(0), hp(1).toInt, portName, files)
      } else graft.streaming.SiteToSite.send(remote, portName, files)
      drained.size
    } catch {
      case t: Throwable =>
        drained.foreach(l.events.add) // keep for the next tick
        throw t
    }
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
    // mergeSchema: logs accumulate across versions, so files may lack
    // later-added columns (e.g. pre-r7 events without `tags`)
    var df = spark.read.option("mergeSchema", "true").parquet(dir)
      .filter(col("tsMillis") >= sinceMillis)
    action.foreach(a => df = df.filter(col("action") === a))
    planDigest.foreach(h => df = df.filter(col("planDigest") === h))
    df
  }

  // ----------------------------------------------- flow-level lineage

  /** One processor's membership in the upstream DAG of one flow output:
    * the answer row for "which processor produced this output?". The
    * `observation` is the metric name the compiled output observes
    * itself under — the join key into [[Event]].tags. */
  case class ProcessorLineage(flow: String, outputPort: String, observation: String,
                              processorId: String, processorName: String,
                              processorType: String)

  /** Persist a flow's lineage manifest beside its provenance log
    * (append — manifests accumulate per compiled flow version). */
  def writeFlowLineage(spark: SparkSession, dir: String,
                       lineage: Seq[ProcessorLineage]): Unit = {
    import spark.implicits._
    if (lineage.nonEmpty)
      lineage.toDF().coalesce(1).write.mode("append").parquet(dir)
  }

  // ------------------------------------------------------------ replay

  /** Content replay at the manifest grain (r18 — NiFi's provenance UI
    * replays a FlowFile from a recorded event; at 100 TB the per-record
    * form is the wrong grain, so the analog is: re-run a FLOW SEGMENT
    * from a recorded input manifest and hash-match its output).
    * [[recordRun]] snapshots every bound input to parquet, runs the
    * flow, records an order-independent distributed digest of the
    * output (count + sum of per-row crc32 — no collect, no sort
    * shuffle), and appends a run manifest carrying the EXACT flow JSON
    * and parameter context. [[replay]] rebinds the recorded snapshots,
    * recompiles the RECORDED flow text, and verifies the digest —
    * byte-drift in any processor between record and replay surfaces as
    * a hash mismatch. */
  case class RunManifest(runId: String, tsMillis: Long, flowName: String,
                         port: String, flowJson: String,
                         inputPorts: Seq[String], params: Map[String, String],
                         outRows: Long, outCrcSum: Long, outSchema: String)

  private def contentDigest(df: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val rowStr = concat_ws("", df.columns.map(c => col(c).cast("string")): _*)
    val r = df.select(count(lit(1)).as("n"),
      coalesce(sum(crc32(rowStr)), lit(0L)).as("s")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Run `port` of the flow over `inputs`, recording the run manifest +
    * input snapshots under `dir`. Returns (runId, output frame — the
    * SNAPSHOT read-back, so the caller observes exactly the recorded
    * bytes). */
  def recordRun(spark: SparkSession, dir: String, flowJson: String,
                inputs: Map[String, DataFrame], port: String,
                params: Map[String, String] = Map.empty): (String, DataFrame) = {
    import spark.implicits._
    val flow = FlowCompiler.parse(flowJson)
    val runId = f"run_${System.currentTimeMillis()}%d_${math.abs(flowJson.hashCode)}%08x"
    val base = s"$dir/runs/$runId"
    // snapshot the inputs FIRST — the replay contract is "the recorded
    // bytes", not "whatever the upstream tables hold later"
    val snapped = inputs.map { case (name, df) =>
      val p = s"$base/in_$name.parquet"
      df.write.mode("errorifexists").parquet(p)
      name -> spark.read.parquet(p)
    }
    val out = FlowCompiler.compile(spark, flow, snapped, params)(port)
    val outPath = s"$base/out.parquet"
    out.write.mode("errorifexists").parquet(outPath)
    val persisted = spark.read.parquet(outPath)
    val (n, crc) = contentDigest(persisted)
    val manifest = RunManifest(runId, System.currentTimeMillis(), flow.name, port,
      flowJson, inputs.keys.toSeq.sorted, params, n, crc,
      persisted.schema.catalogString)
    Seq(manifest).toDF().coalesce(1).write.mode("append").parquet(s"$dir/run_manifests")
    (runId, persisted)
  }

  /** Replay a recorded run: recompile the RECORDED flow JSON over the
    * RECORDED input snapshots and verify the output digest. Returns the
    * replayed frame + whether it hash-matches the original. */
  def replay(spark: SparkSession, dir: String, runId: String): (DataFrame, Boolean) = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val m = spark.read.parquet(s"$dir/run_manifests")
      .filter(col("runId") === runId).as[RunManifest].collect()
    require(m.nonEmpty, s"replay: no recorded run '$runId' under $dir")
    val r = m.head
    val snapped = r.inputPorts.map { name =>
      name -> spark.read.parquet(s"$dir/runs/$runId/in_$name.parquet")
    }.toMap
    val out = FlowCompiler.compile(spark, FlowCompiler.parse(r.flowJson),
      snapped, r.params)(r.port)
    val (n, crc) = contentDigest(out)
    (out, n == r.outRows && crc == r.outCrcSum &&
      out.schema.catalogString == r.outSchema)
  }

  /** "Which actions produced output THROUGH processor X?" — the NiFi
    * lineage-by-component search. Joins the provenance log's observed
    * flow tags to the lineage manifest on the observation name; returns
    * one row per (action event, matching flow output) with the rows
    * that output produced in that action. Both sides are parquet scans
    * with pushed filters; the manifest is dimension-sized (processors
    * x outputs), so the join broadcasts. */
  def queryByProcessor(spark: SparkSession, provenanceDir: String, lineageDir: String,
                       processorId: String, sinceMillis: Long = 0L): DataFrame = {
    import org.apache.spark.sql.functions.col
    // distinct: writeFlowLineage appends one manifest per compile, so a
    // flow compiled N times holds N identical rows — without the dedup
    // the join would multiply every event row N-fold
    val lin = spark.read.parquet(lineageDir)
      .filter(col("processorId") === processorId)
      .select("observation", "flow", "outputPort", "processorId",
        "processorName", "processorType")
      .distinct()
    joinEventsToManifest(spark, provenanceDir, lin, sinceMillis)
  }

  /** "Which actions produced output through a processor of event type
    * X?" — the other axis of NiFi's provenance FIND search (event type +
    * component + time; component is [[queryByProcessor]], time is the
    * `sinceMillis` on both). The manifest's processor types classify
    * into the documented NiFi event vocabulary via [[eventTypeOf]];
    * classification runs on the DISTINCT type list (dimension-sized —
    * a canvas has tens of processor types, never data-scale), then
    * filters the manifest scan. */
  def queryByEventType(spark: SparkSession, provenanceDir: String, lineageDir: String,
                       eventType: String, sinceMillis: Long = 0L): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val lin0 = spark.read.parquet(lineageDir)
      .select("observation", "flow", "outputPort", "processorId",
        "processorName", "processorType")
      .distinct()
    val types = lin0.select("processorType").distinct()
      .collect().map(_.getString(0))
    val matching = types.filter(t => eventTypeOf(t) == eventType).toSeq
    val lin = lin0.filter(col("processorType").isin(matching: _*))
      .withColumn("eventType", lit(eventType))
    joinEventsToManifest(spark, provenanceDir, lin, sinceMillis,
      extraCols = Seq("eventType"))
  }

  private def joinEventsToManifest(spark: SparkSession, provenanceDir: String,
                                   lin: DataFrame, sinceMillis: Long,
                                   extraCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode_outer, lit}
    // mergeSchema: a provenance dir can mix files written before the
    // tags column existed with tagged ones; a missing column after the
    // merged read (all-old dir) still resolves via the null fallback
    val raw = spark.read.option("mergeSchema", "true").parquet(provenanceDir)
    val tagged =
      if (raw.columns.contains("tags")) raw
      else raw.withColumn("tags", lit(null).cast("map<string,bigint>"))
    val ev = tagged
      .filter(col("tsMillis") >= sinceMillis)
      .select(col("tsMillis"), col("action"), col("durationNs"), col("succeeded"),
        explode_outer(col("tags")).as(Seq("observation", "outputRows")))
    // the manifest side is dimension-sized (processors × outputs) — the
    // join broadcasts
    ev.join(lin, Seq("observation"))
      .select((Seq("tsMillis", "action", "succeeded", "flow", "outputPort",
        "processorId", "processorName", "processorType", "outputRows") ++
        extraCols).map(col): _*)
  }

  /** Classify a processor type into NiFi's documented provenance event
    * vocabulary (the FIND search's event-type axis): RECEIVE for data
    * entering the flow (Get/List/Listen/Consume/Tail + the JDBC
    * sources), FETCH for content replaced from a referenced resource,
    * SEND for data leaving (Put/Publish + reporting), CREATE for
    * generators, ROUTE for relationship deciders, ATTRIBUTES_MODIFIED
    * for attribute-only writers, FORK for splitters, JOIN for mergers,
    * CLONE for duplicators, and CONTENT_MODIFIED otherwise (a processor
    * that neither moves data across the boundary nor only re-routes it
    * rewrites its content). Family rules over the simple type name —
    * the same best-effort grain NiFi's own processors declare. */
  def eventTypeOf(processorType: String): String = {
    val t = processorType.split('.').last
    if (t.startsWith("Generate")) "CREATE"
    else if (t.startsWith("Fetch")) "FETCH"
    else if (t.startsWith("Put") || t.startsWith("Publish")) "SEND"
    else if (t.startsWith("Get") || t.startsWith("List") || t.startsWith("Listen") ||
             t.startsWith("Consume") || t == "TailFile" || t == "HandleHttpRequest" ||
             t == "ExecuteSQL" || t == "QueryDatabaseTable") "RECEIVE"
    else if (t.startsWith("Route") || t == "DistributeLoad" || t == "ControlRate" ||
             t == "DetectDuplicate" || t == "EnforceOrder" || t == "SampleRecord" ||
             t == "FilterAttribute" || t == "ScanContent" || t == "ScanAttribute") "ROUTE"
    else if (t == "UpdateAttribute" || t == "LookupAttribute" ||
             t == "CryptographicHashAttribute" || t == "ExtractText" ||
             t == "EvaluateJsonPath" || t == "EvaluateXPath" || t == "ExtractGrok" ||
             t == "IdentifyMimeType" || t == "UpdateCounter" ||
             t == "CalculateRecordStats") "ATTRIBUTES_MODIFIED"
    else if (t.startsWith("Split") || t.startsWith("Segment") ||
             t.startsWith("Fork") || t == "UnpackContent" ||
             t == "ChunkDocument") "FORK"
    else if (t.startsWith("Merge") || t.startsWith("Join") ||
             t == "PackageFlowFile") "JOIN"
    else if (t.startsWith("Duplicate") || t.startsWith("Clone")) "CLONE"
    else "CONTENT_MODIFIED"
  }

  // --------------------------------------------- lineage graph walk

  /** One node on a walked lineage path. `kind` distinguishes the canvas
    * vocabulary (processor / inputPort / outputPort / funnel); `depth`
    * is hops from the walk origin (0 = the origin itself). */
  case class LineageNode(id: String, name: String, kind: String,
                         processorType: String, depth: Int)

  /** Walk a compiled flow's lineage graph from `fromId` — NiFi's
    * child/parent provenance walk (the expand-lineage UI shape), over
    * the flow MANIFEST rather than per-record events: at 100 TB the
    * graph a FlowFile's events trace is exactly the flow's upstream
    * DAG, which the definition already states. `upstream = true` walks
    * parents (sink → the source files that feed it); false walks
    * children (source → every sink it reaches). BFS, each node
    * reported once at its shortest depth; cycles are impossible
    * (compile rejects them) but visited-set-guarded anyway. Driver-side
    * on the canvas graph — dimension-sized by construction. */
  def lineageWalk(flow: FlowCompiler.Flow, fromId: String,
                  upstream: Boolean = true): Seq[LineageNode] = {
    val byDst = flow.connections.groupBy(_.dst)
    val bySrc = flow.connections.groupBy(_.src)
    def neighbors(id: String): Seq[String] =
      if (upstream) byDst.getOrElse(id, Nil).map(_.src)
      else bySrc.getOrElse(id, Nil).map(_.dst)
    val procById = flow.processors.map(p => p.id -> p).toMap
    val inPorts = flow.inputPorts.toMap
    val outPorts = flow.outputPorts.toMap
    val funnels = flow.funnels.toSet
    def nodeOf(id: String, depth: Int): LineageNode =
      procById.get(id) match {
        case Some(p) => LineageNode(id, p.name, "processor", p.tpe.split('.').last, depth)
        case None if inPorts.contains(id) => LineageNode(id, inPorts(id), "inputPort", "", depth)
        case None if outPorts.contains(id) => LineageNode(id, outPorts(id), "outputPort", "", depth)
        case None if funnels.contains(id) => LineageNode(id, id, "funnel", "", depth)
        case None => LineageNode(id, id, "unknown", "", depth)
      }
    val seen = scala.collection.mutable.LinkedHashMap[String, Int](fromId -> 0)
    var frontier = Seq(fromId)
    var depth = 0
    while (frontier.nonEmpty) {
      depth += 1
      frontier = frontier.flatMap(neighbors).distinct.filterNot(seen.contains)
      frontier.foreach(id => seen(id) = depth)
    }
    seen.toSeq.map { case (id, d) => nodeOf(id, d) }
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
    // mergeSchema: logs accumulate across versions, so files may lack
    // later-added columns (e.g. pre-r7 events without `tags`)
    var df = spark.read.option("mergeSchema", "true").parquet(dir)
      .filter(col("tsMillis") >= sinceMillis)
    queryName.foreach(n => df = df.filter(col("queryName") === n))
    df
  }
}
