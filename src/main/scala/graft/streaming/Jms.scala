package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ConsumeJMS / PublishJMS adapter seam (r18 — the 48k′ honest-attempt
  * discipline, applied to the last standard-bundle messaging family
  * with no row).
  *
  * Boundary, stated exactly: this environment has NO JMS API jar and
  * no provider client anywhere offline (r18 sweep: zero
  * `javax.jms`/`jakarta.jms` classes in /opt/spark/jars, the coursier
  * cache, or the filesystem — tools/NOTES_r18_jms.md), and unlike
  * Kafka there is no Spark built-in JMS source either, so not even a
  * compile-only `consume()` against the real wire is possible (the
  * Kafka seam's `format("kafka")` line has no JMS analog). What IS
  * portable — and what this module pins — is the WIRE CONTRACT: the
  * message shape NiFi's ConsumeJMS emits (body + the `jms_*` header
  * attributes + the string-properties map, per the processor's
  * published attribute table) as a Spark schema, the ConsumeJMS →
  * attributes decode, the JMS message-selector filter, and the
  * PublishJMS shaping. A deployment swaps in a real feed by bridging
  * the broker to any source this engine already reads (most brokers
  * ship Kafka/MQTT/AMQP bridges — all three live here) or by a thin
  * receiver conforming to [[wireSchema]]; EVERYTHING downstream of the
  * wire schema is identical either way.
  */
object Jms {

  /** The JMS message shape as a Spark schema: body bytes + the header
    * fields NiFi's ConsumeJMS maps to FlowFile attributes + the
    * user-properties map (JMS string properties). */
  val wireSchema: StructType = StructType(Seq(
    StructField("body", BinaryType, nullable = true),
    StructField("destination", StringType, nullable = true),
    StructField("message_id", StringType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("correlation_id", StringType, nullable = true),
    StructField("jms_type", StringType, nullable = true),
    StructField("priority", IntegerType, nullable = true),
    StructField("properties", MapType(StringType, StringType), nullable = true)))

  /** Conform any (body, ts) stream — MemoryStream in tests, a broker
    * bridge in deployment — to the JMS wire schema. `propsCol` may be
    * empty (no user properties). The message id stand-in is
    * destination + event-time micros + a body/properties hash (r19,
    * ADVICE): micros alone collide for two messages sharing a
    * timestamp in one batch, so the per-row content discriminator
    * rides the id — deterministic across streaming replays (unlike a
    * monotonic id), with only byte-identical (body, ts, props)
    * triples — the same message re-published — sharing an id. */
  def toWire(df: DataFrame, destination: String, bodyCol: String,
             tsCol: String, propsCol: String = ""): DataFrame = {
    val props =
      if (propsCol.nonEmpty) col(propsCol).cast(MapType(StringType, StringType))
      else map().cast(MapType(StringType, StringType))
    df.select(
      col(bodyCol).cast("string").cast("binary").as("body"),
      lit(destination).as("destination"),
      concat(lit(s"ID:$destination-"),
        unix_micros(col(tsCol)).cast("string"), lit("-"),
        lower(hex(xxhash64(col(bodyCol).cast("string"),
          props.cast("string"))))).as("message_id"),
      col(tsCol).cast("timestamp").as("timestamp"),
      lit(null).cast("string").as("correlation_id"),
      lit(null).cast("string").as("jms_type"),
      lit(4).as("priority"), // JMS default priority
      props.as("properties")).to(wireSchema)
  }

  /** ConsumeJMS's FlowFile shape: body decoded to `value` (Character
    * Set UTF-8, the processor default) plus the published `jms_*`
    * attribute columns. */
  def decodeString(wire: DataFrame): DataFrame =
    wire.select(
      col("body").cast("string").as("value"),
      col("destination").as("jms_destination"),
      col("message_id").as("jms_messageid"),
      col("timestamp").as("jms_timestamp"),
      col("correlation_id").as("jms_correlationid"),
      col("jms_type").as("jms_type"),
      col("priority").as("jms_priority"),
      col("properties"))

  /** JMS message-selector subset → a Column over the wire/decoded
    * frame. JMS selectors are SQL-92 conditional expressions over
    * headers and string properties (`JMSPriority >= 5 AND kind =
    * 'alert'`); Spark's SQL expression grammar is a superset, so the
    * mapping is header-name rewriting + `expr`: `JMSPriority` →
    * priority, `JMSCorrelationID` → correlation_id, `JMSType` →
    * jms_type, `JMSTimestamp` → timestamp; any other identifier binds
    * to the string-properties map. Validated at flow-compile time. */
  def selector(sel: String): org.apache.spark.sql.Column = {
    require(sel != null && sel.trim.nonEmpty, "empty JMS selector")
    val headerMap = Map(
      "JMSPriority" -> "priority",
      "JMSCorrelationID" -> "correlation_id",
      "JMSType" -> "jms_type",
      "JMSTimestamp" -> "timestamp",
      "JMSMessageID" -> "message_id",
      "JMSDestination" -> "destination")
    // rewrite known headers, then bind remaining bare identifiers that
    // aren't wire columns or SQL keywords to properties['name']
    val wireCols = Set("priority", "correlation_id", "jms_type", "timestamp",
      "message_id", "destination", "body", "value", "properties",
      "jms_destination", "jms_messageid", "jms_timestamp", "jms_correlationid",
      "jms_priority")
    val keywords = Set("AND", "OR", "NOT", "IS", "NULL", "IN", "LIKE", "BETWEEN",
      "TRUE", "FALSE", "ESCAPE")
    val ident = "[A-Za-z_][A-Za-z0-9_]*".r
    var out = new StringBuilder
    var last = 0
    var inQuote = false
    // single-quote-aware identifier walk (a 'literal' must not rewrite)
    val s = sel
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') { inQuote = !inQuote; i += 1 }
      else if (!inQuote && (c.isLetter || c == '_')) {
        val m = ident.findPrefixOf(s.substring(i)).get
        out.append(s.substring(last, i))
        val repl =
          if (headerMap.contains(m)) headerMap(m)
          else if (keywords.contains(m.toUpperCase(java.util.Locale.ROOT))) m
          else if (wireCols.contains(m)) m
          else s"properties['$m']"
        out.append(repl)
        i += m.length
        last = i
      } else i += 1
    }
    out.append(s.substring(last))
    // Spark 4's expr() defers parsing to analysis — parse NOW so a
    // malformed selector rejects at flow-compile time, not first use
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(out.toString)
    expr(out.toString)
  }

  /** PublishJMS's wire shape: what a bridge sends — (destination,
    * body, properties). The real-broker swap happens OUTSIDE this
    * engine (see the object doc); flows bind this frame to a sink the
    * deployment owns. */
  def publishWire(df: DataFrame, destination: String,
                  bodyCol: String, propsCol: String = ""): DataFrame = {
    val props =
      if (propsCol.nonEmpty) col(propsCol).cast(MapType(StringType, StringType))
      else map().cast(MapType(StringType, StringType))
    df.select(
      lit(destination).as("destination"),
      col(bodyCol).cast("string").cast("binary").as("body"),
      props.as("properties"))
  }
}
