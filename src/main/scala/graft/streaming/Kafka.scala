package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ConsumeKafka / PublishKafka adapter seam.
  *
  * This Spark distribution does not bundle the spark-sql-kafka
  * connector, so a live broker connection is impossible here; what IS
  * portable is the WIRE CONTRACT — Spark's kafka source always produces
  * the same seven columns, and every downstream operator binds to that
  * schema, not to the source. Flows are written against [[wireSchema]];
  * swapping the test/dev stand-in for the real source is the one-line
  * change from [[toWire]] to [[consume]].
  */
object Kafka {

  /** The exact schema Spark's `format("kafka")` source emits. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("timestampType", IntegerType, nullable = true)))

  /** ConsumeKafka on a cluster with spark-sql-kafka on the classpath.
    * Calling it in THIS sandbox fails at stream start with
    * DATA_SOURCE_NOT_FOUND — by design, the seam compiles and the swap
    * is config-only. `startingOffsets`: "latest" (default) or
    * "earliest"; maxOffsetsPerTrigger is the ControlRate knob. */
  def consume(spark: SparkSession, bootstrapServers: String, topics: String,
              startingOffsets: String = "latest",
              maxOffsetsPerTrigger: Long = 100000L,
              groupId: String = ""): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
    // Spark tracks offsets in its own checkpoint; the group id is for
    // broker-side quota/monitoring attribution (NiFi's Group ID slot)
    (if (groupId.nonEmpty) r.option("kafka.group.id", groupId) else r).load()
  }

  /** Conform any (key, value, ts) stream — MemoryStream in tests, file
    * or socket sources in dev — to the kafka wire schema (exactly,
    * including nullability), so the rest of the flow is identical under
    * either source. The offset stand-in is event-time micros — monotone
    * per producer, which is the per-partition guarantee Kafka gives;
    * real offsets arrive only from the real source.
    * (`.to(wireSchema)` reconciles nullability to the contract;
    * monotonically_increasing_id would be the natural offset but is
    * unsupported on streaming Datasets.) */
  def toWire(df: DataFrame, topic: String, keyCol: String, valueCol: String,
             tsCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").cast("binary").as("key"),
      col(valueCol).cast("string").cast("binary").as("value"),
      lit(topic).as("topic"),
      spark_partition_id().as("partition"),
      unix_micros(col(tsCol).cast("timestamp")).as("offset"),
      col(tsCol).cast("timestamp").as("timestamp"),
      lit(0).as("timestampType"))
    .to(wireSchema)

  /** The standard first step after either source: decode key/value
    * bytes as UTF-8 strings, keep the metadata columns. */
  def decodeString(wire: DataFrame): DataFrame =
    wire.select(
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"),
      col("topic"), col("partition"), col("offset"), col("timestamp"))

  /** The projection [[publish]] sends: (key, value, topic). A compiled
    * PublishKafka node returns exactly this frame, so the real-broker
    * swap is only the sink call — the flow plan is already
    * publish-shaped. Missing key column publishes null keys (round-
    * robin partitioning), mirroring kafka's producer default. */
  def publishWire(df: DataFrame, topic: String, keyCol: String, valueCol: String): DataFrame = {
    val key =
      if (df.columns.contains(keyCol)) col(keyCol).cast("string")
      else lit(null).cast("string")
    df.select(key.as("key"), col(valueCol).cast("string").as("value"),
      lit(topic).as("topic"))
  }

  /** PublishKafka seam (needs spark-sql-kafka at runtime): key/value
    * string columns → kafka sink. The stand-in for tests is any other
    * sink over the same two columns. */
  def publish(df: DataFrame, bootstrapServers: String, topic: String,
              checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.select(col("key").cast("string"), col("value").cast("string"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()
}
