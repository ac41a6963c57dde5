package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Capability reference: the NiFi deployment at
  * /root/reference/dev.nifi.yaml ships record-oriented readers per
  * FlowFile; here the same tables are columnar parquet scans so Catalyst
  * gets predicate pushdown + column pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped under two physical parquet encodings across
    * testdata generations: TIMESTAMP(NANOS) (which Spark surfaces as a
    * nanos BIGINT under `nanosAsLong`) and TIMESTAMP_MICROS with
    * isAdjustedToUTC=0 (TIMESTAMP_NTZ). Branch on the schema actually
    * loaded rather than pinning one encoding:
    *   - LongType → nanos: integer `div 1000` then `timestamp_micros`
    *     (a double roundtrip would lose precision at 2024-epoch nanos
    *     ≈ 1.7e18 > 2^53);
    *   - TimestampNTZType → cast to TimestampType. Values are identical
    *     to the nanos path ONLY under session timeZone=UTC (every entry
    *     point pins it; TablesSpec asserts cross-encoding equality).
    *   - TimestampType → already what downstream expects; pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros, col}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (QueryRecord-style SQL access).
    * `events` routes through the schema-adaptive loader above so the SQL
    * view and the DataFrame path agree on `ts`'s type and values. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
