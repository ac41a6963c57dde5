package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** NiFi QueryRecord: SQL over record streams. NiFi embeds Calcite and
  * evaluates per-FlowFile; Spark-first this is just `spark.sql` over
  * registered views — the whole query is planned by Catalyst and runs
  * distributed, which is the only posture that works at 100 TB.
  */
object QueryRecord {
  /** Run SQL against named inputs. Views are temp (session-scoped). */
  def apply(spark: SparkSession, inputs: Map[String, DataFrame], sql: String): DataFrame = {
    inputs.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    spark.sql(sql)
  }

  /** Single-input convenience: the view is named `records` (NiFi names
    * the incoming FlowFile relation FLOWFILE; `records` reads better). */
  def apply(spark: SparkSession, input: DataFrame, sql: String): DataFrame =
    apply(spark, Map("records" -> input), sql)
}
