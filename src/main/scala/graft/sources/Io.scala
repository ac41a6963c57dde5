package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch sources/sinks — the NiFi Get/List/Fetch/Put file processors and
  * ConvertRecord (controller-service readers/writers), Spark-first.
  *
  * NiFi moves one FlowFile per file; here every reader is a distributed
  * columnar scan (splittable formats parallelize per block) and every
  * writer is a distributed job. Schema is explicit where the format is
  * textual (CSV/JSON) so 100 TB reads never pay schema inference.
  *
  * OBJECT STORES (NiFi GetS3Object/PutS3Object etc.): every path here
  * resolves through the Hadoop FileSystem API, so cloud storage is a
  * PATH SCHEME, not an operator — `s3a://bucket/...`, `gs://...`,
  * `abfs://...` work unchanged on clusters whose distribution carries
  * the matching connector jars (hadoop-aws etc.; not bundled in this
  * sandbox, which has no egress anyway). No code change needed at the
  * operator layer.
  */
object Io {

  /** CSV record reader. Pass a schema — inference scans the data twice
    * and is banned at scale. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header).option("delimiter", delimiter)
      .csv(path)

  /** CSV record writer (optionally compressed: gzip/bzip2/none). */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
               compression: String = "none"): Unit =
    df.write.mode("overwrite")
      .option("header", header).option("compression", compression)
      .csv(path)

  /** JSON-lines reader with explicit schema. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSON-lines writer (optionally compressed). */
  def writeJsonl(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** XML record reader/writer (NiFi XMLReader/XMLRecordSetWriter).
    * For NiFi's Avro wire format see [[AvroIo]] (container files over
    * the bundled avro-core; the spark-avro datasource module isn't in
    * this distribution). */
  def readXml(spark: SparkSession, path: String, rowTag: String,
              schema: StructType): DataFrame =
    spark.read.format("xml").schema(schema).option("rowTag", rowTag).load(path)

  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.mode("overwrite").format("xml")
      .option("rowTag", rowTag).option("rootTag", "records").save(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Parquet writer; zstd by default (best scan/size tradeoff at scale). */
  def writeParquet(df: DataFrame, path: String, compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression).parquet(path)

  /** PartitionRecord + PutFile: hive-partitioned parquet layout. The
    * partition columns become directories, so downstream reads prune
    * partitions from the path alone. */
  def writeParquetPartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                              compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression)
      .partitionBy(partitionCols: _*).parquet(path)

  /** ConvertRecord: read `inFormat`, write `outFormat`
    * (csv|json|parquet|avro). One distributed pass, no driver
    * materialization. Avro goes through [[AvroIo]] (container files via
    * the bundled avro-core; the spark-avro datasource module isn't in
    * this distribution). */
  def convert(spark: SparkSession, inPath: String, inFormat: String, schema: StructType,
              outPath: String, outFormat: String): Unit = {
    val df = inFormat match {
      case "csv"     => readCsv(spark, inPath, schema)
      case "json"    => readJsonl(spark, inPath, schema)
      case "parquet" => readParquet(spark, inPath)
      case "avro"    => AvroIo.readAvro(spark, inPath, schema)
      case f         => throw new IllegalArgumentException(s"unknown input format $f")
    }
    outFormat match {
      case "csv"     => writeCsv(df, outPath)
      case "json"    => writeJsonl(df, outPath)
      case "parquet" => writeParquet(df, outPath)
      case "avro"    => AvroIo.writeAvro(df, outPath)
      case f         => throw new IllegalArgumentException(s"unknown output format $f")
    }
  }

  /** ExecuteSQL: read a database table/query over JDBC. Partition with
    * (partitionColumn, lowerBound, upperBound, numPartitions) options at
    * scale so the read parallelizes instead of funneling through one
    * connection. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).load()

  /** GenerateTableFetch analog: PARTITIONED JDBC read — the fetch is
    * split into `numPartitions` range slices of `partitionColumn`
    * (NiFi generates one paged query per flowfile; here every slice is
    * an executor-side query, so a 10⁹-row table fans out across the
    * cluster instead of serializing through one connection — the only
    * JDBC ingest shape that survives at scale). Bounds are inclusive,
    * as in Spark's JDBC partitioning contract. */
  def readJdbcPartitioned(spark: SparkSession, url: String, table: String,
                          partitionColumn: String, lowerBound: Long,
                          upperBound: Long, numPartitions: Int,
                          options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .options(options).load()

  /** PutDatabaseRecord: write a DataFrame to a database table over JDBC
    * (each partition writes through its own connection). */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: String = "overwrite",
                options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).mode(mode).save()

  /** ListFile: enumerate files (path, size, mtime) WITHOUT reading
    * content — the binaryFile source prunes the content column when it
    * isn't selected, so this is a metadata-only listing. */
  def listFiles(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(col("path"), col("length").as("size"),
              col("modificationTime").as("mtime"))

  /** FetchFile: (path, content-bytes) rows — for feeding the multimodal
    * pipeline with raw payloads. */
  def fetchFiles(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(col("path"), col("content"))
}
