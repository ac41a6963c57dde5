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

  // ------- crash-safe single-file state (shared by the stateful sources)

  /** Read small state written by [[writeStateAtomic]]: prefers the live
    * file, falls back to the `.old` aside a crash can leave behind
    * ([[AtomicSwap.resolve]]). None when neither exists (fresh state). */
  private[graft] def readStateString(fs: org.apache.hadoop.fs.FileSystem,
                                     stateP: org.apache.hadoop.fs.Path): Option[String] =
    AtomicSwap.resolve(fs, stateP, fs.exists).map { path =>
      val in = fs.open(path)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }

  /** Crash-safe overwrite of a small state file via [[AtomicSwap]]
    * (write `.tmp` → rename live aside → rename in → delete aside): at
    * every instant either the live file or the aside holds a valid
    * state. Crash recovery direction is at-least-once: a crash mid-swap
    * replays the last slice rather than losing it. */
  private[graft] def writeStateAtomic(fs: org.apache.hadoop.fs.FileSystem,
                                      stateP: org.apache.hadoop.fs.Path,
                                      content: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(stateP.toString + ".tmp")
    AtomicSwap.recover(fs, stateP, fs.exists, recursive = false)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    AtomicSwap.swapIn(fs, tmp, stateP, recursive = false)
  }

  /** GenerateFlowFile: deterministic synthetic records for flow tests
    * and load generation — `n` rows of (id, content, bucket) where
    * content is a digest of the id, so every engine regenerates the
    * exact same data (NiFi GenerateFlowFile with Unique FlowFiles).
    * Distributed from birth: `spark.range` splits the id space evenly
    * across `parts` partitions with no driver materialization. */
  def generate(spark: SparkSession, n: Long, buckets: Int = 10,
               parts: Int = 0): DataFrame = {
    val base = if (parts > 0) spark.range(0L, n, 1L, parts) else spark.range(n)
    base.select(col("id"),
      md5(col("id").cast("string")).as("content"),
      pmod(col("id"), lit(buckets.toLong)).as("bucket"))
  }

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

  /** ORC reader/writer (ConvertRecord's columnar leg besides parquet —
    * spark's builtin ORC datasource, same pushdown/pruning surface). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

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

  /** Parquet with COLUMN BLOOM FILTERS (r13): the third scan-pruning
    * layer after partition dirs and min/max row-group stats — point
    * lookups on high-cardinality keys (doc ids, user ids, hashes) skip
    * row groups whose bloom filter excludes the value, which min/max
    * can't do for uniformly-spread keys. At 100 TB this turns a
    * needle-in-haystack id probe from a full-column scan into a few
    * row groups. Pure parquet-hadoop write options — every reader
    * (Spark, DuckDB, Trino) benefits with no code change; `ndv` sizes
    * the filter (fpp fixed by parquet's default 0.01). The spec
    * asserts the footer really carries bloom offsets for exactly the
    * requested columns and that the data round-trips. */
  /** Crash-safe directory replacement for persisted-index maintenance
    * (compaction, bulk delete): the LIVE directory is renamed ASIDE
    * before the replacement renames in, so there is no window where
    * the data exists only in a tmp dir — if the second rename fails,
    * the original is restored and the exception propagates with the
    * layout intact. `newDir` may be absent (the replacement is empty):
    * the live dir is then simply removed. The aside dir is deleted
    * only after the swap fully succeeds. */
  def swapDir(fs: org.apache.hadoop.fs.FileSystem,
              live: org.apache.hadoop.fs.Path,
              replacement: org.apache.hadoop.fs.Path): Unit = {
    // dot-prefixed: a crash-orphaned aside dir must be INVISIBLE to
    // Spark's partition discovery (a stray `cell=5.swap-aside` sibling
    // would break the partition-value parse of the whole layout)
    val aside = new org.apache.hadoop.fs.Path(live.getParent,
      "." + live.getName + ".swap-aside")
    fs.delete(aside, true) // stale aside from an earlier crash
    val hadLive = fs.exists(live)
    if (hadLive)
      require(fs.rename(live, aside), s"swapDir: could not set aside $live")
    if (fs.exists(replacement)) {
      if (!fs.rename(replacement, live)) {
        if (hadLive) fs.rename(aside, live) // restore, then fail loudly
        throw new java.io.IOException(s"swapDir: rename $replacement -> $live failed")
      }
    }
    if (hadLive) fs.delete(aside, true)
  }

  def writeParquetBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                        ndv: Long = 1000000L, compression: String = "zstd",
                        partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").option("compression", compression)
    val configured = bloomCols.foldLeft(w) { (acc, c) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    val laid = if (partitionCols.isEmpty) configured
               else configured.partitionBy(partitionCols: _*)
    laid.parquet(path)
  }

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

  /** ListDatabaseTables (NiFi): enumerate tables visible through a JDBC
    * connection as a DataFrame of (catalog, schema, table, type) — the
    * discovery half of a generate-fetch ingest (pair with
    * [[readJdbcPartitioned]] per listed table). Driver-side metadata
    * call: the listing is small by construction. */
  def listJdbcTables(spark: SparkSession, url: String,
                     types: Seq[String] = Seq("TABLE")): DataFrame = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", types.toArray)
      val rows = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String)]
      while (rs.next())
        rows += ((Option(rs.getString("TABLE_CAT")).getOrElse(""),
                  Option(rs.getString("TABLE_SCHEM")).getOrElse(""),
                  rs.getString("TABLE_NAME"), rs.getString("TABLE_TYPE")))
      import spark.implicits._
      rows.toSeq.toDF("catalog", "schema", "table", "type")
    } finally conn.close()
  }

  /** QueryDatabaseTable (NiFi): STATEFUL incremental JDBC fetch — each
    * call reads only rows whose `maxValueColumn` exceeds the recorded
    * state, then advances the state atomically (the same tmp+rename
    * file contract as [[listIncremental]], any Hadoop FS scheme). The
    * incremental slice itself is an executor-side pushdown query
    * (`WHERE col > last`), so only new rows cross the wire. Numeric or
    * monotonically-increasing columns only (NiFi's contract too —
    * timestamps ride as epoch numbers). Returns the new rows,
    * materialized to a parquet spool at `statePath + ".spool"` before
    * the state advances (exactly-once under a live writer); the
    * returned frame stays valid until the NEXT call with the same
    * statePath overwrites the spool.
    *
    * Crash-direction contract: state advances as soon as the slice is
    * spooled, BEFORE the caller consumes the returned frame. A crash
    * between the state write and downstream consumption therefore does
    * NOT re-fetch that slice on the next call (at-most-once across a
    * driver crash) — but the slice is not lost: it is still on disk at
    * `statePath + ".spool"` until the next call overwrites it, so a
    * recovering caller reads `spark.read.parquet(statePath + ".spool")`
    * to replay the pending slice before triggering the next increment.
    * This is the same direction NiFi's QueryDatabaseTable takes (state
    * in the local/cluster state map advances at session commit, before
    * downstream processors run). The atomic tmp+rename in
    * [[writeStateAtomic]] guards a different failure: a crash DURING
    * the state write itself can never leave a torn value — the state is
    * either the old max (slice re-fetched, at-least-once) or the new
    * max (spool replay, as above), never garbage. */
  def readJdbcIncremental(spark: SparkSession, url: String, table: String,
                          maxValueColumn: String, statePath: String,
                          options: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val stateP = new Path(statePath)
    val stateFs = stateP.getFileSystem(conf)
    val last: Option[String] = readStateString(stateFs, stateP).map(_.trim).filter(_.nonEmpty)
    val slice = last match {
      case Some(v) =>
        // the state value is interpolated into SQL — enforce the
        // numeric-column contract so a corrupted state file fails fast
        // instead of injecting
        require(v.matches("-?[0-9]+(\\.[0-9]+)?([Ee][+-]?[0-9]+)?"),
          s"non-numeric incremental state '$v' — maxValueColumn must be numeric")
        s"""(SELECT * FROM $table WHERE "$maxValueColumn" > $v) graft_inc"""
      case None => table
    }
    // materialize the slice ONCE — spool it to parquet BEFORE reading
    // its max and advancing state: the returned frame reads the spool,
    // so no downstream action can re-run the JDBC query after state has
    // moved (rows committed to the source between the state advance and
    // the caller's action(s) would otherwise be returned now AND
    // fetched again next run). Parquet spool rather than an eager
    // localCheckpoint: the bootstrap run (no state yet) fetches the
    // WHOLE table, which must land on distributed disk, not pinned
    // executor-memory blocks — and a spool leaves nothing to unpersist
    // across scheduled runs. The spool is overwritten per call: the
    // returned frame is valid until the NEXT call with this statePath
    // (NiFi's per-trigger result lifetime).
    val spool = statePath + ".spool"
    readJdbc(spark, url, slice, options)
      .write.mode("overwrite").parquet(spool)
    val fresh = spark.read.parquet(spool)
    // driver-side max over the spooled slice advances the state; empty
    // slice leaves state untouched (no rows → no progress to record)
    val newMax = fresh.agg(org.apache.spark.sql.functions.max(col(maxValueColumn)))
      .collect()(0)
    if (!newMax.isNullAt(0))
      writeStateAtomic(stateFs, stateP, newMax.get(0).toString)
    fresh
  }

  // Watermark → SQL literal (r19, ADVICE): numeric values interpolate
  // raw; DATE/TIMESTAMP toString shapes (JDBC's java.sql.Date /
  // Timestamp, also what the state file reads back) become typed
  // quoted literals, so temporal Maximum-value Columns page correctly
  // instead of being hard-rejected. The literal form is the JDBC
  // escape ({ts '…'} / {d '…'}): the generated fetch SQL is BY
  // CONSTRUCTION executed through JDBC, whose driver-side escape
  // processing normalizes the literal per database (Derby rejects the
  // ANSI `TIMESTAMP '…'` keyword form outright — NiFi solves the same
  // variance with per-database adapters). The accepted grammar
  // doubles as the injection gate — values that fit none of the three
  // shapes throw BEFORE any SQL is built or state written.
  private def watermarkLiteral(v: String): String = {
    val num = "-?[0-9]+(\\.[0-9]+)?([Ee][+-]?[0-9]+)?"
    val date = "[0-9]{4}-[0-9]{2}-[0-9]{2}"
    val ts = s"$date[ T][0-9]{2}:[0-9]{2}:[0-9]{2}(\\.[0-9]{1,9})?"
    if (v.matches(num)) v
    else if (v.matches(ts)) s"{ts '${v.replace('T', ' ')}'}"
    else if (v.matches(date)) s"{d '$v'}"
    else throw new IllegalArgumentException(
      s"GenerateTableFetch: unsupported watermark value '$v' — " +
        "the Maximum-value Column must be numeric, DATE, or TIMESTAMP")
  }

  /** GenerateTableFetch (NiFi, r17): the fan-out half of the JDBC
    * ingest pair — instead of FETCHING rows, generate the page
    * QUERIES that a fleet of downstream executors (NiFi: ExecuteSQL
    * workers; here: any consumer of the `fetch_sql` column) runs in
    * parallel. One metadata query per trigger (COUNT + MAX past the
    * recorded watermark); the page list itself is built DISTRIBUTED
    * (`spark.range(nPages)` + string concat — no driver loop, a
    * billion-row table's page list is still just count/size rows).
    * Pages are bounded ABOVE by the captured max (`col <= max`), so
    * rows committed after generation belong to the NEXT trigger —
    * NiFi's exact stability contract — and state advances to that max
    * when `statePath` is set (empty = stateless full-table paging).
    * Generated SQL uses ANSI `ORDER BY … OFFSET n ROWS FETCH NEXT k
    * ROWS ONLY` (Derby/PostgreSQL/SQL Server shape; NiFi picks per
    * database adapter the same way). Watermark columns may be numeric,
    * DATE, or TIMESTAMP (r19): temporal maxes interpolate as typed
    * JDBC-escape literals (`{d '…'}` / `{ts '…'}` — portable across
    * drivers since the fetch SQL runs through JDBC), matching the
    * reference processor's support for temporal Maximum-value
    * Columns; any other value type throws before SQL is built or
    * state is written. */
  def generateTableFetch(spark: SparkSession, url: String, table: String,
                         maxValueColumn: String, partitionSize: Long,
                         statePath: String = "",
                         columns: String = "*",
                         options: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.hadoop.fs.Path
    require(partitionSize > 0, s"GenerateTableFetch: Partition Size must be > 0")
    require(maxValueColumn.nonEmpty,
      "GenerateTableFetch needs a Maximum-value Column (page order + watermark)")
    // Identifier validation (r18): table/column names arrive from flow
    // definitions — untrusted config — and are interpolated into SQL
    // that a downstream fetch fleet RUNS. A plain or schema-qualified
    // identifier (parts optionally "double-quoted", no embedded quote)
    // is the full accepted grammar; anything else throws here, which is
    // flow-COMPILE time on the FlowCompiler path.
    val idPart = "(?:[A-Za-z_][A-Za-z0-9_$]*|\"[^\"]+\")"
    require(table.matches(s"$idPart(?:\\.$idPart)?"),
      s"GenerateTableFetch: unsafe table reference '$table'")
    require(maxValueColumn.matches("[A-Za-z_][A-Za-z0-9_$]*"),
      s"GenerateTableFetch: unsafe Maximum-value Column '$maxValueColumn'")
    require(columns == "*" ||
        columns.split(',').forall(_.trim.matches(idPart)),
      s"GenerateTableFetch: unsafe Columns list '$columns'")
    val conf = spark.sparkContext.hadoopConfiguration
    val last: Option[String] =
      if (statePath.isEmpty) None
      else {
        val stateP = new Path(statePath)
        readStateString(stateP.getFileSystem(conf), stateP).map(_.trim).filter(_.nonEmpty)
      }
    val lastLit = last.map(watermarkLiteral)
    val where = lastLit.map(v => s""" WHERE "$maxValueColumn" > $v""").getOrElse("")
    val meta = readJdbc(spark, url,
      s"""(SELECT COUNT(*) AS n, MAX("$maxValueColumn") AS mx FROM $table$where) graft_gtf""",
      options).collect()(0)
    // COUNT(*)'s JDBC type varies by database (Derby INTEGER, others
    // BIGINT) — go through Number
    val n = meta.get(0).asInstanceOf[Number].longValue()
    import spark.implicits._
    if (n == 0L)
      return Seq.empty[(Long, String)].toDF("page_index", "fetch_sql")
    // Validate the watermark NOW, before it is interpolated into page
    // SQL or persisted to state: MAX() can be NULL with rows present
    // (all-null watermark column), and a date/varchar max would be
    // interpolated unquoted on the FIRST trigger (the state read-back
    // guard above only fires on the NEXT one).
    require(!meta.isNullAt(1),
      s"""GenerateTableFetch: MAX("$maxValueColumn") is NULL with $n rows — """ +
        "the Maximum-value Column must be non-null to page on")
    val mx = meta.get(1).toString
    val mxLit = watermarkLiteral(mx)
    val bound = (lastLit.map(v => s""""$maxValueColumn" > $v AND """).getOrElse("") +
      s""""$maxValueColumn" <= $mxLit""")
    val nPages = (n + partitionSize - 1) / partitionSize
    val pages = spark.range(nPages).select(
      col("id").as("page_index"),
      concat(
        lit(s"""SELECT $columns FROM $table WHERE $bound ORDER BY "$maxValueColumn" OFFSET """),
        (col("id") * partitionSize).cast("string"),
        lit(s" ROWS FETCH NEXT $partitionSize ROWS ONLY")).as("fetch_sql"))
    if (statePath.nonEmpty) {
      val stateP = new Path(statePath)
      writeStateAtomic(stateP.getFileSystem(conf), stateP, mx)
    }
    pages
  }

  /** TailFile (NiFi): byte-offset tailing of ONE growing file for
    * scheduled batch runs — returns the COMPLETE lines appended since
    * the recorded offset and advances the state (offset + a partial
    * trailing line is left for the next run; truncation/rotation
    * resets to the start). Driver-side read of the new byte range
    * only; the tail of a single file is small by construction (the
    * distributed analog for many/rotated files is
    * [[listIncremental]] / `Streams.fileStream`). */
  def tailFile(spark: SparkSession, file: String, statePath: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val stateP = new Path(statePath)
    val stateFs = stateP.getFileSystem(conf)
    val lastOffset: Long =
      readStateString(stateFs, stateP).map(_.trim).filter(_.nonEmpty)
        .map(_.toLong).getOrElse(0L)
    val len = if (fs.exists(p)) fs.getFileStatus(p).getLen else 0L
    val start = if (len < lastOffset) 0L else lastOffset // truncated/rotated → restart
    import spark.implicits._
    if (len <= start) return Seq.empty[String].toDF("line")
    val in = fs.open(p)
    val bytes = try {
      in.seek(start)
      val buf = new Array[Byte]((len - start).toInt)
      in.readFully(start, buf)
      buf
    } finally in.close()
    // only COMPLETE lines are emitted; the trailing partial stays for
    // the next run (NiFi's tail semantics)
    val lastNl = bytes.lastIndexOf('\n'.toByte)
    val (complete, consumed) =
      if (lastNl < 0) (Array.emptyByteArray, 0L) else (bytes.take(lastNl + 1), lastNl + 1L)
    writeStateAtomic(stateFs, stateP, (start + consumed).toString)
    new String(complete, "UTF-8").linesIterator.toSeq.toDF("line")
  }

  /** PutDatabaseRecord: write a DataFrame to a database table over JDBC
    * (each partition writes through its own connection). */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: String = "overwrite",
                options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).mode(mode).save()

  /** UpdateDatabaseTable (NiFi): evolve a JDBC table's DDL to accept a
    * DataFrame schema — CREATE TABLE when absent, ALTER TABLE ADD
    * COLUMN per missing column; never drops or retypes (NiFi's
    * contract: additive evolution only). Driver-side metadata + DDL —
    * pair with [[writeJdbc]] `mode="append"` for the data. Returns the
    * column names it added. */
  def updateDatabaseTable(url: String, table: String,
                          schema: StructType): Seq[String] = {
    def ident(s: String): String = {
      require(s.matches("[A-Za-z_][A-Za-z0-9_]*"), s"unsafe SQL identifier '$s'")
      s
    }
    def sqlType(dt: org.apache.spark.sql.types.DataType): String = {
      import org.apache.spark.sql.types._
      dt match {
        case LongType      => "BIGINT"
        case IntegerType   => "INTEGER"
        case ShortType     => "SMALLINT"
        case DoubleType    => "DOUBLE"
        case FloatType     => "REAL"
        case BooleanType   => "BOOLEAN"
        case TimestampType => "TIMESTAMP"
        case DateType      => "DATE"
        case StringType    => "VARCHAR(4000)"
        case BinaryType    => "BLOB"
        case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
        case other => throw new IllegalArgumentException(
          s"no JDBC DDL mapping for ${other.catalogString}")
      }
    }
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // Ask the driver how IT case-folds unquoted identifiers instead of
      // assuming uppercase (Derby/H2/Oracle fold up, PostgreSQL/MySQL
      // fold down — an uppercase probe there finds nothing and we'd
      // wrongly CREATE an existing table). getColumns' table argument is
      // a SEARCH PATTERN: escape '_'/'%' so 'graft_evolve' can't match
      // an unrelated 'graftXevolve' and silently skip needed ADDs.
      val md = conn.getMetaData
      val normalized =
        if (md.storesUpperCaseIdentifiers) table.toUpperCase
        else if (md.storesLowerCaseIdentifiers) table.toLowerCase
        else table
      val esc = Option(md.getSearchStringEscape).getOrElse("\\")
      val pattern = normalized
        .replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
      val existing = scala.collection.mutable.Set.empty[String]
      val rs = md.getColumns(null, null, pattern, "%")
      try while (rs.next()) existing += rs.getString("COLUMN_NAME").toLowerCase
      finally rs.close()
      val st = conn.createStatement()
      try {
        if (existing.isEmpty) {
          val cols = schema.fields
            .map(f => s"${ident(f.name)} ${sqlType(f.dataType)}").mkString(", ")
          st.executeUpdate(s"CREATE TABLE ${ident(table)} ($cols)")
          schema.fieldNames.toSeq
        } else {
          val missing = schema.fields.filterNot(f => existing.contains(f.name.toLowerCase))
          missing.foreach { f =>
            st.executeUpdate(
              s"ALTER TABLE ${ident(table)} ADD COLUMN ${ident(f.name)} ${sqlType(f.dataType)}")
          }
          missing.map(_.name).toSeq
        }
      } finally st.close()
    } finally conn.close()
  }

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

  /** ListFile with NiFi's STATE semantics, for scheduled batch runs
    * (the streaming half of List+Fetch is `Streams.fileStream`, which
    * tracks its own offsets): each call returns only files NOT yet
    * listed — strictly newer than the recorded max modification time,
    * or same-mtime files whose paths weren't seen at the boundary
    * (NiFi's timestamp-tie handling) — then advances the state
    * atomically (tmp + rename). State and listing both go through the
    * Hadoop FileSystem API, so any scheme works (file://, memfs://,
    * s3a:// on clusters with connectors). Returns (path, size, mtime).
    * Driver-side listing; the listing (not the data) must fit the
    * driver, same contract as NiFi's ListFile. */
  /** PutFile-per-row (PutFTP/PutSFTP's upload grain): one file per row
    * under `dir`, written from EXECUTORS through the Hadoop FileSystem
    * API — any scheme (file://, ftp://, memfs://, s3a:// with cluster
    * connectors), no driver funnel, tmp + atomic rename so a reader
    * never sees a partial upload (FTP servers rename with RNFR/RNTO).
    * `contentCol` may be string or binary. */
  def putFiles(df: DataFrame, dir: String, nameCol: String = "filename",
               contentCol: String = "content"): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(nameCol).cast("string"), col(contentCol).cast("binary"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.hasNext) {
          val base = new org.apache.hadoop.fs.Path(dir)
          val fs = base.getFileSystem(conf.value)
          fs.mkdirs(base)
          // hadoop's FTPFileSystem.rename rejects fully-qualified URIs
          // (upstream CWD bug — see AtomicSwap.renameArg); path-only
          // arguments resolve correctly on every scheme we target
          def renameArg(p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path =
            if ("ftp".equalsIgnoreCase(p.toUri.getScheme))
              new org.apache.hadoop.fs.Path(p.toUri.getPath)
            else p
          rows.foreach { r =>
            val name = r.getString(0)
            require(name != null && name.nonEmpty && !name.contains('/'),
              s"bad upload filename '$name'")
            val tmp = new org.apache.hadoop.fs.Path(base, name + ".tmp")
            val out = fs.create(tmp, true)
            try out.write(r.getAs[Array[Byte]](1)) finally out.close()
            val dst = new org.apache.hadoop.fs.Path(base, name)
            if (fs.exists(dst)) fs.delete(dst, false)
            require(fs.rename(renameArg(tmp), renameArg(dst)), s"rename failed for $dst")
          }
        }
      }
  }

  def listIncremental(spark: SparkSession, dir: String, statePath: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val stateP = new Path(statePath)
    val stateFs = stateP.getFileSystem(conf)
    // state = "<maxMtime>\n<path-at-boundary>..." (one per line)
    val (lastMtime, seenAtBoundary): (Long, Set[String]) =
      readStateString(stateFs, stateP) match {
        case Some(text) =>
          val lines = text.linesIterator.toSeq
          (lines.headOption.map(_.trim.toLong).getOrElse(Long.MinValue),
           lines.drop(1).toSet)
        case None => (Long.MinValue, Set.empty[String])
      }
    // the state file is never itself listable (covers state kept
    // inside the watched directory)
    val stateUri = stateFs.makeQualified(stateP).toString
    val all = fs.listStatus(dirPath).toSeq.filter(_.isFile)
      .map(s => (s.getPath.toString, s.getLen, s.getModificationTime))
      .filter { case (p, _, _) =>
        p != stateUri && p != stateUri + ".tmp" && p != stateUri + ".old" }
    val fresh = all.filter { case (p, _, m) =>
      m > lastMtime || (m == lastMtime && !seenAtBoundary.contains(p))
    }
    if (fresh.nonEmpty) {
      val newMax = math.max(lastMtime, fresh.map(_._3).max)
      val boundary = all.collect { case (p, _, m) if m == newMax => p }
      writeStateAtomic(stateFs, stateP, (newMax.toString +: boundary).mkString("\n"))
    }
    import spark.implicits._
    fresh.toDF("path", "size", "mtime")
  }
}
