package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Pq

/** r15 receipt for the persistent IVF-PQ index's three new scale
  * contracts (closing r14 verdict items #1/#2/#3 on Pq):
  *
  *   1. QUERY-BATCH scale: `searchIndex(broadcastQueries = false)`
  *      serves batches 10×/100×/1000× the r14 default (16 queries)
  *      with no per-query driver collect and no per-query broadcast
  *      Map — the walls below are the evidence the batch dimension is
  *      now distributed (sublinear growth; the broadcast path is run
  *      only at the small sizes it is FOR).
  *   2. BULK DELETE: `deleteFromIndexDf` removes a 10⁵-id victim set
  *      in one anti-join job + per-cell renames (the point-delete
  *      form at that cardinality would put 10⁵ literals into the plan
  *      and run ~3 jobs per touched cell).
  *   3. COMPACTION: repeated appends fragment cells into many files;
  *      `compactIndex` rewrites them to one file per cell in one job
  *      and search results are unchanged (spec pins row-identity; the
  *      probe receipts the file counts + wall).
  *
  * Run: sbt "runMain graft.tools.PqBulkProbe <out.json>" */
object PqBulkProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("tools/pq_bulk_probe_r15.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val dir = "/tmp/graft_pqprobe_m100" // shared with PqProbe/PqIndexProbe
    if (!new java.io.File(s"$dir/embeddings.parquet").exists())
      graft.GenSf.generate(spark, dir, 100, only = Set("embeddings"))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val idx = "/tmp/graft_pqbulk_idx_r15"
    val nCells = math.max(16, (n / 1000).toInt)
    val (_, tBuild) = time {
      Pq.buildIndex(spark, emb, idx, nCells = nCells)
    }

    // ---- 1. query-batch scale: 16 / 160 / 1600 / 16000 queries
    val batchPoints = Seq(16, 160, 1600, 16000).map { q =>
      val queries = emb.filter(col("vec_id") < q) // ids are dense 0..n-1
      val nq = queries.count()
      val (_, wDist) = time {
        Pq.searchIndex(spark, idx, queries, k = 10, nProbe = 4,
          broadcastQueries = false).count()
      }
      // the broadcast path only at the sizes it is for (≤ 10× default)
      val wBcast = if (q <= 160) {
        val (_, w) = time {
          Pq.searchIndex(spark, idx, queries, k = 10, nProbe = 4).count()
        }
        f"$w%.2f"
      } else "null"
      s"""{"queries":$nq,"dist_sec":${f"$wDist%.2f"},"bcast_sec":$wBcast}"""
    }

    // ---- 2. fragmentation + compaction: 5 appends of 10k vectors
    (0 until 5).foreach { b =>
      // recycled vectors under fresh ids — append cost is id-agnostic
      val extra = emb.limit(10000)
        .select((col("vec_id") + lit(10000000L + b * 100000L)).as("vec_id"),
          col("embedding"))
      Pq.appendToIndex(spark, idx, extra)
    }
    def maxFiles(): Int = {
      val root = new java.io.File(s"$idx/codes")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    }
    val filesBefore = maxFiles()
    val (cellsCompacted, tCompact) = time { Pq.compactIndex(spark, idx, maxFilesPerCell = 1) }
    val filesAfter = maxFiles()

    // ---- 3. bulk delete: a 10⁵-id victim DataFrame in one job
    val victims = spark.range(0, 200000).select((col("id") * 2).as("vec_id")) // 1e5 even ids
      .filter(col("vec_id") < n)
    val nVictims = victims.count()
    val (removed, tDelete) = time { Pq.deleteFromIndexDf(spark, idx, victims) }
    val afterRows = spark.read.parquet(s"$idx/codes").count()
    // contrast: the point-delete form at the cardinality it is FOR
    val (removed2, tPoint) = time { Pq.deleteFromIndex(spark, idx, (1L to 199L by 2L).toSeq) }

    val json =
      s"""{"probe":"pq_bulk_r15","n_vectors":$n,"n_cells":$nCells,""" +
        f""""build_sec":$tBuild%.2f,""" +
        s""""batch_scale":[${batchPoints.mkString(",")}],""" +
        s""""compact":{"max_files_before":$filesBefore,"max_files_after":$filesAfter,""" +
        f""""cells_compacted":$cellsCompacted,"wall_sec":$tCompact%.2f},""" +
        s""""bulk_delete":{"victim_ids":$nVictims,"removed":$removed,""" +
        f""""wall_sec":$tDelete%.2f},""" +
        s""""point_delete_100ids":{"removed":$removed2,${f""""wall_sec":$tPoint%.2f"""}},""" +
        s""""rows_after":$afterRows}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
