package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Bm25Index, Retrieval}

/** r15 receipt for the persistent BM25 index (SURVEY 38k): the
  * build-once/serve-many contract at two corpus decades — build wall
  * (one tokenize pass + one term shuffle) vs serving a fixed 4-query
  * batch from the persisted postings, vs the INLINE scorer which
  * re-tokenizes the corpus for every batch. The claim receipted:
  * inline serve cost tracks the CORPUS; index serve cost tracks the
  * query terms' postings (sublinear — only matched-term rows read,
  * pruned to their buckets); append cost tracks the increment.
  *
  * Run: sbt "runMain graft.tools.Bm25IndexProbe <out.json>" */
object Bm25IndexProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("tools/bm25_index_probe_r15.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val queries = Seq(
      (0L, "hash join table"), (1L, "window agg stream"),
      (2L, "fast scan filter"), (3L, "vector merge sort column"))
      .toDF("query_id", "qtext")
    val results = Seq(10, 100).map { mult =>
      val dir = s"/tmp/graft_bm25probe_m$mult"
      if (!new java.io.File(s"$dir/documents.parquet").exists())
        graft.GenSf.generate(spark, dir, mult, only = Set("documents"))
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val n = docs.count()
      val idx = s"/tmp/graft_bm25idx_m$mult"
      val (_, tBuild) = time { Bm25Index.buildIndex(spark, docs, idx, nBuckets = 64) }
      val serveWalls = (0 until 3).map { _ =>
        val (_, w) = time {
          Bm25Index.searchIndex(spark, idx, queries, k = 10).count()
        }
        f"$w%.2f"
      }
      val (_, tInline) = time {
        Retrieval.bm25TopK(docs, "doc_id", "text", queries,
          "query_id", "qtext", k = 10).count()
      }
      val batch = docs.filter(col("doc_id") < 1000)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      val (_, tAppend) = time { Bm25Index.appendToIndex(spark, idx, batch) }
      s"""{"mult":$mult,"n_docs":$n,"build_sec":${f"$tBuild%.2f"},""" +
        s""""serve_sec":[${serveWalls.mkString(",")}],""" +
        s""""inline_serve_sec":${f"$tInline%.2f"},"append_1k_sec":${f"$tAppend%.2f"}}"""
    }
    val json = s"""{"probe":"bm25_index_r15","points":[${results.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
