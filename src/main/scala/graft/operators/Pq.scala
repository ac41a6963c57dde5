package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for the embedding family (Jégou, Douze &
  * Schmid 2011, "Product Quantization for Nearest Neighbor Search" —
  * the compression layer under FAISS's IVF-PQ): each vector's int8
  * code array is split into `m` subspaces and every subspace is
  * replaced by the index of its nearest codebook entry, so a d-dim
  * float vector becomes `m` small integers (64 floats → 8 bytes at
  * m=8). Search runs on the compressed codes via ADC (asymmetric
  * distance computation): the QUERY stays full-precision, and its dot
  * product against any corpus vector is approximated by `m` lookups
  * into a per-query table of subspace dots.
  *
  * Determinism/portability design (the [[Cluster]] contract): vectors
  * are quantized to int8 codes first ([[graft.plans.Quantize8Codes]],
  * engine-identical), codebooks are the `kCodes` smallest-id vectors'
  * sub-codes (no RNG, no training job — the hash-pick analog of
  * [[Ann.ivfTopK]]'s centroids), and both the encode argmin (exact
  * integer L2) and the ADC scores (exact integer dots) stay in integer
  * arithmetic ≪ 2⁵³ — so a SQL oracle replays encoding AND search
  * bit-exactly.
  *
  * Scale: encoding is one narrow pass against the broadcast codebook
  * (kCodes·d integers — the model, not data); the 16-row collect is
  * the same model-not-data contract as the BPE merge table. ADC search
  * shuffles only (query, vec, score) triples; at 100 TB the PQ codes
  * are the resident index (d/m·8× smaller than raw embeddings) and
  * re-ranking fetches originals for the top candidates only. */
object Pq {

  /** (id, codes) with codes = integer-valued array<double>. */
  private def int8Codes(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("vec_id"),
      graft.plans.Quantize8Codes(col(vecCol)).as("c"))

  /** Codebook: the `kCodes` smallest-id vectors' int8 codes, indexed by
    * ascending id (index IS the PQ code value). */
  private[graft] def codebook(df: DataFrame, idCol: String, vecCol: String,
                              kCodes: Int): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    int8Codes(df, idCol, vecCol).orderBy(col("vec_id")).limit(kCodes)
      .as[(Long, Array[Double])].collect().sortBy(_._1).map(_._2)
  }

  /** Encode every vector as `m` codebook indexes: per subspace, the
    * argmin exact-integer L2 distance to the codebook entries (ties →
    * smaller index). Output: (vec_id, pq array<int>). */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             m: Int = 8, kCodes: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val book = codebook(df, idCol, vecCol, kCodes)
    require(book.nonEmpty, "PQ: empty corpus")
    val d = book(0).length
    require(d % m == 0, s"PQ: dim $d not divisible by m=$m")
    val sub = d / m
    val bc = spark.sparkContext.broadcast(book)
    int8Codes(df, idCol, vecCol).as[(Long, Array[Double])].mapPartitions { it =>
      val cb = bc.value
      it.map { case (id, c) =>
        val pq = new Array[Int](m)
        var s = 0
        while (s < m) {
          val off = s * sub
          var best = 0
          var bestD = Long.MaxValue
          var j = 0
          while (j < cb.length) {
            var dist = 0L
            var i = 0
            while (i < sub) {
              val diff = (c(off + i) - cb(j)(off + i)).toLong
              dist += diff * diff
              i += 1
            }
            if (dist < bestD) { bestD = dist; best = j } // ties: first (smallest j) wins
            j += 1
          }
          pq(s) = best
          s += 1
        }
        (id, pq)
      }
    }.toDF("vec_id", "pq")
  }

  /** IVF-PQ (r13): the full FAISS composite — IVF cells prune WHICH
    * vectors are scored, PQ codes decide HOW each survivor is scored
    * (m LUT lookups, originals untouched), and an exact-cosine rerank
    * refines the shortlist. At 100 TB this is the architecture that
    * makes embedding search tractable: the resident index is
    * (cell id + m bytes) per vector, the scan per query touches
    * ~nProbe/nCells of the corpus, and full-precision vectors are
    * fetched only for the final rerank candidates.
    *
    * Reuses [[Ann.ivfTopK]]'s centroid machinery verbatim (hash-picked
    * cells, deterministic assignment incl. the >64-cell hierarchical
    * path) and this object's codebook/LUT arithmetic — so every stage
    * is deterministic and the spec can pin planted-twin recall and
    * run-to-run equality. */
  def ivfAdcTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame, k: Int,
                 nCells: Int = 16, nProbe: Int = 4, m: Int = 8, kCodes: Int = 16,
                 rerankFactor: Int = 4): DataFrame = {
    import spark.implicits._
    // IVF side: centroids + cell per corpus vector, nProbe cells per query
    val init: Array[(Int, Array[Float])] = corpus
      .select(col("vec_id").cast("long"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nCells)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .zipWithIndex.map { case ((_, v), i) => (i, v) }
    val bcCells = spark.sparkContext.broadcast(init)
    val cCell = Ann.assignCells(spark, corpus, bcCells, 1).toDF("vec_id", "c_vec", "cell")
      .select("vec_id", "cell")
    val qCell = Ann.assignCells(spark, queries, bcCells, nProbe).toDF("query_id", "q_vec", "cell")
      .select("query_id", "cell")
    // PQ side: codes per corpus vector + per-query LUTs
    val book = codebook(corpus, "vec_id", "embedding", kCodes)
    val d = book(0).length
    val sub = d / m
    val coded = encode(corpus, "vec_id", "embedding", m, kCodes).join(cCell, "vec_id")
    val qCodes = int8Codes(queries, "vec_id", "embedding")
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val luts: Array[(Long, Array[Array[Long]])] = qCodes.map { case (qid, qc) =>
      val lut = Array.ofDim[Long](m, book.length)
      var s = 0
      while (s < m) {
        val off = s * sub
        var j = 0
        while (j < book.length) {
          var dot = 0L
          var i = 0
          while (i < sub) { dot += qc(off + i).toLong * book(j)(off + i).toLong; i += 1 }
          lut(s)(j) = dot
          j += 1
        }
        s += 1
      }
      (qid, lut)
    }
    val bcLuts = spark.sparkContext.broadcast(luts.toMap)
    // candidates = corpus rows in a probed cell; score by LUT
    val cand = coded.join(broadcast(qCell), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id").cast("long"), col("vec_id"), col("pq"))
      .as[(Long, Long, Array[Int])]
      .mapPartitions { it =>
        val ls = bcLuts.value
        it.map { case (qid, id, pq) =>
          val lut = ls(qid)
          var adc = 0L
          var s = 0
          while (s < m) { adc += lut(s)(pq(s)); s += 1 }
          (qid, id, adc)
        }
      }.toDF("query_id", "vec_id", "adc")
      .groupBy("query_id", "vec_id").agg(max("adc").as("adc")) // multi-probe dedup
    val w = Window.partitionBy("query_id").orderBy(col("adc").desc, col("vec_id"))
    val shortlist = cand.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k * math.max(rerankFactor, 1))
      .select("query_id", "vec_id")
    val c = corpus.select(col("vec_id"), col("embedding").as("c_vec"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val exact = shortlist.join(c, "vec_id").join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"),
        round(graft.functions.VectorFunctions.cosine(col("c_vec"), col("q_vec")), 6)
          .as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
    val w2 = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
    exact.withColumn("rk", row_number().over(w2)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_sim"),
        col("rk").cast("long").as("rk"))
  }

  /** ADC top-k: approximate per-query top-k over the PQ codes, with
    * optional exact re-rank. Queries = rows of `queries` (small set,
    * broadcast). Score(v) = Σ_s intDot(query_subcodes_s,
    * codebook[pq_s]_s) — the asymmetric approximation of the int8
    * dot product; ranking by (adc DESC, vec_id). With `rerankFactor >
    * 0` the top rerankFactor·k ADC candidates are re-scored with the
    * exact full-precision cosine and the final top-k ranks by
    * (cos_sim DESC, vec_id) — the standard PQ shortlist+refine. */
  def adcTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame, k: Int,
              m: Int = 8, kCodes: Int = 16, rerankFactor: Int = 0): DataFrame = {
    import spark.implicits._
    val book = codebook(corpus, "vec_id", "embedding", kCodes)
    val d = book(0).length
    val sub = d / m
    val coded = encode(corpus, "vec_id", "embedding", m, kCodes)
    val bcBook = spark.sparkContext.broadcast(book)
    // per-query LUT: lut(s)(j) = intDot(query_codes[s], book(j)[s])
    val qCodes = int8Codes(queries, "vec_id", "embedding")
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val luts: Array[(Long, Array[Array[Long]])] = qCodes.map { case (qid, qc) =>
      val lut = Array.ofDim[Long](m, book.length)
      var s = 0
      while (s < m) {
        val off = s * sub
        var j = 0
        while (j < book.length) {
          var dot = 0L
          var i = 0
          while (i < sub) { dot += qc(off + i).toLong * bcBook.value(j)(off + i).toLong; i += 1 }
          lut(s)(j) = dot
          j += 1
        }
        s += 1
      }
      (qid, lut)
    }
    val bcLuts = spark.sparkContext.broadcast(luts)
    val scored = coded.as[(Long, Array[Int])].mapPartitions { it =>
      val ls = bcLuts.value
      it.flatMap { case (id, pq) =>
        ls.iterator.collect { case (qid, lut) if qid != id =>
          var adc = 0L
          var s = 0
          while (s < m) { adc += lut(s)(pq(s)); s += 1 }
          (qid, id, adc)
        }
      }
    }.toDF("query_id", "vec_id", "adc")
    val w = Window.partitionBy("query_id").orderBy(col("adc").desc, col("vec_id"))
    if (rerankFactor <= 0) {
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .select(col("query_id"), col("vec_id"), col("adc"),
          col("rk").cast("long").as("rk"))
    } else {
      val shortlist = scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k * rerankFactor)
        .select("query_id", "vec_id")
      val c = corpus.select(col("vec_id"), col("embedding").as("c_vec"))
      val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
      val exact = shortlist.join(c, "vec_id").join(broadcast(q), "query_id")
        .select(col("query_id"), col("vec_id"),
          round(graft.functions.VectorFunctions.cosine(col("c_vec"), col("q_vec")), 6)
            .as("cos_sim"))
        .filter(!isnan(col("cos_sim")))
      val w2 = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("vec_id"))
      exact.withColumn("rk", row_number().over(w2)).filter(col("rk") <= k)
        .select(col("query_id"), col("vec_id"), col("cos_sim"),
          col("rk").cast("long").as("rk"))
    }
  }
}
