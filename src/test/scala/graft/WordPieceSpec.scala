package graft

import org.apache.spark.sql.functions._
import graft.operators.WordPiece

/** Calibration gate for WordPiece (no DuckDB oracle — likelihood-argmax
  * training and greedy longest-match are iterative/argmax procedures
  * SQL can't express). The reference is an INDEPENDENT single-threaded
  * trainer implemented inside this spec straight from the published
  * description (Schuster & Nakajima 2012; Devlin et al. 2019 §A):
  * score(a,b) = count(ab)/(count(a)·count(b)) compared as an exact
  * rational (BigInt cross-multiplication), ties by (left, right)
  * ascending — so agreement means the distributed learner reproduces
  * the published algorithm, not itself. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent reference (driver-side, straight pseudocode) ----
  private def refInit(w: String): Vector[String] =
    w.zipWithIndex.map { case (c, i) => if (i == 0) c.toString else "##" + c }.toVector

  private def refMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r.stripPrefix("##"); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** (rank, left, right, token, pf, lc, rc) per merge. */
  private def refLearn(wordFreq: Map[String, Long], k: Int): Seq[(String, String, String, Long, Long, Long)] = {
    var vocab: Map[Vector[String], Long] =
      wordFreq.groupMapReduce { case (w, _) => refInit(w) } { case (_, f) => f }(_ + _)
    val out = Seq.newBuilder[(String, String, String, Long, Long, Long)]
    for (_ <- 1 to k) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      val syms = scala.collection.mutable.Map[String, Long]()
      vocab.foreach { case (ss, f) =>
        ss.foreach(s => syms(s) = syms.getOrElse(s, 0L) + f)
        ss.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (pairs.nonEmpty) {
        // exact rational argmax: pf/(lc*rc), ties (l, r) ascending
        val best = pairs.toSeq.map { case ((l, r), pf) => (l, r, pf, syms(l), syms(r)) }
          .reduce { (a, b) =>
            val c = (BigInt(a._3) * BigInt(b._4) * BigInt(b._5))
              .compare(BigInt(b._3) * BigInt(a._4) * BigInt(a._5))
            if (c > 0) a
            else if (c < 0) b
            else if (a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)) a else b
          }
        val (l, r, pf, lc, rc) = best
        out += ((l, r, l + r.stripPrefix("##"), pf, lc, rc))
        vocab = vocab.groupMapReduce { case (ss, _) => refMerge(ss, l, r) } { case (_, f) => f }(_ + _)
      }
    }
    out.result()
  }

  /** Independent greedy longest-match encoder (BERT WordpieceTokenizer
    * pseudocode — NOT the main module's encodeWord). */
  private def refEncode(w: String, vocab: Set[String], maxChars: Int): Vector[String] = {
    if (w.length > maxChars) return Vector("[UNK]")
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val hits = (i + 1 to w.length).reverse
        .map(j => (if (i > 0) "##" else "") + w.substring(i, j))
        .find(vocab.contains)
      hits match {
        case None => return Vector("[UNK]")
        case Some(t) => out += t; i += (t.length - (if (i > 0) 2 else 0))
      }
    }
    out.result()
  }

  private val worked = Seq( // (word, freq) — mixed shared/unique pieces
    ("hugs", 10L), ("pugs", 5L), ("pun", 12L), ("bun", 4L), ("hug", 8L))
  private def workedDocs = worked.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("learnVocab reproduces the independent reference on the worked corpus") {
    val k = 12
    val got = WordPiece.learnVocab(workedDocs, "text", k).orderBy("rank")
      .as[(Int, String, String, String, Long, Long, Long)].collect()
    val want = refLearn(worked.toMap, k)
    assert(got.length == want.length)
    got.zip(want).foreach { case ((rk, gl, gr, gt, gpf, glc, grc), (wl, wr, wt, wpf, wlc, wrc)) =>
      assert((gl, gr, gt, gpf, glc, grc) == (wl, wr, wt, wpf, wlc, wrc),
        s"merge #$rk: got ($gl,$gr,$gt,$gpf,$glc,$grc) want ($wl,$wr,$wt,$wpf,$wlc,$wrc)")
    }
  }

  test("likelihood scoring picks rare-but-coherent over frequent-but-independent") {
    // (q,##u): pf=2, counts 2·2 → score 0.5; (e,##e): pf=10, counts
    // 10·10 → score 0.1. BPE's frequency argmax takes (e,##e); the
    // WordPiece likelihood argmax MUST take (q,##u) first.
    val docs = (Seq.fill(2)("qu") ++ Seq.fill(10)("ee"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = WordPiece.learnVocab(docs, "text", 1)
      .select("left", "right", "token", "pair_freq", "left_freq", "right_freq")
      .as[(String, String, String, Long, Long, Long)].head()
    assert(got == (("q", "##u", "qu", 2L, 2L, 2L)), got.toString)
  }

  test("learnVocabFast: incremental statistics reproduce the recount form exactly") {
    val k = 40
    val slow = WordPiece.learnVocab(workedDocs, "text", k).orderBy("rank")
      .as[(Int, String, String, String, Long, Long, Long)].collect().toSeq
    val fast = WordPiece.learnVocabFast(workedDocs, "text", k).orderBy("rank")
      .as[(Int, String, String, String, Long, Long, Long)].collect().toSeq
    assert(fast === slow, "fast/slow merge sequences diverged on the worked corpus")
    assert(slow.length < k, "corpus should exhaust before 40 merges (early-stop path covered)")
    // tie-heavy random corpora: tiny alphabet forces repeated counts so
    // the exact-rational compare + (l, r) tie-break actually decide
    val rng = new scala.util.Random(29)
    (1 to 5).foreach { trial =>
      val words = (1 to 30).map(_ =>
        (1 to (1 + rng.nextInt(6))).map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
      val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val s = WordPiece.learnVocab(docs, "text", 12).orderBy("rank")
        .as[(Int, String, String, String, Long, Long, Long)].collect().toSeq
      val f = WordPiece.learnVocabFast(docs, "text", 12).orderBy("rank")
        .as[(Int, String, String, String, Long, Long, Long)].collect().toSeq
      assert(f === s, s"trial $trial: fast/slow diverged on corpus ${words.mkString(" ")}")
      val ref = refLearn(
        words.groupMapReduce(identity)(_ => 1L)(_ + _), 12)
      assert(s.map(m => (m._2, m._3, m._5)) === ref.map(m => (m._1, m._2, m._4)),
        s"trial $trial: distributed form diverged from the independent reference")
    }
  }

  test("learnVocabFast is invariant to input partitioning") {
    val a = WordPiece.learnVocabFast(workedDocs.repartition(1), "text", 10)
      .orderBy("rank").as[(Int, String, String, String, Long, Long, Long)].collect().toSeq
    val b = WordPiece.learnVocabFast(workedDocs.repartition(7), "text", 10)
      .orderBy("rank").as[(Int, String, String, String, Long, Long, Long)].collect().toSeq
    assert(a === b)
  }

  test("greedy longest-match encode: prefix semantics, reconstruction, UNK") {
    val vocab = Seq("un", "##able", "##b", "##le", "a", "##a", "b", "##ble",
      "u", "##n", "x", "y", "z", "[UNK]")
    val docs = Seq((1L, "unable unb a zzz")).toDF("doc_id", "text")
    val got = WordPiece.applyVocab(docs, "text", vocab)
      .select("wp_tokens").as[Seq[String]].head()
    // "unable" → un + ##able (longest match beats un+##a+##ble and u+##n+…)
    // "unb" → un + ##b; "a" → a; "zzz" has z but no ##z → whole-word [UNK]
    assert(got == Seq("un", "##able", "un", "##b", "a", "[UNK]"), got.toString)

    // words past maxWordChars become [UNK] without scanning
    val long = Seq((1L, "a" * 120)).toDF("doc_id", "text")
    val gotLong = WordPiece.applyVocab(long, "text", vocab, maxWordChars = 100)
      .select("wp_tokens").as[Seq[String]].head()
    assert(gotLong == Seq("[UNK]"))

    // null text tokenizes to EMPTY (the established tokenize contract)
    val withNull = Seq((1L, Option("a b")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val gotNull = WordPiece.applyVocab(withNull, "text", vocab)
      .orderBy("doc_id").select("wp_n_tokens").as[Int].collect()
    assert(gotNull.toSeq == Seq(2, 0))
  }

  test("corpus encode agrees with the independent greedy reference") {
    val merges = WordPiece.learnVocabFast(workedDocs, "text", 8)
    val vocab = WordPiece.vocabSet(workedDocs, "text", merges)
    val got = WordPiece.applyVocab(workedDocs.repartition(5), "text", vocab.toSeq)
      .select("text", "wp_tokens").as[(String, Seq[String])].collect()
    val vs = vocab.toSet
    got.foreach { case (w, ts) =>
      assert(ts == refEncode(w, vs, 100), s"$w -> $ts vs ${refEncode(w, vs, 100)}")
      // reconstruction: corpus words always tokenize (alphabet ⊂ vocab)
      assert(ts.map(_.stripPrefix("##")).mkString("") == w, s"$w -> $ts")
      assert(!ts.contains("[UNK]"))
    }
  }

  test("batch-trained vocabulary tokenizes a stream row-identically to batch") {
    // the classifier/curation deployment shape: train once in batch,
    // apply the broadcast model at ingest — the encode expression is a
    // pure narrow Column, so it runs unchanged on a streaming source
    val merges = WordPiece.learnVocabFast(workedDocs, "text", 8)
    val vocab = WordPiece.vocabSet(workedDocs, "text", merges).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_wp_stream").toString
    worked.zipWithIndex.foreach { case ((w, _), i) =>
      java.nio.file.Files.writeString(java.nio.file.Path.of(dir, s"d$i.json"),
        s"""{"id":$i,"text":"$w"}""" + "\n")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val streamed = WordPiece.applyVocab(
      graft.streaming.Streams.fileStream(spark, dir, schema), "text", vocab)
      .select(col("id"), array_join(col("wp_tokens"), " ").as("toks"))
    assert(streamed.isStreaming)
    val q = graft.streaming.Streams.toMemorySink(streamed, "wp_stream")
    q.processAllAvailable(); q.stop()
    val got = spark.table("wp_stream").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = WordPiece.applyVocab(
        worked.zipWithIndex.map { case ((w, _), i) => (i.toLong, w) }.toDF("id", "text"),
        "text", vocab)
      .select(col("id"), array_join(col("wp_tokens"), " ").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
  }

  test("applyVocab compiles to a native expression (no ScalaUDF in the plan)") {
    // range-based source: a local Seq would fold into a LocalTableScan
    // and hide the expression from the executed plan
    val df = spark.range(4).selectExpr("id AS doc_id", "concat('text ', id) AS text")
    val plan = WordPiece.applyVocab(df, "text", Seq("t", "##e", "##x", "##t", "[UNK]"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_wordpiece_encode"), plan)
    assert(!plan.contains("UDF"), plan)
  }
}
