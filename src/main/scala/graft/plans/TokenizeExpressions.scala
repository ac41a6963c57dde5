package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer-apply expressions (r13 — closes the r12 "BPE apply
  * is the one per-row UDF in the §2.4 family" note): the greedy BPE
  * merge loop and the unigram-LM Viterbi both genuinely need JVM state,
  * but they don't need a ScalaUDF — as CodegenFallback Expressions the
  * model rides in the expression INSTANCE (each Spark task deserializes
  * its own plan copy, so the memo is task-local with no ThreadLocal or
  * broadcast-id keying), the output writes a GenericArrayData directly
  * (no UDF boxing round-trip), and the node is visible in plans as
  * `graft_bpe_encode` / `graft_ulm_encode` instead of an opaque UDF.
  *
  * The model (merge table / piece table) is a constructor parameter —
  * serialized once per task with the plan, exactly the broadcast-sized
  * contract the UDF form had. Tokenization semantics are char-identical
  * to [[graft.operators.Bpe.encodeWord]] / the unigram Viterbi (the
  * specs compare them). */
case class BpeEncode(child: Expression, merges: Seq[((String, String), Int)],
                     memoCap: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"
  override def nullable: Boolean = false

  // null text tokenizes to EMPTY (the established applyMerges/tokenize
  // contract) — bypass UnaryExpression's null short-circuit
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Any]) else nullSafeEval(v)
  }

  @transient private lazy val ranks: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer]()
    merges.foreach { case (pair, rank) => m.put(pair, rank) }
    m
  }
  @transient private lazy val memo = new java.util.HashMap[String, Array[String]]()

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    text.toLowerCase.split("\\s+").foreach { w =>
      if (w.nonEmpty) {
        var t = memo.get(w)
        if (t == null) {
          t = encodeWord(w)
          if (memo.size < memoCap) memo.put(w, t)
        }
        t.foreach(s => out += UTF8String.fromString(s))
      }
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(w: String): Array[String] = {
    var syms: Array[String] = w.map(_.toString).toArray :+ graft.operators.Bpe.EndOfWord
    var go = true
    while (go && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get((syms(i), syms(i + 1)))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); bi = i }
        i += 1
      }
      if (bi < 0) go = false
      else {
        val (l, rr) = (syms(bi), syms(bi + 1))
        val b = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == rr) {
            b += l + rr; j += 2
          } else { b += syms(j); j += 1 }
        }
        syms = b.result()
      }
    }
    syms
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** WordPiece greedy longest-match-first apply as a native expression
  * (BERT's WordpieceTokenizer — Devlin et al. 2019 §A) — same contract
  * as [[BpeEncode]]: vocabulary in the instance, task-local memo,
  * direct array output, node visible as `graft_wordpiece_encode`.
  * Delegates the per-word scan to
  * [[graft.operators.WordPiece.encodeWord]] so the greedy semantics
  * (longest match at each position; ANY unmatchable position turns
  * the whole word into `[UNK]`; words past `maxWordChars` skip the
  * scan) cannot drift from the trainer module's reference form. */
case class WordPieceEncode(child: Expression, vocab: Seq[String],
                           maxWordChars: Int, memoCap: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_encode"
  override def nullable: Boolean = false

  // null text tokenizes to EMPTY (the established tokenize contract)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Any]) else nullSafeEval(v)
  }

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val memo = new java.util.HashMap[String, Array[String]]()

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    text.toLowerCase.split("\\s+").foreach { w =>
      if (w.nonEmpty) {
        var t = memo.get(w)
        if (t == null) {
          t = graft.operators.WordPiece.encodeWord(w, vocabSet, maxWordChars)
          if (memo.size < memoCap) memo.put(w, t)
        }
        t.foreach(s => out += UTF8String.fromString(s))
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unigram-LM Viterbi apply as a native expression — same contract as
  * [[BpeEncode]]: piece table in the instance, task-local memo, direct
  * array output. Delegates the per-word segmentation to
  * [[graft.operators.UnigramLm.viterbi]] so the arithmetic cannot
  * drift from the trainer's. */
case class UlmEncode(child: Expression, pieces: Seq[(String, Double)],
                     maxPieceLen: Int, memoCap: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ulm_encode"
  override def nullable: Boolean = false

  // null text tokenizes to EMPTY (the established applyMerges/tokenize
  // contract) — bypass UnaryExpression's null short-circuit
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Any]) else nullSafeEval(v)
  }

  @transient private lazy val logp: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    pieces.foreach { case (p, v) => m.put(p, v) }
    m
  }
  @transient private lazy val memo = new java.util.HashMap[String, Array[String]]()

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    text.toLowerCase.split("\\s+").foreach { w =>
      if (w.nonEmpty) {
        var t = memo.get(w)
        if (t == null) {
          t = graft.operators.UnigramLm.viterbi(w, logp, maxPieceLen)
          if (memo.size < memoCap) memo.put(w, t)
        }
        t.foreach(s => out += UTF8String.fromString(s))
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
