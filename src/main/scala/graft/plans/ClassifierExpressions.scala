package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native classifier-apply expressions (r14 — closes the r13 "score is
  * a per-row ScalaUDF" note, the same move [[BpeEncode]]/[[UlmEncode]]
  * made for the tokenizers): hashing + dot product + sigmoid over a
  * model that rides in the expression INSTANCE (each Spark task
  * deserializes its own plan copy — no broadcast-id keying, no UDF
  * boxing round-trip), visible in plans as `graft_quality_score` /
  * `graft_langid` instead of an opaque ScalaUDF.
  *
  * Arithmetic delegates to [[graft.operators.TextClassifier]]'s static
  * featurizers (the UlmEncode→viterbi pattern), so the expression
  * cannot drift from what the trainer optimized. */
case class QualityScore(child: Expression, weights: Seq[Double])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_quality_score"
  override def nullable: Boolean = false

  @transient private lazy val w: Array[Double] = weights.toArray
  @transient private lazy val dim: Int = w.length - 1

  // null text scores as the empty document (bias-only sigmoid) — the
  // established score contract; bypass UnaryExpression's null
  // short-circuit
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    score(if (v == null) "" else v.asInstanceOf[UTF8String].toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[UTF8String].toString)

  private def score(text: String): Double = {
    var z = w(dim)
    graft.operators.TextClassifier.wordTfFeatures(text, dim).foreach {
      case (idx, v) => z += w(idx) * v
    }
    math.rint(1.0 / (1.0 + math.exp(-z)) * 1e6) / 1e6
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Multinomial (one-vs-rest) language prediction: per-class linear
  * score over hashed character n-gram features, argmax with a
  * deterministic first-label-wins tie-break (labels are sorted by the
  * trainer). Output is the winning label string. */
case class LangIdScore(child: Expression, labels: Seq[String],
                       weights: Seq[Seq[Double]], maxChars: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_langid"
  override def nullable: Boolean = false

  @transient private lazy val w: Array[Array[Double]] = weights.map(_.toArray).toArray
  @transient private lazy val dim: Int = w(0).length - 1
  @transient private lazy val labelsU: Array[UTF8String] =
    labels.map(UTF8String.fromString).toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    predict(if (v == null) "" else v.asInstanceOf[UTF8String].toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    predict(input.asInstanceOf[UTF8String].toString)

  private def predict(text: String): UTF8String = {
    val feats = graft.operators.TextClassifier.charNgramFeatures(text, dim, maxChars)
    var best = 0
    var bestZ = Double.NegativeInfinity
    var k = 0
    while (k < w.length) {
      val wk = w(k)
      var z = wk(dim)
      feats.foreach { case (idx, v) => z += wk(idx) * v }
      if (z > bestZ) { bestZ = z; best = k } // strictly-greater: first label wins ties
      k += 1
    }
    labelsU(best)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
