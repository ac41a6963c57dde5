package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native single-pass int8 quantization codes: for an `array<float>`
  * or `array<double>` vector, emits `floor(xᵢ/scale + 0.5)` with
  * `scale = max|x|/127` (1 when the vector is all zero) as
  * integer-valued `array<double>` — bit-identical to
  * [[graft.functions.VectorFunctions.quantize8]]'s codes (same double
  * operations in the same order), but two primitive loops per row
  * instead of interpreted higher-order-function lambdas. The HOF form
  * measured ~6 µs/row·site at dim 64 (tools/NOTES_r10_kmeans.md,
  * NOTES_r10_m300.md — the q_embed_kmeans linear term); this is the
  * per-row floor for clustering/dedup loops over large corpora.
  * Deliberately CodegenFallback like the other single-pass natives
  * (plans/BinaryExpressions.scala:15 has the tradeoff).
  */
case class Quantize8Codes(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_quantize8_codes"

  private lazy val isDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _)  => false
    case t => throw new IllegalArgumentException(
      s"graft_quantize8_codes expects array<float|double>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = if (isDouble) v.getDouble(i) else v.getFloat(i).toDouble
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs == 0.0) 1.0 else maxAbs / 127.0
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val x = if (isDouble) v.getDouble(i) else v.getFloat(i).toDouble
      out(i) = math.floor(x / scale + 0.5)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Quantize8Codes {
  def apply(v: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Quantize8Codes(ColumnBridge.expression(v)))
  }
}
