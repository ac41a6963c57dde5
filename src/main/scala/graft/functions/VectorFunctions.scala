package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (zip_with / aggregate) — no UDFs, so
  * the expressions stay inside whole-stage codegen and Catalyst can
  * pipeline them with the surrounding plan.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ (double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ (double). */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity in double precision: dot(a,b)/(‖a‖·‖b‖).
    * Matches DuckDB's list_cosine_similarity formulation. Delegates to
    * the native codegen expression (graft.plans.CosineSimilarity) —
    * a fused primitive loop, ~10× the higher-order-function build. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSimilarity(a, b)

  /** Cosine via higher-order functions only (no custom expression) —
    * same doubles as [[cosine]] (identical accumulation order); kept for
    * environments that disallow custom Catalyst nodes. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared euclidean distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val dd = x.cast("double") - y.cast("double"); dd * dd
    }), lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane LSH bucket: `bits` sign bits of projections onto
    * deterministic pseudo-random hyperplanes (seeded by plane index —
    * reproducible across runs/executors with no RNG state). Plane j's
    * i-th component is a hash-derived value in [-0.5, 0.5). */
  def hyperplaneBucket(v: Column, bits: Int, seed: Int = 0): Column = {
    val planeBits = (0 until bits).map { j =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x.cast("double") *
            (pmod(hash(i, lit(j + seed)), lit(1000)).cast("double") / 1000.0 - 0.5)),
        lit(0.0), (acc, p) => acc + p)
      when(proj > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    planeBits.reduce((a, b) => a.bitwiseOR(b))
  }
}
