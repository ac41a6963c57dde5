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

  /** Symmetric int8 quantization of an embedding: per-vector scale
    * `max|xᵢ|/127` plus integer codes `⌊xᵢ/scale + 0.5⌋` (floor-based
    * half-up — identical on every engine, unlike round()'s mode
    * differences). At 100 TB this is the storage/bandwidth lever for
    * similarity search: 4× smaller vectors with ~0.4%-of-scale error
    * per component (production packs codes into binary; arrays keep
    * this demonstration engine-portable). Zero vectors quantize to
    * zero codes with scale 1.
    *
    * Hot-path caveat: as a single Column the scale sub-expression
    * inlines into the per-element lambda, and interpreted HOFs re-fold
    * the max-abs aggregate per element (2·dim² element-ops per row).
    * In loops over large corpora, stage the scale into its own
    * projection instead — see `Cluster.kmeansAssign` and
    * tools/NOTES_r10_kmeans.md for the measured 20× difference. */
  def quantize8(v: Column): Column = {
    val maxAbs = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))
    val scale = when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs / 127.0)
    struct(scale.as("scale"),
      transform(v, x => floor(x.cast("double") / scale + 0.5).cast("int")).as("codes"))
  }

  /** Inverse of [[quantize8]]: reconstructed `array<double>` =
    * codeᵢ · scale. */
  def dequantize8(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") * q.getField("scale"))

  /** Fused quantize→dequantize round trip (native expression): the
    * reconstructed vectors without materializing codes — use this when
    * only the reconstruction is needed (the composed HOF form re-runs
    * the scale aggregate per element: O(dim²) interpreted). */
  def requantize8(v: Column): Column =
    graft.plans.BinaryExpressions.requantize8(v)

  /** Random-hyperplane LSH bucket: `bits` sign bits of projections onto
    * deterministic pseudo-random hyperplanes (splitmix64-derived, no RNG
    * state — reproducible across runs/executors). Native expression: one
    * primitive loop per row instead of bits×dim interpreted lambdas. */
  def hyperplaneBucket(v: Column, bits: Int, seed: Int = 0): Column =
    graft.plans.BinaryExpressions.hyperplaneBucket(v, bits, seed)
}
