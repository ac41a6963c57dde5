package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregation — THE 100 TB pre-aggregation pattern:
  * sketch once per fine-grained segment (partition/day/source), persist
  * the binary sketches, then answer any coarser rollup by UNIONING
  * sketches instead of rescanning raw data. Spark 4 bundles Apache
  * DataSketches HLL natively (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`), so everything here stays inside Tungsten
  * aggregation — no UDAFs.
  *
  * NiFi parity: the CalculateRecordStats / QueryRecord COUNT(DISTINCT)
  * use cases at a scale where exact distinct is a full shuffle of all
  * keys; error is ~1.6%/sqrt(2^lgK) (≈0.8% at the lgK=14 default).
  */
object Sketches {

  /** Per-segment HLL sketches: one binary sketch per (segment, slice).
    * Persist this table; rollups never touch the raw data again. */
  def hllBySegment(df: DataFrame, segmentCols: Seq[String], valueCol: String,
                   lgK: Int = 14): DataFrame =
    df.groupBy(segmentCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Roll segment sketches up to coarser keys by sketch UNION — the
    * merge is associative and commutative, so any partial aggregation
    * order (map-side combine, AQE re-plan) gives identical sketches. */
  def hllRollup(sketches: DataFrame, rollupCols: Seq[String]): DataFrame =
    sketches.groupBy(rollupCols.map(col): _*)
      .agg(hll_union_agg(col("hll")).as("hll"))

  /** Distinct-count estimate column from a sketch column. */
  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** End-to-end convenience: estimated distinct `valueCol` per
    * `groupCols`, sketch-accurate (~0.8% at default lgK). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     lgK: Int = 14): DataFrame =
    hllBySegment(df, groupCols, valueCol, lgK)
      .select(groupCols.map(col) :+
        hll_sketch_estimate(col("hll")).cast("long").as("approx_distinct"): _*)
}
