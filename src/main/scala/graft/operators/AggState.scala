package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate-state maintenance: partial aggregation state kept
  * at a fine time grain (day), re-aggregated to any coarser range WITHOUT
  * touching raw data again.
  *
  * This is the materialized-rollup pattern every 100 TB warehouse runs: the
  * raw fact stream is folded ONCE per day into a tiny state table of
  * commutative-monoid components, and every later query (month, quarter,
  * arbitrary date range) merges state rows instead of re-scanning facts.
  * Each component is chosen for exact mergeability:
  *
  *  - `n_events`       count        → merge by sum (exact)
  *  - `total_value`    decimal sum  → merge by sum (exact, association-free)
  *  - `min/max_value`  min/max      → merge by min/max (exact)
  *  - distinct keys    HLL registers ([[Sketch.registers]]) → merge by max
  *    per bucket — max is associative/commutative/idempotent, so per-day
  *    registers merged to a month are IDENTICAL to registers built on the
  *    month directly; the oracle exploits exactly that identity.
  *
  * Scale shape: the daily fold is one map-side-combined aggregation (the
  * only pass over the facts); the state table is O(groups × days) for the
  * scalar part plus O(groups × days × 256) register rows; every re-grain is
  * an aggregation over state, never over facts. An AVG at the coarse grain
  * derives from (sum, count) — which is why state carries the monoid
  * components, never the finished ratio.
  *
  * Reference anchor: the incremental materializations
  * (models/marts/fact_interval_data.sql's incremental config) re-process a
  * bounded window and merge; daily state + merge is the same idea made
  * algebraic — the merge is a groupBy, not a MERGE INTO.
  */
object AggState {

  /** Register seed for the distinct-key sketch component. */
  val HllSeed = 29L

  /** Fold facts into per-(group, day) scalar state. `day` comes from
    * `tsCol`'s calendar date. One map-side-combined aggregation.
    */
  def dailyScalarState(df: DataFrame, groupCols: Seq[String], tsCol: Column,
      value: Column): DataFrame =
    df.groupBy(groupCols.map(col) :+ to_date(tsCol).as("day"): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(value.cast("decimal(18,2)")).as("sum_value"),
        min(value).as("min_value"),
        max(value).as("max_value"))

  /** Per-(group, day) HLL registers for `distinctKey` — the mergeable
    * distinct-count component of the state.
    */
  def dailyRegisterState(df: DataFrame, groupCols: Seq[String], tsCol: Column,
      distinctKey: Column): DataFrame =
    Sketch.registers(df.withColumn("_day", to_date(tsCol)),
      groupCols :+ "_day", distinctKey, HllSeed)
      .withColumnRenamed("_day", "day")

  /** Merge daily state to a coarser grain given by `grainExpr` over `day`
    * (e.g. `date_trunc("month", ...)`): scalars re-aggregate by their own
    * monoid, registers max-merge, and the distinct estimate is computed
    * from the MERGED registers. Output: group..., grain, n_events,
    * total_value, min_value, max_value, approx_distinct.
    */
  def mergeToGrain(scalarState: DataFrame, registerState: DataFrame,
      groupCols: Seq[String], grain: Column => Column): DataFrame = {
    val g = groupCols.map(col) :+ grain(col("day")).as("grain")
    val scalars = scalarState.groupBy(g: _*)
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("sum_value")).cast("double").as("total_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))
    val mergedRegs = registerState.groupBy(g :+ col("bucket"): _*)
      .agg(max(col("reg")).as("reg"))
    val est = Sketch.estimate(mergedRegs, groupCols :+ "grain")
      .drop("n_buckets_used")
    scalars.join(est, groupCols :+ "grain", "left")
  }
}
