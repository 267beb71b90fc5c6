package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch incremental-merge patterns from the reference's dbt incremental
  * models. (The streaming equivalents live in `graft.streaming`; these are
  * the merge steps a batch re-run performs against previously materialized
  * state.)
  */
object Incremental {

  /** Merge stored per-key first/last aggregate state with a batch of new
    * facts — int_driver_aggregates.sql's incremental branch (reference
    * models/intermediate/int_driver_aggregates.sql:40, unit_tests.yml:7-70):
    * a late-arriving event must overwrite first_seen/first_value, a new
    * latest event must overwrite last_seen/latest_value, and either side may
    * be missing.
    *
    * Implemented by replaying the stored extremes as pseudo-events and
    * re-aggregating with `min_by`/`max_by` — no join: one union, one
    * map-side-combined aggregation, associative and so safe under any
    * partitioning (the same shape a 1000-executor merge needs).
    *
    * `existing` columns: key, first_ts, last_ts, first_val, last_val.
    * `updates` columns: key, ts, val.
    */
  def mergeFirstLast(
      existing: DataFrame,
      updates: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      firstTsCol: String = "first_ts",
      lastTsCol: String = "last_ts",
      firstValCol: String = "first_val",
      lastValCol: String = "last_val"): DataFrame = {
    val replayFirst = existing.select(
      col(keyCol), col(firstTsCol).as(tsCol), col(firstValCol).as(valCol))
    val replayLast = existing.select(
      col(keyCol), col(lastTsCol).as(tsCol), col(lastValCol).as(valCol))
    val all = replayFirst.unionAll(replayLast).unionAll(
      updates.select(col(keyCol), col(tsCol), col(valCol)))
    // tie-break on (ts, val), not ts alone: min_by/max_by keep an arbitrary
    // row on duplicate timestamps, which would make merge-vs-recompute (and
    // Spark-vs-oracle) comparisons flaky whenever two events share a ts —
    // ordering by the struct makes the kept value deterministic under any
    // partitioning, and the oracle mirrors it with arg_min/arg_max over the
    // same composite
    all.groupBy(col(keyCol)).agg(
      min(col(tsCol)).as(firstTsCol),
      max(col(tsCol)).as(lastTsCol),
      min_by(col(valCol), struct(col(tsCol), col(valCol))).as(firstValCol),
      max_by(col(valCol), struct(col(tsCol), col(valCol))).as(lastValCol))
  }
}
