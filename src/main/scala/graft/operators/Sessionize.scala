package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (gaps-and-islands over an event stream).
  *
  * Re-expresses the visit-grouping semantics of the reference's
  * models/marts/fact_visits.sql:160 (lag → boundary flag → group) as a single
  * window pass: one shuffle on the entity key, a running sum of session-start
  * flags, no boundary self-joins (the reference joins attempts back onto
  * visit boundaries — O(n·sessions) per key; the running-sum form is O(n)
  * and survives 100× key cardinality).
  *
  * Timestamps are compared in microseconds (`unix_micros`) so the gap rule
  * is exact and engine-portable.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key) and `is_session_start`.
    * A new session starts when the gap to the previous event is strictly
    * greater than `gapSeconds` (or there is no previous event).
    * `tieBreakCols` (e.g. a unique event id) make `is_session_start`
    * deterministic when rows share a timestamp at a session boundary —
    * `session_seq` itself is tie-order-independent (a zero gap never starts
    * a session), but which tied row carries the start flag is not.
    */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gapSeconds: Long,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    val ordered = Window.partitionBy(keys.map(col): _*)
      .orderBy((tsCol +: tieBreakCols).map(col): _*)
    val prevTs = lag(col(tsCol), 1).over(ordered)
    val isStart = prevTs.isNull ||
      (unix_micros(col(tsCol)) - unix_micros(prevTs)) > gapSeconds * 1000000L
    df.withColumn("is_session_start", isStart)
      .withColumn(
        "session_seq",
        sum(col("is_session_start").cast("long"))
          .over(ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: start/end ts, event count, and caller-supplied
    * aggregates. Mirrors fact_visits' per-visit rollup
    * (models/marts/fact_visits.sql:240) — first/last/count/sum in one
    * groupBy (one extra shuffle, map-side combined).
    */
  def sessionMetrics(
      sessionized: DataFrame,
      keys: Seq[String],
      tsCol: String,
      extraAggs: Seq[Column] = Nil): DataFrame = {
    val groupCols = keys.map(col) :+ col("session_seq")
    val aggs = Seq(
      min(col(tsCol)).as("session_start_ts"),
      max(col(tsCol)).as("session_end_ts"),
      count(lit(1)).as("n_events")) ++ extraAggs
    sessionized
      .groupBy(groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
