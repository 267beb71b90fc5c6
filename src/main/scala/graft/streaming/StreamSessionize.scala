package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming sessionization.
  *
  * The streaming counterpart of `graft.operators.Sessionize` — the
  * reference achieves the same with incremental dbt merges + a 30-minute
  * re-read buffer (models/marts/fact_visits.sql, is_incremental branch);
  * Spark's native `session_window` keeps per-key session state in the state
  * store, merges sessions that close within the gap, and emits finalized
  * sessions once the watermark passes — no buffer re-reads, scales with the
  * state store (RocksDB) rather than the batch size.
  */
object StreamSessionize {

  /** Group a (streaming) DataFrame into gap-based sessions.
    *
    * @param gap e.g. "30 minutes" — session closes after this idle gap
    * @param watermark max lateness, e.g. "10 minutes"
    * @param extraAggs additional per-session aggregates
    */
  def sessions(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gap: String,
      watermark: String,
      extraAggs: Seq[Column] = Nil): DataFrame = {
    val aggs = Seq(count(lit(1)).as("n_events")) ++ extraAggs
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start_ts", col("session_window.start"))
      .withColumn("session_end_ts", col("session_window.end"))
      .drop("session_window")
  }
}
