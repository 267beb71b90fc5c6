package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming fixed-window aggregation — the streaming counterpart of the
  * reference's 15-minute interval data (models/marts/fact_interval_data.sql):
  * tumbling event-time windows with a watermark, emitting finalized buckets
  * in append mode once the watermark passes the window end.
  */
object StreamBucketAgg {

  /** Tumbling-window aggregate per key, e.g. width "15 minutes". */
  def tumbling(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      width: String,
      watermark: String,
      aggs: Seq[Column]): DataFrame = {
    val allAggs = Seq(count(lit(1)).as("n_events")) ++ aggs
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width) +: keys.map(col): _*)
      .agg(allAggs.head, allAggs.tail: _*)
      .withColumn("bucket_start", col("window.start"))
      .withColumn("bucket_end", col("window.end"))
      .drop("window")
  }
}
