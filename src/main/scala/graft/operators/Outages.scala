package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composite outage detection over per-sub-entity fault spans.
  *
  * Re-expresses int_faulted_outages
  * (models/intermediate/outages/int_faulted_outages.sql:60-180): a port is
  * in outage only while ALL of its connectors are simultaneously faulted;
  * adjacent/overlapping outage windows merge into one row.
  *
  * The reference builds elementary intervals with a time-point self-join and
  * counts overlaps with a second interval join (O(n²) per port). Here:
  *  1. [[Intervals.mergeIntervals]] per (key, sub-entity) makes each
  *     sub-entity's fault spans disjoint, so "intervals covering a segment"
  *     equals "distinct sub-entities faulted" (the reference's
  *     count(distinct connector_id)).
  *  2. [[Intervals.sweepActiveCount]] per key: +1/−1 boundary events and a
  *     running sum — O(n log n), one shuffle.
  *  3. Segments where the count equals the required sub-entity total are
  *     merged back into maximal outage windows.
  */
object Outages {

  /** @param faultSpans  one row per (keys, subKey) fault interval
    * @param required    one row per keys with `requiredCol` = total number
    *                    of sub-entities that must all be faulted (small dim,
    *                    broadcast)
    */
  def allFaultedOutages(
      faultSpans: DataFrame,
      keys: Seq[String],
      subKey: String,
      fromCol: String,
      toCol: String,
      required: DataFrame,
      requiredCol: String): DataFrame = {
    val disjoint = Intervals.mergeIntervals(faultSpans, keys :+ subKey, fromCol, toCol)
    val segments = Intervals.sweepActiveCount(disjoint, keys, fromCol, toCol)
    val full = segments
      .join(broadcast(required.select((keys.map(col) :+ col(requiredCol).as("_req")): _*)), keys)
      .filter(col("active_count") === col("_req") && col("_req") > 0)
      .select((keys.map(col) :+ col("segment_start").as(fromCol) :+ col("segment_end").as(toCol)): _*)
    Intervals.mergeIntervals(full, keys, fromCol, toCol)
      .filter(col(toCol) > col(fromCol))
  }
}
