package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered change detection per key.
  *
  * Re-expresses the reference's int_status_changes
  * (models/intermediate/int_status_changes.sql:150): per (entity) ordered by
  * ts, keep only rows whose status differs from the previous one, then
  * attach lag/lead context over the *collapsed* stream. Two window passes
  * over the same partitioning — Catalyst reuses the single shuffle (both
  * windows share partitioning + ordering, so the exchange is planned once).
  */
object ChangeDetect {

  /** Rows where `statusCol` differs from the previous row's value (per key),
    * with previous/next status + ts context columns. `orderCols` orders the
    * stream (first element is the "ts" reported in context columns; add a
    * unique id as a tie-breaker for full determinism).
    */
  def changes(df: DataFrame, keys: Seq[String], orderCols: Seq[String], statusCol: String): DataFrame = {
    val tsCol = orderCols.head
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    val withPrev = df
      .withColumn("previous_status", lag(col(statusCol), 1).over(w))
      .withColumn("previous_ts", lag(col(tsCol), 1).over(w))
    val collapsed = withPrev.filter(
      col("previous_status").isNull || col("previous_status") =!= col(statusCol))
    // lead over the collapsed stream = next *different* status
    collapsed
      .withColumn("next_status", lead(col(statusCol), 1).over(w))
      .withColumn("next_ts", lead(col(tsCol), 1).over(w))
  }

  /** Latest row per key (argmax by `tsCol`) — reference
    * int_connector_latest_status.sql:1. Implemented with `max_by` struct
    * aggregation: one shuffle, map-side combined — strictly cheaper than the
    * window row_number()=1 form at scale (no full sort of each partition).
    */
  def latestByKey(df: DataFrame, keys: Seq[String], tsCol: String, valueCols: Seq[String]): DataFrame = {
    val aggs = valueCols.map(v => max_by(col(v), col(tsCol)).as(s"latest_$v")) :+
      max(col(tsCol)).as(s"latest_$tsCol")
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
