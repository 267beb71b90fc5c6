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

  /** Type-2 slowly-changing dimension from a change-event stream: collapse
    * consecutive equal-status runs ([[changes]]), then each surviving row
    * becomes a validity version — `valid_from` = its ts, `valid_to` = the
    * NEXT change's ts (null ⇒ open/current), `version` = 1-based change
    * ordinal per key, `is_current` = open-ended flag. Re-expresses the
    * warehouse dim-history build the reference's latest-status models
    * truncate to version 1 of (int_connector_latest_status.sql:1 keeps only
    * the argmax row; SCD2 keeps the whole lineage).
    *
    * Scale shape: the collapse window, the valid_to lead and the version
    * row_number all share ONE (key, order) sort — Catalyst plans a single
    * exchange+sort; output is change-grain (≪ event-grain), no self-joins.
    */
  def scd2(df: DataFrame, keys: Seq[String], orderCols: Seq[String], statusCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    changes(df, keys, orderCols, statusCol)
      .withColumn("valid_from", col(orderCols.head))
      .withColumn("valid_to", col("next_ts"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("next_ts").isNull)
      .drop("previous_status", "previous_ts", "next_status", "next_ts")
  }

  /** Latest row per key (argmax by `orderCols`, lexicographic — add a
    * unique tiebreaker for determinism) — reference
    * int_connector_latest_status.sql:1. Implemented with a struct-max
    * aggregation: one shuffle, map-side combined — strictly cheaper than the
    * window row_number()=1 form at scale (no full sort of each partition),
    * and all value columns are taken from the SAME winning row.
    */
  def latestByKey(
      df: DataFrame,
      keys: Seq[String],
      orderCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val packed = struct((orderCols ++ valueCols).map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max(packed).as("_m"))
      .select(
        keys.map(col) ++
          Seq(col(s"_m.${orderCols.head}").as(s"latest_${orderCols.head}")) ++
          valueCols.map(v => col(s"_m.$v").as(s"latest_$v")): _*)
  }
}
