package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing/behavioral attribution — credit assignment from conversion
  * events back to the touches that preceded them (the last mile of every
  * event-analytics stack, and the canonical "windowed as-of over one
  * sorted pass" pattern).
  *
  * Scale shape: ONE shuffle on the user key and ONE (ts, id) sort shared
  * by every window in the frame — the last-touch carry (`last(...,
  * ignoreNulls)` over rows-preceding), the lookback touch count (range
  * frame on event-time micros), and the conversion filter are all
  * expressions over that single sorted partition stream; no self-join, no
  * interval join, nothing quadratic in either events-per-user or
  * touches-per-conversion. At 100 TB this is a sort-merge pass per user
  * partition, exactly like [[Sessionize]].
  */
object Attribution {

  /** Conversion-grain attribution frame:
    * `(conversion_id, user, conv_ts_us, touch_id, touch_ts_us, touch_type,
    * age_us, n_touches_window)`.
    *
    * The attributed touch is the LATEST touch strictly before the
    * conversion (ties on ts broken toward the larger id — "latest wins"
    * end to end) and no older than `lookbackUs`; conversions with no
    * in-window touch keep NULL touch columns (the "direct / unattributed"
    * bucket every report needs). `n_touches_window` counts the touches
    * inside the lookback window — the denominator a linear/position-decay
    * credit model divides by.
    *
    * EDGE CASE a credit model MUST guard: a touch sharing the
    * conversion's exact microsecond (with a smaller event_id) is
    * attributable via the rows-preceding frame, but the range frame ends
    * at conv − 1 µs and excludes it — so a conversion can carry a
    * non-null `touch_id` with `n_touches_window = 0`. Divide by
    * `greatest(n_touches_window, 1)` (or treat the attributed touch as
    * the sole credit holder) rather than by the raw count. The count
    * deliberately stays the pure range frame: widening it to the
    * conversion instant would instead count same-microsecond touches
    * with LARGER ids that the "latest strictly before" rule does NOT
    * attribute — no single range frame expresses the id tiebreak, and an
    * undercount that is documented beats an overcount that is not.
    */
  def lastTouch(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      isTouch: Column,
      isConversion: Column,
      lookbackUs: Long): DataFrame = {
    val base = events.select(
      col(userCol).as("user"),
      unix_micros(col(tsCol)).as("ts_us"),
      col(idCol).cast("long").as("id"),
      col(typeCol).as("etype"),
      isTouch.as("_touch"),
      isConversion.as("_conv"))
    val ordered = Window.partitionBy(col("user"))
      .orderBy(col("ts_us"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inWindow = Window.partitionBy(col("user"))
      .orderBy(col("ts_us"))
      .rangeBetween(-lookbackUs, -1)
    val carried = base
      .withColumn("touch_ts_us", last(when(col("_touch"), col("ts_us")), ignoreNulls = true).over(ordered))
      .withColumn("touch_id", last(when(col("_touch"), col("id")), ignoreNulls = true).over(ordered))
      .withColumn("touch_type", last(when(col("_touch"), col("etype")), ignoreNulls = true).over(ordered))
      .withColumn("n_touches_window",
        coalesce(sum(when(col("_touch"), lit(1L))).over(inWindow), lit(0L)))
    val fresh = col("touch_ts_us") >= col("ts_us") - lit(lookbackUs)
    carried
      .filter(col("_conv"))
      .select(
        col("id").as("conversion_id"),
        col("user"),
        col("ts_us").as("conv_ts_us"),
        when(fresh, col("touch_id")).as("touch_id"),
        when(fresh, col("touch_ts_us")).as("touch_ts_us"),
        when(fresh, col("touch_type")).as("touch_type"),
        when(fresh, col("ts_us") - col("touch_ts_us")).as("age_us"),
        col("n_touches_window"))
  }
}
