package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time-correct rolling feature engineering.
  *
  * The feature-store primitive every training pipeline needs before a model
  * sees an event: "how many times / how much did this key do X in the last
  * H hours AS OF this row's own timestamp". The frame is `[t − window, t]`
  * — it can never look ahead, so features computed here are leakage-free by
  * construction (the same property the as-of join in [[AsOf]] gives lookups
  * against a second table, expressed here against the key's own history).
  *
  * Spark realization and the 100 TB shape:
  *  - ONE hash Exchange on the key columns, ONE sort on (key, ts) — every
  *    requested window is a `RANGE BETWEEN w PRECEDING AND CURRENT ROW`
  *    frame over the SAME (partition, order) spec, so Catalyst stacks the
  *    Window operators on a single sorted pass with no further shuffle;
  *  - RANGE frames (not ROWS) make the result arrival-order independent:
  *    peer rows at an identical timestamp are all inside each other's
  *    frame, in both Spark and any SQL engine — which is what makes the
  *    gate hash-exact without a tie-break column;
  *  - sums run in decimal so frame aggregation order cannot change a bit;
  *  - state per partition is bounded by the widest window's row span, not
  *    the key's full history (Spark's sliding WindowExec keeps only the
  *    current frame's buffer).
  *
  * Reference anchor: int_driver_aggregates.sql:40 computes lifetime
  * first/last aggregates per driver; rolling windows are the same per-key
  * ordered pass with a bounded frame instead of an unbounded one.
  */
object Features {

  /** One rolling window: output-suffix name and width in the order column's
    * own unit (epoch micros here: 1 h = 3_600_000_000L).
    */
  final case class RollingWindow(name: String, widthUs: Long) {
    require(widthUs > 0, s"window width must be positive, got $widthUs")
  }

  /** Append `n_<name>` (event count) and `v_<name>` (decimal-exact value
    * sum, emitted as double) per rolling window, as of each row.
    *
    * @param tsUs event-time order column in epoch microseconds (long)
    * @param value measure to sum; summed as decimal(18,2) for bit-stable
    *              association-free addition, emitted as double
    */
  def rolling(df: DataFrame, keyCols: Seq[String], tsUs: Column, value: Column,
      windows: Seq[RollingWindow]): DataFrame = {
    require(keyCols.nonEmpty, "rolling features need at least one key column")
    require(windows.nonEmpty, "at least one window")
    val withTs = df.withColumn("_ro_ts_us", tsUs)
    val base = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_ro_ts_us"))
    val out = windows.foldLeft(withTs) { (acc, w) =>
      val frame = base.rangeBetween(-w.widthUs, 0)
      acc
        .withColumn(s"n_${w.name}", count(lit(1)).over(frame))
        .withColumn(s"v_${w.name}",
          sum(value.cast("decimal(18,2)")).over(frame).cast("double"))
    }
    out.drop("_ro_ts_us")
  }
}
