package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling of irregular per-entity telemetry — the "align
  * meter readings to a fixed cadence" step the reference's interval marts
  * assume has already happened upstream (fact_interval_data.sql buckets
  * *pre-aligned* 15-minute data; real chargers emit on jittery clocks).
  * Linear interpolation between the surrounding observations yields the
  * value the entity was passing through at each grid instant.
  *
  * Formulation: grid instants are generated per entity from its own
  * first/last observation (span-bounded `sequence()` explode — never a
  * calendar × entity cross join), unioned with the raw readings, and both
  * neighbours found with one carry-forward + one carry-backward window over
  * the SAME (entity, time) ordering — Catalyst plans ONE Exchange for the
  * union'd table; no self-join, no range join. This is the same
  * union-and-carry discipline as [[AsOf.asOfBackward]], extended to both
  * directions (the backward pass re-sorts descending inside the same
  * partitioning — one Exchange, two sorts).
  *
  * Numerics: grid/observation times compare as exact epoch microseconds;
  * the interpolation `v0 + (v1 − v0) · ((t − t0) / (t1 − t0))` is the same
  * IEEE op sequence in any engine (time deltas are exact integers well
  * under 2^53, so the casts are exact) — results are bit-portable. A grid
  * instant that lands exactly on a reading reproduces that reading exactly
  * (both neighbours resolve to the coincident reading → the `nt == pt`
  * branch returns it untouched).
  *
  * Scale shape: one shuffle on the high-cardinality entity key; window
  * state is O(1) per row; output is span/step rows per entity, bounded by
  * the calendar, not the reading volume.
  */
object TimeSeries {

  /** Resample `valueCol` onto a `stepSeconds` grid per entity. Grid covers
    * `ceil(first/step)·step .. floor(last/step)·step` of each entity's own
    * observed span — every grid instant is interpolable (never
    * extrapolated), and entities whose span contains no grid instant (e.g.
    * a single reading) produce no rows. Duplicate observation timestamps
    * are resolved deterministically by `tieBreakCols` (the LAST reading in
    * that order wins both directions, so the series is consistent).
    *
    * Output: one row per (entity, grid instant): keys, `grid_ts_us`
    * (epoch microseconds), `value` (interpolated double).
    *
    * Null semantics: a reading whose `valueCol` is NULL is treated as
    * absent — it contributes neither a neighbour timestamp nor a value.
    * (Carrying its timestamp while skipping its value would pair a null
    * reading's time with an older reading's value and silently skew the
    * interpolation weight.)
    */
  def resampleLinear(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      stepSeconds: Long,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val stepUs = stepSeconds * 1000000L
    val k = keys.map(col)

    val readings = df
      // null-valued readings are absent observations: dropping them HERE
      // keeps (_t, _v) a pair from one physical reading — the window carry
      // below could otherwise pair a null reading's timestamp with an older
      // reading's value
      .where(col(valueCol).isNotNull)
      .select(
        k :+ unix_micros(col(tsCol)).as("_t") :+
          col(valueCol).cast("double").as("_v") :+
          lit(0L).as("_is_grid") :+
          // tiebreak collapses to ONE deterministic bigint so the union'd
          // grid rows need only a constant in this slot
          tieBreak(df, tieBreakCols).as("_tb"): _*)

    // per-entity span -> grid instants; the agg is map-side combined and
    // its output is one row per entity, so the explode is span-bounded
    val grid = readings
      .groupBy(k: _*)
      .agg(min(col("_t")).as("_t0"), max(col("_t")).as("_t1"))
      // sequence() errors on start > stop — drop entities whose span
      // contains no grid instant. pmod (always non-negative) makes this
      // FLOOR alignment: `div` truncates toward zero, which for pre-1970
      // (negative-epoch) timestamps would shift the grid a step late and
      // drop valid instants; `t0 + pmod(-t0, step)` / `t1 - pmod(t1, step)`
      // are the smallest/largest step multiples ≥ t0 / ≤ t1 for any sign
      .where(expr(s"_t0 + pmod(-_t0, $stepUs) <= _t1 - pmod(_t1, $stepUs)"))
      .select(
        k :+ explode(sequence(
          expr(s"_t0 + pmod(-_t0, $stepUs)"),
          expr(s"_t1 - pmod(_t1, $stepUs)"),
          lit(stepUs))).as("_t") :+
          lit(null).cast("double").as("_v") :+
          lit(1L).as("_is_grid") :+
          lit(0L).as("_tb"): _*)

    // Readings order BEFORE the coincident grid instant (_is_grid asc) in
    // BOTH directions, so an exact-hit reading is inside the frame both as
    // "previous" (ascending pass) and as "next" (descending pass) — a
    // current-row..unboundedFollowing frame on the ascending order would
    // miss it and drop grid instants that land on an entity's last reading.
    // Both windows hash-partition on the same key: ONE Exchange, two sorts.
    val wPrev = Window.partitionBy(k: _*)
      .orderBy(col("_t").asc, col("_is_grid").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(k: _*)
      .orderBy(col("_t").desc, col("_is_grid").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val reading = col("_is_grid") === 0L
    readings.unionByName(grid)
      .withColumn("_pt", last(when(reading, col("_t")), ignoreNulls = true).over(wPrev))
      .withColumn("_pv", last(when(reading, col("_v")), ignoreNulls = true).over(wPrev))
      .withColumn("_nt", last(when(reading, col("_t")), ignoreNulls = true).over(wNext))
      .withColumn("_nv", last(when(reading, col("_v")), ignoreNulls = true).over(wNext))
      .where(col("_is_grid") === 1L && col("_pt").isNotNull && col("_nt").isNotNull)
      .select(
        k :+ col("_t").as("grid_ts_us") :+
          when(col("_nt") === col("_pt"), col("_pv"))
            .otherwise(col("_pv") + (col("_nv") - col("_pv")) *
              ((col("_t") - col("_pt")).cast("double") /
                (col("_nt") - col("_pt")).cast("double")))
            .as("value"): _*)
  }

  /** One deterministic bigint from the tiebreak columns. The common case (a
    * single INTEGRAL id) is the id itself — a true total order; anything
    * else (string UUID, timestamp id, multiple columns) folds through
    * xxhash64 (deterministic; total up to hash collisions) — a blind
    * `cast("long")` on a string UUID would yield NULL and make
    * duplicate-timestamp resolution silently nondeterministic; none means
    * the caller asserts timestamps are unique.
    */
  private def tieBreak(df: DataFrame, tieBreakCols: Seq[String]) = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    def integral(name: String) = df.schema(name).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    tieBreakCols match {
      case Nil                           => lit(0L)
      case Seq(one) if integral(one)     => col(one).cast("long")
      case many                          => xxhash64(many.map(col): _*)
    }
  }
}
