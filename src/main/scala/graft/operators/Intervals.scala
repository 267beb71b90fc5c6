package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval/temporal operators: gaps-and-islands merging, concurrent-interval
  * sweeps, interval→day allocation, date spines, fixed time buckets,
  * heartbeat-gap detection.
  *
  * These re-express the reference's outage/uptime pipeline
  * (models/intermediate/outages/int_faulted_outages.sql,
  * int_offline_outages.sql, models/marts/fact_downtime_daily.sql,
  * fact_charger_commissioned_daily.sql, dim_dates.sql) with scale-safe plans:
  * window running sums instead of time-point self-joins, bounded
  * `sequence()` explodes instead of calendar cross joins.
  */
object Intervals {

  /** Merge overlapping/adjacent [from,to] intervals per key
    * (gaps-and-islands). Reference: int_faulted_outages.sql:140 (lag(to_ts) +
    * running group id). Single shuffle on the key; linear per partition.
    * Intervals touching (prev_to >= from) are merged.
    */
  def mergeIntervals(df: DataFrame, keys: Seq[String], fromCol: String, toCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(fromCol), col(toCol))
    val prevMaxTo = max(col(toCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val grouped = df
      .withColumn("_new_island", when(prevMaxTo.isNull || prevMaxTo < col(fromCol), 1L).otherwise(0L))
      .withColumn("_island",
        sum(col("_new_island")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grouped
      .groupBy((keys.map(col) :+ col("_island")): _*)
      .agg(min(col(fromCol)).as(fromCol), max(col(toCol)).as(toCol))
      .drop("_island")
  }

  /** Elementary-segment sweep: for each key, split time at every interval
    * boundary and count how many input intervals cover each segment.
    * Output: key cols, segment_start, segment_end, active_count (count of
    * intervals covering [segment_start, segment_end)).
    *
    * Reference int_faulted_outages.sql:90 builds elementary segments with a
    * time-point self-join + per-segment overlap join (O(n²) per key). Here:
    * +1/−1 boundary events and a running sum — O(n log n), one shuffle.
    */
  def sweepActiveCount(df: DataFrame, keys: Seq[String], fromCol: String, toCol: String): DataFrame = {
    val k = keys.map(col)
    // explode, not union: a union of two projections of the same child plans
    // as TWO full computations of the child subtree (ReuseExchange only
    // dedupes identical exchanges) — one row → two boundary events keeps the
    // input single-pass however expensive its lineage is
    // one shuffle total: hash on the key alone, which satisfies BOTH the
    // (key, _pt) aggregation's clustering and the running-sum window's —
    // the boundary dedup and the sweep share the partitioning
    val points = df
      .select(k :+ explode(array(
        struct(col(fromCol).as("_pt"), lit(1L).as("_delta")),
        struct(col(toCol).as("_pt"), lit(-1L).as("_delta")))).as("_e"): _*)
      .select(k :+ col("_e._pt").as("_pt") :+ col("_e._delta").as("_delta"): _*)
      .repartition(k: _*)
      .groupBy(k :+ col("_pt"): _*).agg(sum(col("_delta")).as("_delta"))
    val w = Window.partitionBy(k: _*).orderBy(col("_pt"))
    points
      .withColumn("active_count",
        sum(col("_delta")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("segment_end", lead(col("_pt"), 1).over(w))
      .filter(col("segment_end").isNotNull)
      .select(k ++ Seq(col("_pt").as("segment_start"), col("segment_end"), col("active_count")): _*)
  }

  /** Allocate [from,to] intervals onto calendar days: one output row per
    * (input row, day touched) with the clipped overlap in minutes (exact,
    * microsecond arithmetic). Reference fact_downtime_daily.sql:95 joins
    * against the full dim_dates calendar; here the explode is bounded by the
    * interval's own span, so a 1000-executor run never materializes
    * calendar × entities.
    */
  def allocateToDays(df: DataFrame, fromCol: String, toCol: String): DataFrame = {
    df.filter(col(toCol) >= col(fromCol)) // inverted intervals would make sequence() throw
      .withColumn("date_id",
        explode(sequence(
          to_date(col(fromCol)),
          to_date(col(toCol)),
          expr("interval 1 day"))))
      .withColumn("_day_start", col("date_id").cast("timestamp"))
      .withColumn("_day_end", (col("date_id") + expr("interval 1 day")).cast("timestamp"))
      .withColumn("overlap_us",
        unix_micros(least(col(toCol), col("_day_end"))) -
          unix_micros(greatest(col(fromCol), col("_day_start"))))
      .filter(col("overlap_us") > 0)
      .withColumn("overlap_minutes", col("overlap_us") / lit(60000000.0))
      .drop("_day_start", "_day_end")
  }

  /** Allocate [from,to] intervals onto fixed-width epoch-aligned buckets
    * (e.g. 900 s for the reference's 15-minute interval data): one output
    * row per (input row, bucket touched) with the clipped overlap — the
    * generalization of [[allocateToDays]] and the dataflow behind
    * fact_interval_data.sql:165-190's partial first/last buckets (bucket
    * bounds clipped to the measurement bounds). The explode is bounded by
    * the interval's own span — never a bucket-spine cross join.
    */
  def allocateToBuckets(
      df: DataFrame,
      fromCol: String,
      toCol: String,
      widthSeconds: Long): DataFrame = {
    df.filter(col(toCol) >= col(fromCol))
      .withColumn("bucket_start",
        explode(sequence(
          timeBucket(col(fromCol), widthSeconds),
          timeBucket(col(toCol), widthSeconds),
          expr(s"interval $widthSeconds seconds"))))
      .withColumn("_bucket_end",
        col("bucket_start") + expr(s"interval $widthSeconds seconds"))
      .withColumn("clipped_start", greatest(col(fromCol), col("bucket_start")))
      .withColumn("clipped_end", least(col(toCol), col("_bucket_end")))
      .withColumn("overlap_us",
        unix_micros(col("clipped_end")) - unix_micros(col("clipped_start")))
      .filter(col("overlap_us") > 0)
      .drop("_bucket_end")
  }

  /** Calendar date dimension — reference dim_dates.sql:1 (dbt_utils
    * date_spine). Generated with `sequence` + `explode` (distributed, no
    * driver loop). `day_of_week`: 1=Sunday … 7=Saturday (Spark `dayofweek`).
    */
  def dateSpine(spark: SparkSession, startDate: String, endDate: String): DataFrame = {
    spark.range(1).select(
        explode(sequence(
          to_date(lit(startDate)),
          to_date(lit(endDate)),
          expr("interval 1 day"))).as("date_id"))
      .select(
        col("date_id"),
        year(col("date_id")).as("year"),
        month(col("date_id")).as("month"),
        dayofmonth(col("date_id")).as("day"),
        dayofweek(col("date_id")).as("day_of_week"),
        quarter(col("date_id")).as("quarter"),
        date_trunc("week", col("date_id")).cast("date").as("week_start_date"),
        date_trunc("month", col("date_id")).cast("date").as("month_start_date"),
        date_trunc("quarter", col("date_id")).cast("date").as("quarter_start_date"),
        date_trunc("year", col("date_id")).cast("date").as("year_start_date"))
  }

  /** Fixed-width time bucket start (epoch-aligned), e.g. 900 seconds for the
    * reference's 15-minute interval data (fact_interval_data.sql:170).
    */
  def timeBucket(ts: Column, widthSeconds: Long): Column =
    timestamp_seconds(
      floor(unix_micros(ts) / lit(widthSeconds * 1000000L)) * lit(widthSeconds))

  /** Heartbeat-gap detection: per key, gaps between consecutive events that
    * exceed `thresholdSeconds`, including the leading gap from
    * `monitorStart` and trailing gap to `monitorEnd` (both columns must be
    * present on every row, e.g. joined from an entity dim). Reference
    * int_offline_outages.sql:70. One shuffle; the union branches reuse the
    * same windowed scan.
    */
  def heartbeatGaps(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      monitorStartCol: String,
      monitorEndCol: String,
      thresholdSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val g = df
      .withColumn("_prev", lag(col(tsCol), 1).over(w))
      .withColumn("_next", lead(col(tsCol), 1).over(w))
    val k = keys.map(col)
    // every row emits its (up to two) candidate gaps through ONE explode —
    // a union of three filtered projections of `g` would plan the windowed
    // subtree three times (ReuseExchange only dedupes identical exchanges)
    val candidates = array(
      when(col("_prev").isNotNull,
        struct(col("_prev").as("from_ts"), col(tsCol).as("to_ts"))),
      when(col("_prev").isNull && col(tsCol) > col(monitorStartCol),
        struct(col(monitorStartCol).as("from_ts"), col(tsCol).as("to_ts"))),
      when(col("_next").isNull && col(tsCol) < col(monitorEndCol),
        struct(col(tsCol).as("from_ts"), col(monitorEndCol).as("to_ts"))))
    g.select(k :+ explode(candidates).as("_gap"): _*)
      .filter(col("_gap").isNotNull)
      .select(k :+ col("_gap.from_ts").as("from_ts") :+ col("_gap.to_ts").as("to_ts"): _*)
      .withColumn("gap_seconds",
        (unix_micros(col("to_ts")) - unix_micros(col("from_ts"))) / lit(1000000.0))
      .filter(col("gap_seconds") > thresholdSeconds)
  }

  /** Anti point-in-interval join: rows of `points` whose `ptCol` does NOT
    * fall inside any [fromCol, toCol) interval of `intervals` sharing the
    * key columns. Reference fact_downtime_daily.sql:47 uses this to drop
    * offline outages that began during an active faulted outage (the fault
    * explains the silence). Planned as an equi-key left_anti hash join with
    * the range predicate as a post-filter — never a cartesian.
    */
  def antiIntervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      ptCol: String,
      fromCol: String,
      toCol: String): DataFrame = {
    val iv = intervals.select((keys.map(col) :+ col(fromCol).as("_ivf") :+ col(toCol).as("_ivt")): _*)
    val cond = keys.map(k => points(k) === iv(k)).reduce(_ && _) &&
      points(ptCol) >= iv("_ivf") && points(ptCol) < iv("_ivt")
    points.join(iv, cond, "left_anti")
  }

  /** Full-window gaps for entities that emitted NO events at all — the
    * worst outage, invisible to [[heartbeatGaps]] because it only sees rows
    * that exist. Mirrors the reference's chargers_with_no_messages branch
    * (int_offline_outages.sql:118): anti-join the entity dim against the
    * observed event keys and emit one [monitorStart, monitorEnd] gap each.
    * Union the result with [[heartbeatGaps]] for complete outage coverage.
    */
  def silentEntityGaps(
      entityDim: DataFrame,
      events: DataFrame,
      keys: Seq[String],
      monitorStartCol: String,
      monitorEndCol: String): DataFrame = {
    entityDim
      .join(events.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .select(keys.map(col) :+ col(monitorStartCol).as("from_ts") :+ col(monitorEndCol).as("to_ts"): _*)
      .withColumn("gap_seconds",
        (unix_micros(col("to_ts")) - unix_micros(col("from_ts"))) / lit(1000000.0))
      .filter(col("gap_seconds") > 0)
  }
}
