package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey analytics over an event stream: funnels, cohort retention,
  * and transition matrices. The reference's product surface is session/visit
  * analytics over charge events (models/marts/fact_visits.sql,
  * models/semantic/semantic_models.yml:310-383 metrics); these are the three
  * standard journey rollups a BI user asks of the same event data.
  *
  * All three keep the scale shape "one shuffle on the entity key, bounded
  * state per key": funnels stack window passes over one Exchange, retention
  * aggregates to a per-user week set (bounded by the calendar, not the data),
  * transitions are a lag + map-side-combined count.
  */
object Behavioral {

  /** Ordered funnel progression per user: stage i is satisfied by the
    * EARLIEST event of `stages(i)` at-or-after the chosen stage-(i−1) event
    * (and within `maxGapSeconds` of it, when set). One output row per user:
    * `stage_<i>_ts` (null once the chain breaks) and `stages_completed`.
    * Users with no stage-1 event are kept with `stages_completed = 0` so
    * the caller can compute entry rates; filter them out for a pure funnel.
    *
    * Earliest-qualifying-event semantics make the result tie-independent:
    * `min(ts)` is a total choice even when several events share a timestamp.
    * Timestamps compare in microseconds (`unix_micros`) — exact and
    * engine-portable.
    *
    * Plan shape: the k dependent stage windows plus the one-row-per-user
    * `row_number` all partition by the user key, so Catalyst plans ONE
    * Exchange; each stage is an O(rows-per-user) pass with O(1) state.
    */
  def funnel(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      maxGapSeconds: Option[Long] = None,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(stages.size >= 2, s"a funnel needs >= 2 stages, got ${stages.size}")
    require(maxGapSeconds.forall(_ > 0), s"maxGapSeconds must be positive")
    val byUser = Window.partitionBy(col(userCol))
    val tsUs = unix_micros(col(tsCol))
    val staged = stages.zipWithIndex.foldLeft(df) { case (acc, (stage, i)) =>
      val hit =
        if (i == 0) col(typeCol) === stage
        else {
          val prevUs = unix_micros(col(s"stage_${i}_ts"))
          val inGap = maxGapSeconds
            .map(g => tsUs <= prevUs + g * 1000000L)
            .getOrElse(lit(true))
          col(typeCol) === stage && tsUs >= prevUs && inGap
        }
      acc.withColumn(s"stage_${i + 1}_ts", min(when(hit, col(tsCol))).over(byUser))
    }
    val oneRow = row_number().over(
      Window.partitionBy(col(userCol))
        .orderBy((tsCol +: tieBreakCols).map(col): _*))
    val stageCols = stages.indices.map(i => col(s"stage_${i + 1}_ts"))
    staged
      .withColumn("_rn", oneRow)
      .where(col("_rn") === 1)
      .select(
        col(userCol) +: stageCols :+
          stageCols.map(c => when(c.isNotNull, 1L).otherwise(0L))
            .reduce(_ + _).as("stages_completed"): _*)
  }

  /** Cohort retention: users bucketed by the week of their first event;
    * for each (cohort_week, week_offset) the number of cohort users active
    * that week. Weeks are `unix_micros div 604800000000` — pure integer
    * arithmetic, identical in any engine (no calendar/timezone semantics).
    *
    * ONE shuffle on the user key: `collect_set(week)` is map-side combined
    * and bounded by the calendar span (a 10-year stream is ≤ 522 weeks per
    * user), then the explode + regroup runs on cohort-grain rows — already
    * thousands of times smaller than the input.
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame =
    df.select(
        col(userCol).as("_u"),
        expr(s"unix_micros($tsCol) div 604800000000").as("_wk"))
      .groupBy("_u")
      .agg(min("_wk").as("cohort_week"), collect_set("_wk").as("_weeks"))
      .select(col("cohort_week"), explode(col("_weeks")).as("_w"))
      .groupBy(
        col("cohort_week"),
        (col("_w") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))

  /** First-order transition matrix over event types: for each observed
    * (prev_type, next_type) pair the count and the row-conditional
    * probability p = n / Σ_next n. The lag pass shuffles once on the user
    * key; the count is map-side combined to |types|² rows, so the
    * probability window runs on a table bounded by the type vocabulary.
    * p is one IEEE division of two exact integers — bit-portable.
    *
    * `tieBreakCols` must totally order each user's events or `lag` is
    * nondeterministic on timestamp ties.
    */
  def transitions(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    val ordered = Window.partitionBy(col(userCol))
      .orderBy((tsCol +: tieBreakCols).map(col): _*)
    df.withColumn("_prev", lag(col(typeCol), 1).over(ordered))
      .where(col("_prev").isNotNull && col(typeCol).isNotNull)
      .groupBy(col("_prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("prev_type"))).cast("double"))
  }
}
