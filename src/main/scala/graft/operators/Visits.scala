package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's flagship visit pipeline (models/marts/fact_visits.sql) as
  * generic operators: two-stage sessionization over [start, stop] attempt
  * intervals with retroactive identity inference and a per-row dynamic gap.
  *
  *  - Step 1 ([[inferTags]], fact_visits.sql:58): chain attempts on the same
  *    physical entity (charger, port) that start within `chainGapSeconds` of
  *    the previous attempt's STOP and don't carry conflicting tags; fill the
  *    tag from any member of the chain — an anonymous attempt immediately
  *    followed by an authenticated one inherits its identity.
  *  - Step 2 ([[sessionizeVisits]], fact_visits.sql:154): dynamic-gap
  *    sessionization — authenticated attempts group by (location, tag) with
  *    a long gap (reference: 30 min), anonymous ones by (location, entity)
  *    with a short gap (2 min). The gap is measured from the previous
  *    attempt's STOP to the current attempt's START.
  *  - [[visitMetrics]] (fact_visits.sql:252): per-visit rollup.
  *
  * The reference assigns rows to groups by self-joining attempts onto
  * boundary rows (`attempts_grouping`: O(n·visits) per key); both stages
  * here are single-shuffle window passes with running-sum group ids — O(n)
  * per partition, no self-join, which is what survives 100 TB. Gaps compare
  * microsecond epochs (strictly greater), i.e. second-precision semantics
  * rather than the reference's minute-boundary-crossing `datediff`; on
  * whole-minute data (all reference unit tests) the two agree.
  */
object Visits {

  /** Retroactive identity inference. Adds `chain_seq` (per entity) and
    * replaces `tagCol` with the chain-filled value (max over the chain).
    * A new chain starts when there is no previous attempt, the gap from the
    * previous attempt's stop exceeds `chainGapSeconds`, or both rows carry
    * tags that differ (fact_visits.sql:89-96).
    */
  def inferTags(
      df: DataFrame,
      entityKeys: Seq[String],
      startCol: String,
      stopCol: String,
      tagCol: String,
      chainGapSeconds: Long,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(entityKeys.map(col): _*)
      .orderBy((startCol +: tieBreakCols).map(col): _*)
    val prevStop = lag(col(stopCol), 1).over(w)
    val prevTag = lag(col(tagCol), 1).over(w)
    val isChainStart = prevStop.isNull ||
      (unix_micros(col(startCol)) - unix_micros(prevStop)) > chainGapSeconds * 1000000L ||
      (col(tagCol).isNotNull && prevTag.isNotNull && col(tagCol) =!= prevTag)
    val chainW = Window.partitionBy((entityKeys.map(col) :+ col("chain_seq")): _*)
    df.withColumn("_chain_start", isChainStart.cast("long"))
      .withColumn("chain_seq",
        sum(col("_chain_start")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_chain_start")
      .withColumn(tagCol, max(col(tagCol)).over(chainW))
  }

  /** Dynamic-gap sessionization into visits. Adds `grouping_key` (location +
    * tag for authenticated rows, location + entity for anonymous ones),
    * `is_visit_start`, and `visit_seq` (1-based per grouping_key). A new
    * visit starts when the gap from the previous attempt's STOP to this
    * attempt's START strictly exceeds the row's window (`authGapSeconds`
    * when `tagCol` is set, `anonGapSeconds` otherwise) —
    * fact_visits.sql:154-210.
    */
  def sessionizeVisits(
      df: DataFrame,
      locationCol: String,
      entityKeys: Seq[String],
      startCol: String,
      stopCol: String,
      tagCol: String,
      authGapSeconds: Long = 1800L,
      anonGapSeconds: Long = 120L,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    // Control-char (\\u0001) separator + A/U discriminator: authenticated and anonymous key
    // spaces must not collide even when ids contain the separator character
    // (the reference's `location || '_' || tag` concat collides for ids
    // containing '_'; "L1"+"7_1" vs "L1_7"+"1")
    // Null-PROPAGATING concat (not concat_ws, which silently drops null
    // elements and manufactures collisions): a null component yields a null
    // key, and window partitioning groups all null keys together -- the
    // same behavior the reference's SQL `||` + PARTITION BY produces.
    val sep = "\u0001"
    def key(parts: Seq[Column]): Column =
      concat(parts.flatMap(p => Seq(lit(sep), p)).tail: _*)
    val keyed = df
      .withColumn("grouping_key",
        when(col(tagCol).isNotNull,
          key(Seq(lit("A"), col(locationCol), col(tagCol))))
          .otherwise(key(lit("U") +: col(locationCol) +: entityKeys.map(col))))
      .withColumn("_window_us",
        when(col(tagCol).isNotNull, lit(authGapSeconds * 1000000L))
          .otherwise(lit(anonGapSeconds * 1000000L)))
    val w = Window.partitionBy(col("grouping_key"))
      .orderBy((startCol +: tieBreakCols).map(col): _*)
    val prevStop = lag(col(stopCol), 1).over(w)
    val isStart = prevStop.isNull ||
      (unix_micros(col(startCol)) - unix_micros(prevStop)) > col("_window_us")
    keyed
      .withColumn("is_visit_start", isStart)
      .withColumn("visit_seq",
        sum(col("is_visit_start").cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_window_us")
  }

  /** Per-visit rollup over the output of [[sessionizeVisits]]: visit
    * start/end, attempt count, plus caller aggregates (use
    * `min_by`/`max_by(col, startCol)` for first/last-attempt attributes —
    * fact_visits.sql:252-276). One groupBy on (grouping_key, visit_seq).
    */
  def visitMetrics(
      sessionized: DataFrame,
      startCol: String,
      stopCol: String,
      extraAggs: Seq[Column] = Nil): DataFrame = {
    val aggs = Seq(
      min(col(startCol)).as("visit_start_ts"),
      max(col(stopCol)).as("visit_end_ts"),
      count(lit(1)).as("charge_attempt_count")) ++ extraAggs
    sessionized
      .groupBy(col("grouping_key"), col("visit_seq"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The full pipeline with the reference's default gaps: infer tags on the
    * entity (2-minute chains), then dynamic-gap sessionize (30 min
    * authenticated / 2 min anonymous), then roll up. `extraAggs` is applied
    * by [[visitMetrics]].
    */
  def visits(
      df: DataFrame,
      locationCol: String,
      entityKeys: Seq[String],
      startCol: String,
      stopCol: String,
      tagCol: String,
      authGapSeconds: Long = 1800L,
      anonGapSeconds: Long = 120L,
      chainGapSeconds: Long = 120L,
      tieBreakCols: Seq[String] = Nil,
      extraAggs: Seq[Column] = Nil): DataFrame = {
    val inferred = inferTags(df, entityKeys, startCol, stopCol, tagCol, chainGapSeconds, tieBreakCols)
    val sessions = sessionizeVisits(
      inferred, locationCol, entityKeys, startCol, stopCol, tagCol,
      authGapSeconds, anonGapSeconds, tieBreakCols)
    visitMetrics(sessions, startCol, stopCol,
      Seq(
        max(col(tagCol)).as(tagCol),
        max(col(locationCol)).as(locationCol)) ++ extraAggs)
  }
}
