package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-window event correlation (request ↔ response / as-of pick-first).
  *
  * Re-expresses the reference's request/confirmation matching
  * (models/intermediate/int_transactions.sql:88: join confirmations arriving
  * within 15 s of the request) as an equi-join on the entity key with the
  * time window as a post-filter, then `min_by` to keep the first match.
  * Because the join carries an equi-key it plans as a shuffled/broadcast
  * hash join — never a cartesian — so it survives arbitrarily many keys.
  */
object AsOf {

  /** For each left row, attach the first right row (by `rightTs`) with the
    * same key whose ts lies in (leftTs, leftTs + maxDelaySeconds].
    * `rightCols` are carried from the matched right row as `matched_<col>`;
    * unmatched left rows are kept with nulls (left outer semantics).
    * `leftId` must uniquely identify left rows.
    */
  def correlateFirstWithin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftId: String,
      leftTs: String,
      rightTs: String,
      maxDelaySeconds: Long,
      rightCols: Seq[String]): DataFrame = {
    val r = right.select((keys :+ rightTs).map(col) ++ rightCols.map(col): _*)
      .toDF((keys :+ "_r_ts") ++ rightCols.map("_r_" + _): _*)
    val cond = keys.map(k => left(k) === r(k)).reduce(_ && _) &&
      r("_r_ts") > left(leftTs) &&
      unix_micros(r("_r_ts")) <= unix_micros(left(leftTs)) + maxDelaySeconds * 1000000L
    val joined = left.join(r, cond, "left")
    val leftCols = left.columns
    val firstMatch = struct((col("_r_ts") +: rightCols.map(c => col("_r_" + c))): _*)
    // ordering key: (ts, carried cols) — deterministic tie-break; null when
    // unmatched so min_by skips those rows entirely
    val orderKey = when(col("_r_ts").isNotNull, firstMatch)
    val aggs = leftCols.filterNot(_ == leftId).toSeq.map(c => first(left(c)).as(c)) :+
      min_by(firstMatch, orderKey).as("_m")
    joined
      .groupBy(col(leftId))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        leftCols.map(col) ++
          Seq(col("_m._r_ts").as("matched_ts")) ++
          rightCols.map(c => col(s"_m._r_$c").as(s"matched_$c")): _*)
  }

  /** Backward as-of join: for each left row, the LATEST right row with the
    * same key whose ts is <= the left row's ts (the classic trade↔quote
    * as-of). Implemented as union + carry-forward window — NOT a range
    * join: tag both streams, sort each key's merged timeline once, and
    * `last(value, ignoreNulls)` carries the most recent right values onto
    * every left row. One shuffle on the key, linear per partition,
    * unbounded lookback for free — a range-join formulation needs a bounded
    * window and rescans candidates per row, and at 100 TB the merged-scan
    * form is the one that holds.
    *
    * Right values arrive as `asof_<col>` (null when no prior right row —
    * left outer semantics). At equal timestamps the right row wins (<=).
    * `rightTs` is also carried as `asof_ts`. When two RIGHT rows tie on
    * (key, ts), pass a unique right column in `rightTieBreakCols` to make
    * the pick deterministic (the row with the LARGEST tiebreak wins).
    */
  def asOfBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      rightTieBreakCols: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    // the whole right row is carried as ONE struct, so a null field in the
    // newest right row correctly overwrites an older non-null (per-column
    // last(ignoreNulls) would resurrect stale values)
    val rpack = struct(
      (col(rightTs).as("_asof_ts") +: valueCols.map(c => col(c))): _*)
    val rpackType = right.select(rpack.as("_rp")).schema("_rp").dataType
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_side"),
        struct(leftCols.map(col): _*).as("_lrow"),
        lit(null).cast(rpackType).as("_rp")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_side"),
        lit(null).cast(l.schema("_lrow").dataType).as("_lrow"),
        rpack.as("_rp")): _*)
    require(rightTieBreakCols.forall(valueCols.contains),
      "rightTieBreakCols must be a subset of valueCols (they order via the carried struct)")
    // right (_side=0) sorts before left (_side=1) at equal ts → <= semantics;
    // tied right rows are totally ordered by the tiebreak fields (null for
    // left rows, which sort first within their ts+side group — harmless,
    // every left row computes its own carry)
    val tieOrder = rightTieBreakCols.map(c => col("_rp").getField(c))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col("_ts") +: col("_side") +: tieOrder): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        leftCols.map(c => col(s"_lrow.$c").as(c)) ++
          (col("_asof._asof_ts").as("asof_ts") +:
            valueCols.map(c => col(s"_asof.$c").as(s"asof_$c"))): _*)
  }
}
