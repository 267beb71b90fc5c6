package graft.operators

import org.apache.spark.sql.DataFrame
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
}
