package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distribution statistics for discrete corpus signals — quantile
  * thresholds and quantile-bucket assignment (curriculum phases, length
  * buckets, quality tiers) WITHOUT a global sort.
  *
  * The naive formulation — `ntile(k) over (order by v)` — range-shuffles and
  * sorts the entire corpus, and an unpartitioned window funnels it through
  * ONE task. This operator exploits that curriculum signals are DISCRETE
  * with bounded cardinality (token counts, quantized scores, star ratings):
  *
  *  1. cell table: `groupBy(v).count` — map-side combined, the exchange
  *     carries |distinct v| rows, not the corpus;
  *  2. CDF: running sum over the CELL table (bounded by the value domain —
  *     e.g. ≤ max-doc-tokens rows at ANY corpus size — so the single-task
  *     window is a constant-size step, like a broadcast centroid table);
  *  3. thresholds: type-1 quantile `min{v : cdf(v) ≥ ⌈p·n⌉}` with the rank
  *     computed in pure integer arithmetic from RATIONAL probabilities
  *     (`(n·num + den − 1) div den`) — no float rounding at bucket edges;
  *  4. assignment: thresholds collapse to one array row, broadcast, and the
  *     bucket is a scan-side count of thresholds below the value — the
  *     corpus is never shuffled, sorted, or joined.
  *
  * For continuous signals, quantize first (e.g. the 2^-40 binary grid used
  * across graft) — thresholds are then exact quantiles of the quantized
  * value, with error bounded by the grid step.
  */
object Stats {

  /** Exact type-1 quantile thresholds of `valueCol` for rational
    * probabilities `probs` = (numerator, denominator) pairs. Returns one row
    * per prob: (q_num, q_den, rank, threshold) where rank = ⌈p·n⌉ and
    * threshold is the rank-th smallest value (counting duplicates).
    */
  def quantileThresholds(df: DataFrame, valueCol: String,
      probs: Seq[(Int, Int)]): DataFrame = {
    require(probs.nonEmpty, "need at least one probability")
    require(probs.forall { case (num, den) => num > 0 && num <= den },
      s"probabilities must be rationals in (0, 1], got $probs")
    val spark = df.sparkSession
    import spark.implicits._
    // null values are outside the distribution: excluded from cells AND n,
    // so ranks stay consistent with the CDF
    val clean = df.where(col(valueCol).isNotNull)
    val cells = clean.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("cnt"))
    // bounded-cardinality cell table: the unpartitioned window is a
    // constant-size step regardless of corpus size (see scaladoc)
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = cells.withColumn("cum", sum(col("cnt")).over(w))
    val total = clean.agg(count(lit(1)).as("_n"))
    val ranks = probs.toDF("q_num", "q_den")
      .crossJoin(broadcast(total))
      .select(col("q_num"), col("q_den"),
        expr("(_n * q_num + q_den - 1) div q_den").as("rank"))
    cdf.join(broadcast(ranks), col("cum") >= col("rank"))
      .groupBy(col("q_num"), col("q_den"), col("rank"))
      .agg(min(col("v")).as("threshold"))
  }

  /** Adds `bucketCol` = number of quantile thresholds strictly below the
    * value (0 = lowest bucket). Thresholds collapse to a one-row array and
    * broadcast; the bucket is a pure scan-side expression — zero corpus
    * shuffle (spec-asserted).
    */
  def assignQuantileBucket(df: DataFrame, valueCol: String,
      thresholds: DataFrame, bucketCol: String = "bucket"): DataFrame = {
    val thrArr = thresholds
      .agg(sort_array(collect_list(col("threshold"))).as("_thr"))
    df.crossJoin(broadcast(thrArr))
      .withColumn(bucketCol,
        size(filter(col("_thr"), t => col(valueCol) > t)).cast("long"))
      .drop("_thr")
  }
}
