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
      // null-guarded: `filter` drops elements whose comparison is null, so
      // a null signal would otherwise land silently in bucket 0 — a null
      // value is OUTSIDE the distribution (quantileThresholds excludes it
      // from the CDF) and gets a null bucket
      .withColumn(bucketCol,
        when(col(valueCol).isNotNull,
          size(filter(col("_thr"), t => col(valueCol) > t)).cast("long")))
      .drop("_thr")
  }

  /** Rolling z-score anomaly detection per entity — telemetry monitoring
    * ("this meter reading is 3σ off this charger's recent behavior").
    * Each row is scored against the trailing `lookback` observations of its
    * own entity (the current row excluded): z = (x − μ)/σ, flagged past
    * `zThreshold`. Rows without a full lookback window get a null score —
    * an entity's first readings are never judged against noise.
    *
    * Engine-exact variance without a second pass: values are quantized to
    * the 2^-10 binary grid, so the frame's Σx and Σx² are sums of ≤
    * lookback exact doubles (k/2^10 and k²/2^20 — integers scaled by powers
    * of two, exact for |x| < ~2^21) — NO rounding in any accumulation
    * order; μ, σ², z then take the same three IEEE ops in both engines.
    * `σ² = Σx²/n − μ²` can round to a tiny negative near zero variance —
    * guarded to null (constant signals have no z-score).
    *
    * Scale shape: one window shuffle on the high-cardinality entity key;
    * the frame is O(lookback) per row. (`orderCols` must totally order each
    * entity's rows — include a tiebreaker.)
    *
    * Null semantics: a null reading contributes nothing to any window
    * (count/sum skip nulls) but still OCCUPIES a positional frame slot, so
    * its `lookback` successors see a short window and score null — the
    * conservative outcome (never a value computed from a shifted window);
    * the null row itself scores null. Drop null readings upstream if
    * position-exact windows over sparse signals are required.
    */
  def rollingAnomaly(
      df: DataFrame,
      keys: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column],
      valueCol: String,
      lookback: Int = 6,
      zThreshold: Double = 3.0): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2, got $lookback")
    require(zThreshold > 0, s"zThreshold must be positive, got $zThreshold")
    val Q = 1024.0 // 2^10
    val q = floor(col(valueCol).cast("double") * lit(Q)) / lit(Q)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(-lookback, -1)
    val cnt = count(col("_q")).over(w)
    val mean = sum(col("_q")).over(w) / cnt.cast("double")
    val variance = sum(col("_q") * col("_q")).over(w) / cnt.cast("double") -
      mean * mean
    df.withColumn("_q", q)
      .withColumn("_z",
        when(cnt === lookback && variance > 0,
          (col("_q") - mean) / sqrt(variance)))
      .withColumn("z_score", col("_z"))
      .withColumn("is_anomaly",
        when(col("_z").isNotNull && abs(col("_z")) > zThreshold, 1L)
          .otherwise(0L))
      .drop("_q", "_z")
  }
}
