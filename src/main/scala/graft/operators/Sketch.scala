package graft.operators

import graft.plans.HashExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable mergeable cardinality sketch (HyperLogLog registers over
  * the [[graft.plans.FnvMix]] hash family).
  *
  * Why next to Spark's built-in `hll_sketch_agg`: the built-in sketch's
  * binary format and estimator are engine-specific, so a query using it can
  * only ever get a rows-only correctness check. This sketch keeps the
  * registers as plain rows — `(group..., bucket, reg)` — and the estimator as
  * exact integer + IEEE-double arithmetic, so the whole pipeline (hash →
  * bucket → rank → max-register → estimate) is replayable digit-for-digit by
  * the DuckDB oracle. Same scale shape as any production HLL:
  *
  *  - one map-side-combined `max` aggregation builds the registers (the
  *    exchange carries at most groups×256 rows, never the corpus);
  *  - register tables merge with `max` ([[mergeRegisters]]) — the
  *    incremental/cross-day path: sketch each day, merge, estimate;
  *  - the estimator is a tiny second aggregation over groups×256 rows.
  *
  * Estimator maths, exact cross-engine: with register values M_b the raw HLL
  * harmonic sum Σ 2^(−M_b) is computed scaled by 2^57 so every term
  * 2^(57−M_b) is an exact integer (M_b ∈ [0, 57]); the sum runs in
  * decimal(38,0) (no double rounding, association-order-free), and the final
  * `α·m² / (S/2^57)` does one exact power-of-two division and one IEEE
  * division — bit-identical in any IEEE engine. No small/large-range
  * correction terms: those need `ln`, which is NOT bit-portable across libm
  * implementations, so this estimator is the pure raw-HLL form (std error
  * ≈ 1.04/√256 ≈ 6.5 % — the spec asserts the achieved accuracy).
  *
  * Reference anchor: distinct-count measures in the semantic layer
  * (/root/reference/models/semantic/semantic_models.yml count_distinct
  * measures) — at 100 TB those become sketches.
  */
object Sketch {

  /** Precision bits: m = 2^P = 256 buckets, rank width W = 64 − P. */
  val P = 8
  val M: Int = 1 << P
  val W: Int = 64 - P

  /** HLL bias constant for m ≥ 128 (Flajolet et al. 2007). Computed once
    * here and embedded as a double literal in BOTH engines' plans, so
    * nobody re-derives it with possibly different operation order.
    */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

  /** `α·m²` — the estimator numerator, one shared literal. */
  val Numer: Double = Alpha * M * M

  /** `2^(W+1)` as an exact double (power of two). */
  val Scale: Double = math.pow(2.0, (W + 1).toDouble)

  private val ScaleLong: Long = 1L << (W + 1) // 2^57 fits a signed long

  /** HLL registers for `value` per `groupCols`: one row per (group, bucket)
    * with `reg` = max rank observed. Bucket = top P hash bits; rank ρ = 1 +
    * leading zeros of the remaining W bits (W+1 when they are all zero).
    * Absent buckets mean register 0 — the estimator accounts for them, so
    * the table stays sparse (at most groups×256 rows).
    */
  def registers(df: DataFrame, groupCols: Seq[String], value: Column,
      seed: Long): DataFrame = {
    val (bucket, rho) = bucketRho(value, seed)
    // null values do not count toward cardinality (count_distinct semantics)
    df.where(value.isNotNull).select(
        groupCols.map(col) :+ bucket.as("bucket") :+ rho.as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").as("reg"))
  }

  /** The (bucket, rank) pair for one value — the scan-side core of
    * [[registers]], exposed so callers fusing the sketch into a wider
    * single-pass aggregation (e.g. [[TableStats.profile]]) compute the
    * identical registers without a second scan.
    */
  def bucketRho(value: Column, seed: Long): (Column, Column) = {
    val h = HashExpressions.fnvMix(value.cast("string"), seed)
    val rem = shiftleft(h, P) // low W bits moved to the top; 0 iff all zero
    val rho = when(rem === 0L, lit(W + 1))
      .otherwise(HashExpressions.clz64(rem) + lit(1))
    (shiftrightunsigned(h, W), rho)
  }

  /** Merge two register tables (same groupCols): max per (group, bucket).
    * Associative + commutative + idempotent — the mergeability that makes
    * sketches the 100 TB distinct-count path (per-day sketches roll up to
    * any date range without touching raw data).
    */
  def mergeRegisters(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("reg").as("reg"))

  // ---- count-min: the FREQUENCY member of the sketch family ----------
  //
  // Same design rules as the HLL registers: counters are plain rows
  // `(group..., r, bucket, cnt)` over the FnvMix hash family, so the whole
  // pipeline is replayable digit-for-digit by the oracle; the exchange
  // carries at most groups × depth × width rows (never the item stream —
  // map-side combine collapses hot cells first); counter tables MERGE by
  // summing cnt per cell (the incremental/cross-day path); and because
  // counting is associative-commutative, a STREAMING complete-mode
  // groupBy-count over the same projection produces the identical table —
  // the q_stream_cm gate runs this exact function on a bounded stream.
  // Estimates are min over depth cells — always an OVERestimate of the
  // true count (cells only ever gain), which the spec pins.

  /** Count-min counters for `value` per `groupCols`: `depth` rows per item
    * (one per hash-family member), bucket_r = fnv_mix(value, seed+r) mod
    * width. `width` must be a power of two so Spark's signed `pmod` and
    * the oracle's unsigned `%` agree bit-for-bit (low log2(w) bits).
    */
  def countMinCounters(df: DataFrame, groupCols: Seq[String], value: Column,
      depth: Int, width: Int, seed: Long): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    val buckets = array((0 until depth).map(r =>
      pmod(HashExpressions.fnvMix(value.cast("string"), seed + r),
        lit(width.toLong))): _*)
    df.where(value.isNotNull)
      .select(groupCols.map(col) :+ posexplode(buckets).as(Seq("r", "bucket")): _*)
      .groupBy((groupCols :+ "r" :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two counter tables (same geometry): sum per (group, r, bucket). */
  def countMinMerge(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "r" :+ "bucket").map(col): _*)
      .agg(sum("cnt").as("cnt"))

  /** Point estimates for `probes` (a frame bearing `probeCol`, plus
    * `groupCols` when the counters are grouped): min over the depth cells,
    * absent cells counting 0. The counter table is groups × depth × width
    * rows — broadcast it; the probe side never shuffles.
    *
    * Output grain is DISTINCT (group, probe): duplicate probe rows collapse
    * (an estimate is a property of the value, not the row), and null probes
    * are dropped explicitly — mirroring [[countMinCounters]]' isNotNull on
    * the ingest side, and making the otherwise-silent posexplode-of-null
    * row loss an documented contract instead of a surprise.
    */
  def countMinEstimate(counters: DataFrame, probes: DataFrame,
      groupCols: Seq[String], probeCol: String,
      depth: Int, width: Int, seed: Long): DataFrame = {
    val buckets = array((0 until depth).map(r =>
      pmod(HashExpressions.fnvMix(col(probeCol).cast("string"), seed + r),
        lit(width.toLong))): _*)
    probes
      .where(col(probeCol).isNotNull)
      .select((groupCols :+ probeCol).map(col) :+
        posexplode(buckets).as(Seq("r", "bucket")): _*)
      .join(broadcast(counters), groupCols :+ "r" :+ "bucket", "left")
      .groupBy((groupCols :+ probeCol).map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Equi-join size estimate from two (ungrouped) count-min counter tables
    * built with the SAME (depth, width, seed): for each hash row r the
    * bucket-wise inner product Σ_b a_r[b]·b_r[b] over-estimates the true
    * frequency inner product Σ_k fA(k)·fB(k) — which IS the row count of
    * the equi-join A ⋈ B on k — and the estimate is the min over the depth
    * rows (Cormode & Muthukrishnan 2005, §4.2). Collisions only ever ADD
    * mass, so est ≥ true always.
    *
    * The 100 TB story: counter tables are depth×width rows however large
    * the inputs, they build in each side's single map-side-combined pass,
    * and the estimate itself is a join of two sketch tables — a planner can
    * size (and decide to salt, broadcast, or refuse) a petabyte join for
    * the price of two scans it was going to do anyway. Requiring the same
    * seed on both sides is what makes bucket ids comparable.
    */
  def countMinJoinSize(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("r"), col("bucket"), col("cnt").as("_cnt_a"))
      .join(b.select(col("r"), col("bucket"), col("cnt").as("_cnt_b")),
        Seq("r", "bucket"))
      .groupBy(col("r"))
      .agg(sum(col("_cnt_a") * col("_cnt_b")).as("ip"))
      .agg(min(col("ip")).as("est_pairs"))

  // ---- log-bucketed histogram: the QUANTILE member of the sketch family --
  //
  // HdrHistogram-style bucketing (Tene's HdrHistogram; also the shape of
  // Prometheus native histograms) over NON-NEGATIVE integer measures
  // (lengths, token counts, latencies, byte sizes): bucket index derives
  // from the value's binary exponent plus `SubBits` sub-bucket bits — pure
  // integer shifts, no log(), so the whole pipeline (bucket → count →
  // cumulate → rank-select → representative) replays digit-for-digit in the
  // DuckDB oracle. Same design rules as the HLL registers and count-min
  // counters:
  //
  //  - one map-side-combined count builds the histogram; the exchange
  //    carries at most groups × ~976 rows (buckets for the full int64
  //    range), never the measure stream;
  //  - histograms MERGE by summing cnt per (group, bucket)
  //    ([[mergeHistograms]]) — per-day histograms roll up to any date range
  //    without touching raw data, the property exact percentile_disc never
  //    has;
  //  - quantile estimates are EXACT-integer rank selection over the
  //    cumulated buckets, answering with the bucket's lower bound — a
  //    deterministic under-estimate with relative error < 2^-SubBits
  //    (6.25 % at SubBits=4), which the spec pins against exact order
  //    statistics;
  //  - a streaming complete-mode groupBy-count over the same projection
  //    produces the identical table (counting is associative-commutative) —
  //    the q_stream_hist gate runs this exact function on a bounded stream.

  /** Sub-bucket resolution bits: relative error < 2^-4 = 6.25 %. */
  val SubBits = 4
  private val Sub: Long = 1L << SubBits // 16 sub-buckets per octave

  /** Bucket index for a non-negative long `v`: identity below 2^SubBits,
    * then `(e - SubBits) * 2^SubBits + (v >> (e - SubBits))` where
    * `e = 63 - clz64(v)` — continuous at every octave boundary, ≤ 976
    * distinct buckets over the whole non-negative int64 range.
    */
  def histBucket(v: Column): Column = {
    val e = lit(63) - HashExpressions.clz64(v)
    when(v < lit(Sub), v).otherwise(
      (e - lit(SubBits)).cast("long") * lit(Sub) +
        call_function("shiftrightunsigned", v, e - lit(SubBits)))
  }

  /** Lower bound (the quantile representative) of bucket `id` — the exact
    * integer inverse of [[histBucket]]: every value in the bucket is ≥ lb
    * and < lb · (1 + 2^-SubBits), so rank-selection answers from lb with
    * bounded relative error.
    */
  def histLowerBound(id: Column): Column =
    when(id < lit(2L * Sub), id).otherwise(
      call_function("shiftleft",
        lit(Sub) + pmod(id, lit(Sub)),
        (call_function("shiftrightunsigned", id, lit(SubBits)) - lit(1))
          .cast("int")))

  /** Histogram of `value` per `groupCols`: one row per (group, bucket) with
    * `cnt`. Nulls and negative values are dropped explicitly (the bucket
    * map is defined on non-negative measures only) — callers quantiling a
    * column that may go negative must shift it into range first; silent
    * clamping would corrupt the tails.
    */
  def logHistogram(df: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame = {
    val v = value.cast("long")
    df.where(v.isNotNull && v >= 0)
      .select(groupCols.map(col) :+ histBucket(v).as("bucket"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two histograms (same groupCols): sum per (group, bucket). */
  def mergeHistograms(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(sum("cnt").as("cnt"))

  /** Quantile estimates from a histogram: for each `(label, num, den)`
    * target (e.g. ("p90", 9, 10)), the lower bound of the first bucket
    * whose cumulative count reaches rank `ceil(N · num / den)` — the
    * integer-exact rank-select both engines compute identically. Output is
    * long-format `(group..., q_label, approx_value)`.
    *
    * The window cumulation runs over the histogram table (≤ ~976 rows per
    * group), never the raw measures.
    */
  def histQuantiles(hist: DataFrame, groupCols: Seq[String],
      quantiles: Seq[(String, Int, Int)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile target")
    require(quantiles.forall { case (_, n, d) => n > 0 && n <= d },
      s"quantile targets must satisfy 0 < num <= den, got $quantiles")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("bucket"))
    val cum = hist
      .withColumn("_cum", sum(col("cnt")).over(w))
      .withColumn("_n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)))
    val targets = explode(array(quantiles.map { case (label, n, d) =>
      struct(lit(label).as("q_label"), lit(n.toLong).as("_qn"),
        lit(d.toLong).as("_qd"))
    }: _*)).as("_t")
    cum.select((groupCols.map(col) :+ col("bucket") :+ col("_cum") :+
        col("_n") :+ targets): _*)
      // cum ≥ ceil(N·num/den) ⇔ cum·den ≥ N·num — integer cross-multiply,
      // no division anywhere in the estimator
      .where(col("_cum") * col("_t._qd") >= col("_n") * col("_t._qn"))
      .select(groupCols.map(col) :+ col("bucket") :+
        col("_t.q_label").as("q_label"): _*)
      .groupBy((groupCols :+ "q_label").map(col): _*)
      .agg(min(col("bucket")).as("_b"))
      .select(groupCols.map(col) :+ col("q_label") :+
        histLowerBound(col("_b")).as("approx_value"): _*)
  }

  /** Raw-HLL estimate per group from a register table. */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val sTotal = col("_s_present") +
      (lit(M.toLong) - col("_n_buckets")).cast("decimal(20,0)") *
        lit(ScaleLong).cast("decimal(20,0)")
    regs.groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr(s"shiftleft(cast(1 as bigint), cast(${W + 1} - reg as int))")
          .cast("decimal(20,0)")).as("_s_present"),
        count(lit(1)).as("_n_buckets"))
      .select(
        groupCols.map(col) :+
          (lit(Numer) / (sTotal.cast("double") / lit(Scale)))
            .as("approx_distinct") :+
          col("_n_buckets").as("n_buckets_used"): _*)
  }
}
