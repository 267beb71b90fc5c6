package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus snapshots — the
  * training-data monitoring operator (the PSI / population-stability /
  * two-sample chi-square family every production data pipeline runs when a
  * new crawl, a new ingest window or a re-filtered corpus replaces the one
  * a model was trained on): bucket both snapshots on the same key, compare
  * the per-bucket shares, and flag buckets whose share moved.
  *
  * The per-bucket statistic is the two-sample chi-square contribution
  *
  *   chi2_b = (n_base·T_new − n_new·T_base)² / ((n_base+n_new)·T_base·T_new)
  *
  * — algebraically T_base·T_new/(T_base+T_new) · (p_b − q_b)²/(p̂_b) with
  * p̂ the pooled share, i.e. the classic Pearson two-sample statistic; the
  * total over buckets is χ²-distributed with (buckets−1) dof under
  * no-drift. Chosen over PSI's Σ(p−q)ln(p/q) because it needs NO
  * transcendental: every FACTOR is an exact int64 count cast to double
  * (exact below 2^53 ≈ 9e15 rows — any realistic snapshot), and the
  * multiplies/subtracts/divide are IEEE round-to-nearest, identical in
  * every engine — so the emitted `chi2_q20 = ⌊chi2 · 2²⁰⌋` longs
  * hash-match an external SQL replay exactly, and a consumer's SUM over
  * them is order-free (the NgramLM quantized-sum device). (Factors cast
  * BEFORE multiplying: int64 products like n·T_base·T_new overflow
  * already at ~1e7-row snapshots.)
  *
  * Scale shape: each snapshot is scanned ONCE into a map-side-combined
  * groupBy on the bucket key (bounded cardinality — the caller's bucketing
  * contract), the two bucket tables full-outer join on the key (bucket-
  * sized, not corpus-sized), and the totals ride along as one-row
  * broadcast crossJoins. Nothing corpus-sized ever shuffles.
  */
object Drift {

  /** Per-bucket drift table: `keyCols` ++ (n_base, n_new, chi2_q20).
    * `base` and `next` must both carry the bucket-key columns named in
    * `keyCols`; buckets absent from one snapshot count 0 there (their
    * contribution is the share that appeared/vanished — the strongest
    * drift signal, kept, not dropped).
    */
  def driftTable(base: DataFrame, next: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one bucket-key column")
    val kc = keyCols.map(col)
    val b = base.groupBy(kc: _*).agg(count(lit(1)).as("n_base"))
    val n = next.groupBy(kc: _*).agg(count(lit(1)).as("n_new"))
    val tb = base.agg(count(lit(1)).as("_tb"))
    val tn = next.agg(count(lit(1)).as("_tn"))
    val joined = b.join(n, keyCols, "full_outer")
      .na.fill(0L, Seq("n_base", "n_new"))
      .crossJoin(broadcast(tb))
      .crossJoin(broadcast(tn))
    // each FACTOR casts to double before multiplying (counts ≤ ~9e15 cast
    // exactly; int64 products like n·T_b·T_n overflow already at ~1e7-row
    // snapshots — hit at sf10); double multiplies/subtracts are IEEE
    // round-to-nearest, identical in every engine
    def d(c: Column) = c.cast("double")
    val num = d(col("n_base")) * d(col("_tn")) - d(col("n_new")) * d(col("_tb"))
    val den = (d(col("n_base")) + d(col("n_new"))) * d(col("_tb")) * d(col("_tn"))
    // saturation bound: chi2 ≤ pooled count, so chi2·2²⁰ can exceed int64
    // at multi-trillion-row snapshots (~8.8e12 pooled rows) — where Spark's
    // floor(double)→long wraps and DuckDB's CAST errors, the two engines
    // diverging instead of failing loudly. Clamp BOTH sides at 2⁶² (exactly
    // double-representable, unlike Long.MaxValue): a saturated bucket still
    // reads as "maximal drift", and the replay stays hash-exact.
    val sat = lit(4.611686018427387904e18) // 2^62
    joined
      .withColumn("chi2_q20",
        when(col("_tb") === 0L || col("_tn") === 0L, lit(0L))
          .otherwise(floor(least(num * num / den * lit(1048576.0), sat))
            .cast("long")))
      .select(kc ++ Seq(col("n_base"), col("n_new"), col("chi2_q20")): _*)
  }
}
