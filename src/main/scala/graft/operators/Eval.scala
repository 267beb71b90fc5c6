package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classifier evaluation at corpus scale: bucketed ROC-AUC plus
  * threshold confusion metrics, in two bounded aggregations.
  *
  * A quality/langid classifier gating a 100 TB corpus needs its
  * discrimination measured on the corpus itself (against rule labels, a
  * held-out set, or a larger teacher model). Exact AUC ranks every row —
  * an O(n log n) global sort; production AUC quantizes scores into a
  * BOUNDED bucket grid first (Spark MLlib's `numBins`, TFX calibration
  * plots do the same), making the rank statistic an aggregation over
  * ≤`buckets` rows. Semantics: Mann–Whitney AUC with average-rank tie
  * correction AT BUCKET GRAIN — ties inside a bucket count ½, exactly the
  * trapezoid ROC over the bucketed curve.
  *
  * Engine-exactness: counts are longs; average ranks are multiples of 0.5
  * below 2^52, so every product/sum of them is an EXACT double in any
  * IEEE engine regardless of association order — the one rounding step is
  * the final division. The only window is over the bucket table (bounded
  * by the quantization grid, never the data).
  */
object Eval {

  /** One-row metrics for a binary classifier: `bucket` is the quantized
    * score (any monotone bucketing — bounded grid), `label` the ground
    * truth, `predicted` the classifier's thresholded decision. Returns
    * (n_pos, n_neg, auc, tp, fp, fn, tn, precision, recall, f1); ratio
    * columns are null when their denominator is empty.
    */
  def binaryMetrics(df: DataFrame, bucket: Column, label: Column, predicted: Column): DataFrame = {
    val g = df
      .select(bucket.as("bucket"), label.as("label"), predicted.as("pred"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos"),
        sum(when(col("pred") && col("label"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("label"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("label"), 1L).otherwise(0L)).as("fn"))
    // bucket-grain window: bounded by the quantization grid, not the data
    val w = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, 0)
    val ranked = g.withColumn("cum_less", sum(col("cnt")).over(w) - col("cnt"))
    val agg = ranked.agg(
      sum(col("pos")).as("n_pos"),
      sum(col("cnt") - col("pos")).as("n_neg"),
      // Σ over positives of their bucket's average rank (1-based):
      // avg_rank = cum_less + (cnt+1)/2 — each term a multiple of 0.5
      sum(col("pos").cast("double") *
        (col("cum_less").cast("double")
          + (col("cnt").cast("double") + lit(1.0)) / lit(2.0))).as("rank_sum"),
      sum(col("tp")).as("tp"),
      sum(col("fp")).as("fp"),
      sum(col("fn")).as("fn"),
      sum(col("cnt")).as("n"))
    def ratio(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double"))
    agg.select(
      col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        (col("rank_sum")
          - col("n_pos").cast("double") * (col("n_pos").cast("double") + lit(1.0)) / lit(2.0))
          / (col("n_pos").cast("double") * col("n_neg").cast("double"))).as("auc"),
      col("tp"), col("fp"), col("fn"),
      (col("n") - col("tp") - col("fp") - col("fn")).as("tn"),
      ratio(col("tp"), col("tp") + col("fp")).as("precision"),
      ratio(col("tp"), col("tp") + col("fn")).as("recall"),
      ratio(lit(2L) * col("tp"),
        lit(2L) * col("tp") + col("fp") + col("fn")).as("f1"))
  }
}
