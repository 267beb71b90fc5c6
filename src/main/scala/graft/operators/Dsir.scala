package graft.operators

import graft.functions.Text
import graft.plans.HashExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al., "Data
  * Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): estimate a TARGET hashed-unigram model and a RAW
  * hashed-unigram model, weight every corpus document by how much more
  * target-like than raw-like its tokens are, and keep the top-k.
  *
  * The per-feature evidence is the add-one-smoothed likelihood ratio
  *
  *   r_b = ((c_t(b)+1)·(N_r+B)) / ((c_r(b)+1)·(N_t+B))
  *
  * and a document's importance is Σ_tokens r_bucket(token). The paper sums
  * LOG ratios; the log is replaced by the ratio itself for engine
  * exactness — libm `ln` is not correctly-rounded-portable, while the
  * ratio is three IEEE ops on exact integers (the same trade as
  * [[NgramLM]]'s collocations ranking by lift instead of log-PMI). Each
  * ratio is floor-quantized to the 2^-20 grid so per-document sums are
  * association-order-free and bit-identical on any engine and partitioning.
  *
  * Scale shape: model estimation is ONE map-side-combined
  * `groupBy(bucket).count` over the token stream (the exchange carries ≤ B
  * rows per partition — B is the model size, not the corpus); the trained
  * B-entry weight table is a bounded parameter artifact collected to the
  * driver (like k-means centroids) and compiled into the scoring scan as an
  * array literal — scoring is a pure map over the corpus, zero joins, zero
  * shuffles. Selection is a global top-k (`TakeOrderedAndProject`), never a
  * full sort.
  */
object Dsir {

  private val Q20 = 1048576.0 // 2^20

  /** Token → bucket: `fnv_mix(token, seed) mod B`. B must be a power of two
    * for the cross-engine replay guarantee (see
    * [[QualityClassifier.weightSum]]).
    */
  private def bucket(token: Column, buckets: Int, seed: Long): Column =
    pmod(HashExpressions.fnvMix(token, seed), lit(buckets.toLong))

  /** Train the B-entry importance-ratio table: target = rows matching
    * `targetPred`, raw = all of `docs`. Buckets never seen in the raw
    * corpus get the ct=cr=0 ratio (they cannot be hit when scoring the same
    * corpus; filled for API completeness).
    */
  def importanceWeights(
      docs: DataFrame,
      textCol: String,
      targetPred: Column,
      buckets: Int,
      seed: Long): Array[Double] = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two for engine-portable bucketing, got $buckets")
    val counts = docs
      .select(targetPred.as("_is_t"), explode(Text.tokens(col(textCol))).as("_t"))
      .select(col("_is_t"), bucket(col("_t"), buckets, seed).as("_b"))
      .groupBy(col("_b"))
      .agg(
        sum(when(col("_is_t"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
      .collect()
    val nt = counts.map(_.getLong(1)).sum
    val nr = counts.map(_.getLong(2)).sum
    // ((ct+1)·(nr+B)) / ((cr+1)·(nt+B)) with each factor cast to double and
    // exactly this association — deterministic IEEE rounding on any engine
    def ratio(ct: Long, cr: Long): Double = {
      val r = ((ct + 1L).toDouble * (nr + buckets).toDouble) /
        ((cr + 1L).toDouble * (nt + buckets).toDouble)
      math.floor(r * Q20) / Q20
    }
    val w = Array.fill(buckets)(ratio(0L, 0L))
    counts.foreach(r => w(r.getLong(0).toInt) = ratio(r.getLong(1), r.getLong(2)))
    w
  }

  /** Score every document (`n_tokens`, `importance` = Σ r over the token
    * bag, `avg_importance` = importance / n_tokens — the length-normalized
    * signal; the raw sum grows with document length whatever the content,
    * exactly like the paper's log-ratio sum) and keep the global top-`k` by
    * average importance (ties to smaller id), with a 1-based `rank`.
    */
  def select(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: Array[Double],
      seed: Long,
      k: Int): DataFrame = {
    val wlit = typedLit(weights.toSeq)
    val toks = Text.tokens(col(textCol))
    val importance = aggregate(
      toks,
      lit(0.0),
      (acc, t) => acc +
        element_at(wlit, (bucket(t, weights.length, seed) + 1L).cast("int")))
    val top = docs
      .select(
        col(idCol),
        size(toks).cast("long").as("n_tokens"),
        importance.as("importance"))
      .withColumn("avg_importance",
        col("importance") / greatest(col("n_tokens"), lit(1L)).cast("double"))
      .orderBy(col("avg_importance").desc, col(idCol))
      .limit(k) // TakeOrderedAndProject: bounded heaps, no global sort
    // rank over the k survivors only (single tiny partition by construction)
    top.withColumn("rank",
      row_number().over(
        Window.orderBy(col("avg_importance").desc, col(idCol))).cast("long"))
  }
}
