package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding pooling — per-group centroids over an `array<float>` column,
  * the building block of cluster-based curation (SemDeDup-style pruning,
  * per-domain centroid drift monitoring, IVF cell refresh).
  *
  * Shape: `posexplode` to (group, position, component) grain, then ONE
  * map-side-combined aggregation — partial sums collapse the D× row
  * inflation inside each input partition before the shuffle, so the
  * exchange carries groups×D rows, not corpus×D. No driver-side vectors,
  * no UDFs.
  *
  * Engine-exactness: components are binary-quantized to 2^-40 multiples
  * (floor/×2^40/÷2^40 are exact IEEE ops) before summing, so partial sums
  * are association-order-free — the centroid is bit-identical under any
  * partitioning and replayable by an external SQL engine. The bias is
  * ≤ 2^-40 per component, noise floor for float32 inputs.
  */
object Pooling {

  private val Q = 1099511627776.0 // 2^40

  /** Per-(groupCols, pos) centroid components: `n_vecs`, `centroid_val`.
    * Flat grain — gate-friendly and directly joinable; use [[meanPool]] for
    * the assembled vector.
    */
  def meanComponents(df: DataFrame, groupCols: Seq[String], vecCol: String): DataFrame =
    df.select(groupCols.map(col) :+ posexplode(col(vecCol)): _*)
      .withColumn("_q", floor(col("col").cast("double") * lit(Q)) / lit(Q))
      .groupBy((groupCols :+ "pos").map(col): _*)
      .agg(
        count(lit(1)).as("n_vecs"),
        (sum(col("_q")) / count(lit(1))).as("centroid_val"))

  /** Assembled per-group centroid vector (`array<double>`, position order)
    * plus the group's vector count.
    */
  def meanPool(df: DataFrame, groupCols: Seq[String], vecCol: String): DataFrame =
    meanComponents(df, groupCols, vecCol)
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(col("n_vecs")).as("n_vecs"),
        transform(
          array_sort(collect_list(struct(col("pos"), col("centroid_val")))),
          s => s.getField("centroid_val")).as("centroid"))

  /** Euclidean distance of every vector to its group's centroid — the
    * SemDeDup-style prune signal (far-from-centroid ⇒ outlier/noise,
    * near-duplicates cluster tightly around it). The centroid table is
    * groups×D (tiny) and BROADCAST; the distance is a SEQUENTIAL
    * `zip_with` + `aggregate` fold evaluated scan-side — the corpus is
    * never shuffled, and the ordered fold makes the value bit-exact across
    * engines and partitionings (same discipline as the brute-kNN cosines).
    */
  def distanceToCentroid(
      df: DataFrame,
      groupCols: Seq[String],
      vecCol: String): DataFrame = {
    val centroids = meanPool(df, groupCols, vecCol)
      .select((groupCols.map(col) :+ col("centroid")): _*)
    df.join(broadcast(centroids), groupCols)
      .withColumn("dist_to_centroid",
        sqrt(aggregate(
          zip_with(col(vecCol), col("centroid"),
            (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
          lit(0.0),
          (acc, d) => acc + d)))
      .drop("centroid")
  }
}
