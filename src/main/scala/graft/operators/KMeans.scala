package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an `array<float>` embedding column — the
  * clustering stage of cluster-based curation (SemDeDup partitioning, IVF
  * coarse quantizers, per-cluster mixture balancing), as a Spark-first
  * operator rather than the driver-side bounded-sample trainer
  * ([[Similarity.trainCentroids]] trains on ≤4096 rows; this runs Lloyd over
  * the WHOLE corpus).
  *
  * Scale shape (the MLlib recipe, declaratively): per iteration the corpus
  * is scanned ONCE — assignment is a scan-side argmin over the k centroid
  * vectors embedded as literals (no join, no shuffle of the corpus), and the
  * centroid update is a map-side-combined component aggregation whose
  * exchange carries ≤ k·D rows (parameters, not data). The k·D driver state
  * between iterations is the model, not the corpus — the same bounded-
  * parameters-on-the-driver discipline as Similarity's k-means sample
  * (documented collect; at k=256, D=1024 that is 256k doubles).
  *
  * Engine-exactness (hash-replayable by an external SQL engine):
  *   - seeding is the k smallest-id vectors (cell id = seed's id);
  *   - distances are SEQUENTIAL left folds of (x−c)² in doubles — every op
  *     IEEE-correctly-rounded in a fixed order (the brute-kNN discipline);
  *   - argmin ties break toward the smaller cell id via struct ordering;
  *   - component means binary-quantize each addend to the 2^-40 grid before
  *     summing ([[Pooling]] discipline), so partial sums are association-
  *     order-free and the update is bit-identical under any partitioning.
  *   - a cell no vector chose drops out of the model (deterministic on both
  *     engines; with seeded-from-data centroids every seed's own vector is
  *     at distance 0, so cells empty only on duplicate seed vectors).
  */
object KMeans {

  private val Q = 1099511627776.0 // 2^40

  /** Squared L2 distance of `vec` (array<float/double>) to a constant
    * centroid, as one sequential fold.
    */
  private def dist2To(vec: Column, centroid: Array[Double]): Column =
    aggregate(
      zip_with(vec, typedLit(centroid.toSeq),
        (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0),
      (acc, d) => acc + d)

  /** Deterministic seeds: the k smallest-`idCol` vectors, cell id = their
    * id. Bounded collect of k parameter vectors (production k-means|| would
    * sample by portable hash; smallest-id keeps the external replay exact).
    */
  def seedSmallestIds(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): Array[(Long, Array[Double])] =
    df.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol).cast("long"))
      .limit(k)
      .collect()
      .map { r =>
        (r.getLong(0), r.getAs[scala.collection.Seq[Any]](1).iterator.map {
          case f: Float => f.toDouble
          case d: Double => d
          case other => throw new IllegalArgumentException(
            s"$vecCol must be array<float>/array<double>, found element $other")
        }.toArray)
      }

  /** Assignment frame (`idCol`, `cell`, `dist2`) of every vector to its
    * nearest centroid — scan-side argmin, zero shuffle.
    */
  def assign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[(Long, Array[Double])]): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val pairs = array(centroids.map { case (cell, c) =>
      struct(dist2To(col(vecCol), c).as("d2"), lit(cell).as("cell"))
    }: _*)
    df.withColumn("_best", array_min(pairs))
      .withColumn("cell", col("_best.cell"))
      .withColumn("dist2", col("_best.d2"))
      .drop("_best")
  }

  /** One centroid update from an assignment: per (cell, pos) quantized-exact
    * component mean, collected as the next k·D-parameter model. Cells with
    * no assigned vectors drop out.
    */
  def updateCentroids(
      assigned: DataFrame,
      vecCol: String): Array[(Long, Array[Double])] =
    assigned
      .select(col("cell"), posexplode(col(vecCol)))
      .withColumn("_q", floor(col("col").cast("double") * lit(Q)) / lit(Q))
      .groupBy(col("cell"), col("pos"))
      .agg((sum(col("_q")) / count(lit(1))).as("m"))
      .collect()
      .groupBy(_.getLong(0))
      .toArray
      .sortBy(_._1)
      .map { case (cell, rows) =>
        val comps = rows.map(r => (r.getInt(1), r.getDouble(2))).sortBy(_._1)
        (cell, comps.map(_._2))
      }

  /** Full Lloyd loop: seed from the k smallest ids, run `iters` assign +
    * update rounds, return the FINAL assignment (`idCol`, `cell`, `dist2`)
    * against the trained centroids. One corpus scan per iteration + one for
    * the returned frame; the corpus is never shuffled.
    */
  def lloyd(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0 (got k=$k, iters=$iters)")
    var centroids = seedSmallestIds(df, idCol, vecCol, k)
    var it = 0
    while (it < iters) {
      centroids = updateCentroids(assign(df, idCol, vecCol, centroids), vecCol)
      it += 1
    }
    assign(df, idCol, vecCol, centroids)
  }
}
