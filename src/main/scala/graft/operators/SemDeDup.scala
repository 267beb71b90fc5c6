package graft.operators

import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication over an embedding column (the
  * cluster-then-prune recipe of Abbas et al., "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication", arXiv:2303.09540):
  * cluster the embedding space with k-means, compare vectors ONLY within
  * their cluster, group pairs above the cosine threshold into duplicate
  * components, and keep one representative per component — the member
  * FARTHEST from its cluster centroid (the paper's low-centroid-similarity
  * keep rule: the most atypical copy carries the most training signal),
  * ties to the smallest id.
  *
  * This composes three already-gated operators end-to-end:
  * [[KMeans.lloyd]] (scan-side assignment, exact centroids),
  * the in-cell cosine pair join (native [[graft.plans.VectorExpressions
  * FloatDot]] sequential folds — bit-exact), and
  * [[Dedup.connectedComponents]] (pointer-jumping, O(log diameter) rounds).
  *
  * Scale shape: the ONLY quadratic term is per-cell (Σ n_c² candidate
  * pairs) — that is the SemDeDup contract: k grows with the corpus
  * (the paper uses k ≈ N/10k) so cells stay bounded and the pair join is
  * an equi-join on `cell`, never a corpus self-join. Everything else is a
  * scan or a parameter-sized exchange; norms are computed once per row
  * BELOW the join, not per pair.
  */
object SemDeDup {

  /** Full decision frame: (`idCol`, cell, component, is_kept) for every
    * input vector — `component` is the duplicate group (its smallest member
    * id; singletons are their own), `is_kept` marks the group's surviving
    * representative.
    */
  def semDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      tau: Double): DataFrame = {
    val assigned = KMeans.lloyd(df, idCol, vecCol, k, iters)
    val a = assigned.select(col("cell"), col(idCol).as("id_a"),
      col(vecCol).as("_va"), Vectors.norm(col(vecCol)).as("_na"))
    val b = assigned.select(col("cell"), col(idCol).as("id_b"),
      col(vecCol).as("_vb"), Vectors.norm(col(vecCol)).as("_nb"))
    val nn = col("_na") * col("_nb")
    val pairs = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        when(nn > 0, Vectors.dot(col("_va"), col("_vb")) / nn).otherwise(lit(0.0)))
      .filter(col("cosine") >= tau)
      .select("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val w = Window.partitionBy(col("component"))
      .orderBy(col("dist2").desc, col(idCol))
    assigned.join(comp, assigned(idCol) === comp("id"), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
      .withColumn("is_kept", row_number().over(w) === 1)
      .select(col(idCol), col("cell"), col("component"), col("is_kept"))
  }
}
