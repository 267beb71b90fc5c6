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
  * [[KMeans.twoLevelModel]] (the two-level IVF-hierarchy quantizer:
  * ⌈√k⌉ coarse Lloyd cells, then ⌈k/⌈√k⌉⌉ sub-cells trained INSIDE each
  * coarse cell; fine `cell` = sub-cell), the in-cell cosine pair join
  * (native [[graft.plans.VectorExpressions FloatDot]] sequential folds —
  * bit-exact), and [[Dedup.connectedComponents]] (pointer-jumping,
  * O(log diameter) rounds).
  *
  * Scale shape: the ONLY quadratic term is per-cell (Σ n_c² candidate
  * pairs) — that is the SemDeDup contract: k grows with the corpus
  * (the paper uses k ≈ N/10k) so cells stay bounded and the pair join is
  * an equi-join on `cell`, never a corpus self-join. With k ∝ N, FLAT
  * assignment is itself n·k = O(n²) distance folds — the r13 sf100
  * decade measured 622 s (41×/decade) on exactly that — so assignment is
  * two-level: n·(k1+k2) ≈ n·2√k folds for the same ~k bounded fine
  * cells (see [[KMeans.twoLevelModel]]). Everything else is a scan or a
  * parameter-sized exchange; norms are computed once per row BELOW the
  * join, not per pair.
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
    val model = KMeans.twoLevelModel(df, idCol, vecCol, k, iters)
    val assigned = KMeans.assignTwoLevel(df, idCol, vecCol, model)
      .drop("ccell")
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

  /** The persistable SemDeDup corpus INDEX: `(id, cell, vec, norm)` under
    * a trained two-level quantizer — what production mode WRITES (partitioned by
    * `cell`). Re-clustering a 100 TB corpus for every daily increment is
    * the anti-pattern; the model is trained once, the corpus assigned
    * once, and each new batch pays only its own assignment + its cells'
    * members (the [[Dedup.minhashIndex]] / [[Similarity.ivfIndex]]
    * pattern). Norms ride in the index so the batch join never recomputes
    * them per pair.
    */
  def semDedupIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      model: KMeans.TwoLevelModel): DataFrame =
    KMeans.assignTwoLevel(corpus, idCol, vecCol, model)
      .select(col(idCol).cast("long").as("id"), col("cell"),
        col(vecCol).as("vec"), Vectors.norm(col(vecCol)).as("norm"))

  /** INCREMENTAL SemDeDup — the production mode of arXiv:2303.09540: a new
    * `batch` assigns into the PERSISTED k-means cells (the same trained
    * `centroids` the index was built under; the corpus is NOT re-clustered
    * or re-scanned — only the stored index is read) and compares only
    * against its cells' existing members. Returns every above-threshold
    * `(id_new, id_corpus, cosine)` pair — the duplicate evidence a
    * curation pipeline filters the new batch by.
    *
    * Scale shape: one scan-side batch assignment (the k·D model rides as
    * a literal), one `cell` equi-join whose corpus side is the stored
    * index (partition-pruned to the batch's cells when the index is
    * written partitioned by `cell`), cosines as bit-exact sequential
    * folds. Candidate volume is Σ_c n_batch(c)·n_corpus(c) — linear while
    * the model's k grows with the corpus, the SemDeDup contract; the
    * batch assignment is two-level (n_batch·2√k folds, not n_batch·k).
    */
  def semDedupAgainst(
      batch: DataFrame,
      index: DataFrame,
      idCol: String,
      vecCol: String,
      model: KMeans.TwoLevelModel,
      tau: Double): DataFrame = {
    val b = KMeans.assignTwoLevel(batch, idCol, vecCol, model)
      .select(col("cell"), col(idCol).cast("long").as("id_new"),
        col(vecCol).as("_vb"), Vectors.norm(col(vecCol)).as("_nb"))
    val c = index.select(col("cell"), col("id").as("id_corpus"),
      col("vec").as("_va"), col("norm").as("_na"))
    val nn = col("_na") * col("_nb")
    b.join(c, Seq("cell"))
      .withColumn("cosine",
        when(nn > 0, Vectors.dot(col("_va"), col("_vb")) / nn).otherwise(lit(0.0)))
      .filter(col("cosine") >= tau)
      .select(col("id_new"), col("id_corpus"), col("cosine"))
  }
}
