package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., TPAMI 2011) — the vector
  * compression behind IVF-PQ, the standard disk-scale ANN layout: split
  * each D-dim vector into M subspaces, k-means each subspace, store a
  * vector as M small codes (k ≤ 256 → one byte per subspace — a 64-dim
  * float vector compresses 256 B → M B), and answer queries with
  * asymmetric distance computation (ADC): per-subspace lookup tables
  * against the UNquantized probe, summed across subspaces.
  *
  * Scale shape: codebook training reuses [[KMeans.lloydFrom]] per
  * subspace over subvector slices (each a corpus scan with parameter-only
  * exchange); encoding is a scan-side argmin per subspace via the native
  * [[graft.plans.NearestCentroid]] expression (M·k·(D/M) = k·D
  * multiply-adds per row, zero shuffle, the corpus is never joined);
  * ADC search is a scan-side literal-map lookup + sum over the CODES
  * table — the probe's k·D distance table is computed once on the driver
  * and broadcast as literals, so search cost per row is M map lookups
  * and M−1 additions regardless of D. Engine-exactness: every distance
  * is the KMeans sequential fold, every mean the 2^-40-quantized
  * component mean, so the q_pq_adc gate replays training, encoding and
  * search in DuckDB hash-exact.
  */
object Pq {

  /** Per-subspace codebooks: (subspace index, [[KMeans]] model of the
    * subvector slice [sub·dSub, (sub+1)·dSub)). Cell ids are the seed
    * vectors' ids (the replay-exact convention; bijective with 0..k−1
    * codes — a storage layer would dense-rank them to bytes).
    */
  def trainCodebooks(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int,
      iters: Int): Seq[(Int, Array[(Long, Array[Double])])] = {
    require(m > 0 && k > 0, s"need m > 0, k > 0 (got m=$m, k=$k)")
    requireDivisible(df, vecCol, m)
    (0 until m).map { sub =>
      val sliced = df.select(col(idCol),
        subvector(col(vecCol), sub, m).as("_sv"))
      val seeds = KMeans.seedSmallestIds(sliced, idCol, "_sv", k)
      val trained = finalCentroids(sliced, idCol, "_sv", seeds, iters)
      sub -> trained
    }
  }

  /** Subvector `sub` of `m` equal slices (1-based `slice`; D must divide
    * evenly — the PQ precondition).
    */
  def subvector(vec: Column, sub: Int, m: Int): Column = {
    val dSub = (size(vec) / m).cast("int")
    slice(vec, lit(sub) * dSub + 1, dSub)
  }

  /** PQ precondition guard: the integer-truncated dSub in [[subvector]]
    * would otherwise silently DROP the trailing D mod m dimensions —
    * assert divisibility once per call from a one-row sample (a
    * parameter-scale driver action, matching the existing preconditions
    * in [[adcDistances]]).
    */
  private def requireDivisible(df: DataFrame, vecCol: String, m: Int): Unit = {
    val d0 = df.select(size(col(vecCol)).as("_d")).limit(1).collect()
    d0.headOption.foreach { r =>
      val d = r.getInt(0)
      require(d % m == 0,
        s"vector dimension $d must divide into m=$m subspaces " +
          s"(trailing ${d % m} dimensions would be dropped)")
    }
  }

  private def finalCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      seeds: Array[(Long, Array[Double])],
      iters: Int): Array[(Long, Array[Double])] = {
    var c = seeds
    var it = 0
    while (it < iters) {
      c = KMeans.updateCentroids(KMeans.assign(df, idCol, vecCol, c), vecCol)
      it += 1
    }
    c
  }

  /** Code frame `(idCol, carry…, code_0 … code_{m-1})`: per-subspace
    * nearest codebook cell — one scan, zero shuffle. `carry` columns
    * (e.g. an IVF cell id) ride through the same projection so callers
    * never re-join them onto the codes.
    */
  def encode(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: Seq[(Int, Array[(Long, Array[Double])])],
      carry: Seq[String] = Nil): DataFrame = {
    val m = codebooks.length
    requireDivisible(df, vecCol, m)
    val codeCols = codebooks.map { case (sub, model) =>
      graft.plans.VectorExpressions
        .nearestCentroid(subvector(col(vecCol), sub, m), model)
        .getField("cell").as(s"code_$sub")
    }
    df.select((col(idCol) +: carry.map(col)) ++ codeCols: _*)
  }

  /** Residual frame `(idCol, cell, vecCol = x − coarse[cell])` — the
    * IVF-PQ preprocessing step: PQ codebooks train on residuals relative
    * to each vector's coarse cell, which concentrates their distribution
    * and is what makes 4-bit/8-bit codes usable at billion scale. The
    * coarse model rides as a cell→vector map literal; the subtraction is
    * a scan-side zip (zero shuffle).
    */
  def residuals(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cellCol: String,
      coarse: Array[(Long, Array[Double])]): DataFrame = {
    val coarseMap = map(coarse.flatMap { case (cell, c) =>
      Seq(lit(cell), typedLit(c.toSeq))
    }: _*)
    df.select(col(idCol), col(cellCol),
      zip_with(col(vecCol), element_at(coarseMap, col(cellCol)),
        (x, c) => x.cast("double") - c).as(vecCol))
  }

  /** ADC distances of every encoded vector to ONE probe vector: the
    * probe's per-subspace distance table (k·M doubles) rides along as map
    * literals; the scan does M lookups + a fixed-order left-to-right sum.
    */
  def adcDistances(
      codes: DataFrame,
      idCol: String,
      probe: Array[Double],
      codebooks: Seq[(Int, Array[(Long, Array[Double])])]): DataFrame = {
    val m = codebooks.length
    require(probe.length % m == 0, "probe dimension must divide into m subspaces")
    val dSub = probe.length / m
    val terms = codebooks.map { case (sub, model) =>
      val pSub = probe.slice(sub * dSub, (sub + 1) * dSub)
      val table = model.map { case (cell, c) =>
        // the KMeans sequential fold, computed on the driver
        var s = 0.0
        var i = 0
        while (i < dSub) { val d = pSub(i) - c(i); s += d * d; i += 1 }
        cell -> s
      }
      element_at(
        map(table.flatMap { case (cell, d) => Seq(lit(cell), lit(d)) }: _*),
        col(s"code_$sub"))
    }
    codes.withColumn("adc_d2", terms.reduceLeft(_ + _))
  }

  /** Exact re-rank stage (Jégou et al., TPAMI 2011 §V) — the production
    * serving path on top of ADC search: take the ADC-ordered top-`c`
    * candidates (c ≈ 4–8×k), re-score ONLY those against the original
    * uncompressed vectors with the exact sequential (x−p)² fold, and
    * return the exact-ordered top-`k`. ADC distances are lossy (codebook
    * quantization), so the candidate list's ORDER is approximate even
    * when its membership is good — re-ranking c candidates recovers the
    * order at the cost of c exact distance computations instead of N.
    *
    * Scale shape: the candidate frame is k-bounded (TakeOrderedAndProject
    * on (adc_d2, id) — a per-partition top-c then a driver merge of c-row
    * heaps, never a global sort), and re-scoring joins it BROADCAST
    * against the vector store, so the big side is scanned once with a
    * pushed join filter and the exact fold ([[graft.plans.NearestCentroid]]
    * with the probe as a 1-entry model — whole-stage codegen) touches c
    * rows. Ties break toward the smaller id at both stages, so the result
    * replays hash-exact in SQL.
    */
  def searchRerank(
      adc: DataFrame,
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      probe: Array[Double],
      c: Int,
      k: Int): DataFrame = {
    require(c >= k && k > 0, s"need candidates c >= k > 0 (got c=$c, k=$k)")
    val cand = adc.orderBy(col("adc_d2"), col(idCol)).limit(c)
    broadcast(cand)
      .join(vectors.select(col(idCol), col(vecCol)), idCol)
      .withColumn("exact_d2",
        graft.plans.VectorExpressions
          .nearestCentroid(col(vecCol), Array((0L, probe)))
          .getField("d2"))
      .drop(vecCol)
      .orderBy(col("exact_d2"), col(idCol))
      .limit(k)
  }
}
