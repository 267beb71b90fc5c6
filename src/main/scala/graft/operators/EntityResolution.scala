package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution (record linkage) by blocked edit-distance
  * matching: dirty strings matched to a canonical dimension WITHOUT the
  * all-pairs distance matrix.
  *
  * The classic curation problem (Fellegi & Sunter 1969; the blocking
  * formulation in every dedupe/linkage system): a raw feed carries
  * misspelled entity names; match each to its canonical row. Distance is
  * Levenshtein — but at 100 TB you can never evaluate it on the cross
  * product, so candidates come from BLOCKING: a cheap deterministic key
  * that any true match must share with its canonical row. For edit
  * distance ≤ 1 on strings longer than 2k, a (head-k, tail-k) key pair is
  * a complete cover — a single edit can corrupt the head or the tail but
  * never both — so the union of two equi-joins (head block ∪ tail block)
  * contains every true match, each a plain shuffle join whose cost is
  * Σ|block|², never |A|·|B|.
  *
  * Levenshtein itself is exact integer dynamic programming, bit-identical
  * in every engine that implements it (Spark `levenshtein`, DuckDB
  * `levenshtein`) — which is what lets the whole operator hash-gate.
  */
object EntityResolution {

  /** Match `dirty(idCol, nameCol)` against `canon(canonIdCol, canonNameCol)`
    * with edit distance ≤ 1, blocking on head/tail substrings of length
    * `blockLen`. COMPLETE by a case split on the single edit's position:
    * for names of length ≥ 2·blockLen the edit sits in the head block, the
    * tail block, or between them — so it leaves the head intact (head keys
    * match) or the tail intact (tail keys match; an indel before the tail
    * does not shift the LAST blockLen characters). Names too short for
    * that argument — and long names within maxDist of the boundary, which
    * a single indel can carry across it — share one residual block, whose
    * size is bounded by the short-name population (constant as the table
    * grows), so no pair is ever silently dropped. The gate proves the
    * cover: the oracle computes the exhaustive cross-product answer, so a
    * missed block would hash-mismatch.
    * Output: one row per (dirty id, canonical id) match with the distance.
    */
  def matchByEditDistance(dirty: DataFrame, idCol: String, nameCol: String,
      canon: DataFrame, canonIdCol: String, canonNameCol: String,
      blockLen: Int, maxDist: Int): DataFrame = {
    require(maxDist == 1,
      s"head/tail (2-piece) blocking is only a complete cover for one edit; got maxDist=$maxDist")
    val minSafe = 2 * blockLen
    def keyed(df: DataFrame, name: String): DataFrame = {
      val n = col(name)
      val ht = array(
        concat(lit("h:"), substring(n, 1, blockLen)),
        concat(lit("t:"), substring(n, -blockLen, blockLen)))
      val residual = array(lit("s:"))
      val keys = when(length(n) >= minSafe + maxDist, ht)
        .when(length(n) >= minSafe, concat(ht, residual))
        .otherwise(residual)
      df.withColumn("_bk", explode(keys))
    }
    keyed(dirty.select(col(idCol), col(nameCol)), nameCol)
      .join(keyed(canon.select(col(canonIdCol), col(canonNameCol)), canonNameCol), "_bk")
      .where(levenshtein(col(nameCol), col(canonNameCol)) <= maxDist)
      // a pair found via BOTH its head and tail block collapses to one row
      .select(col(idCol), col(canonIdCol),
        levenshtein(col(nameCol), col(canonNameCol)).as("edit_dist"))
      .distinct()
  }
}
