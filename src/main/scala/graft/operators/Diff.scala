package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning primitive: given two
  * versions of a document table, label every id `added` / `removed` /
  * `changed` / `unchanged`. This is how a training-data pipeline answers
  * "what moved between v1 and v2?" (release notes, incremental re-embedding
  * worklists, cache invalidation for downstream features).
  *
  * Scale shape: content is reduced to an 8-byte fingerprint ON THE SCAN, so
  * the full-outer join shuffles (id, fp) pairs — never document text; the
  * join is one linear equi-shuffle per side on the unique id (no skew by
  * construction). Downstream consumers filter on `status` — e.g.
  * `status != 'unchanged'` is the re-embedding worklist, typically a tiny
  * fraction of the corpus.
  *
  * The fingerprint is an internal xxhash64 (equality-only use — the hash
  * never leaves the plan, so the oracle can replay the diff by comparing
  * content directly).
  */
object Diff {

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), xxhash64(col(textCol)).as("_old_fp"))
    val n = newDf.select(col(idCol), xxhash64(col(textCol)).as("_new_fp"))
    o.join(n, Seq(idCol), "full_outer")
      .select(
        col(idCol),
        when(col("_old_fp").isNull, "added")
          .when(col("_new_fp").isNull, "removed")
          .when(col("_old_fp") =!= col("_new_fp"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
