package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene step that removes
  * documents overlapping an evaluation set: a training document is
  * contaminated when it shares at least `minOverlap` distinct word
  * `n`-grams with some benchmark document.
  *
  * Scale shape: the benchmark side is SMALL by nature (eval sets are
  * thousands of documents, the corpus is billions), so its shingle posting
  * list is BROADCAST — contamination detection is one broadcast hash join
  * over a single scan of the training corpus, no shuffle of the corpus at
  * all. Stopword shingles are suppressed first (corpus-side document
  * frequency via map-side-combined groupBy + broadcast anti-join, the same
  * construction as [[Dedup.ngramJaccard]]) so ubiquitous n-grams neither
  * blow up the join nor count as overlap evidence.
  */
object Contamination {

  /** Per contaminated training document: how many benchmark documents it
    * overlaps and the largest single-benchmark overlap. Documents below
    * `minOverlap` against every benchmark are absent (clean).
    */
  def flagContaminated(
      docs: DataFrame,
      docIdCol: String,
      docTextCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      n: Int,
      minOverlap: Long,
      maxShingleDocFreq: Long = 10000L): DataFrame = {
    val dPost = docs.select(
        col(docIdCol).as("doc_id"),
        explode(Text.wordShingles(col(docTextCol), n)).as("_sh"))
      .select(col("doc_id"), xxhash64(col("_sh")).as("shingle"))
    val bPost = bench.select(
        col(benchIdCol).as("bench_id"),
        explode(Text.wordShingles(col(benchTextCol), n)).as("_sh"))
      .select(col("bench_id"), xxhash64(col("_sh")).as("shingle"))
    // corpus-side document frequency decides "ubiquitous": partial-agg
    // collapses hot shingles map-side, the surviving hot set is tiny
    val hot = dPost.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDocFreq)
      .select(col("shingle"))
    dPost.join(broadcast(hot), Seq("shingle"), "left_anti")
      .join(broadcast(bPost.join(broadcast(hot), Seq("shingle"), "left_anti")),
        Seq("shingle"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bench_hits"),
        max(col("n_overlap")).as("max_overlap"))
  }
}
