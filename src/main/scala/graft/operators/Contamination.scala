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

  /** [[flagContaminated]] behind a Bloom-filter prefilter on the corpus
    * side — the shape that matters when the broadcast posting list itself
    * gets heavy: the corpus scan first tests each shingle against a
    * bit-set a fraction the size of the postings (bits, not 16-byte
    * hash+id rows), and only bloom-positive shingles reach the hash join.
    * The RESULT is exactly [[flagContaminated]]'s: a Bloom filter has no
    * false negatives, and a false-positive shingle carries no matching
    * benchmark posting, so it dies in the exact join it was admitted to —
    * the same oracle gates both paths, and exactness holds for ANY
    * (bloomBits, bloomHashes), including pathologically small filters.
    *
    * Bit positions use Kirsch–Mitzenmacher double hashing over the 64-bit
    * shingle hash (`pos_j = (h + j·(2·(h >>> 32)+1)) & (bits-1)`), pure
    * long arithmetic replayed identically on the driver (build) and in the
    * scan (probe, codegen'd: two `element_at`s on plan literals per probe
    * — the word array and a 64-entry bit-mask table — no dynamic shifts).
    * The filter words ride the plan as ONE array literal (bits/8 bytes,
    * the [[graft.operators.QualityClassifier]] precedent); a deployment
    * with a multi-GB filter would broadcast it behind a custom expression
    * instead, everything else unchanged.
    */
  def flagContaminatedBloom(
      docs: DataFrame,
      docIdCol: String,
      docTextCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      n: Int,
      minOverlap: Long,
      maxShingleDocFreq: Long = 10000L,
      bloomBits: Int = 1 << 20,
      bloomHashes: Int = 3): DataFrame = {
    require(bloomBits >= 64 && (bloomBits & (bloomBits - 1)) == 0,
      s"bloomBits must be a power of two >= 64, got $bloomBits")
    require(bloomHashes >= 1, s"bloomHashes must be >= 1, got $bloomHashes")
    val dPost = docs.select(
        col(docIdCol).as("doc_id"),
        explode(Text.wordShingles(col(docTextCol), n)).as("_sh"))
      .select(col("doc_id"), xxhash64(col("_sh")).as("shingle"))
    val bPost = bench.select(
        col(benchIdCol).as("bench_id"),
        explode(Text.wordShingles(col(benchTextCol), n)).as("_sh"))
      .select(col("bench_id"), xxhash64(col("_sh")).as("shingle"))
    val hot = dPost.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDocFreq)
      .select(col("shingle"))
    val bClean = bPost.join(broadcast(hot), Seq("shingle"), "left_anti")

    // build: distinct benchmark shingles are eval-set-bounded (the same
    // boundedness that justifies broadcasting the postings), so setting
    // bits driver-side is a parameter computation, not a data collect
    val words = new Array[Long](bloomBits / 64)
    bClean.select(col("shingle")).distinct()
      .as(org.apache.spark.sql.Encoders.scalaLong).collect()
      .foreach { h =>
        val h2 = (h >>> 32) * 2L + 1L
        var j = 0
        while (j < bloomHashes) {
          val p = ((h + j.toLong * h2) & (bloomBits - 1L)).toInt
          words(p >>> 6) |= 1L << (p & 63)
          j += 1
        }
      }

    val bloomLit = lit(words)
    val maskLit = lit(Array.tabulate(64)(i => 1L << i))
    val bloomPass = (0 until bloomHashes).map { j =>
      val h2 = shiftrightunsigned(col("shingle"), 32) * lit(2L) + lit(1L)
      val pos = (col("shingle") + lit(j.toLong) * h2).bitwiseAND(lit(bloomBits - 1L))
      val word = element_at(bloomLit, shiftright(pos, 6).cast("int") + lit(1))
      word.bitwiseAND(
        element_at(maskLit, pos.bitwiseAND(lit(63L)).cast("int") + lit(1))) =!= lit(0L)
    }.reduce(_ && _)

    dPost.join(broadcast(hot), Seq("shingle"), "left_anti")
      .filter(bloomPass)
      .join(broadcast(bClean), Seq("shingle"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bench_hits"),
        max(col("n_overlap")).as("max_overlap"))
  }
}
