package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pruning for shuffle joins — the "runtime filter"
  * every petabyte engine ships (Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter`, Trino's dynamic filtering):
  * when the build side is too big to BROADCAST but its join-key SET fits a
  * few megabytes of Bloom bits, probe rows that cannot possibly match are
  * dropped at the scan, BEFORE the probe side pays the shuffle. At 100 TB
  * the shuffle is the cost — a 20%-selective build side cuts probe shuffle
  * bytes ~5× for two extra scans of nothing (the filter is a bounded bit
  * array riding the task closure).
  *
  * Determinism: a Bloom filter has NO false negatives, so
  * `bloomJoin(probe, build, k) == probe ⋈ build` exactly — the join result
  * is byte-identical to the unfiltered plan and SQL-oracle-checkable; false
  * positives only cost the shuffle bytes they fail to save.
  *
  * Reference semantics: kwwhat's join models rely on the warehouse's own
  * runtime pruning (models/marts join graph); this makes the same pruning
  * an explicit, testable operator.
  */
object RuntimeFilter {

  private val bitMasks = Array.tabulate(64)(i => 1L << i)

  /** Build the packed Bloom words over `key` of `build` DISTRIBUTEDLY: each
    * key contributes `nHashes` positions via xxhash64 double hashing
    * (h + j·h2, h2 odd so every stride is full-period mod the power-of-two
    * width); contributions are OR-combined map-side per word index, so the
    * exchange and the driver collect are bounded by `bloomBits/64` rows —
    * the SKETCH size, never the data size (2^20 bits = 16 K rows ≈ 200 KB).
    */
  def bloomWords(build: DataFrame, key: Column, bloomBits: Int, nHashes: Int): Array[Long] = {
    require(bloomBits >= 64 && Integer.bitCount(bloomBits) == 1,
      s"bloomBits must be a power of two >= 64 (got $bloomBits)")
    require(nHashes >= 1 && nHashes <= 16, s"need 1 <= nHashes <= 16 (got $nHashes)")
    val words = new Array[Long](bloomBits / 64)
    build
      .select(xxhash64(key).as("_h"))
      .select(col("_h"),
        (shiftrightunsigned(col("_h"), 32) * lit(2L) + lit(1L)).as("_h2"),
        explode(sequence(lit(0L), lit(nHashes - 1L))).as("_j"))
      .select((col("_h") + col("_j") * col("_h2"))
        .bitwiseAND(lit(bloomBits - 1L)).as("_pos"))
      .select(shiftright(col("_pos"), 6).cast("int").as("w"),
        element_at(lit(bitMasks), col("_pos").bitwiseAND(lit(63L)).cast("int") + 1)
          .as("bit"))
      .groupBy(col("w")).agg(expr("bit_or(bit)").as("bits"))
      .collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Scan-side membership test against a built word array: `nHashes` word
    * lookups per row on two array-literal `element_at`s — whole-stage
    * codegen, no join, no shuffle. Must use the SAME bloomBits/nHashes the
    * words were built with.
    */
  def mightContain(key: Column, words: Array[Long], bloomBits: Int, nHashes: Int): Column = {
    require(words.length == bloomBits / 64, "words/bloomBits mismatch")
    val wordsLit = lit(words)
    val maskLit = lit(bitMasks)
    val h = xxhash64(key)
    val h2 = shiftrightunsigned(h, 32) * lit(2L) + lit(1L)
    (0 until nHashes).map { j =>
      val pos = (h + lit(j.toLong) * h2).bitwiseAND(lit(bloomBits - 1L))
      element_at(wordsLit, shiftright(pos, 6).cast("int") + 1)
        .bitwiseAND(element_at(maskLit, pos.bitwiseAND(lit(63L)).cast("int") + 1)) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Inner equi-join with the probe side Bloom-pruned before the join: the
    * filter sits under the probe's exchange, so only might-match rows are
    * shuffled. Result is exactly `probe.join(build, key)` (no false
    * negatives); build-side keys are scanned once extra to build the words.
    */
  def bloomJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      bloomBits: Int = 1 << 20,
      nHashes: Int = 4): DataFrame = {
    val words = bloomWords(build, col(key), bloomBits, nHashes)
    probe.filter(mightContain(col(key), words, bloomBits, nHashes))
      .join(build, Seq(key))
  }
}
