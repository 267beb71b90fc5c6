package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair encoding) tokenizer TRAINING — the subword
  * vocabulary build (Sennrich et al. 2016, arXiv:1508.07909) every LM
  * pipeline runs before token counting/packing: repeatedly merge the most
  * frequent adjacent symbol pair, starting from characters.
  *
  * Scale shape (the Hugging-Face-trainer recipe, declaratively): ONE corpus
  * scan builds the (word, count) vocabulary via a map-side-combined
  * groupBy; every merge round then runs on the VOCABULARY table (≪ corpus —
  * this is the classic trick: BPE statistics are word-count-weighted, so
  * the corpus is never rescanned), and the chosen pair per round is a
  * 1-row parameter collect. Round cost: one vocab-sized pair explode +
  * aggregation; m merges ⇒ m bounded rounds, `localCheckpoint` pins each
  * round's vocab so plans don't nest.
  *
  * Engine-exactness: a word's symbol sequence is encoded as a
  * sentinel-delimited string (`<D>sym<D>` per symbol, D = U+0001, so
  * boundaries never collide — words are pre-filtered to `[a-z0-9]+`), and
  * applying a merge (a, b) is ONE literal `replace` of `<D>a<D><D>b<D>`
  * with `<D>ab<D>`: left-to-right, non-overlapping, all occurrences —
  * exactly BPE's greedy merge semantics, and exactly the semantics of
  * `replace()` in any SQL engine, so the full m-round trajectory (pair
  * counts, argmax with (count desc, pair asc) tie-break, segmentations)
  * replays hash-identically. Integer counts throughout; no floats anywhere.
  */
object Bpe {

  private val D = "\u0001"

  /** ASCII-lowercase word vocabulary with counts: one corpus scan. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Text.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** Sentinel-delimited character-symbol encoding of `word`. */
  private def symStr(word: Column): Column =
    concat(lit(D),
      concat_ws(D + D,
        transform(
          sequence(lit(1), length(word)),
          i => substring(word, i, lit(1)))),
      lit(D))

  /** Symbols of a delimited string: strip the outer sentinels, split on the
    * doubled inner sentinel.
    */
  private def symsOf(s: Column): Column =
    split(substring(s, lit(2), length(s) - 2), D + D)

  /** Adjacent-pair counts over a (s, cnt) vocab frame → (a, b, pcnt). */
  private[operators] def pairCounts(vocab: DataFrame): DataFrame = {
    val syms = symsOf(col("s"))
    vocab
      .select(col("cnt"),
        explode(
          when(size(syms) >= 2,
            transform(sequence(lit(1), size(syms) - 1),
              i => struct(
                element_at(syms, i).as("a"),
                element_at(syms, i + 1).as("b"))))
            .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("_p"))
      .groupBy(col("_p.a").as("a"), col("_p.b").as("b"))
      .agg(sum(col("cnt")).as("pcnt"))
  }

  /** Train `m` merges. Returns the ordered merge table
    * (step, sym_a, sym_b, pair_cnt) — the tokenizer artifact. Stops early
    * if no pair remains.
    */
  def train(
      docs: DataFrame,
      textCol: String,
      m: Int): Array[(Int, String, String, Long)] = {
    require(m > 0, s"need at least one merge, got $m")
    var vocab = wordVocab(docs, textCol)
      .select(symStr(col("word")).as("s"), col("cnt"))
      .localCheckpoint(true)
    val merges = Array.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= m && !done) {
      val best = pairCounts(vocab)
        .orderBy(col("pcnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) done = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step, a, b, c))
        vocab = vocab
          .withColumn("s",
            replace(col("s"), lit(D + a + D + D + b + D), lit(D + a + b + D)))
          .localCheckpoint(true)
        step += 1
      }
    }
    merges.result()
  }

  /** The merge table as a DataFrame (for gates/persistence). */
  def mergeTable(
      spark: SparkSession,
      merges: Array[(Int, String, String, Long)]): DataFrame = {
    import spark.implicits._
    merges.toSeq.toDF("step", "sym_a", "sym_b", "pair_cnt")
      .select(col("step").cast("long").as("step"), col("sym_a"), col("sym_b"),
        col("pair_cnt"))
  }

  /** Apply a trained merge list to the corpus and return per-subword
    * corpus frequencies (top `k` by count, ties to the smaller subword):
    * segmentation happens on the word VOCAB (corpus scanned once for
    * counts), each merge is one literal scan-side `replace`.
    */
  def subwordCounts(
      docs: DataFrame,
      textCol: String,
      merges: Array[(Int, String, String, Long)],
      k: Int): DataFrame = {
    val vocab = wordVocab(docs, textCol)
    val applied = merges.foldLeft(symStr(col("word"))) { case (s, (_, a, b, _)) =>
      replace(s, lit(D + a + D + D + b + D), lit(D + a + b + D))
    }
    vocab
      .select(col("cnt"), explode(symsOf(applied)).as("subword"))
      .groupBy(col("subword"))
      .agg(sum(col("cnt")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("subword"))
      .limit(k)
  }
}
