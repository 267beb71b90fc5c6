package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bitmap-index distinct counting and set algebra over dense integer keys —
  * the EXACT counterpart to the HLL sketch ([[Sketch]]), and the device
  * OLAP engines (Druid, ClickHouse, Kylin's bitmap measures, roaring
  * bitmaps generally) use when identities must be exact: count-distinct,
  * audience overlap (AND), reach (OR) — all without ever re-touching raw
  * events.
  *
  * Representation: plain rows `(group..., word, bits)` where `word` indexes
  * a 63-key block and `bits` has bit `key mod 63` set for every present
  * key. 63 (not 64) keys per word keeps the int64 sign bit clear — engines
  * disagree on `1 << 63` (DuckDB range-checks it), and a sign-free word is
  * portable everywhere. The same plain-row discipline as the sketch family
  * means the whole pipeline replays in the oracle.
  *
  * Scale shape: one map-side-combined `bit_or` builds the index (the
  * exchange carries ≤ groups × |key-universe|/63 rows, with hot blocks
  * collapsing map-side); indexes MERGE by `bit_or` per word (associative,
  * commutative, idempotent — per-day bitmaps roll up like registers);
  * intersection/union cardinalities are joins over WORD tables, so
  * "users who did A and B" never joins the raw event stream against
  * itself. Exactness costs O(universe/63) state versus HLL's fixed 256
  * registers — the classic exact-vs-sketch trade, which is why both are
  * first-class here.
  */
object Bitmap {

  val WordBits = 63

  private def exactDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / lit(b)).cast("long")

  /** Bitmap words for non-negative integer `key` per `groupCols`: one row
    * per (group, word) with the presence bits OR-folded map-side.
    */
  def words(df: DataFrame, groupCols: Seq[String], key: Column): DataFrame =
    df.where(key.isNotNull)
      .select(groupCols.map(col) :+
        exactDiv(key, WordBits).as("word") :+
        call_function("shiftleft", lit(1L),
          pmod(key, lit(WordBits.toLong)).cast("int")).as("bit"): _*)
      .groupBy((groupCols :+ "word").map(col): _*)
      .agg(bit_or(col("bit")).as("bits"))

  /** Merge two word tables (same groupCols): OR per (group, word). */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "word").map(col): _*)
      .agg(bit_or(col("bits")).as("bits"))

  /** Exact distinct count per group: Σ popcount(bits). The global form
    * (empty `groupCols`) coalesces to 0 on an empty word table so an
    * absent slice counts as zero, matching `andCardinality`.
    */
  def cardinality(words: DataFrame, groupCols: Seq[String]): DataFrame =
    words.groupBy(groupCols.map(col): _*)
      .agg(coalesce(sum(bit_count(col("bits")).cast("long")), lit(0L))
        .as("n_distinct"))

  /** Exact |A ∩ B| from two word tables: popcount of AND, joined on word
    * — absent words contribute nothing, so an inner join is exact.
    */
  def andCardinality(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("word"), col("bits").as("_ba"))
      .join(b.select(col("word"), col("bits").as("_bb")), "word")
      .agg(coalesce(sum(bit_count(col("_ba").bitwiseAND(col("_bb"))).cast("long")),
        lit(0L)).as("n_and"))

  /** Exact |A ∪ B|: popcount of the OR-merged table. */
  def orCardinality(a: DataFrame, b: DataFrame): DataFrame =
    cardinality(merge(a, b, Nil), Nil)
      .withColumnRenamed("n_distinct", "n_or")
}
