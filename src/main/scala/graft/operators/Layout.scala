package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: multi-dimensional clustering for file
  * skipping.
  *
  * At 100 TB the dominant scan cost is files that DIDN'T need reading. A
  * table range-partitioned on one column prunes on that column only; a
  * z-ordered layout interleaves the bits of two (or more) dimension keys so
  * that rows close in ANY dimension land in the same files — per-file
  * min/max statistics then prune selective predicates on EITHER dimension
  * (the layout device behind Delta/Iceberg `ZORDER BY`; Morton 1966,
  * Orenstein & Merrett 1984). The operator itself is pure arithmetic on the
  * scan (zero shuffle); the layout write is one `repartitionByRange` on the
  * z-value.
  *
  * The bit-spread uses the classic mask-doubling sequence — 5 shift/and
  * steps per dimension, no loop, no UDF — and every constant is an int64
  * literal, so the whole computation replays digit-for-digit in any engine
  * with `&`, `|`, `<<` (the oracle does exactly that). Inputs are clamped
  * to 31 bits so the interleaved result (≤ 62 bits) stays positive in a
  * signed int64 in both engines.
  */
object Layout {

  private val Masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 31 bits of `v` to even bit positions (Morton spread). */
  def spreadBits(v: Column): Column =
    Masks.foldLeft(v.bitwiseAND(lit(0x7FFFFFFFL))) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** Morton-interleave two non-negative dimension keys (≤ 31 bits each):
    * x on even bits, y on odd bits. Monotone in each dimension along its
    * own bit lattice — the property that makes per-file min/max ranges
    * tight in both dimensions after range-partitioning on the result.
    */
  def zValue(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** DuckDB replay of [[spreadBits]] over SQL fragment `v`. */
  def spreadBitsSql(v: String): String =
    Masks.foldLeft(s"(($v) & 2147483647)") { case (acc, (s, m)) =>
      s"((($acc) | (($acc) << $s)) & $m)"
    }

  /** DuckDB replay of [[zValue]]. */
  def zValueSql(x: String, y: String): String =
    s"(${spreadBitsSql(x)} | (${spreadBitsSql(y)} << 1))"

  /** Rewrite `df` clustered by the z-value of two dimension columns into
    * `numFiles` range partitions — the layout write. Range partitioning on
    * z gives each output file a contiguous z-interval, i.e. a small
    * bounding box in (x, y) space; file-level min/max stats on BOTH
    * dimensions become selective.
    */
  def zOrderBy(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame =
    df.withColumn("_z", zValue(x, y))
      .repartitionByRange(numFiles, col("_z"))
      .drop("_z")

  /** Shard count for [[epochShuffle]] derived from the corpus size:
    * ceil(n / targetPerShard), floored at `minShards`. A pinned shard
    * count makes each (epoch, shard) window sort an O(N/shards) slice —
    * a global-sort scale shape; deriving it keeps every window's sort
    * bounded at ~targetPerShard rows at any corpus size (the ICP k rule,
    * [[graft.operators.Packing]]). Integer arithmetic only, so an
    * external SQL engine derives the identical count from its own
    * count(*).
    */
  def shardsFor(n: Long, targetPerShard: Long = 8192L, minShards: Int = 8): Int = {
    require(targetPerShard > 0 && minShards > 0)
    math.max(minShards.toLong, (n + targetPerShard - 1) / targetPerShard).toInt
  }

  /** Deterministic multi-epoch training-order shuffle — the data-loader
    * layout contract: every (document, epoch) pair gets a (shard, pos)
    * placement such that reading each shard in pos order replays the
    * epoch's training order EXACTLY, every epoch is an independent
    * pseudorandom permutation, and the whole assignment is a pure
    * function of (id, epoch, seed) — resumable from any point, and
    * regenerable on any cluster size with zero coordination (the
    * WebDataset/tf.data shard-shuffle discipline, stated as a query).
    *
    * The permutation key is the engine-portable md5 20-bit draw
    * ([[graft.sources.ZipfCorpus.u20]]'s construction), so an external
    * SQL engine replays placements digit-for-digit. Scale shape: one
    * projection (key, shard) + one window per (epoch, shard) — shard
    * count scales with the corpus, so each window sorts a bounded
    * ~n/shards slice; no global ordering, no driver state.
    *
    * Key-collision note: `pos` tie-breaks equal keys by id, so the order
    * stays total and deterministic even where the 20-bit draws collide.
    */
  def epochShuffle(
      df: DataFrame,
      idCol: String,
      epochs: Int,
      shards: Int,
      seed: String = "ep"): DataFrame = {
    require(epochs > 0 && shards > 0, "need epochs > 0 and shards > 0")
    val key = graft.sources.ZipfCorpus.u20(
      concat(col(idCol).cast("string"), lit(s":$seed:"), col("epoch").cast("string")))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("_key"), col(idCol))
    df.select(col(idCol),
        explode(sequence(lit(0L), lit((epochs - 1).toLong))).as("epoch"))
      .withColumn("_key", key)
      .withColumn("shard", pmod(col("_key"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("epoch"), col("shard"), col("pos"))
  }
}
