package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
