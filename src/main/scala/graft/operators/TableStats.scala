package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table statistics collection — the ANALYZE every cost-based
  * optimizer (and every data-quality dashboard) needs: per column
  * null count, min/max, and an approximate distinct count, computed in a
  * single scan of the table.
  *
  * At 100 TB, statistics are harvested alongside a pass the pipeline was
  * making anyway — never as one scan per column (a 10-column table must
  * not cost 10 scans). The trick is the standard melt: each row explodes
  * into (col_name, string value, numeric value) triples — a constant
  * per-column fan-out ON THE SCAN — and then ONE map-side-combined
  * aggregation per statistic family:
  *
  *  - scalar stats (n_rows, n_nulls, min, max) collapse to |columns| rows
  *    before the exchange;
  *  - ndv uses the portable HLL registers ([[Sketch.registers]]) per
  *    column — exchange ≤ |columns|×256 rows — with the same exact-integer
  *    estimator as every other sketch gate, so the whole profile is
  *    oracle-replayable including the estimate doubles.
  *
  * Callers choose the string rendering per column; for bit-portable
  * hashing of doubles, quantize first (e.g. cast to decimal) — a raw
  * double→string render is NOT portable across engines.
  */
object TableStats {

  /** One profiled column: output name, the hash rendering (drives ndv; null
    * disables ndv for the column), and the numeric rendering (drives
    * min/max; null disables them).
    */
  final case class ProfiledCol(name: String, hashed: Column, numeric: Option[Column])

  /** Profile `cols` of `df` in ONE scan (spec-asserted). Output: col_name,
    * n_rows, n_nulls (of the hash rendering), min_num, max_num, approx_ndv.
    *
    * Shape: melt → one (col_name, bucket) aggregation fusing the scalar
    * partials WITH the register max (nulls ride in a reserved bucket −1 so
    * they reach the scalar stats without touching the sketch) → one final
    * per-column aggregation over ≤ |columns|×257 rows that finishes the
    * scalars and applies the raw-HLL estimator — the identical exact-
    * integer arithmetic as [[Sketch.estimate]], so the estimate doubles
    * stay oracle-replayable bit for bit. No joins, no second scan.
    */
  def profile(df: DataFrame, cols: Seq[ProfiledCol], seed: Long): DataFrame = {
    require(cols.nonEmpty)
    val melted = df.select(explode(array(cols.map { c =>
      struct(
        lit(c.name).as("col_name"),
        c.hashed.cast("string").as("sval"),
        c.numeric.getOrElse(lit(null)).cast("double").as("nval"))
    }: _*)).as("m")).select(col("m.col_name"), col("m.sval"), col("m.nval"))
    val (bucket, rho) = Sketch.bucketRho(col("sval"), seed)
    val cells = melted
      .select(col("col_name"), col("sval"), col("nval"),
        when(col("sval").isNull, lit(-1L)).otherwise(bucket).as("bucket"),
        when(col("sval").isNull, lit(null).cast("int")).otherwise(rho).as("rho"))
      .groupBy(col("col_name"), col("bucket"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(when(col("sval").isNull, 1L).otherwise(0L)).as("nulls"),
        min(col("nval")).as("mn"),
        max(col("nval")).as("mx"),
        max(col("rho")).as("reg"))
    val sTotal = col("_s_present") +
      (lit(Sketch.M.toLong) - col("_nb")).cast("decimal(20,0)") *
        lit(1L << (Sketch.W + 1)).cast("decimal(20,0)")
    cells.groupBy(col("col_name"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        sum(col("nulls")).as("n_nulls"),
        min(col("mn")).as("min_num"),
        max(col("mx")).as("max_num"),
        sum(when(col("reg").isNotNull,
            expr(s"shiftleft(cast(1 as bigint), cast(${Sketch.W + 1} - reg as int))")
              .cast("decimal(20,0)"))
          .otherwise(lit(0L).cast("decimal(20,0)"))).as("_s_present"),
        sum(when(col("reg").isNotNull, 1L).otherwise(0L)).as("_nb"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("min_num"), col("max_num"),
        when(col("_nb") === 0L, lit(null).cast("double"))
          .otherwise(lit(Sketch.Numer) / (sTotal.cast("double") / lit(Sketch.Scale)))
          .as("approx_ndv"))
  }
}
