package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. At 100 TB, sampling
  * must be (a) shuffle-free — a scan-side filter that parquet row groups
  * stream through, (b) reproducible across runs and engines, and (c)
  * stratified — per-class rates, since web-scale corpora are wildly
  * imbalanced. Hash-mod bucketing gives all three; `TABLESAMPLE`/`rand()`
  * give none (nondeterministic, non-stratified).
  */
object Sampling {

  /** Keep rows where `bucket` (0..buckets-1, derived deterministically from
    * a unit column) falls under the class's per-mille/percent rate.
    * `rates` maps class value → kept buckets; unlisted classes use
    * `defaultRate`. Pure filter: no shuffle, pushdown-friendly.
    *
    * Pass `bucket = pmod(xxhash64(col(id)), lit(buckets))` in production —
    * uniform even when ids are clustered; any deterministic bucketing
    * expression works (the oracle-checked query uses a plain modulus so a
    * SQL engine can reproduce it).
    */
  def stratified(
      df: DataFrame,
      classCol: String,
      bucket: Column,
      buckets: Int,
      rates: Map[String, Int],
      defaultRate: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (cls, r)) =>
      when(col(classCol) === cls, lit(r)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }
}
