package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Surrogate-key generation.
  *
  * Mirrors the semantics the reference relies on via
  * `dbt_utils.generate_surrogate_key` (md5 over '-'-joined, null-sentinel
  * coalesced string casts) — see reference
  * models/marts/fact_visits.sql:417 and dbt-utils' public implementation.
  * Pure `functions._` so it stays inside whole-stage codegen.
  */
object Keys {
  val NullSentinel = "_null_"

  /** md5 surrogate key over any number of columns (null-safe, order-significant). */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit(NullSentinel))): _*))

  /** DuckDB-equivalent SQL text for the same key, for oracle queries. */
  def surrogateKeySql(cols: String*): String =
    cols.map(c => s"coalesce(cast($c as varchar), '$NullSentinel')")
      .mkString("md5(concat_ws('-', ", ", ", "))")
}
