package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composite quality-filter DECISION — the Gopher-rules-style step that
  * turns individual text signals (token count, repetition, stopword and
  * punctuation ratios, …) into an auditable keep/drop verdict. Emitting the
  * violated-rule names alongside the boolean matters in production: corpus
  * curation is iterated by inspecting WHY documents were dropped
  * (per-reason counts, samples per reason), not just how many.
  *
  * Scale shape: the decision is a pure scan-side projection over whatever
  * signal columns the caller computed (themselves single-pass expressions —
  * see `TextExpressions.tokenStats`): no shuffle, no UDFs, stays inside
  * whole-stage codegen. Filtering `keep` then prunes at the scan.
  */
object QualityFilter {

  /** Adds `reasons` (names of violated rules, in rule order) and `keep`
    * (no rule violated). Each rule is (name, violation predicate).
    */
  def decide(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val reasons = filter(
      array(rules.map { case (name, violated) => when(violated, lit(name)) }: _*),
      r => r.isNotNull)
    df.withColumn("reasons", reasons)
      .withColumn("keep", size(col("reasons")) === 0)
  }

  /** Per-reason violation counts plus the kept tally (`_kept` row) — the
    * curation report consumed when tuning thresholds. ONE map-side-combined
    * pass: kept docs contribute a `_kept` tag through the same explode
    * (keep ⇔ empty reasons), instead of a unionAll of two aggregations that
    * would execute the decide subtree twice.
    */
  def report(decided: DataFrame): DataFrame =
    decided
      .select(explode(
        when(col("keep"), array(lit("_kept"))).otherwise(col("reasons"))).as("reason"))
      .groupBy(col("reason"))
      .agg(count(lit(1)).as("n_docs"))
}
