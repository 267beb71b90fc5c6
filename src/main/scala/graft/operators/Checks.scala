package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Production-time data-quality assertions — the reference runs ~120
  * schema tests on every build (models/marts/marts.yml:10-31 and staging.yml:
  * `not_null`, `unique`, `accepted_values`, `relationships`). Each check
  * here computes its violation count over the data and the whole suite is
  * returned as ONE violations report DataFrame
  * (`check_type, target, violations`), so a pipeline can gate a publish on
  * `report.filter($"violations" > 0).isEmpty` and persist the report next
  * to the mart.
  *
  * Scale shape: all `not_null` + `accepted_values` checks fold into a
  * SINGLE scan-side aggregate pass over the frame (no shuffle — partial
  * aggregation reduces to one row); each `unique` check is one
  * map-side-combined groupBy on its key; each `relationships` check is one
  * anti-join against the parent key set (broadcast when the parent is a
  * dim). Nothing collects to the driver.
  */
object Checks {

  sealed trait Check
  /** Rows where `column` IS NULL (dbt `not_null`). */
  final case class NotNull(column: String) extends Check
  /** Number of DISTINCT key values occurring more than once, nulls ignored
    * (dbt `unique` — its test query counts duplicated values, not rows).
    */
  final case class Unique(columns: Seq[String]) extends Check
  /** Non-null rows whose value is outside `allowed` (dbt `accepted_values`).
    * `allowed` must be non-empty — an empty list would flag every row,
    * which is always a mis-declared check, not an intent.
    */
  final case class AcceptedValues(column: String, allowed: Seq[Any]) extends Check {
    require(allowed.nonEmpty, s"accepted_values($column): empty allowed list")
  }
  /** Non-null child values with no matching parent row (dbt `relationships`:
    * referential integrity child→parent). `parentName` labels the report.
    */
  final case class Relationships(
      column: String, parent: DataFrame, parentColumn: String, parentName: String)
    extends Check

  private def row(checkType: String, target: String, violations: Column): Column =
    struct(lit(checkType).as("check_type"), lit(target).as("target"),
      violations.cast("long").as("violations"))

  /** Run the suite; one report row per check. */
  def violations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    // scan-side checks: one shared aggregate pass
    val scanRows: Seq[Column] = checks.collect {
      case NotNull(c) =>
        row("not_null", c, coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)))
      case AcceptedValues(c, allowed) =>
        row("accepted_values", c,
          coalesce(sum(when(col(c).isNotNull && !col(c).isin(allowed: _*), 1L)
            .otherwise(0L)), lit(0L)))
    }
    val scanReport: Seq[DataFrame] =
      if (scanRows.isEmpty) Nil
      else Seq(df.agg(scanRows.head.as("_r0"),
          scanRows.tail.zipWithIndex.map { case (c, i) => c.as(s"_r${i + 1}") }: _*)
        .select(explode(array((0 until scanRows.size).map(i => col(s"_r$i")): _*)).as("r"))
        .select(col("r.check_type"), col("r.target"), col("r.violations")))
    val keyedReports: Seq[DataFrame] = checks.collect {
      case Unique(cols) =>
        df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
          .groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("_n"))
          .filter(col("_n") > 1)
          .agg(row("unique", cols.mkString(","), count(lit(1))).as("r"))
          .select(col("r.check_type"), col("r.target"), col("r.violations"))
      case Relationships(c, parent, pc, pname) =>
        df.filter(col(c).isNotNull)
          .select(col(c))
          .join(parent.select(col(pc).as(c)), Seq(c), "left_anti")
          .agg(row("relationships", s"$c->$pname.$pc", count(lit(1))).as("r"))
          .select(col("r.check_type"), col("r.target"), col("r.violations"))
    }
    (scanReport ++ keyedReports).reduce(_ unionAll _)
  }
}
