package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative metric/semantic layer — the reference's user-facing product
  * surface (models/semantic/semantic_models.yml:97-383): measures are
  * declared ONCE on a model, metrics (simple or ratio) are declared over
  * measures, and any metric can then be instantiated over an arbitrary
  * dimension set without rewriting the aggregation — "same metric,
  * different grain" is a parameter, not a new query.
  *
  * Spark realization: one `groupBy(dims).agg(...)` pass computes every
  * measure the requested metrics (transitively) need — the `sum(when)`
  * conditional-aggregate family, all map-side combinable, a single shuffle
  * on the dimension key regardless of how many metrics are requested.
  * Ratio metrics are post-aggregation projections, so they cost nothing
  * extra and stay exact (counts divide deterministically).
  */
object MeasureAgg {
  sealed trait Agg
  /** count(expr): non-null count — yml `agg: count` with a `case when` expr. */
  case object Count extends Agg
  /** count(DISTINCT expr) — hierarchy cardinalities. */
  case object CountDistinct extends Agg
  /** sum(expr) — yml `agg: sum`. */
  case object Sum extends Agg
  /** sum(cast(expr as bigint)) over booleans — yml `agg: sum_boolean`. */
  case object SumBoolean extends Agg
  /** Exact-order-free mean: cast(sum(expr) as double) / count(expr).
    * Pass a decimal-cast expr to make the sum association-order-exact —
    * then the single final double division is deterministic across engines
    * and partitionings (a running double mean is not). yml `agg: average`.
    */
  case object Average extends Agg
  case object Min extends Agg
  case object Max extends Agg
}

/** A named aggregate over a model column expression. */
final case class Measure(name: String, agg: MeasureAgg.Agg, expr: Column) {
  import MeasureAgg._
  def aggColumn: Column = (agg match {
    case Count         => count(expr)
    case CountDistinct => count_distinct(expr)
    case Sum           => sum(expr)
    case SumBoolean    => sum(expr.cast("long"))
    case Average       =>
      when(count(expr) > 0, sum(expr).cast("double") / count(expr).cast("double"))
    case Min           => min(expr)
    case Max           => max(expr)
  }).as(name)
}

object SemanticModel {
  /** Time dimension at a declared granularity — yml `type: time` with
    * `time_granularity: day|week|month|quarter|year` (the grain every
    * reference model declares on its agg_time_dimension). Returns an
    * aliased date column usable directly as a `query(..., dims, ...)` dim.
    */
  def timeDim(c: Column, granularity: String, name: String): Column = {
    val g = granularity.toLowerCase(java.util.Locale.ROOT)
    require(Set("day", "week", "month", "quarter", "year")(g),
      s"unsupported time granularity '$granularity'")
    date_trunc(g, c).cast("date").as(name)
  }
}

sealed trait Metric { def name: String }
/** yml `type: simple` — the value of one measure. */
final case class SimpleMetric(name: String, measure: String) extends Metric
/** yml `type: ratio` — numerator metric / denominator metric (by NAME, so
  * ratios compose over already-declared metrics, as in the yml). Emitted as
  * double; null when the denominator is 0.
  */
final case class RatioMetric(name: String, numerator: String, denominator: String)
    extends Metric

/** A semantic model: measure + metric declarations over one input frame. */
final case class SemanticModel(measures: Seq[Measure], metrics: Seq[Metric]) {
  private val measureByName: Map[String, Measure] =
    measures.map(m => m.name -> m).toMap
  private val metricByName: Map[String, Metric] =
    metrics.map(m => m.name -> m).toMap
  require(measures.map(_.name).distinct.size == measures.size, "duplicate measure name")
  require(metrics.map(_.name).distinct.size == metrics.size, "duplicate metric name")

  /** Measures a metric needs, transitively through ratio references. */
  private def neededMeasures(name: String, seen: Set[String]): Set[String] = {
    require(!seen(name), s"metric reference cycle through '$name'")
    metricByName.getOrElse(name,
      throw new IllegalArgumentException(s"unknown metric '$name'")) match {
      case SimpleMetric(_, meas) =>
        require(measureByName.contains(meas), s"unknown measure '$meas'")
        Set(meas)
      case RatioMetric(_, num, den) =>
        neededMeasures(num, seen + name) ++ neededMeasures(den, seen + name)
    }
  }

  /** Post-aggregation value of a metric (aggregated measures are columns). */
  private def metricValue(name: String): Column = metricByName(name) match {
    case SimpleMetric(_, meas)     => col(meas)
    case RatioMetric(_, num, den)  =>
      val d = metricValue(den)
      when(d =!= 0, metricValue(num).cast("double") / d.cast("double"))
  }

  /** Instantiate `metricNames` over `dims` in ONE aggregation pass.
    * `dims` must be aliased columns (their names become output columns);
    * empty `dims` → a single grand-total row. Output: dims ++ one column
    * per requested metric, named after the metric.
    */
  def query(df: DataFrame, dims: Seq[Column], metricNames: Seq[String]): DataFrame = {
    require(metricNames.nonEmpty, "no metrics requested")
    val needed = metricNames.foldLeft(Set.empty[String])(_ ++ neededMeasures(_, Set.empty))
    val aggCols = measures.filter(m => needed(m.name)).map(_.aggColumn)
    val aggregated =
      if (dims.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
      else df.groupBy(dims: _*).agg(aggCols.head, aggCols.tail: _*)
    val dimNames = aggregated.columns.dropRight(aggCols.size).toSeq
    // a dim named like a measure would make the measure reference ambiguous
    // in the projection below — fail with the actual clash, not an
    // unresolved-column AnalysisException
    val clash = dimNames.toSet.intersect(needed)
    require(clash.isEmpty, s"dimension name(s) collide with measure name(s): $clash")
    aggregated.select(
      dimNames.map(col) ++ metricNames.map(n => metricValue(n).as(n)): _*)
  }
}
