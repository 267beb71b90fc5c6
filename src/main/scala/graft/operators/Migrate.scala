package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-migration table split — a denormalized table at the finest
  * entity grain splits into one table per entity, each the DISTINCT
  * projection of that entity's key + attribute columns, with targeted
  * value corrections and a validation report to run BEFORE cutover
  * (the reference's migration playbook: create new tables without
  * touching the original, validate, then swap — reference
  * migrations/001_split_ports.sql:1, the charger → port → connector
  * split with its post-split connector-type correction).
  *
  * Scale shape: each grain is one `distinct` over its projected columns
  * (map-side partial aggregation, shuffle of the DISTINCT combinations
  * only — at 100 TB the coarse grains shuffle entity cardinalities, not
  * table rows); the validation report is one aggregate per grain plus a
  * left-anti parent check whose sides are already entity-sized. Nothing
  * collects to the driver.
  */
object Migrate {

  /** One target table: `keys` identify the entity, `attrs` ride along.
    * A key combination appearing with TWO attr combinations is a grain
    * violation the validation report surfaces (not an error here — the
    * split must be inspectable before cutover, like the reference's
    * Phase-1-then-validate flow). */
  final case class GrainSpec(name: String, keys: Seq[String], attrs: Seq[String] = Seq.empty)

  /** A targeted post-split correction (the reference's `update ...
    * set CONNECTOR_TYPE = 'CHAdeMO' where ...`): set `column` to
    * `value` on rows matching `where` in table `table`. */
  final case class Correction(table: String, where: Column, column: String, value: Column)

  /** Phase 1: the entity-grain tables, one distinct projection each,
    * with corrections applied to their targets. Returns
    * (grain name → (table, rows corrected counter column name)) — the
    * corrected-row count is carried as a constant column `_n_corrected`
    * for the report and dropped from the table itself by [[validate]].
    */
  def splitByGrain(
      source: DataFrame,
      grains: Seq[GrainSpec],
      corrections: Seq[Correction] = Seq.empty): Map[String, DataFrame] =
    grains.map { g =>
      val projected = source.select((g.keys ++ g.attrs).map(col): _*).distinct()
      val corrected = corrections.filter(_.table == g.name).foldLeft(projected) {
        (df, c) => df.withColumn(c.column, when(c.where, c.value).otherwise(col(c.column)))
      }
      g.name -> corrected
    }.toMap

  /** The pre-cutover validation report, one row per grain:
    *   - `n_rows`: split-table row count
    *   - `grain_unique`: no key combination carries two attr sets
    *   - `covers_source`: the split holds exactly the source's distinct
    *     key combinations (nothing lost, nothing invented)
    *   - `parent_contained`: every row's parent-key prefix exists in
    *     the previous (coarser) grain — referential integrity across
    *     the new tables
    *   - `n_corrected`: rows whose value a [[Correction]] changed
    *     (count of rows matching the correction predicates)
    */
  def validate(
      source: DataFrame,
      grains: Seq[GrainSpec],
      splits: Map[String, DataFrame],
      corrections: Seq[Correction] = Seq.empty): DataFrame = {
    // every check is a 1-row aggregate; the report row is their lazy
    // cross-join (all broadcastable singletons — no driver action, the
    // whole report stays one deferred distributed plan).
    // Distinct key counting goes through a STRUCT of the key columns:
    // `countDistinct(k1, k2)` drops rows where ANY key is null, while the
    // oracle's `count(DISTINCT (k1, k2))` counts null-bearing tuples — a
    // struct is never null itself, so both engines count the same
    // combinations even on dirty keys.
    val reports = grains.zipWithIndex.map { case (g, i) =>
      val t = splits(g.name)
      def keyStruct(df: DataFrame) = struct(g.keys.map(df.apply): _*)
      val stats = t.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(keyStruct(t)).as("n_keys"))
      // ONE source scan per grain: the distinct (keys ++ attrs) projection
      // yields both the source key cardinality and the corrected-row count
      // (rows a correction predicate hits, counted PRE-correction)
      val corrPred = corrections.filter(_.table == g.name)
        .map(_.where).reduceOption(_ || _).getOrElse(lit(false))
      val srcProj = source.select((g.keys ++ g.attrs).map(col): _*).distinct()
      val srcStats = srcProj.agg(
        countDistinct(keyStruct(srcProj)).as("n_src_keys"),
        count(when(corrPred, lit(1))).as("n_corrected_rows"))
      val parentMissing =
        if (i == 0) stats.select(lit(0L).as("n_parent_missing"))
        else {
          val parent = grains(i - 1)
          // null-SAFE anti join (<=> per key): the parent split is a
          // distinct projection of the same source, so a child row whose
          // parent key is null necessarily has its (null) key present in
          // the parent — a null-dropping equi-join would report it as a
          // phantom containment violation
          val childKeys = t.select(parent.keys.map(col): _*).distinct().alias("_c")
          val parentKeys = splits(parent.name)
            .select(parent.keys.map(col): _*).distinct().alias("_p")
          val cond = parent.keys
            .map(k => col(s"_c.$k") <=> col(s"_p.$k"))
            .reduce(_ && _)
          childKeys.join(parentKeys, cond, "left_anti")
            .agg(count(lit(1)).as("n_parent_missing"))
        }
      stats.crossJoin(srcStats).crossJoin(parentMissing)
        .select(
          lit(g.name).as("table_name"),
          col("n_rows"),
          (col("n_rows") === col("n_keys")).as("grain_unique"),
          (col("n_keys") === col("n_src_keys")).as("covers_source"),
          (col("n_parent_missing") === 0L).as("parent_contained"),
          col("n_corrected_rows").as("n_corrected"))
    }
    reports.reduce(_ unionByName _)
  }
}
