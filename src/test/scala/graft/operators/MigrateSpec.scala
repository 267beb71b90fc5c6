package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Negative-case and idempotence pins for the schema-migration split
  * (operators/Migrate.scala — reference migrations/001_split_ports.sql:1).
  * The gate (q_split_migration) only ever sees a CLEAN source, so every
  * validation check passes there; this spec plants each violation class and
  * asserts the report actually flips the corresponding flag.
  */
class MigrateSpec extends SparkSpec {
  import Migrate._

  private def report(src: DataFrame, grains: Seq[GrainSpec],
      corr: Seq[Correction] = Seq.empty): Map[String, Row] = {
    val splits = Migrate.splitByGrain(src, grains, corr)
    Migrate.validate(src, grains, splits, corr)
      .collect().map(r => r.getString(0) -> r).toMap
  }

  private val grains = Seq(
    GrainSpec("parents", Seq("pid")),
    GrainSpec("children", Seq("pid", "cid"), Seq("attr")))

  private def df(rows: Seq[(Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("pid", "cid", "attr")
  }

  test("clean source: every check passes, counts match the entity grains") {
    val rep = report(df(Seq((1L, 10L, "a"), (1L, 11L, "b"), (2L, 20L, "a"),
      (2L, 20L, "a"))), grains) // exact dup row collapses in the distinct
    val p = rep("parents"); val c = rep("children")
    assert(p.getLong(1) == 2 && c.getLong(1) == 3)
    for (r <- Seq(p, c); i <- 2 to 4) assert(r.getBoolean(i), s"$r check $i")
    assert(p.getLong(5) == 0 && c.getLong(5) == 0)
  }

  test("planted grain violation: same key, two attr sets → grain_unique=false") {
    val rep = report(df(Seq((1L, 10L, "a"), (1L, 10L, "B"))), grains)
    assert(!rep("children").getBoolean(2), "grain_unique must flip")
    assert(rep("children").getBoolean(3), "coverage is still exact")
    assert(rep("parents").getBoolean(2), "coarser grain unaffected")
  }

  test("missing parent key: child references pid absent from parent split → parent_contained=false") {
    // sabotage: hand the validator a parents split missing pid=2
    val src = df(Seq((1L, 10L, "a"), (2L, 20L, "b")))
    val splits = Migrate.splitByGrain(src, grains)
    val broken = splits.updated("parents", splits("parents").filter(col("pid") =!= 2L))
    val rep = Migrate.validate(src, grains, broken)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!rep("children").getBoolean(4), "parent_contained must flip")
    assert(!rep("parents").getBoolean(3), "truncated parents no longer covers source")
  }

  test("lost rows: split missing a source key combination → covers_source=false") {
    val src = df(Seq((1L, 10L, "a"), (2L, 20L, "b")))
    val splits = Migrate.splitByGrain(src, grains)
    val broken = splits.updated("children", splits("children").filter(col("cid") =!= 20L))
    val rep = Migrate.validate(src, grains, broken)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!rep("children").getBoolean(3), "covers_source must flip")
  }

  test("corrections: applied to the target grain only, counted pre-correction, idempotent") {
    val corr = Seq(Correction("children", col("cid") === 10L, "attr", lit("X")))
    val src = df(Seq((1L, 10L, "a"), (1L, 11L, "b"), (2L, 10L, "X")))
    val splits = Migrate.splitByGrain(src, grains, corr)
    val children = splits("children").orderBy("pid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(children.toSeq == Seq((1L, 10L, "X"), (1L, 11L, "b"), (2L, 10L, "X")))
    // n_corrected counts predicate HITS on the pre-correction projection —
    // including the (2,10,"X") row that already held the target value
    val rep = report(src, grains, corr)
    assert(rep("children").getLong(5) == 2)
    assert(rep("parents").getLong(5) == 0, "correction scoped to its table")
    // idempotence: re-splitting the corrected table with the same correction
    // changes nothing
    val again = Migrate.splitByGrain(splits("children"), Seq(grains(1)), corr)
    assert(again("children").orderBy("pid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq == children.toSeq)
  }

  test("null key combinations count identically to the tuple-DISTINCT oracle semantics") {
    // countDistinct(k1, k2) would DROP the null-bearing rows and report a
    // phantom grain violation (n_rows > n_keys); the struct-based count must
    // treat (null, 10) as a countable combination like DuckDB's
    // count(DISTINCT (pid, cid))
    import spark.implicits._
    val src = Seq((Some(1L), 10L, "a"), (None, 10L, "b"), (None, 11L, "b"))
      .toDF("pid", "cid", "attr")
    val g = Seq(GrainSpec("parents", Seq("pid")), GrainSpec("children", Seq("pid", "cid"), Seq("attr")))
    val rep = report(src, g)
    assert(rep("parents").getLong(1) == 2, "null pid is one parent entity")
    assert(rep("parents").getBoolean(2) && rep("parents").getBoolean(3))
    assert(rep("children").getLong(1) == 3)
    assert(rep("children").getBoolean(2), "3 rows, 3 distinct null-bearing key tuples")
    assert(rep("children").getBoolean(3))
    assert(rep("children").getBoolean(4),
      "null parent key is contained null-safely (<=>): the parent split is " +
        "a distinct projection of the same source, so (null) is present " +
        "there — not a phantom containment violation")
  }
}
