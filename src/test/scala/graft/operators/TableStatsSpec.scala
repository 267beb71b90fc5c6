package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** One-pass profile: correct per-column stats (incl. nulls and disabled
  * families), ndv accuracy within the raw-HLL envelope, and the one-scan
  * plan claim.
  */
class TableStatsSpec extends SparkSpec {
  import spark.implicits._
  import TableStats.ProfiledCol

  private def df = Seq(
    (1L, Some("a"), Some(1.5)), (2L, Some("b"), None),
    (3L, None, Some(-2.0)), (4L, Some("a"), Some(7.25)))
    .toDF("id", "s", "v")

  test("profile reports nulls, min/max, and row counts per column") {
    val out = TableStats.profile(df, Seq(
      ProfiledCol("id", col("id"), Some(col("id"))),
      ProfiledCol("s", col("s"), None),
      ProfiledCol("v", col("v").cast("decimal(18,2)"), Some(col("v")))),
      seed = 3L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("id", "s", "v"))
    val id = out("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 0L)
    assert(id.getDouble(3) == 1.0 && id.getDouble(4) == 4.0)
    val s = out("s")
    assert(s.getLong(2) == 1L, "one null in s")
    assert(s.isNullAt(3) && s.isNullAt(4), "min/max disabled for strings")
    val v = out("v")
    assert(v.getLong(2) == 1L && v.getDouble(3) == -2.0 && v.getDouble(4) == 7.25)
  }

  test("ndv estimate lands within the raw-HLL error envelope") {
    val big = (1L to 5000L).map(i => (i, s"u${i % 700}")).toDF("id", "s")
    val out = TableStats.profile(big, Seq(
      ProfiledCol("id", col("id"), Some(col("id"))),
      ProfiledCol("s", col("s"), None)), seed = 7L)
      .select($"col_name", $"approx_ndv").as[(String, Double)].collect().toMap
    // raw-HLL @ 256 registers: std err ~6.5%; allow 4 sigma
    assert(math.abs(out("id") - 5000.0) / 5000.0 < 0.26, s"id ndv ${out("id")}")
    assert(math.abs(out("s") - 700.0) / 700.0 < 0.26, s"s ndv ${out("s")}")
  }

  test("the profile costs ONE scan of the table") {
    val t = java.nio.file.Files.createTempDirectory("graft_profile").toString
    df.write.parquet(s"$t/t")
    val pdf = spark.read.parquet(s"$t/t")
    val out = TableStats.profile(pdf, Seq(
      ProfiledCol("id", col("id"), Some(col("id"))),
      ProfiledCol("s", col("s"), None)), seed = 3L)
    val scans = "Scan parquet".r.findAllIn(
      out.queryExecution.executedPlan.toString).size
    assert(scans == 1, s"profile must melt on one scan, found $scans")
  }
}
