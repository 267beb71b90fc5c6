package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  // id 2 duplicated, one null seg, one disallowed seg, one orphan pid,
  // one null pid (ignored by relationships, counted by nothing here)
  private def child = Seq(
    (1L, Option("a"), Option(10L)),
    (2L, Option.empty[String], Option(10L)),
    (2L, Option("b"), Option(99L)),
    (3L, Option("zz"), Option.empty[Long])
  ).toDF("id", "seg", "pid")

  private def parent = Seq(Tuple1(10L)).toDF("pid")

  private def suite = Seq(
    Checks.NotNull("seg"),
    Checks.NotNull("id"),
    Checks.Unique(Seq("id")),
    Checks.AcceptedValues("seg", Seq("a", "b")),
    Checks.Relationships("pid", parent, "pid", "parent"))

  test("each check type reports its exact violation count") {
    val report = Checks.violations(child, suite)
      .as[(String, String, Long)].collect().toSet
    assert(report == Set(
      ("not_null", "seg", 1L),
      ("not_null", "id", 0L),
      ("unique", "id", 1L),              // ONE duplicated value (id=2), not 2 rows
      ("accepted_values", "seg", 1L),    // "zz"
      ("relationships", "pid->parent.pid", 1L))) // 99; null pid ignored
  }

  test("clean (and empty) data reports all-zero violations, never null") {
    val clean = Seq((1L, Option("a"), Option(10L))).toDF("id", "seg", "pid")
    val r1 = Checks.violations(clean, suite).as[(String, String, Long)].collect()
    assert(r1.length == 5 && r1.forall(_._3 == 0L))
    val r2 = Checks.violations(child.filter(lit(false)), suite)
      .as[(String, String, Long)].collect()
    assert(r2.length == 5 && r2.forall(_._3 == 0L))
  }

  test("an empty accepted_values list is rejected at declaration time") {
    intercept[IllegalArgumentException] {
      Checks.AcceptedValues("seg", Nil)
    }
  }

  test("scan-side checks share ONE aggregate pass over the frame") {
    val report = Checks.violations(child, Seq(
      Checks.NotNull("seg"), Checks.NotNull("id"),
      Checks.AcceptedValues("seg", Seq("a", "b"))))
    report.collect()
    val plan = report.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // three scan checks, one aggregation of the child frame: exactly one
    // final+partial HashAggregate pair, one scan of the input
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"scan checks re-scan the input ($scans scans):\n$plan")
  }
}
