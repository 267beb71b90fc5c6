package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SetExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("sorted_intersect_count equals size(array_intersect) on random sorted sets") {
    // hash-derived pseudo-random distinct sorted sets, 200 pairs of varying
    // length including empty and disjoint
    val pairs = spark.range(200).select(
      col("id"),
      sort_array(array_distinct(transform(
        sequence(lit(1), pmod(xxhash64(col("id"), lit(1)), lit(40L)).cast("int")),
        i => pmod(xxhash64(col("id"), i, lit(2)), lit(60L))))).as("a"),
      sort_array(array_distinct(transform(
        sequence(lit(1), pmod(xxhash64(col("id"), lit(3)), lit(40L)).cast("int")),
        i => pmod(xxhash64(col("id"), i, lit(4)), lit(60L))))).as("b"))
    val checked = pairs.select(
      SetExpressions.sortedIntersectCount(col("a"), col("b")).as("walk"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
    assert(checked.filter(col("walk") =!= col("builtin")).count() == 0)
  }

  test("sorted_intersect_count handles empty, identical, and disjoint arrays") {
    val rows = Seq(
      (Seq.empty[Long], Seq(1L, 2L), 0L),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3L),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L), 0L),
      (Seq(-5L, 0L, 7L), Seq(-5L, 7L, 9L), 2L)
    ).toDF("a", "b", "expect")
    assert(rows.filter(
      SetExpressions.sortedIntersectCount(col("a"), col("b")) =!= col("expect"))
      .count() == 0)
  }

  test("sorted_intersect_count is codegen-compatible (no fallback)") {
    // spark.range keeps a live projection (a local Seq constant-folds into
    // a LocalTableScan with no codegen stage to observe)
    val df = spark.range(4).select(
      SetExpressions.sortedIntersectCount(
        array(col("id"), col("id") + 1),
        array(col("id") + 1, col("id") + 2)).as("c"))
    assert(df.as[Long].collect().toSeq == Seq(1L, 1L, 1L, 1L))
    // the starred prefix is the WholeStageCodegen marker in the simple plan
    // string; a CodegenFallback expression would force an unstarred Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [sorted_intersect_count"),
      s"expected the projection inside a codegen stage:\n$plan")
  }
}
