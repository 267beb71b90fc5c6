package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityFilterSpec extends SparkSpec {
  import spark.implicits._

  test("decide emits violated rules in rule order; keep ⇔ no violations") {
    val df = Seq(
      (1L, 10L, 5L),   // short AND repetitive (dup 0.5 > 0.4)
      (2L, 100L, 90L), // clean
      (3L, 100L, 30L)  // repetitive only (dup 0.7)
    ).toDF("id", "n", "nd")
    val out = QualityFilter.decide(df, Seq(
        "too_short" -> (col("n") < 32),
        "too_repetitive" -> ((col("n") - col("nd")).cast("double")
          > lit(0.4) * col("n").cast("double"))))
      .select($"id", $"keep", $"reasons")
      .as[(Long, Boolean, Seq[String])].collect().sortBy(_._1)
    assert(out(0) == ((1L, false, Seq("too_short", "too_repetitive"))))
    assert(out(1) == ((2L, true, Seq.empty[String])))
    assert(out(2) == ((3L, false, Seq("too_repetitive"))))
  }

  test("report tallies per-reason counts and kept docs in one pass") {
    val df = Seq((1L, 10L), (2L, 100L), (3L, 5L)).toDF("id", "n")
    val decided = QualityFilter.decide(df, Seq("too_short" -> (col("n") < 32)))
    val rep = QualityFilter.report(decided)
      .as[(String, Long)].collect().toMap
    assert(rep == Map("too_short" -> 2L, "_kept" -> 1L))
    // one pass: the report plan contains a single scan of the source
    val plan = QualityFilter.report(decided).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union"), s"report must not union two passes:\n$plan")
  }

  test("decide stays a scan-side projection (no shuffle)") {
    val df = Seq((1L, 10L)).toDF("id", "n")
    val plan = QualityFilter.decide(df, Seq("r" -> (col("n") < 32)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decide must not shuffle:\n$plan")
  }
}
