package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mergeable aggregate state: (1) metrics derived from merged daily state
  * equal metrics computed directly from facts at the coarse grain — the
  * correctness contract of incremental view maintenance; (2) state built
  * from disjoint fact slices and merged equals state built from all facts —
  * the "only new days touch raw data" property the pattern exists for.
  */
class AggStateSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    // (type, ts, value, user) spanning two months, three days
    ("a", "2024-01-01 10:00:00", 1.5, 1L),
    ("a", "2024-01-01 11:00:00", 2.5, 2L),
    ("a", "2024-01-15 10:00:00", -3.0, 1L),
    ("a", "2024-02-01 09:00:00", 7.25, 3L),
    ("b", "2024-01-02 00:00:00", 10.0, 1L),
    ("b", "2024-02-02 00:00:00", 0.125, 1L))
    .toDF("event_type", "ts_s", "value", "user_id")
    .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")

  private def monthOf = (d: org.apache.spark.sql.Column) =>
    to_date(date_trunc("month", d))

  test("merged daily state reproduces direct coarse-grain aggregation") {
    val merged = AggState.mergeToGrain(
        AggState.dailyScalarState(facts, Seq("event_type"), col("ts"), col("value")),
        AggState.dailyRegisterState(facts, Seq("event_type"), col("ts"), col("user_id")),
        Seq("event_type"), monthOf)
      .select("event_type", "grain", "n_events", "total_value", "min_value", "max_value")
    val direct = facts.groupBy(col("event_type"), monthOf(to_date(col("ts"))).as("grain"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "state-derived metrics must equal direct aggregation")
  }

  test("registers merged from daily state equal month-grain registers built directly") {
    val daily = AggState.dailyRegisterState(facts, Seq("event_type"), col("ts"), col("user_id"))
    val mergedToMonth = daily
      .groupBy(col("event_type"), monthOf(col("day")).as("m"), col("bucket"))
      .agg(max("reg").as("reg"))
    val direct = Sketch.registers(
        facts.withColumn("m", monthOf(to_date(col("ts")))),
        Seq("event_type", "m"), col("user_id"), AggState.HllSeed)
    assert(mergedToMonth.exceptAll(direct).isEmpty && direct.exceptAll(mergedToMonth).isEmpty,
      "max-merge associativity: day→month merge == direct month registers")
  }

  test("state from disjoint slices merges to the same answer as full-corpus state") {
    val jan = facts.filter(month(col("ts")) === 1)
    val feb = facts.filter(month(col("ts")) === 2)
    val sliced = AggState.mergeToGrain(
      AggState.dailyScalarState(jan, Seq("event_type"), col("ts"), col("value"))
        .unionByName(AggState.dailyScalarState(feb, Seq("event_type"), col("ts"), col("value"))),
      AggState.dailyRegisterState(jan, Seq("event_type"), col("ts"), col("user_id"))
        .unionByName(AggState.dailyRegisterState(feb, Seq("event_type"), col("ts"), col("user_id"))),
      Seq("event_type"), monthOf)
    val whole = AggState.mergeToGrain(
      AggState.dailyScalarState(facts, Seq("event_type"), col("ts"), col("value")),
      AggState.dailyRegisterState(facts, Seq("event_type"), col("ts"), col("user_id")),
      Seq("event_type"), monthOf)
    assert(sliced.exceptAll(whole).isEmpty && whole.exceptAll(sliced).isEmpty,
      "incremental slices must merge to the full-corpus answer")
  }
}
