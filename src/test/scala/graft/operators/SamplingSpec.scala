package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratified keeps per-class rates, deterministically") {
    val df = spark.range(10000).select(
      col("id"),
      when(col("id") % 2 === 0, "hot").otherwise("cold").as("cls"))
    def run() = Sampling.stratified(
      df, "cls", bucket = pmod(col("id"), lit(100L)), buckets = 100,
      rates = Map("hot" -> 10), defaultRate = 50)
    val counts = run().groupBy("cls").count().as[(String, Long)].collect().toMap
    // hot = even ids → even buckets; kept when bucket < 10 → 5 even buckets × 100 ids.
    // cold = odd ids → odd buckets; kept when bucket < 50 → 25 odd buckets × 100 ids.
    assert(counts("hot") == 500L && counts("cold") == 2500L)
    // determinism: second run identical row set
    val a = run().select("id").as[Long].collect().toSet
    val b = run().select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("stratified plans as a pure filter (no shuffle)") {
    val df = spark.range(1000).select(col("id"), lit("x").as("cls"))
    val plan = Sampling.stratified(df, "cls", pmod(col("id"), lit(100L)), 100,
      Map("x" -> 10), 0).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }
}
