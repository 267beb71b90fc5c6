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

  private def mixCorpus = spark.range(1000).select(
    col("id"),
    concat(lit("c"), pmod(col("id"), lit(4))).as("dom"))

  test("toMixture keeps ≈ budget·w per class, deterministically, capped at 1") {
    // c0 at target rate 0.5; c1 capped (rate would be 2.0); c2/c3 unweighted
    val kept = Sampling.toMixture(mixCorpus, "id", "dom",
      weights = Map("c0" -> 0.2, "c1" -> 0.8), budget = 625L, seed = 3L)
    val counts = kept.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("c0", "c1"), "unweighted classes must be dropped")
    assert(counts("c1") == 250L, "capped class keeps every row")
    // c0: 250 rows at rate 0.5 — uniform hash keeps ~125; generous bounds
    assert(counts("c0") > 85L && counts("c0") < 165L, s"got ${counts("c0")}")
    val a = kept.select("id").as[Long].collect().toSet
    val b = Sampling.toMixture(mixCorpus, "id", "dom",
        Map("c0" -> 0.2, "c1" -> 0.8), 625L, 3L)
      .select("id").as[Long].collect().toSet
    assert(a == b, "same seed must select the identical row set")
    // a different seed selects a different (same-sized ±) row set
    val c = Sampling.toMixture(mixCorpus, "id", "dom",
        Map("c0" -> 0.2, "c1" -> 0.8), 625L, 4L)
      .select("id").as[Long].collect().toSet
    assert(a != c)
  }

  test("toMixture never shuffles the corpus: rates broadcast onto the scan") {
    val df = Sampling.toMixture(mixCorpus, "id", "dom", Map("c0" -> 1.0), 100L, 1L)
    df.collect() // finalize the AQE plan before asserting on it
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), s"rates must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus side must not shuffle for the join:\n$plan")
  }

  // imbalanced classes: 640 / 160 / 40 / 10 rows — shares 79% / 20% / 5% / 1%
  private def skewCorpus = spark.range(850).select(
    col("id"),
    when(col("id") < 640, "en").when(col("id") < 800, "de")
      .when(col("id") < 840, "fr").otherwise("rm").as("lang"))

  test("temperatureBalance keeps the smallest class whole, others ∝ sqrt(n)") {
    val kept = Sampling.temperatureBalance(skewCorpus, "id", "lang", seed = 9L)
    val counts = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts("rm") == 10L, "smallest class must keep every row (rate 1)")
    // expected kept_c = n_c · sqrt(n_min/n_c) = sqrt(n_min · n_c):
    // en: sqrt(10·640) = 80, de: sqrt(10·160) = 40, fr: sqrt(10·40) = 20 —
    // uniform-hash binomial noise, generous ±45% bounds
    assert(counts("en") > 44 && counts("en") < 116, s"en: ${counts("en")}")
    assert(counts("de") > 22 && counts("de") < 58, s"de: ${counts("de")}")
    assert(counts("fr") > 8 && counts("fr") < 32, s"fr: ${counts("fr")}")
    // the flattening property itself: kept shares are closer to uniform
    // than original shares (max/min ratio shrinks from 64 toward sqrt(64)=8)
    val ratio = counts.values.max.toDouble / counts.values.min
    assert(ratio < 64.0 / 4, s"kept max/min ratio $ratio did not flatten")
  }

  test("temperatureBalance is deterministic and never shuffles the corpus") {
    val a = Sampling.temperatureBalance(skewCorpus, "id", "lang", 9L)
    val b = Sampling.temperatureBalance(skewCorpus.repartition(7), "id", "lang", 9L)
    assert(a.select("id").exceptAll(b.select("id")).isEmpty &&
      b.select("id").exceptAll(a.select("id")).isEmpty)
    a.collect() // finalize the AQE plan before asserting on it
    val plan = a.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), s"rates must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus side must not shuffle for the join:\n$plan")
  }

  test("fixedPerStratum draws exactly min(k, stratum size) rows per stratum") {
    val ds = ((1L to 100L).map(i => (i, "big")) ++ (101L to 103L).map(i => (i, "small")))
      .toDF("id", "cls")
    val out = Sampling.fixedPerStratum(ds, Seq("cls"), "id", k = 10, seed = 5L)
    val sizes = out.groupBy($"cls").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("big" -> 10L, "small" -> 3L))
  }

  test("fixedPerStratum is deterministic across reruns and partitionings") {
    val ds = (1L to 500L).map(i => (i, s"c${i % 4}")).toDF("id", "cls")
    val a = Sampling.fixedPerStratum(ds, Seq("cls"), "id", 7, 5L)
      .select($"id").as[Long].collect().sorted.toSeq
    val b = Sampling.fixedPerStratum(ds.repartition(13), Seq("cls"), "id", 7, 5L)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(a == b && a.size == 28)
    // a different seed draws a different sample
    val c = Sampling.fixedPerStratum(ds, Seq("cls"), "id", 7, 6L)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(a != c)
  }

  test("fixedPerStratum grows stably: adding rows only swaps in new winners") {
    val small = (1L to 300L).map(i => (i, "c")).toDF("id", "cls")
    val grown = (1L to 400L).map(i => (i, "c")).toDF("id", "cls")
    val a = Sampling.fixedPerStratum(small, Seq("cls"), "id", 10, 5L)
      .select($"id").as[Long].collect().toSet
    val b = Sampling.fixedPerStratum(grown, Seq("cls"), "id", 10, 5L)
      .select($"id").as[Long].collect().toSet
    // every survivor of the grown draw that existed before was already kept
    assert(b.filter(_ <= 300L).subsetOf(a))
  }

  test("splitAssign is disjoint, exhaustive, and ~proportional") {
    val ds = (1L to 10000L).toDF("id")
    val out = Sampling.splitAssign(ds, "id", 13L,
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val sizes = out.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(sizes.values.sum == 10000L) // every row exactly one split
    assert(math.abs(sizes("train") - 9000L) < 200)
    assert(math.abs(sizes("val") - 500L) < 100)
    assert(math.abs(sizes("test") - 500L) < 100)
  }

  test("splitAssign: growing the corpus never moves an existing row") {
    val small = (1L to 1000L).toDF("id")
    val grown = (1L to 2000L).toDF("id")
    val f = (d: org.apache.spark.sql.DataFrame) =>
      Sampling.splitAssign(d, "id", 13L,
        Seq("train" -> 0.8, "val" -> 0.2))
        .select($"id", $"split").as[(Long, String)].collect().toMap
    val a = f(small)
    val b = f(grown)
    assert(a.forall { case (id, s) => b(id) == s })
  }

  test("splitAssign plans as a pure projection (no shuffle)") {
    val ds = (1L to 100L).toDF("id")
    val out = Sampling.splitAssign(ds, "id", 13L,
      Seq("train" -> 0.9, "val" -> 0.1))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(ds, "id", 13L, Seq("train" -> 0.9, "val" -> 0.2))
    }
  }

  test("fixedPerStratum plans through TopKPerKey heaps, not a window sort") {
    val ds = (1L to 100L).map(i => (i, s"c${i % 3}")).toDF("id", "cls")
    val out = Sampling.fixedPerStratum(ds, Seq("cls"), "id", 5, 5L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKeyExec in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window sort in:\n$plan")
  }
}
