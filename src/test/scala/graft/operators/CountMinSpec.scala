package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min contracts the oracle gate cannot see: the overestimate
  * inequality holds for EVERY item (not just the gate's top-20 probes),
  * and counter tables merge by cell-sum into exactly the whole-corpus
  * table — the incremental/cross-day path.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish token stream: token i appears ~N/i times — guarantees hot
  // cells, collisions, and a long tail at width 64
  private def items = {
    val rows = for { i <- 1 to 80; _ <- 1 to (200 / i) } yield s"tok$i"
    rows.toDF("token")
  }

  test("estimate >= true count for every item, with equality somewhere") {
    val counters = Sketch.countMinCounters(items, Nil, $"token",
      depth = 3, width = 64, seed = 5L)
    val truth = items.groupBy($"token").agg(count(lit(1)).as("true_cnt"))
    val est = Sketch.countMinEstimate(counters, truth.select($"token"), Nil,
      "token", depth = 3, width = 64, seed = 5L)
    val joined = est.join(truth, Seq("token"))
      .select($"token", $"est_cnt", $"true_cnt")
      .as[(String, Long, Long)].collect()
    assert(joined.length == 80)
    val under = joined.filter { case (_, e, t) => e < t }
    assert(under.isEmpty, s"count-min UNDERestimated: ${under.take(5).toSeq}")
    // width 64 << 80 items forces collisions: some overestimate must occur,
    // and the hottest tokens should still estimate exactly (min survives)
    assert(joined.exists { case (_, e, t) => e > t },
      "no collisions at width 64 — test has no discriminating power")
  }

  test("counters combine map-side and estimates broadcast the counter table") {
    val counters = Sketch.countMinCounters(items, Nil, $"token",
      depth = 3, width = 64, seed = 5L)
    val cPlan = counters.queryExecution.executedPlan.toString
    val partial = cPlan.indexOf("partial_count")
    val exchange = cPlan.indexOf("Exchange hashpartitioning")
    assert(partial >= 0 && exchange >= 0 && partial > exchange,
      // executedPlan prints top-down: the final agg (above the exchange)
      // appears FIRST, the partial agg below it — partial > exchange in
      // string order means the partial sits under the exchange, i.e. the
      // item stream is combined map-side before any shuffle
      s"expected partial aggregation below the exchange, plan:\n$cPlan")
    val est = Sketch.countMinEstimate(counters,
      items.select($"token").distinct(), Nil, "token",
      depth = 3, width = 64, seed = 5L)
    val ePlan = est.queryExecution.executedPlan.toString
    assert(ePlan.contains("BroadcastHashJoin") && !ePlan.contains("SortMergeJoin"),
      s"probe join must broadcast the counter table, plan:\n$ePlan")
  }

  test("counter tables merge by cell-sum into the whole-corpus table") {
    val (a, b) = (items.filter(substring($"token", 4, 10).cast("int") % 2 === 0),
                  items.filter(substring($"token", 4, 10).cast("int") % 2 === 1))
    def cm(df: org.apache.spark.sql.DataFrame) =
      Sketch.countMinCounters(df, Nil, $"token", depth = 3, width = 64, seed = 5L)
    val merged = Sketch.countMinMerge(cm(a), cm(b), Nil)
      .select($"r", $"bucket", $"cnt").as[(Int, Long, Long)].collect().toSet
    val whole = cm(items)
      .select($"r", $"bucket", $"cnt").as[(Int, Long, Long)].collect().toSet
    assert(merged == whole, "merged half-corpus counters != whole-corpus counters")
  }

  test("join-size estimate >= true inner product, exact when collision-free") {
    // side A: tok_i × i for i in 1..10; side B: tok_i × (11-i)
    // true |A ⋈ B| = Σ i·(11−i) = 220
    val a = (for { i <- 1 to 10; _ <- 1 to i } yield s"tok$i").toDF("k")
    val b = (for { i <- 1 to 10; _ <- 1 to (11 - i) } yield s"tok$i").toDF("k")
    def cm(df: org.apache.spark.sql.DataFrame, width: Int) =
      Sketch.countMinCounters(df, Nil, $"k", depth = 3, width = width, seed = 7L)
    // wide sketch: 10 keys in 1024 buckets — collision-free with this seed,
    // so the inner product is EXACT, pinning the estimator arithmetic
    val wide = Sketch.countMinJoinSize(cm(a, 1024), cm(b, 1024))
      .as[Long].head()
    assert(wide == 220L, s"collision-free sketch must be exact, got $wide")
    // narrow sketch: 4 buckets force collisions — still never underestimates
    val narrow = Sketch.countMinJoinSize(cm(a, 4), cm(b, 4)).as[Long].head()
    assert(narrow >= 220L, s"join-size sketch underestimated: $narrow")
  }

  test("estimate drops null probes and collapses duplicates to distinct grain") {
    val counters = Sketch.countMinCounters(items, Nil, $"token",
      depth = 3, width = 64, seed = 5L)
    // duplicated + null probes: the output grain contract is DISTINCT
    // non-null probe values — an estimate is a property of the value
    val probes = Seq(Some("tok1"), Some("tok1"), None, Some("tok2"), None)
      .toDF("token")
    val est = Sketch.countMinEstimate(counters, probes, Nil, "token",
      depth = 3, width = 64, seed = 5L)
      .as[(String, Long)].collect().toMap
    assert(est.keySet == Set("tok1", "tok2"),
      s"expected distinct non-null probes only, got ${est.keySet}")
    assert(est("tok1") >= 200L && est("tok2") >= 100L)
  }
}
