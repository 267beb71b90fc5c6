package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("quantileThresholds computes exact type-1 quantiles with duplicates") {
    // values 1..10 each once, plus ten extra 5s → n=20, sorted order has
    // rank: ceil(.25*20)=5 → value 4 (1,2,3,4,5...: positions 5..15 are 5s
    // — wait: sorted = 1,2,3,4,5×11,6,7,8,9,10; rank5=5? position 5 is the
    // first 5. ceil(.5*20)=10 → 5; ceil(.75*20)=15 → 5
    val vals = ((1L to 10L) ++ Seq.fill(10)(5L)).toDF("v")
    val thr = Stats.quantileThresholds(vals, "v", Seq((1, 4), (1, 2), (3, 4)))
      .select($"q_num", $"q_den", $"rank", $"threshold")
      .as[(Int, Int, Long, Long)].collect().sortBy(t => t._1 * 100 / t._2).toSeq
    // sorted values: 1,2,3,4,5,5,5,5,5,5,5,5,5,5,5,6,7,8,9,10
    assert(thr == Seq((1, 4, 5L, 5L), (1, 2, 10L, 5L), (3, 4, 15L, 5L)))
  }

  test("assignQuantileBucket counts thresholds below, duplicates included") {
    val vals = ((1L to 10L) ++ Seq.fill(10)(5L)).toDF("v")
    val thr = Stats.quantileThresholds(vals, "v", Seq((1, 4), (1, 2), (3, 4)))
    val buckets = Stats.assignQuantileBucket(vals.distinct(), "v", thr)
      .select($"v", $"bucket").as[(Long, Long)].collect().toMap
    // all three thresholds equal 5 → v<=5 phase 0, v>5 phase 3
    assert((1L to 5L).forall(buckets(_) == 0L))
    assert((6L to 10L).forall(buckets(_) == 3L))
  }

  test("thresholds are invariant under repartitioning") {
    val vals = (1L to 1000L).map(i => i % 97).toDF("v")
    val a = Stats.quantileThresholds(vals, "v", Seq((9, 10)))
      .select($"threshold").as[Long].collect().toSeq
    val b = Stats.quantileThresholds(vals.repartition(11), "v", Seq((9, 10)))
      .select($"threshold").as[Long].collect().toSeq
    assert(a == b)
  }

  test("bucket assignment never shuffles the corpus") {
    val vals = (1L to 500L).toDF("v")
    val thr = Stats.quantileThresholds(vals, "v", Seq((1, 2)))
    val out = Stats.assignQuantileBucket(vals, "v", thr)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the corpus branch feeds a broadcast nested-loop with NO exchange of
    // its own: every Exchange in the plan belongs to the threshold subtree
    // (cell aggregation / total), which is bounded. Assert the corpus scan
    // reaches the join without repartitioning: no Exchange between the
    // range/scan source and the BroadcastNestedLoopJoin on the stream side.
    val streamSide = plan.split("BroadcastNestedLoopJoin")(0)
    assert(!streamSide.contains("Exchange hashpartitioning"),
      s"corpus side must not shuffle:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast threshold array:\n$plan")
  }

  test("bucket sizes match the quantile split on a uniform distribution") {
    val vals = (1L to 1000L).toDF("v")
    val thr = Stats.quantileThresholds(vals, "v", Seq((1, 4), (1, 2), (3, 4)))
    val sizes = Stats.assignQuantileBucket(vals, "v", thr)
      .groupBy($"bucket").count().as[(Long, Long)].collect().toMap
    assert(sizes == Map(0L -> 250L, 1L -> 250L, 2L -> 250L, 3L -> 250L))
  }
}
