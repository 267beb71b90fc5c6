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

  test("rollingAnomaly flags a spike against the entity's own trailing window") {
    import spark.implicits._
    // entity 1: steady 10.0 with jitter, then a spike; entity 2: constant
    val rows =
      (1 to 10).map(i => (i.toLong, 1L, sqlTs(f"2024-01-01 10:${i}%02d:00"),
        10.0 + (i % 3) * 0.5)) ++
      Seq((11L, 1L, sqlTs("2024-01-01 10:11:00"), 50.0)) ++   // spike
      (1 to 8).map(i => (100L + i, 2L, sqlTs(f"2024-01-01 10:${i}%02d:00"), 7.0))
    val out = Stats.rollingAnomaly(
        rows.toDF("event_id", "user_id", "ts", "value"),
        Seq("user_id"), Seq(col("ts"), col("event_id")), "value")
      .select($"event_id", $"z_score", $"is_anomaly")
      .as[(Long, Option[Double], Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(11L)._2 == 1L, s"spike must flag: ${out(11L)}")
    // first 6 rows of each entity have no full window -> null score
    (1L to 6L).foreach(i => assert(out(i)._1.isEmpty))
    // steady jitter is not anomalous
    (7L to 10L).foreach(i => assert(out(i)._2 == 0L))
    // constant entity: zero variance -> null score, never flagged
    (101L to 108L).foreach(i => assert(out(i)._1.isEmpty && out(i)._2 == 0L))
  }

  test("bucket sizes match the quantile split on a uniform distribution") {
    val vals = (1L to 1000L).toDF("v")
    val thr = Stats.quantileThresholds(vals, "v", Seq((1, 4), (1, 2), (3, 4)))
    val sizes = Stats.assignQuantileBucket(vals, "v", thr)
      .groupBy($"bucket").count().as[(Long, Long)].collect().toMap
    assert(sizes == Map(0L -> 250L, 1L -> 250L, 2L -> 250L, 3L -> 250L))
  }
}
