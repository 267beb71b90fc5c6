package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // 0 -> 1, 0 -> 2, 1 -> 2, 2 -> 0, plus 3 as a dangling sink (1 -> 3)
  private def edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (1L, 3L))
    .toDF("src", "dst")

  private def ranksOf(df: org.apache.spark.sql.DataFrame, iters: Int) =
    Graph.pageRank(df, "src", "dst", iters).as[(Long, Double)]
      .collect().toMap

  test("rank mass is conserved (≈1) and a sink node outranks its uniform share") {
    val r = ranksOf(edges, 20)
    assert(r.size == 4)
    assert(math.abs(r.values.sum - 1.0) < 1e-9,
      s"rank mass should stay ~1, got ${r.values.sum}")
    // node 0 receives node 2's ENTIRE mass (2's only out-link) — top rank;
    // node 2 (two inbound halves) outranks the dangling sink 3 (one half)
    assert(r(0L) == r.values.max)
    assert(r(2L) > r(3L))
  }

  test("hand-checked single iteration on a two-node cycle") {
    val two = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val r = ranksOf(two, 1)
    // symmetric: 0.15/2 + 0.85 * 0.5 = 0.5 exactly (modulo quantization)
    assert(math.abs(r(0L) - 0.5) < 1e-9 && math.abs(r(1L) - 0.5) < 1e-9)
  }

  test("dangling mass is redistributed: a pure sink graph stays uniform") {
    // star into node 9, which has no out-edges
    val star = (0L until 9L).map(i => (i, 9L)).toDF("src", "dst")
    val r = ranksOf(star, 3)
    assert(r.size == 10)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r(9L) == r.values.max)
  }

  test("ranks are bit-identical under any partitioning") {
    val big = (0L until 200L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 200), (i, (i * 13 + 5) % 200))).toDF("src", "dst")
    val a = ranksOf(big.repartition(13), 4).toSeq.sortBy(_._1)
    val b = ranksOf(big.coalesce(1), 4).toSeq.sortBy(_._1)
    assert(a == b) // exact doubles: the quantized-sum claim
  }

  test("deep iteration counts do not stack plans (localCheckpoint truncation)") {
    val r = Graph.pageRank(edges, "src", "dst", iters = 12)
    // would blow the planner well before 12 iterations if lineage stacked;
    // the assertion is that it completes and stays normalized
    val total = r.agg(sum("rank")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }
}
