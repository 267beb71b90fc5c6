package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PoolingSpec extends SparkSpec {
  import spark.implicits._

  private val Q = 1099511627776.0

  test("meanPool computes exact per-group centroids in position order") {
    val df = Seq(
      ("a", Array(1.0f, 0.0f)),
      ("a", Array(0.0f, 1.0f)),
      ("b", Array(2.0f, 4.0f))
    ).toDF("grp", "vec")
    val out = Pooling.meanPool(df, Seq("grp"), "vec")
      .as[(String, Long, Seq[Double])].collect().sortBy(_._1)
    assert(out(0) == (("a", 2L, Seq(0.5, 0.5))))
    assert(out(1) == (("b", 1L, Seq(2.0, 4.0))))
  }

  test("quantized components make the centroid partitioning-invariant") {
    // values whose double sums are association-order-SENSITIVE un-quantized
    val vals = Seq(0.1f, 0.7f, 1e-8f, 0.3f, 0.2f, 1e-9f)
    val df = vals.map(v => ("g", Array(v))).toDF("grp", "vec")
    def centroid(parts: Int): Double =
      Pooling.meanPool(df.repartition(parts), Seq("grp"), "vec")
        .select(element_at(col("centroid"), 1)).as[Double].collect().head
    val expected = vals.map(v => math.floor(v.toDouble * Q) / Q).sum / vals.size
    assert(centroid(1) == expected)
    assert(centroid(7) == expected, "must be bit-identical under repartitioning")
  }

  test("distanceToCentroid broadcasts centroids; distance exact") {
    val df = Seq(
      (1L, "a", Array(1.0f, 0.0f)),
      (2L, "a", Array(0.0f, 1.0f)),
      (3L, "b", Array(3.0f, 4.0f))
    ).toDF("id", "grp", "vec")
    val out = Pooling.distanceToCentroid(df, Seq("grp"), "vec")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), s"centroids must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the corpus must not shuffle for the join:\n$plan")
    val d = out.select($"id", $"dist_to_centroid").as[(Long, Double)]
      .collect().toMap
    // group a centroid (0.5, 0.5): both vectors at distance sqrt(0.5)
    assert(math.abs(d(1L) - math.sqrt(0.5)) < 1e-12 && d(1L) == d(2L))
    assert(d(3L) == 0.0, "singleton group sits on its own centroid")
  }

  test("component aggregation partial-aggregates before one shuffle") {
    val df = Seq.tabulate(100)(i => ("g" + (i % 4), Array.fill(8)(i.toFloat)))
      .toDF("grp", "vec")
    val comp = Pooling.meanComponents(df, Seq("grp"), "vec")
    comp.collect()
    val plan = comp.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregation:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected ONE shuffle:\n$plan")
  }
}
