package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    spark.range(n.toLong).select(
      (col("id") % 3).cast("string").as("grp"),
      concat(lit("value-"), col("id")).as("v"))

  test("estimate is within HLL error bounds of the exact distinct count") {
    // 3 groups x ~3333 distinct values; raw HLL @ m=256 has ~6.5 % std error
    val est = Sketch.estimate(
      Sketch.registers(docs(10000), Seq("grp"), col("v"), seed = 3L),
      Seq("grp"))
    val exact = docs(10000).groupBy("grp")
      .agg(countDistinct("v").as("exact"))
    val rows = est.join(exact, "grp").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val approx = r.getAs[Double]("approx_distinct")
      val ex = r.getAs[Long]("exact").toDouble
      assert(math.abs(approx - ex) / ex < 0.25,
        s"grp=${r.getAs[String]("grp")} approx=$approx exact=$ex")
    }
  }

  test("registers are invariant under repartitioning and duplication") {
    val base = docs(2000)
    val a = Sketch.registers(base, Seq("grp"), col("v"), seed = 3L)
    val b = Sketch.registers(
      base.union(base).repartition(7), Seq("grp"), col("v"), seed = 3L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("mergeRegisters over a split equals registers over the whole") {
    val base = docs(5000)
    val left = base.where(col("v") < "value-3")
    val right = base.where(col("v") >= "value-3")
    val merged = Sketch.mergeRegisters(
      Sketch.registers(left, Seq("grp"), col("v"), seed = 3L),
      Sketch.registers(right, Seq("grp"), col("v"), seed = 3L),
      Seq("grp"))
    val whole = Sketch.registers(base, Seq("grp"), col("v"), seed = 3L)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    // and the estimate over merged registers is the estimate over the whole
    val eM = Sketch.estimate(merged, Seq("grp")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val eW = Sketch.estimate(whole, Seq("grp")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(eM == eW)
  }

  test("register build is map-side combined (partial max before the shuffle)") {
    val regs = Sketch.registers(docs(1000), Seq("grp"), col("v"), seed = 3L)
    regs.collect()
    val plan = regs.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // partial-aggregate max on both sides of the exchange
    assert("HashAggregate.*partial_max".r.findFirstIn(finalPlan).isDefined
      || "partial_max".r.findFirstIn(finalPlan).isDefined,
      s"expected a partial max aggregate in:\n$finalPlan")
  }

  test("null values do not count toward cardinality") {
    val withNulls = spark.range(100).select(
      lit("g").as("grp"),
      when(col("id") % 2 === 0, concat(lit("v"), col("id"))).as("v"))
    val regs = Sketch.registers(withNulls, Seq("grp"), col("v"), seed = 3L)
    val clean = Sketch.registers(
      withNulls.where(col("v").isNotNull), Seq("grp"), col("v"), seed = 3L)
    assert(regs.exceptAll(clean).isEmpty && clean.exceptAll(regs).isEmpty)
  }

  test("rank uses the full 56-bit suffix (bucket 0 values rank correctly)") {
    // Construct the rho column directly: clz64(h << 8) + 1, capped at 57
    val one = spark.range(1).select(
      graft.plans.HashExpressions.clz64(lit(1L << 8)).as("clz"))
    assert(one.head().getInt(0) == 55) // lowest usable bit -> rho = 56
  }
}
