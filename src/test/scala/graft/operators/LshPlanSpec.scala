package graft.operators

import graft.SparkSpec

class LshPlanSpec extends SparkSpec {
  import spark.implicits._

  private def chosen(h: Int, tn: Long, td: Long): (Long, Long) =
    Dedup.lshPlan(spark, h, tn, td)
      .filter($"chosen").select($"bands", $"rows_per_band")
      .as[(Long, Long)].collect().head

  test("quantized choice agrees with exact double S-curve distance") {
    // the quantized-integer rule must pick the same split the exact
    // |log2((1/b)^(1/r)) − log2 τ| distance picks (ties toward more
    // bands) on the calibration points the gates use
    for ((h, tn, td) <- Seq((32, 7L, 10L), (32, 1L, 2L), (16, 1L, 2L),
      (64, 4L, 5L))) {
      val splits = (1 to h).filter(h % _ == 0).map(b => (b, h / b))
      val target = math.log(tn.toDouble / td) / math.log(2.0)
      val exact = splits
        .map { case (b, r) =>
          ((b, r), math.abs(-math.log(b.toDouble) / math.log(2.0) / r - target))
        }
        .minBy { case ((b, _), d) => (d, -b) }._1
      val got = chosen(h, tn, td)
      assert(got == ((exact._1.toLong, exact._2.toLong)),
        s"h=$h tau=$tn/$td: quantized picked $got, exact picks $exact")
    }
  }

  test("S-curve sanity: the chosen split's threshold brackets tau best") {
    val (b, r) = chosen(32, 7L, 10L)
    val t = math.pow(1.0 / b, 1.0 / r)
    // every other split's threshold is farther from 0.7 in log space
    (1 to 32).filter(32 % _ == 0).filterNot(_ == b).foreach { ob =>
      val ot = math.pow(1.0 / ob, 1.0 / (32 / ob))
      assert(math.abs(math.log(t) - math.log(0.7)) <=
        math.abs(math.log(ot) - math.log(0.7)) + 1e-9,
        s"split b=$ob t=$ot beats chosen b=$b t=$t")
    }
  }
}
