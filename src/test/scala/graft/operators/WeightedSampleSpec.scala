package graft.operators

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def aesKey(id: Long, w: Long, seed: Long): Long = {
    val u40 = graft.plans.HashKernels.fnvMix(
      UTF8String.fromString(id.toString), seed) >>> 24
    val v = u40 + 1L
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val lg = e.toLong * 65536L + (((v - (1L << e)) << 16) >> e)
    -(((40L * 65536L - lg) << 20) / w)
  }

  test("top-k by quantized A-ES key == the brute-force reference, no dupes") {
    val rows = (1L to 500L).map(i => (i, i % 7 + 1))
    val out = Sampling.weightedFixedK(rows.toDF("id", "w"), "id", "w",
        k = 50, seed = 13L)
      .as[(Long, Long)].collect().toSeq
    assert(out.map(_._1).distinct.size == 50, "without replacement")
    val expected = rows
      .sortBy { case (id, w) => (aesKey(id, w, 13L), id) }(
        Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long))
      .take(50).map(_._1).toSet
    assert(out.map(_._1).toSet == expected)
  }

  test("inclusion tracks weight: heavy rows dominate the sample") {
    // 200 rows of weight 1000 vs 200 rows of weight 1: a 100-row sample
    // should be nearly all heavy (P(light beats heavy) ~ w_l/w_h)
    val rows = (1L to 200L).map(i => (i, 1000L)) ++
      (201L to 400L).map(i => (i, 1L))
    val out = Sampling.weightedFixedK(rows.toDF("id", "w"), "id", "w",
        k = 100, seed = 7L)
      .as[(Long, Long)].collect()
    val heavy = out.count(_._2 == 1000L)
    assert(heavy >= 90, s"expected heavy dominance, got $heavy/100")
    // zero/negative weights never sample
    val withZero = rows ++ Seq((999L, 0L))
    val out2 = Sampling.weightedFixedK(withZero.toDF("id", "w"), "id", "w",
        k = 100, seed = 7L).as[(Long, Long)].collect()
    assert(!out2.exists(_._1 == 999L))
  }

  test("global top-k runs as TakeOrdered, never a full sort") {
    val plan = Sampling.weightedFixedK(
        (1L to 100L).map(i => (i, i)).toDF("id", "w"), "id", "w", 5, 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"expected TakeOrdered:\n$plan")
  }
}
