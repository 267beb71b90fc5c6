package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Log-histogram contracts the oracle gate cannot see: the bucket map and
  * its lower-bound inverse agree for EVERY value class (exact region,
  * octave boundaries, deep octaves), the rank-select answer is within the
  * designed relative error of the exact order statistic everywhere, and
  * histograms merge by bucket-sum into exactly the whole-corpus table.
  */
class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("bucket/lowerBound inverse: lb(bucket(v)) <= v with rel err < 2^-4") {
    // boundary values around every power of two + odd fillers + extremes
    val vals = (0L to 64L) ++
      (4 to 62).flatMap(e => Seq((1L << e) - 1, 1L << e, (1L << e) + 1,
        (1L << e) + (1L << math.max(0, e - 3)))) ++
      Seq(Long.MaxValue, Long.MaxValue - 1, 123456789L, 987654321098L)
    val df = vals.distinct.toDF("v")
      .select($"v", Sketch.histBucket($"v").as("b"))
      .select($"v", $"b", Sketch.histLowerBound($"b").as("lb"))
    val rows = df.as[(Long, Long, Long)].collect()
    rows.foreach { case (v, b, lb) =>
      assert(lb <= v, s"v=$v bucket=$b lb=$lb: lower bound above the value")
      if (v < 16) assert(lb == v, s"exact region must be identity: v=$v lb=$lb")
      else {
        // every value in the bucket sits within one sub-bucket step of lb
        assert(v - lb < math.max(1L, lb >>> Sketch.SubBits) * 2,
          s"v=$v b=$b lb=$lb: relative error above 2^-4 design bound")
        assert((v - lb).toDouble / lb < 1.0 / (1 << Sketch.SubBits) + 1e-15,
          s"v=$v lb=$lb rel err ${(v - lb).toDouble / lb}")
      }
    }
    // the map is monotone: sorting by bucket == sorting by value
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((v1, b1, _), (v2, b2, _)) =>
        assert(b1 <= b2, s"bucket map not monotone: v=$v1->b$b1 then v=$v2->b$b2")
      case _ =>
    }
  }

  test("histQuantiles is within 2^-4 of the exact order statistic") {
    // skewed: long-tailed doc lengths per group
    val df = (1 to 4000).map { i =>
      (s"g${i % 3}", (math.pow(1.003, i % 1500) * 20).toLong)
    }.toDF("grp", "v")
    val targets = Seq(("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
    val approx = Sketch.histQuantiles(
      Sketch.logHistogram(df, Seq("grp"), $"v"), Seq("grp"), targets)
    // exact rank-select per (grp, target) done driver-side
    val byGrp = df.as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    val rows = approx.as[(String, String, Long)].collect()
    assert(rows.length == 3 * targets.length)
    rows.foreach { case (g, label, got) =>
      val vs = byGrp(g)
      val (_, n, d) = targets.find(_._1 == label).get
      val exact = vs((((vs.length.toLong * n) + d - 1) / d).toInt - 1)
      assert(got <= exact, s"$g/$label: answer $got above exact $exact")
      assert((exact - got).toDouble / exact <= 1.0 / (1 << Sketch.SubBits),
        s"$g/$label: approx $got vs exact $exact outside the error bound")
    }
  }

  test("mergeHistograms over a split equals the whole-corpus histogram") {
    val df = (1 to 3000).map(i => (s"g${i % 2}", (i * 37 % 701).toLong))
      .toDF("grp", "v")
    val merged = Sketch.mergeHistograms(
      Sketch.logHistogram(df.where($"v" % 2 === 0), Seq("grp"), $"v"),
      Sketch.logHistogram(df.where($"v" % 2 === 1), Seq("grp"), $"v"),
      Seq("grp"))
    val whole = Sketch.logHistogram(df, Seq("grp"), $"v")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("nulls and negatives are dropped, not clamped into bucket 0") {
    val df = Seq(Some(-5L), None, Some(0L), Some(3L), Some(-1L))
      .toDF("v")
    val hist = Sketch.logHistogram(df, Nil, $"v")
      .as[(Long, Long)].collect().toMap
    assert(hist == Map(0L -> 1L, 3L -> 1L),
      s"negative/null measures must vanish, got $hist")
  }

  test("histogram build is map-side combined (partial count under the exchange)") {
    val df = (1 to 2000).map(i => ("g", (i % 50).toLong)).toDF("grp", "v")
    val plan = Sketch.logHistogram(df, Seq("grp"), $"v")
      .queryExecution.executedPlan.toString
    val partial = plan.indexOf("partial_count")
    val exchange = plan.indexOf("Exchange hashpartitioning")
    assert(partial >= 0 && exchange >= 0 && partial > exchange,
      s"expected partial aggregation below the exchange, plan:\n$plan")
  }
}
