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
    // (32, 9/10) is the case where the old r-scaled rule tied (2,16)
    // with (4,8) while the exact distance uniquely picks 2 bands — the
    // scale-free score_q·b key must agree with the exact rule here too.
    // NOT in the list: (24, 3/4) and (96, 17/20), where ilog2q's
    // mid-octave interpolation error (|ilog2q(3)/2^16 − log2 3| ≈ 0.085)
    // legitimately flips the choice — that is τ-quantization, not the
    // comparison rule; the rule itself is pinned scale-free below.
    for ((h, tn, td) <- Seq((32, 7L, 10L), (32, 1L, 2L), (16, 1L, 2L),
      (64, 4L, 5L), (32, 9L, 10L), (64, 9L, 10L), (128, 1L, 2L),
      (48, 2L, 3L), (8, 1L, 4L),
      (16, 3L, 10L), (64, 1L, 5L), (128, 9L, 10L))) {
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

  test("choice is scale-free: chosen minimizes score_q/r over ALL splits") {
    // the contract the r11 advice flagged: comparing raw score_q weights
    // each split by its own r; the chosen row must minimize the rational
    // score_q/r (checked by cross-multiplication, exact integers) with
    // ties toward more bands — for every (numHashes, tau) in a sweep
    for {
      h <- Seq(8, 16, 24, 32, 48, 64, 96, 128)
      (tn, td) <- Seq((1L, 2L), (3L, 4L), (7L, 10L), (9L, 10L), (17L, 20L))
    } {
      val rows = Dedup.lshPlan(spark, h, tn, td)
        .select($"bands", $"rows_per_band", $"score_q", $"chosen")
        .as[(Long, Long, Long, Boolean)].collect()
      val (cb, cr, cs, _) = rows.filter(_._4) match {
        case Array(one) => one
        case other => fail(s"h=$h tau=$tn/$td: ${other.length} chosen rows")
      }
      rows.filterNot(_._4).foreach { case (b, r, s, _) =>
        // cs/cr < s/r, or equal with cb > b  (cross-multiplied)
        assert(cs * r < s * cr || (cs * r == s * cr && cb > b),
          s"h=$h tau=$tn/$td: chosen ($cb,$cr,score=$cs) loses to " +
            s"($b,$r,score=$s) under score_q/r")
      }
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
