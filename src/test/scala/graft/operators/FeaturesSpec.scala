package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rolling point-in-time features: semantics vs brute force (including the
  * timestamp-peer rule RANGE frames give), and the one-exchange/one-sort
  * plan claim — two windows must NOT cost two shuffles.
  */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // 1 h in micros

  test("rolling window equals brute force, frame is [t-w, t], peers mutual") {
    // user 1: events at 0s, 30m, 59m59.999999s, 60m, 90m; two PEERS at 90m
    val rows = Seq(
      (1L, 0L, 1.0), (1L, 1800000000L, 2.0), (1L, 3599999999L, 4.0),
      (1L, H, 8.0), (1L, 5400000000L, 16.0), (1L, 5400000000L, 32.0),
      (2L, 0L, 100.0))
    val df = rows.toDF("user_id", "ts_us", "value")
    val out = Features.rolling(df, Seq("user_id"), col("ts_us"), col("value"),
        Seq(Features.RollingWindow("1h", H)))
      .select("user_id", "ts_us", "value", "n_1h", "v_1h")
      .as[(Long, Long, Double, Long, Double)].collect()

    def brute(u: Long, t: Long): Seq[(Long, Double)] =
      rows.filter(r => r._1 == u && r._2 >= t - H && r._2 <= t)
        .map(r => (1L, r._3))
    for ((u, t, _, n, v) <- out) {
      val b = brute(u, t)
      assert(n == b.map(_._1).sum, s"count at ($u, $t)")
      assert(math.abs(v - b.map(_._2).sum) < 1e-9, s"sum at ($u, $t)")
    }
    // the two peer rows at 90m must see each other (RANGE, not ROWS): the
    // frame [30m, 90m] holds {30m, ~60m, 60m, 90m, 90m} → n=5, v=62
    val peers = out.filter(r => r._1 == 1L && r._2 == 5400000000L)
    assert(peers.length == 2 && peers.forall(r => r._4 == 5L && r._5 == 62.0))
    // the 0s event has left the 90m frame, the 60m event still holds 0s's
    // boundary twin: frame at 60m = [0, 60m] inclusive → all four early rows
    val at60 = out.find(r => r._1 == 1L && r._2 == H).get
    assert(at60._4 == 4L, "boundary t-w is INSIDE the frame")
  }

  test("two windows plan on one exchange and one sort") {
    val df = Features.rolling(
      Seq((1L, 10L, 1.0)).toDF("user_id", "ts_us", "value"),
      Seq("user_id"), col("ts_us"), col("value"),
      Seq(Features.RollingWindow("a", 100L), Features.RollingWindow("b", 1000L)))
    val phys = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(phys).size
    assert(exchanges == 1, s"both windows must share one exchange:\n$phys")
    val sorts = raw"\bSort\b".r.findAllIn(phys).size
    assert(sorts == 1, s"both windows must share one sort:\n$phys")
  }
}
