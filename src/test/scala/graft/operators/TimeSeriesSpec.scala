package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = sqlTs(s)

  test("resampleLinear interpolates between surrounding readings") {
    // readings at :00 (v=0) and :10 (v=100); 5-min grid → :00, :05, :10
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 0.0),
      (2L, 1L, ts("2024-01-01 00:10:00"), 100.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TimeSeries.resampleLinear(df, Seq("user_id"), "ts", "value",
        300L, Seq("event_id"))
      .select($"grid_ts_us", $"value").as[(Long, Double)].collect().toMap
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    assert(out.keySet == Set(base, base + 300000000L, base + 600000000L))
    assert(out(base) == 0.0)                  // exact hit reproduces reading
    assert(out(base + 300000000L) == 50.0)    // midpoint
    assert(out(base + 600000000L) == 100.0)   // exact hit at the end
  }

  test("grid instants never extrapolate beyond an entity's span") {
    // span 00:02..00:08 → only one 5-min grid instant (00:05) is interior
    val df = Seq(
      (1L, 7L, ts("2024-01-01 00:02:00"), 10.0),
      (2L, 7L, ts("2024-01-01 00:08:00"), 40.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TimeSeries.resampleLinear(df, Seq("user_id"), "ts", "value",
        300L, Seq("event_id"))
      .select($"value").as[Double].collect().toSeq
    assert(out == Seq(25.0)) // 00:05 is halfway between 00:02 and 00:08
  }

  test("single-reading and empty-grid entities produce no rows") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:03:01"), 5.0),                 // single
      (2L, 2L, ts("2024-01-01 00:03:30"), 1.0),                 // span has
      (3L, 2L, ts("2024-01-01 00:04:30"), 2.0)                  // no grid pt
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TimeSeries.resampleLinear(df, Seq("user_id"), "ts", "value",
      300L, Seq("event_id"))
    assert(out.count() == 0L)
  }

  test("duplicate timestamps resolve deterministically (last by tiebreak)") {
    // two readings at the same instant: event_id 9 (v=80) wins over 5 (v=20)
    val df = Seq(
      (5L, 1L, ts("2024-01-01 00:00:00"), 20.0),
      (9L, 1L, ts("2024-01-01 00:00:00"), 80.0),
      (1L, 1L, ts("2024-01-01 00:10:00"), 80.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TimeSeries.resampleLinear(df, Seq("user_id"), "ts", "value",
        300L, Seq("event_id"))
      .select($"value").as[Double].collect().toSeq
    // carry-forward picks v=80 at t0 → the whole segment is constant 80
    assert(out == Seq(80.0, 80.0, 80.0))
  }

  test("constant segments stay bit-exact (no drift from interpolation)") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:07"), 0.1),
      (2L, 1L, ts("2024-01-01 01:59:59"), 0.1)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TimeSeries.resampleLinear(df, Seq("user_id"), "ts", "value",
        600L, Seq("event_id"))
      .select($"value").as[Double].collect()
    assert(out.nonEmpty && out.forall(_ == 0.1))
  }

  test("plan: one exchange on the entity key, no join") {
    val df = (1 to 200).map(i =>
      (i.toLong, (i % 5).toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00"),
        i.toDouble)).toDF("event_id", "user_id", "ts", "value")
    val out = TimeSeries.resampleLinear(df, Seq("user_id"), "ts", "value",
      1800L, Seq("event_id"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), s"resample must not join:\n$plan")
    // the union'd (readings ∪ grid) table shuffles once on the entity key;
    // the grid subtree re-aggregates the readings (its own small exchange)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"expected <= 3 exchanges, got $exchanges:\n$plan")
  }
}
