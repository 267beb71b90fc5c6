package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehavioralSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, u: Long, t: String, typ: String) =
    (id, u, sqlTs(t), typ)

  test("funnel chains earliest qualifying events and respects the gap") {
    // u1 completes all three; u2 clicks BEFORE viewing (no chain past view);
    // u3 converts but outside the gap; u4 never enters the funnel
    val rows = Seq(
      ev(1, 1, "2024-01-01 10:00:00", "view"),
      ev(2, 1, "2024-01-01 10:05:00", "click"),
      ev(3, 1, "2024-01-01 10:06:00", "click"),     // later click ignored
      ev(4, 1, "2024-01-01 10:30:00", "purchase"),
      ev(5, 2, "2024-01-01 09:00:00", "click"),     // pre-view click ignored
      ev(6, 2, "2024-01-01 09:30:00", "view"),
      ev(7, 3, "2024-01-01 08:00:00", "view"),
      ev(8, 3, "2024-01-01 08:10:00", "click"),
      ev(9, 3, "2024-01-02 09:00:00", "purchase"),  // > 1h after click
      ev(10, 4, "2024-01-01 07:00:00", "error"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Behavioral.funnel(rows, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxGapSeconds = Some(3600L),
        tieBreakCols = Seq("event_id"))
      .select($"user_id", $"stage_2_ts", $"stages_completed")
      .as[(Long, Option[java.sql.Timestamp], Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L) == (Some(sqlTs("2024-01-01 10:05:00")), 3L))
    assert(out(2L) == (None, 1L))
    assert(out(3L)._2 == 2L)
    assert(out(4L) == (None, 0L))
  }

  test("funnel plans a single exchange for all stage windows") {
    val rows = Seq(ev(1, 1, "2024-01-01 10:00:00", "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val df = Behavioral.funnel(rows, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), tieBreakCols = Seq("event_id"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("cohortRetention counts active users per (cohort week, offset)") {
    // two users first seen week A (one returns the next week), one in week B
    val rows = Seq(
      ev(1, 1, "2024-01-04 10:00:00", "view"),   // week of Jan 4
      ev(2, 1, "2024-01-11 10:00:00", "view"),   // +1 week
      ev(3, 2, "2024-01-04 12:00:00", "view"),
      ev(4, 3, "2024-01-11 09:00:00", "view"))   // later cohort
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Behavioral.cohortRetention(rows, "user_id", "ts")
      .as[(Long, Long, Long)].collect()
      .map(t => (t._2, t._1) -> t._3).toMap  // (offset, cohort) dedup below
    val byCohort = Behavioral.cohortRetention(rows, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cohorts = byCohort.keys.map(_._1).toSet
    assert(cohorts.size == 2)
    val (a, b) = (cohorts.min, cohorts.max)
    assert(b - a == 1)
    assert(byCohort((a, 0L)) == 2L)  // both week-A users active at offset 0
    assert(byCohort((a, 1L)) == 1L)  // one returned
    assert(byCohort((b, 0L)) == 1L)
    assert(out.nonEmpty)
  }

  test("transitions counts lagged pairs with row-conditional probabilities") {
    val rows = Seq(
      ev(1, 1, "2024-01-01 10:00:00", "view"),
      ev(2, 1, "2024-01-01 10:01:00", "click"),
      ev(3, 1, "2024-01-01 10:02:00", "view"),
      ev(4, 1, "2024-01-01 10:03:00", "click"),
      ev(5, 2, "2024-01-01 10:00:00", "view"),
      ev(6, 2, "2024-01-01 10:01:00", "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Behavioral.transitions(rows, "user_id", "ts", "event_type",
        tieBreakCols = Seq("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(("view", "click")) == (2L, 2.0 / 3.0))
    assert(out(("view", "purchase")) == (1L, 1.0 / 3.0))
    assert(out(("click", "view")) == (1L, 1.0))
    // first event of each user contributes no pair
    assert(out.values.map(_._1).sum == 4L)
  }
}
