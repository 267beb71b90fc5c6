package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("correlateFirstWithin picks the first match inside the window, keeps unmatched") {
    val left = Seq(
      (10L, 1L, "2024-01-01 10:00:00"),
      (11L, 1L, "2024-01-01 12:00:00"),
      (12L, 2L, "2024-01-01 10:00:00")
    ).toDF("event_id", "user_id", "s").select($"event_id", $"user_id", to_timestamp($"s").as("ts"))
    val right = Seq(
      (100L, 1L, "2024-01-01 10:05:00", 5.0), // first match for 10
      (101L, 1L, "2024-01-01 10:08:00", 8.0), // later — ignored
      (102L, 1L, "2024-01-01 13:30:00", 9.0), // outside 1h window of 11? no: 12:00+1h=13:00 → unmatched
      (103L, 3L, "2024-01-01 10:01:00", 1.0)  // other key
    ).toDF("event_id", "user_id", "s", "value")
      .select($"event_id", $"user_id", to_timestamp($"s").as("ts"), $"value")

    val out = AsOf.correlateFirstWithin(
        left, right, Seq("user_id"), "event_id", "ts", "ts", 3600L, Seq("event_id", "value"))
      .select("event_id", "matched_event_id", "matched_value")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (10L, Some(100L), Some(5.0)),
      (11L, None, None),
      (12L, None, None)))
  }
}
