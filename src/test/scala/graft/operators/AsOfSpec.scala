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

  test("asOfBackward attaches the latest right row at or before each left ts") {
    val trades = Seq(
      (1L, 1L, "2024-01-01 10:00:00"), // before any quote → nulls
      (2L, 1L, "2024-01-01 10:05:00"), // exactly at quote ts → that quote (<=)
      (3L, 1L, "2024-01-01 10:30:00"), // latest prior = 10:10
      (4L, 2L, "2024-01-01 10:30:00")  // other key, no quotes → nulls
    ).toDF("trade_id", "k", "s").select($"trade_id", $"k", to_timestamp($"s").as("ts"))
    val quotes = Seq(
      (1L, "2024-01-01 10:05:00", Some(5.0)),
      (1L, "2024-01-01 10:10:00", None: Option[Double]) // newest value is NULL
    ).toDF("k", "s", "px").select($"k", to_timestamp($"s").as("ts"), $"px")
    val out = AsOf.asOfBackward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
      .select($"trade_id", $"asof_ts".cast("string"), $"asof_px")
      .as[(Long, Option[String], Option[Double])].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, None, None),
      (2L, Some("2024-01-01 10:05:00"), Some(5.0)),
      // the newest quote wins even though its value is null — per-column
      // carry-forward would wrongly resurrect 5.0
      (3L, Some("2024-01-01 10:10:00"), None),
      (4L, None, None)))
  }
}
