package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // user 1: two sessions (gap of 31 min between 10:10 and 10:41)
    (1L, "2024-01-01 10:00:00", "view"),
    (1L, "2024-01-01 10:10:00", "purchase"),
    (1L, "2024-01-01 10:41:00", "view"),
    // user 2: one session, gap exactly 30 min does NOT split (strict >)
    (2L, "2024-01-01 09:00:00", "view"),
    (2L, "2024-01-01 09:30:00", "view")
  ).toDF("user_id", "ts_s", "event_type")
    .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")

  test("sessionize splits on gaps strictly greater than the threshold") {
    val out = Sessionize.sessionize(events, Seq("user_id"), "ts", 1800L)
      .select("user_id", "ts", "session_seq").as[(Long, java.sql.Timestamp, Long)]
      .collect().sortBy(r => (r._1, r._2.getTime))
    assert(out.map(_._3).toSeq == Seq(1L, 1L, 2L, 1L, 1L))
  }

  test("sessionMetrics rolls up per session") {
    val s = Sessionize.sessionize(events, Seq("user_id"), "ts", 1800L)
    val m = Sessionize.sessionMetrics(s, Seq("user_id"), "ts",
      Seq(sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("n_purchases")))
    val rows = m.orderBy("user_id", "session_seq")
      .select("user_id", "session_seq", "n_events", "n_purchases")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 1L, 2L, 1L), (1L, 2L, 1L, 0L), (2L, 1L, 2L, 0L)))
  }
}
