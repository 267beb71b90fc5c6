package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val Hour = 3600L * 1000000L

  private def ts(h: Long) = new java.sql.Timestamp(h * 3600L * 1000L)

  private def run(rows: Seq[(Long, Long, Long, String)], lookbackUs: Long) =
    Attribution.lastTouch(
        rows.map { case (id, u, h, t) => (id, u, ts(h), t) }
          .toDF("event_id", "user_id", "ts", "event_type"),
        "user_id", "ts", "event_id", "event_type",
        isTouch = col("event_type").isin("click", "view"),
        isConversion = col("event_type") === "purchase",
        lookbackUs = lookbackUs)
      .select("conversion_id", "touch_id", "touch_type", "age_us", "n_touches_window")
      .as[(Long, Option[Long], Option[String], Option[Long], Long)]
      .collect().sortBy(_._1).toSeq

  test("latest in-window touch wins and the window count feeds linear credit") {
    val got = run(Seq(
      (1L, 7L, 1L, "view"),
      (2L, 7L, 2L, "click"),
      (3L, 7L, 3L, "purchase"),
      (4L, 7L, 5L, "error"),  // not a touch: must not be attributed
      (5L, 7L, 6L, "purchase")), lookbackUs = 10 * Hour)
    assert(got == Seq(
      (3L, Some(2L), Some("click"), Some(Hour), 2L),
      (5L, Some(2L), Some("click"), Some(4 * Hour), 2L)))
  }

  test("touches beyond the lookback leave the conversion unattributed") {
    val got = run(Seq(
      (1L, 7L, 0L, "click"),
      (2L, 7L, 50L, "purchase")), lookbackUs = 10 * Hour)
    assert(got == Seq((2L, None, None, None, 0L)))
  }

  test("ties on ts break toward the larger event id (latest wins end to end)") {
    val got = run(Seq(
      (1L, 7L, 2L, "view"),
      (9L, 7L, 2L, "click"),
      (3L, 7L, 4L, "purchase")), lookbackUs = 10 * Hour)
    assert(got == Seq((3L, Some(9L), Some("click"), Some(2 * Hour), 2L)))
  }

  test("touches after the conversion never count; same-instant touch excluded") {
    val got = run(Seq(
      (1L, 7L, 5L, "purchase"),
      (2L, 7L, 5L, "click"),   // same instant: strictly-before rule excludes
      (3L, 7L, 6L, "view")), lookbackUs = 10 * Hour)
    assert(got == Seq((1L, None, None, None, 0L)))
  }

  test("users are independent and the frame plans one exchange") {
    val df = Seq(
      (1L, 1L, ts(1), "click"), (2L, 1L, ts(2), "purchase"),
      (3L, 2L, ts(1), "view"), (4L, 2L, ts(2), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Attribution.lastTouch(df, "user_id", "ts", "event_id", "event_type",
      col("event_type").isin("click", "view"), col("event_type") === "purchase",
      10 * Hour)
    val got = out.select("conversion_id", "touch_id")
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq((2L, Some(1L)), (4L, Some(3L))))
    val nExchanges = "Exchange(?! SinglePartition)".r
      .findAllIn(out.queryExecution.executedPlan.toString).length
    assert(nExchanges <= 1,
      s"attribution should shuffle once:\n${out.queryExecution.executedPlan}")
  }
}
