package graft.streaming

import graft.SparkSpec
import graft.operators.Attribution
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamAttributionSpec extends SparkSpec {
  import spark.implicits._
  import StreamAttribution._

  private val Hour = 3600L * 1000000L

  private def ev(id: Long, key: Long, ts: String, etype: String) =
    TouchStreamEvent(key, sqlTs(ts), id, etype,
      is_touch = etype == "click" || etype == "view",
      is_conv = etype == "purchase")

  test("conversions credit touches carried across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TouchStreamEvent]
    val query = StreamAttribution.attributed(input.toDS(), 10 * Hour)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 7, "2024-01-01 10:00:00", "view"),
        ev(2, 7, "2024-01-01 11:00:00", "click"))
      query.processAllAvailable()
      input.addData(ev(3, 7, "2024-01-01 12:00:00", "purchase")) // later batch
      query.processAllAvailable()
      input.addData(ev(4, 7, "2024-01-02 23:00:00", "purchase")) // stale window
      query.processAllAvailable()
      val got = spark.table("attr_out")
        .select($"conversion_id", $"touch_id", $"touch_type", $"age_us", $"n_touches_window")
        .as[(Long, Option[Long], Option[String], Option[Long], Long)]
        .collect().sortBy(_._1).toSeq
      assert(got == Seq(
        (3L, Some(2L), Some("click"), Some(Hour), 2L),
        (4L, None, None, None, 0L)))
    } finally query.stop()
  }

  test("state stays bounded: touches outside the lookback are pruned, empty state removed") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TouchStreamEvent]
    val query = StreamAttribution.attributed(input.toDS(), 2 * Hour)
      .writeStream.format("memory").queryName("attr_prune")
      .outputMode("append").start()
    try {
      (0 until 8).foreach { h =>
        input.addData(ev(h.toLong, 7, f"2024-01-01 0$h%d:00:00", "click"))
        query.processAllAvailable()
      }
      val stateRows = query.recentProgress.filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.head.numRowsTotal)
      // one state ROW per key however many touches ride inside it
      assert(stateRows.max <= 1L, stateRows.mkString(","))
      input.addData(ev(99, 7, "2024-01-01 09:00:00", "purchase"))
      query.processAllAvailable()
      val got = spark.table("attr_prune")
        .select($"conversion_id", $"touch_id", $"n_touches_window")
        .as[(Long, Option[Long], Long)].collect().toSeq
      // clicks ran 00:00–07:00; only the 07:00 one is >= 09:00 − 2h
      assert(got == Seq((99L, Some(7L), 1L)))
    } finally query.stop()
  }

  test("stream emissions equal the batch attribution frame") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, 7L, "2024-01-01 01:00:00", "view"),
      (2L, 7L, "2024-01-01 02:00:00", "click"),
      (3L, 7L, "2024-01-01 03:00:00", "purchase"),
      (4L, 7L, "2024-01-01 03:00:00", "click"),    // same-instant, larger id
      (5L, 7L, "2024-01-01 09:00:00", "purchase"),
      (6L, 8L, "2024-01-01 01:00:00", "purchase"), // no touch at all
      (7L, 8L, "2024-01-01 02:00:00", "view"),
      (8L, 8L, "2024-01-01 02:30:00", "purchase"))
    val input = MemoryStream[TouchStreamEvent]
    val query = StreamAttribution.attributed(input.toDS(), 5 * Hour)
      .writeStream.format("memory").queryName("attr_eq")
      .outputMode("append").start()
    try {
      rows.foreach { case (id, k, ts, t) => // one event per micro-batch
        input.addData(ev(id, k, ts, t))
        query.processAllAvailable()
      }
      val got = spark.table("attr_eq")
        .select($"conversion_id", $"touch_id", $"touch_ts_us", $"touch_type",
          $"age_us", $"n_touches_window")
        .as[(Long, Option[Long], Option[Long], Option[String], Option[Long], Long)]
        .collect().sortBy(_._1).toSeq
      val batch = Attribution.lastTouch(
          rows.map { case (id, k, ts, t) => (id, k, sqlTs(ts), t) }
            .toDF("event_id", "user_id", "ts", "event_type"),
          "user_id", "ts", "event_id", "event_type",
          col("event_type").isin("click", "view"),
          col("event_type") === "purchase", 5 * Hour)
        .select($"conversion_id", $"touch_id", $"touch_ts_us", $"touch_type",
          $"age_us", $"n_touches_window")
        .as[(Long, Option[Long], Option[Long], Option[String], Option[Long], Long)]
        .collect().sortBy(_._1).toSeq
      assert(got == batch, s"\n got: $got\nbatch: $batch")
    } finally query.stop()
  }
}
