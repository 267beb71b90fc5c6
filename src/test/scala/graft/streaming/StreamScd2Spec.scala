package graft.streaming

import graft.SparkSpec
import graft.operators.ChangeDetect
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamScd2Spec extends SparkSpec {
  import spark.implicits._
  import StreamChangeDetect.StatusEvent

  private def collapse(table: String) =
    spark.table(table)
      .groupBy($"key", $"version")
      .agg(max(struct($"valid_to".isNotNull.as("_closed"), $"status",
        $"valid_from", $"valid_to", $"is_current")).as("_m"))
      .select($"key", $"version", $"_m.status".as("status"),
        $"_m.valid_from".cast("string").as("valid_from"),
        $"_m.valid_to".cast("string").as("valid_to"),
        $"_m.is_current".as("is_current"))

  test("versions open and close across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatusEvent]
    val query = StreamScd2.versions(input.toDS())
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    try {
      input.addData(
        StatusEvent(1L, sqlTs("2024-01-01 10:00:00"), "online", 1L),
        StatusEvent(1L, sqlTs("2024-01-01 10:05:00"), "online", 2L)) // absorbed
      query.processAllAvailable()
      input.addData( // transition lands in a LATER batch: state crossed
        StatusEvent(1L, sqlTs("2024-01-01 10:30:00"), "offline", 3L),
        StatusEvent(2L, sqlTs("2024-01-01 09:00:00"), "online", 4L))
      query.processAllAvailable()
      input.addData(
        StatusEvent(1L, sqlTs("2024-01-01 11:00:00"), "online", 5L))
      query.processAllAvailable()

      val rows = collapse("scd2_out")
        .as[(Long, Long, String, String, Option[String], Boolean)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      assert(rows == Seq(
        (1L, 1L, "online", "2024-01-01 10:00:00", Some("2024-01-01 10:30:00"), false),
        (1L, 2L, "offline", "2024-01-01 10:30:00", Some("2024-01-01 11:00:00"), false),
        (1L, 3L, "online", "2024-01-01 11:00:00", None, true),
        (2L, 1L, "online", "2024-01-01 09:00:00", None, true)))
      // raw emissions: closed versions appear twice (open then closed)
      val raw = spark.table("scd2_out")
        .groupBy($"key", $"version").count()
        .as[(Long, Long, Long)].collect()
        .map { case (k, v, n) => (k, v) -> n }.toMap
      assert(raw.get((1L, 1L)).contains(2L), raw) // open + closed emission
      assert(raw.get((1L, 3L)).contains(1L), raw) // still-open: one emission
    } finally query.stop()
  }

  test("late events older than the open version are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatusEvent]
    val query = StreamScd2.versions(input.toDS())
      .writeStream.format("memory").queryName("scd2_late")
      .outputMode("append").start()
    try {
      input.addData(StatusEvent(1L, sqlTs("2024-01-01 10:00:00"), "b", 1L))
      query.processAllAvailable()
      input.addData(StatusEvent(1L, sqlTs("2024-01-01 09:00:00"), "a", 2L)) // late
      query.processAllAvailable()
      val rows = collapse("scd2_late")
        .as[(Long, Long, String, String, Option[String], Boolean)].collect().toSeq
      assert(rows == Seq((1L, 1L, "b", "2024-01-01 10:00:00", None, true)))
    } finally query.stop()
  }

  test("collapsed stream emissions equal the batch scd2 table") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (1L, "2024-01-01 10:00:00", "a", 1L),
      (1L, "2024-01-01 10:10:00", "b", 2L),
      (1L, "2024-01-01 10:10:00", "c", 3L), // same-ts transition, id order
      (1L, "2024-01-01 10:20:00", "c", 4L),
      (2L, "2024-01-01 08:00:00", "x", 5L),
      (2L, "2024-01-01 09:00:00", "y", 6L),
      (3L, "2024-01-01 12:00:00", "solo", 7L))
    val input = MemoryStream[StatusEvent]
    val query = StreamScd2.versions(input.toDS())
      .writeStream.format("memory").queryName("scd2_eq")
      .outputMode("append").start()
    try {
      // one event per micro-batch: maximal state crossing
      events.foreach { case (k, ts, st, id) =>
        input.addData(StatusEvent(k, sqlTs(ts), st, id))
        query.processAllAvailable()
      }
      val got = collapse("scd2_eq")
        .select($"key", $"version", $"status", $"valid_from", $"valid_to", $"is_current")
        .as[(Long, Long, String, String, Option[String], Boolean)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      val batch = ChangeDetect.scd2(
          events.map { case (k, ts, st, id) => (k, sqlTs(ts), st, id) }
            .toDF("key", "ts", "status", "event_id"),
          Seq("key"), Seq("ts", "event_id"), "status")
        .select($"key", $"version", $"status",
          $"valid_from".cast("string"), $"valid_to".cast("string"), $"is_current")
        .as[(Long, Long, String, String, Option[String], Boolean)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got == batch, s"\n got: $got\nbatch: $batch")
    } finally query.stop()
  }
}
