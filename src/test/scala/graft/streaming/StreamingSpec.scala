package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  import StreamChangeDetect._

  test("StreamSessionize groups events into watermarked session windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val df = input.toDF().toDF("user_id", "ts")
    val out = StreamSessionize.sessions(df, Seq("user_id"), "ts", "30 minutes", "10 minutes")
    val query = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, sqlTs("2024-01-01 10:00:00")),
        (1L, sqlTs("2024-01-01 10:10:00")),
        (1L, sqlTs("2024-01-01 11:30:00")), // new session (gap 80 min)
        (2L, sqlTs("2024-01-01 10:05:00")))
      query.processAllAvailable()
      // advance watermark far enough to close all sessions
      input.addData((9L, sqlTs("2024-01-02 00:00:00")))
      query.processAllAvailable()
      val rows = spark.table("sess_out")
        .select($"user_id", $"n_events",
          $"session_start_ts".cast("string"), $"session_end_ts".cast("string"))
        .as[(Long, Long, String, String)].collect().sortBy(r => (r._1, r._3)).toSeq
      assert(rows.contains((1L, 2L, "2024-01-01 10:00:00", "2024-01-01 10:40:00")))
      assert(rows.contains((1L, 1L, "2024-01-01 11:30:00", "2024-01-01 12:00:00")))
      assert(rows.contains((2L, 1L, "2024-01-01 10:05:00", "2024-01-01 10:35:00")))
    } finally query.stop()
  }

  test("StreamBucketAgg emits finalized tumbling windows past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")
    val out = StreamBucketAgg.tumbling(df, Seq("user_id"), "ts", "15 minutes",
      "5 minutes", Seq(sum($"value").as("total_value")))
    val query = out.writeStream.format("memory").queryName("bucket_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, sqlTs("2024-01-01 10:02:00"), 1.0),
        (1L, sqlTs("2024-01-01 10:08:00"), 2.0),
        (1L, sqlTs("2024-01-01 10:17:00"), 4.0))
      query.processAllAvailable()
      input.addData((9L, sqlTs("2024-01-01 12:00:00"), 0.0)) // advance watermark
      query.processAllAvailable()
      val rows = spark.table("bucket_out")
        .select($"user_id", $"bucket_start".cast("string"), $"n_events", $"total_value")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(rows.contains((1L, "2024-01-01 10:00:00", 2L, 3.0)))
      assert(rows.contains((1L, "2024-01-01 10:15:00", 1L, 4.0)))
    } finally query.stop()
  }

  test("StreamHeartbeat emits closed gaps on arrival and ongoing gaps via timeout") {
    implicit val sqlCtx = spark.sqlContext
    import StreamHeartbeat._
    val input = MemoryStream[Heartbeat]
    val out = StreamHeartbeat.gaps(input.toDS(), thresholdSeconds = 300L)
    val query = out.writeStream.format("memory").queryName("hb_out")
      .outputMode("append").start()
    try {
      input.addData(
        Heartbeat(1L, sqlTs("2024-01-01 10:00:00")),
        Heartbeat(1L, sqlTs("2024-01-01 10:01:00")),
        Heartbeat(1L, sqlTs("2024-01-01 10:20:00")), // 19-min gap > 300 s
        Heartbeat(2L, sqlTs("2024-01-01 10:00:00"))) // then silent forever
      query.processAllAvailable()
      input.addData(Heartbeat(9L, sqlTs("2024-01-01 11:00:00"))) // advance watermark
      query.processAllAvailable()
      input.addData(Heartbeat(9L, sqlTs("2024-01-01 12:00:00"))) // fire timeouts again
      query.processAllAvailable()
      val rows = spark.table("hb_out")
        .select($"key", $"from_ts".cast("string"), $"to_ts".cast("string"), $"closed")
        .as[(Long, String, String, Boolean)].collect().toSeq
      assert(rows.contains((1L, "2024-01-01 10:01:00", "2024-01-01 10:20:00", true)))
      val ongoing = rows.filter(r => r._1 == 2L && !r._4)
      assert(ongoing.nonEmpty && ongoing.map(_._2).min == "2024-01-01 10:00:00",
        s"expected ongoing increments for silent key 2 starting 10:00, got $rows")
      // increments chain: each starts where the previous one stopped, and
      // together they cover [10:00, >= 11:00]
      assert(ongoing.map(_._3).max >= "2024-01-01 11:00:00")
      val sortedInc = ongoing.sortBy(_._2)
      sortedInc.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 == b._2, s"non-touching increments: $a then $b")
        case _ =>
      }
    } finally query.stop()
  }

  test("mergeIncrements rejoins chains but keeps adjacent outages separate") {
    import StreamHeartbeat._
    // key 1: an open chain [10:00→10:30→11:00] closed by a heartbeat at
    // 11:05 — one outage. key 2: two genuinely ADJACENT closed outages
    // sharing the boundary heartbeat at 12:00 — must stay two rows.
    val rows = Seq(
      Gap(1L, sqlTs("2024-01-01 10:00:00"), sqlTs("2024-01-01 10:30:00"), closed = false),
      Gap(1L, sqlTs("2024-01-01 10:30:00"), sqlTs("2024-01-01 11:00:00"), closed = false),
      Gap(1L, sqlTs("2024-01-01 11:00:00"), sqlTs("2024-01-01 11:05:00"), closed = true),
      Gap(2L, sqlTs("2024-01-01 11:00:00"), sqlTs("2024-01-01 12:00:00"), closed = true),
      Gap(2L, sqlTs("2024-01-01 12:00:00"), sqlTs("2024-01-01 13:00:00"), closed = true))
    val merged = StreamHeartbeat.mergeIncrements(rows.toDF())
      .select($"key", $"from_ts".cast("string"), $"to_ts".cast("string"), $"closed")
      .as[(Long, String, String, Boolean)].collect().toSet
    assert(merged == Set(
      (1L, "2024-01-01 10:00:00", "2024-01-01 11:05:00", true),
      (2L, "2024-01-01 11:00:00", "2024-01-01 12:00:00", true),
      (2L, "2024-01-01 12:00:00", "2024-01-01 13:00:00", true)))
  }

  test("heartbeat at exactly the watermark is LATE (pins the equality semantics)") {
    // The r6-advice scenario — a closing heartbeat arriving with t == wm,
    // making the closed increment zero-length — is UNREACHABLE through the
    // real stream path: emittedOpenUntil only ever holds a PAST watermark
    // value, watermarks are non-decreasing, and Spark's late filter drops
    // rows with ts <= wm, so any heartbeat that survives the filter has
    // t > wm_now >= emittedOpenUntil. The processor still emits the
    // zero-length closed row if handed t == from (defense in depth; the
    // merge unit test below pins its chain-break role). This test pins the
    // equality-drop semantics the unreachability argument rests on — if a
    // Spark upgrade starts admitting ts == wm, it fails and the boundary
    // must be re-audited.
    implicit val sqlCtx = spark.sqlContext
    import StreamHeartbeat._
    val input = MemoryStream[Heartbeat]
    val out = StreamHeartbeat.gaps(input.toDS(), thresholdSeconds = 300L)
    val query = out.writeStream.format("memory").queryName("hb_boundary")
      .outputMode("append").start()
    try {
      // batch 1: key 1 heartbeat 10:00; driver key 9 pushes max event time
      // (and thus the post-batch watermark, delay 0s) to exactly 11:00
      input.addData(
        Heartbeat(1L, sqlTs("2024-01-01 10:00:00")),
        Heartbeat(9L, sqlTs("2024-01-01 11:00:00")))
      query.processAllAvailable()
      // batch 2 (wm = 11:00): key 1's timeout fires — open [10:00, 11:00)
      input.addData(Heartbeat(9L, sqlTs("2024-01-01 11:00:00")))
      query.processAllAvailable()
      // batch 3 (wm = 11:00): a heartbeat at EXACTLY the watermark — late
      input.addData(Heartbeat(1L, sqlTs("2024-01-01 11:00:00")))
      query.processAllAvailable()
      val dropped = query.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped >= 1,
        "ts == watermark was ADMITTED: the zero-length closed-row boundary " +
          "is now reachable end-to-end and needs a real stream-path test")
      // and the open increment [10:00, 11:00) from the timeout is present
      val rows = spark.table("hb_boundary").where($"key" === 1L)
        .select($"from_ts".cast("string"), $"to_ts".cast("string"), $"closed")
        .as[(String, String, Boolean)].collect().toSeq
      assert(rows.contains(("2024-01-01 10:00:00", "2024-01-01 11:00:00", false)))
    } finally query.stop()
  }

  test("mergeIncrements: a zero-length closed row breaks the chain") {
    import StreamHeartbeat._
    // open chain up to 11:00 terminated by the zero-length closed marker
    // (the row the processor emits when handed t == from), then a second
    // outage [11:00 → 11:45] — must remain TWO outages, not merge into one
    val rows = Seq(
      Gap(1L, sqlTs("2024-01-01 10:00:00"), sqlTs("2024-01-01 11:00:00"), closed = false),
      Gap(1L, sqlTs("2024-01-01 11:00:00"), sqlTs("2024-01-01 11:00:00"), closed = true),
      Gap(1L, sqlTs("2024-01-01 11:00:00"), sqlTs("2024-01-01 11:45:00"), closed = true))
    val merged = StreamHeartbeat.mergeIncrements(rows.toDF())
      .select($"from_ts".cast("string"), $"to_ts".cast("string"), $"closed")
      .as[(String, String, Boolean)].collect().toSet
    assert(merged == Set(
      ("2024-01-01 10:00:00", "2024-01-01 11:00:00", true),
      ("2024-01-01 11:00:00", "2024-01-01 11:45:00", true)),
      s"zero-length closed row failed to break the chain: $merged")
  }

  test("writeOrdered fails fast when ties underfill the requested chunks") {
    // one distinct order value cannot fill 4 ranges — the gate must abort
    // HERE with the cause, not downstream in an assertMultiBatch mystery
    val dir = java.nio.file.Files.createTempDirectory("graft-underfill").toString
    val df = Seq.fill(20)(("a", 1L)).toDF("k", "ord")
    val e = intercept[IllegalStateException] {
      FileReplay.writeOrdered(df, Seq("ord"), chunks = 4, dir = s"$dir/data")
    }
    assert(e.getMessage.contains("part files") &&
      e.getMessage.contains("distinct"), e.getMessage)
    FileReplay.deleteRecursively(new java.io.File(dir))
  }

  test("StreamUptime accumulates per-day downtime from gap increments") {
    implicit val sqlCtx = spark.sqlContext
    import StreamHeartbeat._
    val tmp = java.nio.file.Files.createTempDirectory("graft-uptime").toString
    val input = MemoryStream[Heartbeat]
    val gapsDs = StreamHeartbeat.gaps(input.toDS(), thresholdSeconds = 300L)
    val query = StreamUptime.run(gapsDs, s"$tmp/deltas", s"$tmp/ckpt")
    try {
      input.addData(
        Heartbeat(1L, sqlTs("2024-01-01 23:00:00")),
        Heartbeat(1L, sqlTs("2024-01-02 01:00:00"))) // 2 h gap across midnight
      query.processAllAvailable()
      input.addData(Heartbeat(1L, sqlTs("2024-01-02 01:01:00")))
      query.processAllAvailable()
      val daily = StreamUptime.readDailyDowntime(spark, s"$tmp/deltas")
        .select($"key", $"date_id".cast("string"), $"downtime_minutes")
        .as[(Long, String, Double)].collect().toSet
      assert(daily == Set(
        (1L, "2024-01-01", 60.0), // 23:00 → midnight
        (1L, "2024-01-02", 60.0))) // midnight → 01:00
    } finally query.stop()
  }

  test("StreamChangeDetect emits only transitions, state persists across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatusEvent]
    val out = StreamChangeDetect.changes(input.toDS())
    val query = out.writeStream.format("memory").queryName("chg_out")
      .outputMode("append").start()
    try {
      input.addData(
        StatusEvent(1L, sqlTs("2024-01-01 10:00:00"), "Available"),
        StatusEvent(1L, sqlTs("2024-01-01 10:01:00"), "Available"),
        StatusEvent(1L, sqlTs("2024-01-01 10:02:00"), "Charging"))
      query.processAllAvailable()
      input.addData(
        StatusEvent(1L, sqlTs("2024-01-01 10:05:00"), "Charging"), // no change across batches
        StatusEvent(1L, sqlTs("2024-01-01 10:06:00"), "Faulted"))
      query.processAllAvailable()
      // a late event older than applied state must NOT emit an inverted
      // transition
      input.addData(StatusEvent(1L, sqlTs("2024-01-01 10:04:00"), "Available"))
      query.processAllAvailable()
      val rows = spark.table("chg_out")
        .select($"key", $"status", $"previous_status")
        .as[(Long, String, Option[String])].collect().toSeq
      assert(rows.sortBy(_._2) == Seq(
        (1L, "Available", None),
        (1L, "Charging", Some("Available")),
        (1L, "Faulted", Some("Charging"))))
    } finally query.stop()
  }

  test("StreamDedup drops re-deliveries within the watermark, state bounded by it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDF().toDF("doc_id", "ts", "text")
    val out = StreamDedup.exactDedup(df, "text", "ts", "10 minutes")
    val query = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, sqlTs("2024-01-01 10:00:00"), "alpha doc"),
        (2L, sqlTs("2024-01-01 10:01:00"), "ALPHA   DOC"), // normalized dup
        (3L, sqlTs("2024-01-01 10:02:00"), "beta doc"))
      query.processAllAvailable()
      // cross-batch re-delivery within the watermark window still drops
      input.addData((4L, sqlTs("2024-01-01 10:03:00"), "alpha doc"))
      query.processAllAvailable()
      val ids = spark.table("dedup_out").select($"doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L), s"got $ids")
      // watermark-bounded state: after event time advances far beyond the
      // delay, the fingerprint key is evicted and the content re-admits
      input.addData((5L, sqlTs("2024-01-01 12:00:00"), "gamma doc"))
      query.processAllAvailable()
      input.addData((6L, sqlTs("2024-01-01 12:01:00"), "alpha doc"))
      query.processAllAvailable()
      val ids2 = spark.table("dedup_out").select($"doc_id").as[Long].collect().toSet
      assert(ids2 == Set(1L, 3L, 5L, 6L), s"got $ids2")
    } finally query.stop()
  }
}
