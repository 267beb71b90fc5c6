package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Restart-recovery evidence for every stateful streaming operator class:
  * a query is killed after draining part of an ordered file replay, a NEW
  * query instance resumes from the SAME checkpoint over late-arriving
  * files, and the combined answer must be restart-invariant — equal to
  * what a single uninterrupted run (or the batch formulation) produces.
  *
  * This is the production failure mode the multi-batch gates do not cover:
  * driver loss between micro-batches. What it proves per operator class:
  * session_window merge state, flatMapGroupsWithState user state,
  * dropDuplicatesWithinWatermark fingerprint state, EventTimeTimeout timer
  * state, and windowed-agg partial sums all round-trip the checkpoint, and
  * the file source's commit log prevents reprocessing (phase 2 reads ONLY
  * the files that arrived after the restart — asserted on numInputRows).
  *
  * Harness: each logical micro-batch is appended as one part file
  * ([[FileReplay.appendFile]] stamps ascending mtimes) and streamed with
  * maxFilesPerTrigger=1, so the restart boundary sits between REAL
  * micro-batch commits at a deterministic point in event time.
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  private case class PhaseResult(rows: Seq[Row], lastBatchId: Long, inputRows: Long)

  /** Run one drain-to-completion phase over `dir` with the shared
    * checkpoint `ckpt`. Append-mode phases write through the REAL file
    * sink (its commit log is what gives a restarted query exactly-once
    * output — an append-mode memory sink refuses checkpoint recovery);
    * `rows` is then the sink's ACCUMULATED content, so duplicate emission
    * across the restart would show up directly. Complete mode keeps the
    * memory sink (per-phase table `name`) — its full-rewrite contract is
    * restart-recoverable.
    */
  private def runPhase(
      dir: String, ckpt: String, out: String, name: String, outputMode: String)(
      build: DataFrame => DataFrame): PhaseResult = {
    val schema = spark.read.parquet(dir).schema
    val writer = build(FileReplay.stream(spark, dir, schema))
      .writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
    val q =
      if (outputMode == "complete") writer.format("memory").queryName(name).start()
      else writer.format("parquet").option("path", out).start()
    q.awaitTermination()
    val progs = q.recentProgress.toSeq
    q.stop()
    val rows =
      if (outputMode == "complete") spark.table(name).collect().toSeq
      else
        try spark.read.parquet(out).collect().toSeq
        catch { case _: org.apache.spark.sql.AnalysisException => Seq.empty }
    PhaseResult(
      rows,
      progs.map(_.batchId).maxOption.getOrElse(-1L),
      progs.map(_.numInputRows).sum)
  }

  private def freshDirs(tag: String): (String, String, String) = {
    val base = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-ckpt-$tag-${System.nanoTime()}")
    val replay = new java.io.File(base, "replay")
    replay.mkdirs()
    (replay.getAbsolutePath,
     new java.io.File(base, "ckpt").getAbsolutePath,
     new java.io.File(base, "out").getAbsolutePath)
  }

  private def cleanup(dir: String, ckpt: String): Unit = {
    FileReplay.deleteRecursively(new java.io.File(dir).getParentFile)
  }

  test("session_window state merges across a checkpoint restart") {
    val (dir, ckpt, out) = freshDirs("sess")
    try {
      // phase 1: two batches — first two events of what must become ONE
      // 3-event session, plus an unrelated user
      FileReplay.appendFile(Seq(
        (1L, sqlTs("2024-01-01 10:00:00")),
        (2L, sqlTs("2024-01-01 10:02:00"))).toDF("user_id", "ts"), dir)
      FileReplay.appendFile(Seq(
        (1L, sqlTs("2024-01-01 10:10:00"))).toDF("user_id", "ts"), dir)
      def build(df: DataFrame) =
        StreamSessionize.sessions(df, Seq("user_id"), "ts", "30 minutes", "0 seconds")
      val p1 = runPhase(dir, ckpt, out, "ckpt_sess_p1", "complete")(build)
      assert(p1.lastBatchId >= 1, s"expected >=2 phase-1 batches, got ${p1.lastBatchId}")

      // phase 2 (post-restart): the session's third event — mergeable with
      // the CHECKPOINTED window only — and a far-later separate session
      FileReplay.appendFile(Seq(
        (1L, sqlTs("2024-01-01 10:20:00"))).toDF("user_id", "ts"), dir)
      FileReplay.appendFile(Seq(
        (1L, sqlTs("2024-01-01 13:00:00"))).toDF("user_id", "ts"), dir)
      val p2 = runPhase(dir, ckpt, out, "ckpt_sess_p2", "complete")(build)

      assert(p2.lastBatchId > p1.lastBatchId,
        s"restart did not continue the checkpoint batch sequence: ${p2.lastBatchId}")
      assert(p2.inputRows == 2L,
        s"restart reprocessed already-committed files: ${p2.inputRows} input rows")
      val sessions = p2.rows.map(r => (
        r.getLong(r.fieldIndex("user_id")),
        r.getTimestamp(r.fieldIndex("session_start_ts")).toString,
        r.getLong(r.fieldIndex("n_events")))).toSet
      // straddling session merged to n=3; batch twin agrees
      assert(sessions == Set(
        (1L, "2024-01-01 10:00:00.0", 3L),
        (2L, "2024-01-01 10:02:00.0", 1L),
        (1L, "2024-01-01 13:00:00.0", 1L)), s"got $sessions")
    } finally cleanup(dir, ckpt)
  }

  test("flatMapGroupsWithState user state survives a checkpoint restart") {
    import StreamChangeDetect._
    val (dir, ckpt, out) = freshDirs("chg")
    try {
      FileReplay.appendFile(Seq(
        StatusEvent(1L, sqlTs("2024-01-01 10:00:00"), "online", 1L),
        StatusEvent(2L, sqlTs("2024-01-01 10:00:00"), "online", 2L)).toDF(), dir)
      FileReplay.appendFile(Seq(
        StatusEvent(1L, sqlTs("2024-01-01 10:05:00"), "online", 3L)).toDF(), dir)
      def build(df: DataFrame) =
        changes(df.as(org.apache.spark.sql.Encoders.product[StatusEvent])).toDF()
      val p1 = runPhase(dir, ckpt, out, "ckpt_chg_p1", "append")(build)

      // post-restart: user 1 flips — the A->B transition is only visible
      // if the checkpoint restored user 1's last status "online"
      FileReplay.appendFile(Seq(
        StatusEvent(1L, sqlTs("2024-01-01 10:10:00"), "offline", 4L),
        StatusEvent(2L, sqlTs("2024-01-01 10:10:00"), "online", 5L)).toDF(), dir)
      val p2 = runPhase(dir, ckpt, out, "ckpt_chg_p2", "append")(build)

      assert(p2.lastBatchId > p1.lastBatchId && p2.inputRows == 2L,
        s"expected continuation with 2 new rows, got batch=${p2.lastBatchId} rows=${p2.inputRows}")
      def asTuples(rs: Seq[Row]) = rs.map(r => (
        r.getLong(r.fieldIndex("key")),
        r.getTimestamp(r.fieldIndex("ts")).toString,
        r.getString(r.fieldIndex("status")),
        r.getString(r.fieldIndex("previous_status")))).toSet
      // phase 2 added ONLY the cross-restart transition (user 2 stayed
      // put) — p2.rows is the sink's accumulated content, so diff vs p1
      assert(asTuples(p2.rows) -- asTuples(p1.rows) == Set(
        (1L, "2024-01-01 10:10:00.0", "offline", "online")),
        s"got ${asTuples(p2.rows) -- asTuples(p1.rows)}")
      // accumulated sink == the batch lag() formulation, no duplicates
      assert(p2.rows.size == 3 && asTuples(p2.rows) == Set(
        (1L, "2024-01-01 10:00:00.0", "online", null),
        (2L, "2024-01-01 10:00:00.0", "online", null),
        (1L, "2024-01-01 10:10:00.0", "offline", "online")))
    } finally cleanup(dir, ckpt)
  }

  test("dropDuplicatesWithinWatermark fingerprint state survives restart") {
    val (dir, ckpt, out) = freshDirs("dedup")
    try {
      FileReplay.appendFile(Seq(
        ("docA", sqlTs("2024-01-01 10:00:00")),
        ("docB", sqlTs("2024-01-01 10:00:30"))).toDF("doc_id", "ts"), dir)
      FileReplay.appendFile(Seq(
        ("docC", sqlTs("2024-01-01 10:01:00"))).toDF("doc_id", "ts"), dir)
      def build(df: DataFrame) =
        StreamDedup.exactDedupByCols(df, Seq("doc_id"), "ts", "1 hour")
      val p1 = runPhase(dir, ckpt, out, "ckpt_dd_p1", "append")(build)
      assert(p1.rows.size == 3)

      // post-restart re-deliveries of pre-restart docs + one new doc; all
      // inside the watermark window, so the re-sends MUST be dropped by
      // restored state, and must not be re-emitted
      FileReplay.appendFile(Seq(
        ("docA", sqlTs("2024-01-01 10:02:00")),
        ("docB", sqlTs("2024-01-01 10:02:10")),
        ("docD", sqlTs("2024-01-01 10:02:20"))).toDF("doc_id", "ts"), dir)
      val p2 = runPhase(dir, ckpt, out, "ckpt_dd_p2", "append")(build)

      assert(p2.lastBatchId > p1.lastBatchId && p2.inputRows == 3L)
      // accumulated sink: exactly the 4 distinct docs, once each — the
      // re-sends were dropped by RESTORED state, nothing was re-emitted
      val ids = p2.rows.map(_.getString(0))
      assert(ids.size == 4 && ids.toSet == Set("docA", "docB", "docC", "docD"),
        s"restored dedup state failed to drop re-deliveries: $ids")
    } finally cleanup(dir, ckpt)
  }

  test("EventTimeTimeout timer/lastSeen state survives restart") {
    import StreamHeartbeat._
    val (dir, ckpt, out) = freshDirs("hb")
    try {
      // key 1 heartbeats then goes silent BEFORE the restart; key 9 is the
      // watermark mover. threshold 300 s.
      FileReplay.appendFile(Seq(
        Heartbeat(1L, sqlTs("2024-01-01 10:00:00")),
        Heartbeat(9L, sqlTs("2024-01-01 10:00:00"))).toDF(), dir)
      FileReplay.appendFile(Seq(
        Heartbeat(9L, sqlTs("2024-01-01 10:30:00"))).toDF(), dir)
      def build(df: DataFrame) =
        gaps(df.as(org.apache.spark.sql.Encoders.product[Heartbeat]), 300L).toDF()
      val p1 = runPhase(dir, ckpt, out, "ckpt_hb_p1", "append")(build)

      // post-restart: watermark moves further (timeout must re-fire from
      // RESTORED lastSeen/emittedOpenUntil), then key 1 returns, closing
      // the gap at exactly its silent start
      FileReplay.appendFile(Seq(
        Heartbeat(9L, sqlTs("2024-01-01 11:00:00"))).toDF(), dir)
      // the returning heartbeat is the LAST event: a later watermark mover
      // would re-open a fresh (correct) ongoing gap after 11:30+threshold
      // and the chain would no longer END on the closed increment
      FileReplay.appendFile(Seq(
        Heartbeat(1L, sqlTs("2024-01-01 11:30:00"))).toDF(), dir)
      val p2 = runPhase(dir, ckpt, out, "ckpt_hb_p2", "append")(build)
      assert(p2.lastBatchId > p1.lastBatchId && p2.inputRows == 2L)

      def incs(rs: Seq[Row]) = rs.map(r => Gap(
        r.getLong(r.fieldIndex("key")),
        r.getTimestamp(r.fieldIndex("from_ts")),
        r.getTimestamp(r.fieldIndex("to_ts")),
        r.getBoolean(r.fieldIndex("closed")))).filter(_.key == 1L)
      // p2.rows is the accumulated file sink — already the full chain
      val all = incs(p2.rows)
      // increments chain across the restart: each starts where the last
      // stopped, from 10:00 silent-start to the 11:30 closing heartbeat
      val sorted = all.sortBy(g => g.from_ts.getTime)
      assert(sorted.nonEmpty && sorted.head.from_ts == sqlTs("2024-01-01 10:00:00"))
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a.to_ts == b.from_ts,
          s"increment chain broke across restart: $a then $b")
        case _ =>
      }
      assert(sorted.last.to_ts == sqlTs("2024-01-01 11:30:00") && sorted.last.closed,
        s"gap did not close at the returning heartbeat: ${sorted.last}")
      // merged view equals the single uninterrupted-run answer
      val merged = mergeIncrements(all.toDF())
        .select($"key", $"from_ts".cast("string"), $"to_ts".cast("string"), $"closed")
        .as[(Long, String, String, Boolean)].collect().toSet
      assert(merged == Set(
        (1L, "2024-01-01 10:00:00", "2024-01-01 11:30:00", true)))
    } finally cleanup(dir, ckpt)
  }

  test("foreachBatch delta-sum replays an uncommitted batch idempotently") {
    import StreamHeartbeat._
    // THE at-least-once window: a crash after the offset log records batch
    // N but before the commit log does forces Spark to re-execute batch N
    // on restart with the same batchId and the same source slice.
    // StreamUptime's contract is that the re-execution OVERWRITES
    // batch_id=N instead of double-appending its downtime deltas. Forced
    // deterministically here by deleting the checkpoint's last commit
    // marker between two AvailableNow drains.
    val (dir, ckpt, out) = freshDirs("fb")
    val noData = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.get(noData)
    // no-data batches add trailing EMPTY batches; with timeouts disabled
    // they carry nothing, and the replayed batch must be one with real
    // deltas for this test to bite
    spark.conf.set(noData, "false")
    try {
      // closed gaps only (watermark beyond horizon disables timeouts) —
      // the q_stream_uptime gate's mode; threshold 300 s
      FileReplay.appendFile(Seq(
        Heartbeat(1L, sqlTs("2024-01-01 23:50:00")),
        Heartbeat(1L, sqlTs("2024-01-01 23:55:00"))).toDF(), dir)
      FileReplay.appendFile(Seq(
        Heartbeat(1L, sqlTs("2024-01-02 00:10:00"))).toDF(), dir) // 15 min, straddles midnight
      FileReplay.appendFile(Seq(
        Heartbeat(1L, sqlTs("2024-01-02 02:00:00"))).toDF(), dir) // 110 min
      val schema = spark.read.parquet(dir).schema
      def drain(): Unit = {
        val gapsDs = StreamHeartbeat.gaps(
          FileReplay.stream(spark, dir, schema)
            .as(org.apache.spark.sql.Encoders.product[Heartbeat]),
          thresholdSeconds = 300L, watermark = "3650 days")
        val q = StreamUptime.run(gapsDs, out, ckpt,
          Some(Trigger.AvailableNow()))
        try q.awaitTermination() finally q.stop()
      }
      drain()
      def daily(): Set[(Long, String, Double)] =
        StreamUptime.readDailyDowntime(spark, out)
          .select($"key", $"date_id".cast("string"), $"downtime_minutes")
          .as[(Long, String, Double)].collect().toSet
      val expected = Set(
        (1L, "2024-01-01", 5.0),    // 23:55→00:10 allocates 5 min to day 1
        (1L, "2024-01-02", 120.0))  // 10 min + the 110-min gap
      assert(daily() == expected, s"pre-crash daily table wrong: ${daily()}")

      // find the last batch's delta dir and part file, then simulate the
      // crash: offsets retain batch N, its commit marker disappears
      val commits = new java.io.File(ckpt, "commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
      val lastBatch = commits.last.getName.toLong
      val deltaDir = new java.io.File(out, s"batch_id=$lastBatch")
      def partNames = deltaDir.listFiles()
        .filter(_.getName.startsWith("part-")).map(_.getName).toSet
      val before = partNames
      assert(before.nonEmpty, s"last batch $lastBatch wrote no deltas")
      assert(commits.last.delete(), "could not remove the last commit marker")
      // the local FS keeps a checksum sibling; left behind it would make
      // the re-written commit marker's rename fail
      new java.io.File(commits.last.getParentFile, s".${commits.last.getName}.crc").delete()

      drain() // restart: batch N re-executes (same id, same source slice)
      assert(partNames != before,
        s"batch $lastBatch was not re-executed — the at-least-once replay never happened")
      assert(daily() == expected,
        s"replayed batch double-counted its deltas: ${daily()}")
    } finally {
      spark.conf.set(noData, prevNoData)
      cleanup(dir, ckpt)
    }
  }

  test("windowed-agg partial sums accumulated pre-restart finalize post-restart") {
    val (dir, ckpt, out) = freshDirs("win")
    try {
      // window [10:00,10:15) gets rows in BOTH phases; watermark (5 min)
      // passes it only in phase 2, so the single emitted row must combine
      // a pre-restart partial with post-restart rows
      FileReplay.appendFile(Seq(
        (1L, sqlTs("2024-01-01 10:02:00"), 1.0),
        (1L, sqlTs("2024-01-01 10:08:00"), 2.0)).toDF("user_id", "ts", "value"), dir)
      def build(df: DataFrame) =
        StreamBucketAgg.tumbling(df, Seq("user_id"), "ts", "15 minutes",
          "5 minutes", Seq(sum(col("value")).as("total_value")))
      val p1 = runPhase(dir, ckpt, out, "ckpt_win_p1", "append")(build)
      assert(p1.rows.isEmpty, s"window emitted before the watermark passed: ${p1.rows}")

      FileReplay.appendFile(Seq(
        (1L, sqlTs("2024-01-01 10:12:00"), 4.0)).toDF("user_id", "ts", "value"), dir)
      FileReplay.appendFile(Seq(
        (9L, sqlTs("2024-01-01 12:00:00"), 0.0)).toDF("user_id", "ts", "value"), dir)
      val p2 = runPhase(dir, ckpt, out, "ckpt_win_p2", "append")(build)
      assert(p2.lastBatchId > p1.lastBatchId && p2.inputRows == 2L)
      val emitted = p2.rows.map(r => (
        r.getLong(r.fieldIndex("user_id")),
        r.getTimestamp(r.fieldIndex("bucket_start")).toString,
        r.getLong(r.fieldIndex("n_events")),
        r.getDouble(r.fieldIndex("total_value")))).toSet
      assert(emitted == Set((1L, "2024-01-01 10:00:00.0", 3L, 7.0)),
        s"pre-restart partial aggregate was lost or doubled: $emitted")
    } finally cleanup(dir, ckpt)
  }
}
