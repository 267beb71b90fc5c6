package graft.streaming

import graft.SparkSpec
import graft.operators.Sketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** S4/S5/S6/S7 scale checks on the production state-store backend: the
  * RocksDB provider (the store a 1000-executor cluster would run — state
  * lives off the JVM heap and spills to local SSD, so per-executor state is
  * bounded by disk, not memory). Thousands of entities over a multi-batch
  * soak: state must stay bounded by the operator's own invariant — one row
  * per key (heartbeat), keys-per-watermark-window (ingest dedup),
  * groups×256 (sketch registers) — and must NOT grow with the number of
  * processed batches, which is what makes each operator viable over an
  * unbounded 100 TB stream.
  */
class RocksDbSoakSpec extends SparkSpec {
  import spark.implicits._
  import StreamHeartbeat._

  private val Entities = 2000
  private val Batches = 6

  private def withRocksDb[A](body: => A): A = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("S4 heartbeat gaps on RocksDB: state stays O(entities) across a soak") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[Heartbeat]
      val out = StreamHeartbeat.gaps(input.toDS(), thresholdSeconds = 300L)
      val query = out.writeStream.format("memory").queryName("rocks_out")
        .outputMode("append").start()
      try {
        val base = sqlTs("2024-01-01 10:00:00").getTime
        // each batch advances 10 min (> the 5-min threshold), so every
        // entity closes a gap every batch — constant churn through the store
        (0 until Batches).foreach { b =>
          input.addData((0 until Entities).map(k =>
            Heartbeat(k.toLong, new java.sql.Timestamp(base + b * 600000L))))
          query.processAllAvailable()
        }
        val progresses = query.recentProgress.filter(_.stateOperators.nonEmpty)
        assert(progresses.nonEmpty, "no state operator progress recorded")
        val stateRows = progresses.map(_.stateOperators.head.numRowsTotal)
        // O(entities): one state row per key, never more
        assert(stateRows.last == Entities.toLong,
          s"state rows ${stateRows.last} != $Entities entities")
        // and flat across the soak once all keys are seen — no per-batch growth
        val settled = stateRows.dropWhile(_ < Entities.toLong)
        assert(settled.nonEmpty && settled.forall(_ == Entities.toLong),
          s"state grew across batches: ${stateRows.mkString(",")}")
        // every entity surfaced its gaps: batches-1 closed gaps per key
        val n = spark.table("rocks_out").count()
        assert(n == Entities.toLong * (Batches - 1),
          s"expected ${Entities * (Batches - 1)} closed gaps, got $n")
      } finally query.stop()
    }
  }

  test("S6 ingest dedup on RocksDB: watermark BOUNDS state — old fingerprints evicted") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(String, java.sql.Timestamp)]
      val out = StreamDedup.exactDedup(
        input.toDF().toDF("text", "ts"), "text", "ts", watermarkDelay = "5 minutes")
      val query = out.writeStream.format("memory").queryName("dedup_soak")
        .outputMode("append").start()
      try {
        val base = sqlTs("2024-01-01 10:00:00").getTime
        (0 until Batches).foreach { b =>
          // fresh documents each batch, every one re-delivered twice in the
          // same batch (at-least-once source behavior) — batches advance
          // event time 10 min, twice the watermark delay, so fingerprints
          // from two batches back are evictable, not state forever
          val docs = (0 until Entities).map(k =>
            (s"document $k of batch $b", new java.sql.Timestamp(base + b * 600000L)))
          input.addData(docs ++ docs)
          query.processAllAvailable()
        }
        // re-delivery suppressed: exactly one output row per unique doc
        val n = spark.table("dedup_soak").count()
        assert(n == Entities.toLong * Batches,
          s"expected ${Entities * Batches} unique docs, got $n")
        val stateRows = query.recentProgress.filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators.head.numRowsTotal)
        // bounded by the watermark window — at most 2 batches of keys live
        // at once (a key is evictable one watermark delay after its event
        // time), NOT by the number of batches processed. The store
        // oscillates batch-keys ↔ 2×batch-keys as eviction lags one
        // microbatch; both edges are the 100 TB-stream invariant.
        assert(stateRows.max <= 2L * Entities,
          s"dedup state exceeded the watermark bound: ${stateRows.mkString(",")}")
        // no growth trend: the soak's second half peaks no higher than the
        // first half once saturated
        val half = stateRows.length / 2
        assert(stateRows.drop(half).max <= stateRows.take(half).max,
          s"dedup state still growing at soak end: ${stateRows.mkString(",")}")
      } finally query.stop()
    }
  }

  test("S1 session windows on RocksDB: finalized sessions leave the store") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(Long, java.sql.Timestamp)]
      val out = StreamSessionize.sessions(
        input.toDF().toDF("user_id", "ts"), Seq("user_id"), "ts",
        gap = "2 minutes", watermark = "1 minute")
      val query = out.writeStream.format("memory").queryName("sess_soak")
        .outputMode("append").start()
      try {
        val base = sqlTs("2024-01-01 10:00:00").getTime
        // one event per user per batch, batches 10 min apart — far past
        // gap + watermark, so every batch closes the previous batch's
        // session for all users: constant churn, state must stay at the
        // OPEN sessions (O(entities)), not accumulate finalized ones
        (0 until Batches).foreach { b =>
          input.addData((0 until Entities).map(k =>
            (k.toLong, new java.sql.Timestamp(base + b * 600000L))))
          query.processAllAvailable()
        }
        val emitted = spark.table("sess_soak").count()
        assert(emitted == Entities.toLong * (Batches - 1),
          s"expected ${Entities * (Batches - 1)} finalized sessions, got $emitted")
        val stateRows = query.recentProgress.filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators.head.numRowsTotal)
        // open sessions only — eviction may lag one microbatch, so the
        // bound is 2×entities, never batches×entities
        assert(stateRows.max <= 2L * Entities,
          s"session state exceeded the open-session bound: ${stateRows.mkString(",")}")
        val half = stateRows.length / 2
        assert(stateRows.drop(half).max <= stateRows.take(half).max,
          s"session state still growing at soak end: ${stateRows.mkString(",")}")
      } finally query.stop()
    }
  }

  test("streaming log-histogram on RocksDB: state capped at groups×buckets forever") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val groups = 4
      val input = MemoryStream[(String, Long)]
      val out = graft.operators.Sketch.logHistogram(
        input.toDF().toDF("grp", "v"), Seq("grp"), col("v"))
      val query = out.writeStream.format("memory").queryName("hist_soak")
        .outputMode("complete").start()
      try {
        (0 until Batches).foreach { _ =>
          // values span many octaves; an exact percentile would need
          // O(rows) state, the histogram must stay within the fixed
          // bucket domain (≤ ~976 per group). The same value set repeats
          // per batch so the bucket set saturates after batch 1 and the
          // settle assertion below can demand zero state growth
          input.addData((0 until Entities).map(k =>
            (s"g${k % groups}", (k.toLong * 997) % 1000000L)): _*)
          query.processAllAvailable()
        }
        val stateRows = query.recentProgress.filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators.head.numRowsTotal)
        assert(stateRows.max <= groups.toLong * 976,
          s"histogram state exceeded groups×976: ${stateRows.mkString(",")}")
        // the value domain repeats across batches, so the bucket set
        // saturates early and state growth stops — counts only increase
        assert(stateRows.takeRight(2).distinct.size == 1,
          s"histogram state not settled at soak end: ${stateRows.mkString(",")}")
        // and the stream-final histogram == the batch histogram over the
        // union of all batches, row for row
        val streamed = spark.table("hist_soak")
          .select($"grp", $"bucket", $"cnt").as[(String, Long, Long)]
          .collect().toSet
        val all = (0 until Batches).flatMap(_ => (0 until Entities).map(k =>
          (s"g${k % groups}", (k.toLong * 997) % 1000000L)))
        val batch = graft.operators.Sketch.logHistogram(
            all.toDF("grp", "v"), Seq("grp"), col("v"))
          .select($"grp", $"bucket", $"cnt").as[(String, Long, Long)]
          .collect().toSet
        assert(streamed == batch,
          "streaming histogram must equal batch histogram over the same data")
      } finally query.stop()
    }
  }

  test("S7 sketch registers on RocksDB: state capped at groups×256 forever") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val groups = 5
      val input = MemoryStream[(String, Long)]
      val out = StreamSketch.registers(
        input.toDF().toDF("grp", "v"), Seq("grp"), "v", seed = 7L)
      val query = out.writeStream.format("memory").queryName("sketch_soak")
        .outputMode("complete").start()
      try {
        (0 until Batches).foreach { b =>
          // every batch brings entirely NEW values — a count(distinct)
          // would need O(rows) state; registers must stay at groups×256
          input.addData((0 until Entities).map(k =>
            (s"g${k % groups}", b.toLong * Entities + k)): _*)
          query.processAllAvailable()
        }
        val stateRows = query.recentProgress.filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators.head.numRowsTotal)
        assert(stateRows.max <= groups.toLong * 256,
          s"register state exceeded groups×256: ${stateRows.mkString(",")}")
        // saturates AT the cap and stays there — 12k distinct values fill
        // every bucket, then zero growth: registers only tighten
        assert(stateRows.takeRight(2).distinct.size == 1,
          s"register state not settled at soak end: ${stateRows.mkString(",")}")
        // streaming registers == batch registers over the union of all
        // batches, row for row — so stream and batch sketches merge freely
        val streamed = spark.table("sketch_soak")
          .select($"grp", $"bucket", $"reg").as[(String, Long, Int)]
          .collect().toSet
        val all = (0 until Batches).flatMap(b => (0 until Entities).map(k =>
          (s"g${k % groups}", b.toLong * Entities + k)))
        val batch = Sketch.registers(all.toDF("grp", "v"), Seq("grp"), col("v"), seed = 7L)
          .select($"grp", $"bucket", $"reg").as[(String, Long, Int)]
          .collect().toSet
        assert(streamed == batch,
          "streaming registers must equal batch registers over the same data")
      } finally query.stop()
    }
  }

  test("stream-static enrich on RocksDB: agg state capped at the group domain") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val groups = 5
      val dim = (0 until Entities).map(k => (k.toLong, s"seg${k % groups}"))
        .toDF("cust_id", "segment")
      val input = MemoryStream[(Long, Double)]
      val enriched = input.toDF().toDF("user_id", "value")
        .join(broadcast(dim), $"user_id" === $"cust_id")
        .groupBy($"segment")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
      val query = enriched.writeStream.format("memory").queryName("enrich_soak")
        .outputMode("complete").start()
      try {
        (0 until Batches).foreach { b =>
          input.addData((0 until Entities).map(k => (k.toLong, (k + b).toDouble)))
          query.processAllAvailable()
        }
        val stateRows = query.recentProgress.filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators.head.numRowsTotal)
        // one state row per segment — the dimension is broadcast, never
        // stateful; unbounded stream, constant state
        assert(stateRows.max <= groups.toLong,
          s"enrich agg state exceeded the group domain: ${stateRows.mkString(",")}")
        assert(stateRows.takeRight(2).distinct.size == 1,
          s"enrich state not settled: ${stateRows.mkString(",")}")
        // stream-final == batch join+agg over the union of all batches
        val all = (0 until Batches).flatMap(b =>
          (0 until Entities).map(k => (k.toLong, (k + b).toDouble)))
        val batch = all.toDF("user_id", "value")
          .join(broadcast(dim), $"user_id" === $"cust_id")
          .groupBy($"segment")
          .agg(count(lit(1)).as("n_events"),
            sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
          .as[(String, Long, Double)].collect().toSet
        val streamed = spark.table("enrich_soak")
          .as[(String, Long, Double)].collect().toSet
        assert(streamed == batch, "stream-final enrich must equal the batch join+agg")
      } finally query.stop()
    }
  }

  test("stream-stream interval join on RocksDB: watermark evicts both sides' state") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val views = MemoryStream[(Long, java.sql.Timestamp)]
      val purchases = MemoryStream[(Long, java.sql.Timestamp)]
      val v = views.toDF().toDF("v_user", "v_ts").withWatermark("v_ts", "10 minutes")
      val pu = purchases.toDF().toDF("p_user", "p_ts").withWatermark("p_ts", "10 minutes")
      val joined = v.join(pu,
        $"v_user" === $"p_user" && $"p_ts" >= $"v_ts" &&
          $"p_ts" <= $"v_ts" + expr("INTERVAL 30 MINUTES"))
      val query = joined.writeStream.format("memory").queryName("ssj_soak")
        .outputMode("append").start()
      try {
        val base = sqlTs("2024-01-01 10:00:00").getTime
        // batches advance 20 min; the range window is 30 min and the
        // watermark 10 min, so a side's rows are joinable by the next
        // batch but MUST leave the store two batches on — state is
        // bounded by the (window + delay) horizon, not the soak length
        (0 until Batches).foreach { b =>
          val t = base + b * 1200000L
          views.addData((0 until Entities).map(k =>
            (k.toLong, new java.sql.Timestamp(t))))
          purchases.addData((0 until Entities).map(k =>
            (k.toLong, new java.sql.Timestamp(t + 300000L))))
          query.processAllAvailable()
        }
        val stateRows = query.recentProgress.filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators.head.numRowsTotal)
        assert(stateRows.max <= 6L * Entities,
          s"join state exceeded the watermark horizon: ${stateRows.mkString(",")}")
        // steady state oscillates (rows join next batch, evict the one
        // after) — compare the last third against the middle third, both
        // past the ramp-up, to prove the plateau is flat, not growing
        val third = stateRows.length / 3
        assert(stateRows.takeRight(third).max <= stateRows.slice(third, 2 * third).max,
          s"join state still growing at soak end: ${stateRows.mkString(",")}")
        // emitted pairs == batch interval join over the union of all data
        // (modulo the final batch's rows whose partners were all seen —
        // replay order guarantees that here, so equality is exact)
        val allV = (0 until Batches).flatMap(b => (0 until Entities).map(k =>
          (k.toLong, new java.sql.Timestamp(base + b * 1200000L))))
        val allP = (0 until Batches).flatMap(b => (0 until Entities).map(k =>
          (k.toLong, new java.sql.Timestamp(base + b * 1200000L + 300000L))))
        val batchN = allV.toDF("v_user", "v_ts").join(allP.toDF("p_user", "p_ts"),
          $"v_user" === $"p_user" && $"p_ts" >= $"v_ts" &&
            $"p_ts" <= $"v_ts" + expr("INTERVAL 30 MINUTES")).count()
        assert(spark.table("ssj_soak").count() == batchN,
          "stream-stream join output must equal the batch interval join")
      } finally query.stop()
    }
  }

  test("streaming SCD2 on RocksDB: state is one open version per key, flat forever") {
    implicit val sqlCtx = spark.sqlContext
    import StreamChangeDetect.StatusEvent
    withRocksDb {
      val input = MemoryStream[StatusEvent]
      val query = StreamScd2.versions(input.toDS())
        .writeStream.format("memory").queryName("scd2_soak")
        .outputMode("append").start()
      try {
        val base = sqlTs("2024-01-01 10:00:00").getTime
        // alternating status every batch: every key transitions every
        // batch — history grows in the SINK; state must stay at one
        // CurrentVersion row per key however long the soak runs
        (0 until Batches).foreach { b =>
          input.addData((0 until Entities).map(k =>
            StatusEvent(k.toLong, new java.sql.Timestamp(base + b * 600000L),
              if (b % 2 == 0) "on" else "off", b.toLong)))
          query.processAllAvailable()
        }
        val stateRows = query.recentProgress.filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators.head.numRowsTotal)
        assert(stateRows.max == Entities.toLong,
          s"SCD2 state must be one row per key: ${stateRows.mkString(",")}")
        val settled = stateRows.dropWhile(_ < Entities.toLong)
        assert(settled.nonEmpty && settled.forall(_ == Entities.toLong),
          s"SCD2 state grew across batches: ${stateRows.mkString(",")}")
        // emissions: 1 open (batch 0) + 2 per later batch (close + open)
        val n = spark.table("scd2_soak").count()
        assert(n == Entities.toLong * (1 + 2 * (Batches - 1)),
          s"expected ${Entities * (1 + 2 * (Batches - 1))} emissions, got $n")
      } finally query.stop()
    }
  }

  test("streaming attribution on RocksDB: lookback prune bounds the touch window state") {
    implicit val sqlCtx = spark.sqlContext
    import StreamAttribution._
    withRocksDb {
      val input = MemoryStream[TouchStreamEvent]
      // 30-minute lookback; batches advance 20 minutes, so each key's
      // window holds at most the previous batch's touch — state is one
      // row per key (the touch list inside it pruned), flat forever
      val query = StreamAttribution.attributed(input.toDS(), 1800L * 1000000L)
        .writeStream.format("memory").queryName("attr_soak")
        .outputMode("append").start()
      try {
        val base = sqlTs("2024-01-01 10:00:00").getTime
        (0 until Batches).foreach { b =>
          val t = base + b * 1200000L
          input.addData((0 until Entities).flatMap { k =>
            Seq(
              TouchStreamEvent(k.toLong, new java.sql.Timestamp(t),
                b.toLong * Entities * 2 + k, "click", is_touch = true, is_conv = false),
              TouchStreamEvent(k.toLong, new java.sql.Timestamp(t + 600000L),
                b.toLong * Entities * 2 + Entities + k, "purchase",
                is_touch = false, is_conv = true))
          })
          query.processAllAvailable()
        }
        val stateRows = query.recentProgress.filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators.head.numRowsTotal)
        assert(stateRows.max <= Entities.toLong,
          s"attribution state must stay at one row per key: ${stateRows.mkString(",")}")
        // every conversion in every batch credits its same-batch click
        val attributed = spark.table("attr_soak")
          .where(col("touch_id").isNotNull).count()
        assert(attributed == Entities.toLong * Batches,
          s"expected ${Entities * Batches} attributed conversions, got $attributed")
      } finally query.stop()
    }
  }

  test("S1 append-mode session_window on RocksDB: state O(entities), sessions finalize") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(Long, java.sql.Timestamp)]
      val out = StreamSessionize.sessions(
        input.toDF().toDF("user_id", "ts"), Seq("user_id"), "ts",
        gap = "30 minutes", watermark = "0 seconds")
      val query = out.writeStream.format("memory").queryName("sess_append_soak")
        .outputMode("append").start()
      try {
        val base = sqlTs("2024-01-01 10:00:00").getTime
        // batches advance 40 min (> the 30-min gap): every batch opens a
        // fresh session per entity and the advancing watermark finalizes
        // the previous one — constant churn through the store
        (0 until Batches).foreach { b =>
          input.addData((0 until Entities).map(k =>
            (k.toLong, new java.sql.Timestamp(base + b * 2400000L))))
          query.processAllAvailable()
        }
        val stateRows = query.recentProgress.filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators.head.numRowsTotal)
        // bounded by keys (≤ one open + one finalizing session per key),
        // NEVER by batches
        assert(stateRows.max <= 2L * Entities,
          s"session state must stay O(entities): ${stateRows.mkString(",")}")
        val settled = stateRows.drop(2)
        assert(settled.nonEmpty && settled.distinct.size <= 2,
          s"state grew across batches: ${stateRows.mkString(",")}")
        // finalized sessions: every batch's session except the open tail
        // (watermark lag can hold back at most one extra batch per key)
        val n = spark.table("sess_append_soak").count()
        assert(n >= Entities.toLong * (Batches - 2) && n % Entities == 0,
          s"expected >= ${Entities * (Batches - 2)} finalized sessions, got $n")
      } finally query.stop()
    }
  }

  test("stream-stream LEFT OUTER join on RocksDB: eviction emits outer rows, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val views = MemoryStream[(Long, java.sql.Timestamp)]
      val purchases = MemoryStream[(Long, java.sql.Timestamp)]
      val v = views.toDF().toDF("v_user", "v_ts").withWatermark("v_ts", "10 minutes")
      val pu = purchases.toDF().toDF("p_user", "p_ts").withWatermark("p_ts", "10 minutes")
      val joined = v.join(pu,
        $"v_user" === $"p_user" && $"p_ts" >= $"v_ts" &&
          $"p_ts" <= $"v_ts" + expr("INTERVAL 30 MINUTES"), "left_outer")
      val query = joined.writeStream.format("memory").queryName("sslj_soak")
        .outputMode("append").start()
      try {
        val base = sqlTs("2024-01-01 10:00:00").getTime
        // only EVEN keys ever get a purchase: half of each batch's views
        // can only leave the store as watermark-evicted outer rows
        (0 until Batches).foreach { b =>
          val t = base + b * 1200000L
          views.addData((0 until Entities).map(k =>
            (k.toLong, new java.sql.Timestamp(t))))
          purchases.addData((0 until Entities by 2).map(k =>
            (k.toLong, new java.sql.Timestamp(t + 300000L))))
          query.processAllAvailable()
        }
        // far-future flush pair so the final batches' outer rows finalize
        val flushT = base + (Batches + 8) * 1200000L
        views.addData(Seq((-1L, new java.sql.Timestamp(flushT))))
        purchases.addData(Seq((-1L, new java.sql.Timestamp(flushT))))
        query.processAllAvailable()
        views.addData(Seq((-1L, new java.sql.Timestamp(flushT + 1200000L))))
        purchases.addData(Seq((-1L, new java.sql.Timestamp(flushT + 1200000L))))
        query.processAllAvailable()
        val stateRows = query.recentProgress.filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators.head.numRowsTotal)
        assert(stateRows.max <= 6L * Entities,
          s"outer-join state exceeded the watermark horizon: ${stateRows.mkString(",")}")
        // emitted = batch LEFT join over everything (flush keys excluded):
        // matched pairs AND every odd-key view as a null-extended row
        val out = spark.table("sslj_soak").filter($"v_user" =!= -1L)
        val matched = out.filter($"p_user".isNotNull).count()
        val outer = out.filter($"p_user".isNull).count()
        val allV = (0 until Batches).flatMap(b => (0 until Entities).map(k =>
          (k.toLong, new java.sql.Timestamp(base + b * 1200000L))))
        val allP = (0 until Batches).flatMap(b => (0 until Entities by 2).map(k =>
          (k.toLong, new java.sql.Timestamp(base + b * 1200000L + 300000L))))
        val batchMatched = allV.toDF("v_user", "v_ts").join(allP.toDF("p_user", "p_ts"),
          $"v_user" === $"p_user" && $"p_ts" >= $"v_ts" &&
            $"p_ts" <= $"v_ts" + expr("INTERVAL 30 MINUTES")).count()
        assert(matched == batchMatched,
          s"matched rows: stream $matched vs batch $batchMatched")
        assert(outer == (Entities / 2).toLong * Batches,
          s"every odd-key view must surface as ONE outer row, got $outer")
      } finally query.stop()
    }
  }

  test("stream-stream FULL OUTER join on RocksDB: both sides evict to outer rows") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val views = MemoryStream[(Long, java.sql.Timestamp)]
      val purchases = MemoryStream[(Long, java.sql.Timestamp)]
      val v = views.toDF().toDF("v_user", "v_ts").withWatermark("v_ts", "10 minutes")
      val pu = purchases.toDF().toDF("p_user", "p_ts").withWatermark("p_ts", "10 minutes")
      val joined = v.join(pu,
        $"v_user" === $"p_user" && $"p_ts" >= $"v_ts" &&
          $"p_ts" <= $"v_ts" + expr("INTERVAL 30 MINUTES"), "full_outer")
      val query = joined.writeStream.format("memory").queryName("ssfj_soak")
        .outputMode("append").start()
      try {
        val base = sqlTs("2024-01-01 10:00:00").getTime
        // views for keys [0, Entities); purchases for EVEN keys (matched)
        // plus keys [2*Entities, 2*Entities + Entities/4) that have NO
        // views — those can only leave the store as right-outer rows
        (0 until Batches).foreach { b =>
          val t = base + b * 1200000L
          views.addData((0 until Entities).map(k =>
            (k.toLong, new java.sql.Timestamp(t))))
          purchases.addData(
            (0 until Entities by 2).map(k =>
              (k.toLong, new java.sql.Timestamp(t + 300000L))) ++
            (2 * Entities until 2 * Entities + Entities / 4).map(k =>
              (k.toLong, new java.sql.Timestamp(t + 300000L))))
          query.processAllAvailable()
        }
        val flushT = base + (Batches + 8) * 1200000L
        views.addData(Seq((-1L, new java.sql.Timestamp(flushT))))
        purchases.addData(Seq((-1L, new java.sql.Timestamp(flushT))))
        query.processAllAvailable()
        views.addData(Seq((-1L, new java.sql.Timestamp(flushT + 1200000L))))
        purchases.addData(Seq((-1L, new java.sql.Timestamp(flushT + 1200000L))))
        query.processAllAvailable()
        val stateRows = query.recentProgress.filter(_.stateOperators.nonEmpty)
          .map(_.stateOperators.head.numRowsTotal)
        assert(stateRows.max <= 8L * Entities,
          s"full-outer-join state exceeded the watermark horizon: ${stateRows.mkString(",")}")
        // EXACT outer-row accounting per side: every odd-key view is one
        // left-outer row, every no-view-key purchase one right-outer row
        val out = spark.table("ssfj_soak")
          .filter(coalesce($"v_user", $"p_user") =!= -1L)
        val matched = out.filter($"v_user".isNotNull && $"p_user".isNotNull).count()
        val leftOuter = out.filter($"p_user".isNull).count()
        val rightOuter = out.filter($"v_user".isNull).count()
        val allV = (0 until Batches).flatMap(b => (0 until Entities).map(k =>
          (k.toLong, new java.sql.Timestamp(base + b * 1200000L))))
        val allP = (0 until Batches).flatMap(b => (0 until Entities by 2).map(k =>
          (k.toLong, new java.sql.Timestamp(base + b * 1200000L + 300000L))))
        val batchMatched = allV.toDF("v_user", "v_ts").join(allP.toDF("p_user", "p_ts"),
          $"v_user" === $"p_user" && $"p_ts" >= $"v_ts" &&
            $"p_ts" <= $"v_ts" + expr("INTERVAL 30 MINUTES")).count()
        assert(matched == batchMatched,
          s"matched rows: stream $matched vs batch $batchMatched")
        assert(leftOuter == (Entities / 2).toLong * Batches,
          s"every odd-key view must surface as ONE left-outer row, got $leftOuter")
        assert(rightOuter == (Entities / 4).toLong * Batches,
          s"every no-view-key purchase must surface as ONE right-outer row, got $rightOuter")
      } finally query.stop()
    }
  }
}
