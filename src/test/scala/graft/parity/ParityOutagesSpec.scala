package graft.parity

import graft.SparkSpec
import graft.operators.{Intervals, Outages}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replicates the reference's int_faulted_outages / int_offline_outages /
  * fact_downtime_daily unit tests
  * (models/intermediate/unit_tests.yml:173-340, models/marts/
  * unit_tests.yml:1359-1426) against graft operators.
  */
class ParityOutagesSpec extends SparkSpec {
  import spark.implicits._

  // ── int_faulted_outages ──────────────────────────────────────────────────

  private def faultSpans(rows: Seq[(String, String, String, String, String)]): DataFrame =
    rows.toDF("charger_id", "port_id", "connector_id", "from_s", "to_s")
      .withColumn("from_ts", to_timestamp(col("from_s")))
      .withColumn("to_ts", to_timestamp(col("to_s")))
      .select("charger_id", "port_id", "connector_id", "from_ts", "to_ts")

  private def portCounts(rows: (String, String, Int)*): DataFrame =
    rows.toDF("charger_id", "port_id", "connector_count")

  test("partial fault (1 of 2 connectors) produces no outage (yml:173)") {
    val got = Outages.allFaultedOutages(
      faultSpans(Seq(("CH-001", "PORT-001", "1", "2025-10-01 10:00:00", "2025-10-01 11:00:00"))),
      Seq("charger_id", "port_id"), "connector_id", "from_ts", "to_ts",
      portCounts(("CH-001", "PORT-001", 2)), "connector_count")
    assert(got.count() == 0)
  }

  test("all connectors faulted produces one outage over the overlap (yml:195)") {
    val got = Outages.allFaultedOutages(
      faultSpans(Seq(
        ("CH-001", "PORT-001", "1", "2025-10-01 10:00:00", "2025-10-01 11:00:00"),
        ("CH-001", "PORT-001", "2", "2025-10-01 10:00:00", "2025-10-01 11:00:00"))),
      Seq("charger_id", "port_id"), "connector_id", "from_ts", "to_ts",
      portCounts(("CH-001", "PORT-001", 2)), "connector_count")
      .select("charger_id", "port_id", "from_ts", "to_ts")
      .as[(String, String, java.sql.Timestamp, java.sql.Timestamp)].collect().toSeq
    assert(got == Seq(("CH-001", "PORT-001",
      sqlTs("2025-10-01 10:00:00"), sqlTs("2025-10-01 11:00:00"))))
  }

  test("adjacent all-faulted periods merge into one outage (yml:218)") {
    val got = Outages.allFaultedOutages(
      faultSpans(Seq(
        ("CH-001", "PORT-001", "1", "2025-10-01 10:00:00", "2025-10-01 11:00:00"),
        ("CH-001", "PORT-001", "1", "2025-10-01 11:00:00", "2025-10-01 12:00:00"))),
      Seq("charger_id", "port_id"), "connector_id", "from_ts", "to_ts",
      portCounts(("CH-001", "PORT-001", 1)), "connector_count")
      .select("charger_id", "port_id", "from_ts", "to_ts")
      .as[(String, String, java.sql.Timestamp, java.sql.Timestamp)].collect().toSeq
    assert(got == Seq(("CH-001", "PORT-001",
      sqlTs("2025-10-01 10:00:00"), sqlTs("2025-10-01 12:00:00"))))
  }

  // ── int_offline_outages ──────────────────────────────────────────────────

  /** Heartbeat events joined to the charger dim's monitoring window
    * (int_offline_outages.sql:70 shape); threshold 300 s
    * (var heartbeat_interval_seconds).
    */
  private def offlineOutages(
      events: Seq[(String, String)],
      chargers: Seq[(String, String, String)]): DataFrame = {
    val dim = chargers.toDF("charger_id", "comm_s", "decomm_s")
      .withColumn("monitor_start", to_timestamp(col("comm_s")))
      .withColumn("monitor_end", to_timestamp(col("decomm_s")))
      .select("charger_id", "monitor_start", "monitor_end")
    val ev = events.toDF("charger_id", "ts_s")
      .withColumn("ingested_ts", to_timestamp(col("ts_s")))
    val observed = ev.join(broadcast(dim), Seq("charger_id"))
    Intervals.heartbeatGaps(observed, Seq("charger_id"), "ingested_ts",
        "monitor_start", "monitor_end", thresholdSeconds = 300L)
      .select("charger_id", "from_ts", "to_ts")
      .unionAll(
        Intervals.silentEntityGaps(dim, ev, Seq("charger_id"), "monitor_start", "monitor_end")
          .select("charger_id", "from_ts", "to_ts"))
  }

  test("90-minute silence exceeds the 300 s heartbeat threshold (yml:243)") {
    val got = offlineOutages(
      events = Seq(("CH-001", "2025-10-01 10:00:00"), ("CH-001", "2025-10-01 11:30:00")),
      chargers = Seq(("CH-001", "2025-10-01 09:59:00", "2025-10-01 11:30:00")))
      .as[(String, java.sql.Timestamp, java.sql.Timestamp)].collect().toSeq
    assert(got == Seq(("CH-001", sqlTs("2025-10-01 10:00:00"), sqlTs("2025-10-01 11:30:00"))))
  }

  test("4-minute gap below the threshold produces no outage (yml:266)") {
    val got = offlineOutages(
      events = Seq(("CH-001", "2025-10-01 10:00:00"), ("CH-001", "2025-10-01 10:04:00")),
      chargers = Seq(("CH-001", "2025-10-01 09:59:00", "2025-10-01 10:04:00")))
    assert(got.count() == 0)
  }

  test("commissioned charger with no messages is fully offline (yml:288)") {
    val got = offlineOutages(
      events = Seq(("CH-002", "2025-10-01 13:00:00")), // CH-002 has no dim row
      chargers = Seq(("CH-001", "2025-10-01 10:00:00", "2025-10-01 12:00:00")))
      .as[(String, java.sql.Timestamp, java.sql.Timestamp)].collect().toSeq
    assert(got == Seq(("CH-001", sqlTs("2025-10-01 10:00:00"), sqlTs("2025-10-01 12:00:00"))))
  }

  // ── fact_downtime_daily ──────────────────────────────────────────────────

  /** fact_downtime_daily.sql:27-75: port-grain outage rows, offline outages
    * whose start falls inside an active faulted window dropped, then
    * interval→day allocation.
    */
  private def downtimeDaily(
      faulted: DataFrame, offlineChargerLevel: DataFrame, ports: DataFrame): DataFrame = {
    val f = faulted.withColumn("reason", lit("FAULTED"))
    val o = Intervals.antiIntervalJoin(
        offlineChargerLevel.join(ports, Seq("charger_id")), f,
        Seq("charger_id", "port_id"), "from_ts", "from_ts", "to_ts")
      .withColumn("reason", lit("OFFLINE"))
    val outages = f.select("charger_id", "port_id", "from_ts", "to_ts", "reason")
      .unionAll(o.select("charger_id", "port_id", "from_ts", "to_ts", "reason"))
    Intervals.allocateToDays(outages, "from_ts", "to_ts")
      .select(col("charger_id"), col("port_id"), col("reason"), col("date_id"),
        round(col("overlap_minutes")).cast("long").as("duration_minutes"))
  }

  test("offline outage starting during a faulted outage is excluded (yml:1359)") {
    val faulted = Seq(("CH-001", "PORT-001", "2025-10-01 10:00:00", "2025-10-01 12:00:00"))
      .toDF("charger_id", "port_id", "from_s", "to_s")
      .withColumn("from_ts", to_timestamp(col("from_s")))
      .withColumn("to_ts", to_timestamp(col("to_s")))
    val offline = Seq(("CH-001", "2025-10-01 10:30:00", "2025-10-01 12:30:00"))
      .toDF("charger_id", "from_s", "to_s")
      .withColumn("from_ts", to_timestamp(col("from_s")))
      .withColumn("to_ts", to_timestamp(col("to_s")))
      .select("charger_id", "from_ts", "to_ts")
    val ports = Seq(("CH-001", "PORT-001")).toDF("charger_id", "port_id")
    val got = downtimeDaily(faulted, offline, ports)
      .select("charger_id", "port_id", "reason", "duration_minutes")
      .as[(String, String, String, Long)].collect().toSeq
    assert(got == Seq(("CH-001", "PORT-001", "FAULTED", 120L)))
  }

  test("multi-day outage splits into per-day clipped minutes (yml:1392)") {
    val faulted = Seq.empty[(String, String, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("charger_id", "port_id", "from_ts", "to_ts")
    val offline = Seq(("CH-001", "2025-10-01 22:00:00", "2025-10-02 04:00:00"))
      .toDF("charger_id", "from_s", "to_s")
      .withColumn("from_ts", to_timestamp(col("from_s")))
      .withColumn("to_ts", to_timestamp(col("to_s")))
      .select("charger_id", "from_ts", "to_ts")
    val ports = Seq(("CH-001", "PORT-001")).toDF("charger_id", "port_id")
    val got = downtimeDaily(faulted, offline, ports)
      .orderBy("date_id")
      .select("reason", "date_id", "duration_minutes")
      .as[(String, java.sql.Date, Long)].collect().toSeq
    assert(got == Seq(
      ("OFFLINE", java.sql.Date.valueOf("2025-10-01"), 120L),
      ("OFFLINE", java.sql.Date.valueOf("2025-10-02"), 240L)))
  }
}
