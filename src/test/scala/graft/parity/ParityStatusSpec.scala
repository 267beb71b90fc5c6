package graft.parity

import graft.SparkSpec
import graft.operators.{ChangeDetect, Incremental}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replicates the reference's int_status_changes / int_connector_latest_status
  * / int_driver_aggregates unit tests
  * (models/intermediate/unit_tests.yml:7-170, 410-444) against graft
  * operators, starting from raw OCPP-log-shaped rows (JSON payload
  * extraction included, as in stg_ocpp_logs.sql).
  */
class ParityStatusSpec extends SparkSpec {
  import spark.implicits._

  /** stg_ocpp_logs-shaped fixture → status-change stream:
    * filter StatusNotification, extract connectorId/status from the JSON
    * payload (stg_ocpp_logs.sql:24 shape).
    */
  private def statusStream(rows: Seq[(String, String, String, String, String)]): DataFrame =
    rows.toDF("ingested_s", "charger_id", "action", "unique_id", "payload")
      .withColumn("ingested_ts", to_timestamp(col("ingested_s")))
      .filter(col("action") === "StatusNotification")
      .withColumn("connector_id", get_json_object(col("payload"), "$.connectorId"))
      .withColumn("status", get_json_object(col("payload"), "$.status"))

  test("consecutive same-status notifications collapse to one change row (yml:72)") {
    val df = statusStream(Seq(
      ("2025-10-01 09:59:00", "CH-001", "Heartbeat", "UID-000", "{}"),
      ("2025-10-01 10:00:00", "CH-001", "StatusNotification", "UID-001",
        """{"connectorId": 1, "errorCode": "NoError", "status": "Available"}"""),
      ("2025-10-01 10:30:00", "CH-001", "StatusNotification", "UID-002",
        """{"connectorId": 1, "errorCode": "NoError", "status": "Available"}""")))
    val got = ChangeDetect.changes(df, Seq("charger_id", "connector_id"),
        Seq("ingested_ts", "unique_id"), "status")
      .select("charger_id", "connector_id", "status", "previous_status", "next_status")
      .as[(String, String, String, Option[String], Option[String])].collect().toSeq
    assert(got == Seq(("CH-001", "1", "Available", None, None)))
  }

  test("three transitions carry correct previous/next status (yml:98)") {
    val df = statusStream(Seq(
      ("2025-10-01 09:59:00", "CH-001", "Heartbeat", "UID-000", "{}"),
      ("2025-10-01 10:00:00", "CH-001", "StatusNotification", "UID-001",
        """{"connectorId": 1, "errorCode": "NoError", "status": "Available"}"""),
      ("2025-10-01 10:05:00", "CH-001", "StatusNotification", "UID-002",
        """{"connectorId": 1, "errorCode": "NoError", "status": "Preparing"}"""),
      ("2025-10-01 10:10:00", "CH-001", "StatusNotification", "UID-003",
        """{"connectorId": 1, "errorCode": "NoError", "status": "Charging"}""")))
    val got = ChangeDetect.changes(df, Seq("charger_id", "connector_id"),
        Seq("ingested_ts", "unique_id"), "status")
      .orderBy("ingested_ts")
      .select("status", "previous_status", "next_status")
      .as[(String, Option[String], Option[String])].collect().toSeq
    assert(got == Seq(
      ("Available", None, Some("Preparing")),
      ("Preparing", Some("Available"), Some("Charging")),
      ("Charging", Some("Preparing"), None)))
  }

  test("latest status: a batch with no events for a key emits no row for it (yml:410)") {
    // merge-strategy contract: only keys present in the new batch are
    // (re)emitted, so the stored row for CH-001 stays untouched
    val newBatch = Seq(
      ("CH-002", "1", "P-002", "2025-10-02 10:30:00", "Charging"))
      .toDF("charger_id", "connector_id", "port_id", "ingested_s", "status")
      .withColumn("ingested_ts", to_timestamp(col("ingested_s")))
    val got = ChangeDetect.latestByKey(newBatch,
        Seq("charger_id", "connector_id"), Seq("ingested_ts"), Seq("port_id", "status"))
      .select("charger_id", "connector_id", "latest_port_id", "latest_status")
      .as[(String, String, String, String)].collect().toSeq
    assert(got == Seq(("CH-002", "1", "P-002", "Charging")))
  }

  /** dim_drivers assembly (models/marts/dim_drivers.sql:15-60): known
    * drivers pass through; the __UNKNOWN__ sentinel maps to one UNKNOWN
    * dimension row, falling back to 1900-01-01 when absent.
    */
  private def dimDrivers(aggs: DataFrame): DataFrame = {
    val known = aggs.filter(col("id_tag") =!= "__UNKNOWN__")
      .withColumn("is_known_driver", lit(true))
    val unknown = aggs.agg(
        coalesce(
          max(when(col("id_tag") === "__UNKNOWN__", col("first_seen_ts"))),
          to_timestamp(lit("1900-01-01"))).as("first_seen_ts"),
        coalesce(
          max(when(col("id_tag") === "__UNKNOWN__", col("last_seen_ts"))),
          to_timestamp(lit("1900-01-01"))).as("last_seen_ts"))
      .select(
        lit("UNKNOWN").as("id_tag"), col("first_seen_ts"), col("last_seen_ts"),
        lit(null).cast("string").as("first_authorization_status"),
        lit(null).cast("string").as("latest_authorization_status"),
        lit(false).as("is_known_driver"))
    known.unionByName(unknown)
  }

  test("dim_drivers assembles known rows and maps the sentinel to UNKNOWN (marts yml:6)") {
    val aggs = Seq(
      ("TAG-001", "2025-10-02 10:00:00", "2025-10-02 12:00:00", Some("Invalid"), Some("Blocked")),
      ("__UNKNOWN__", "2025-10-02 08:00:00", "2025-10-02 09:00:00", None, None))
      .toDF("id_tag", "f_s", "l_s", "first_authorization_status", "latest_authorization_status")
      .withColumn("first_seen_ts", to_timestamp(col("f_s")))
      .withColumn("last_seen_ts", to_timestamp(col("l_s")))
      .drop("f_s", "l_s")
    val got = dimDrivers(aggs)
      .select(col("id_tag"), col("is_known_driver"),
        col("first_authorization_status"), col("latest_authorization_status"),
        col("first_seen_ts").cast("string"), col("last_seen_ts").cast("string"))
      .as[(String, Boolean, Option[String], Option[String], String, String)]
      .collect().toSet
    assert(got == Set(
      ("TAG-001", true, Some("Invalid"), Some("Blocked"),
        "2025-10-02 10:00:00", "2025-10-02 12:00:00"),
      ("UNKNOWN", false, None, None,
        "2025-10-02 08:00:00", "2025-10-02 09:00:00")))
  }

  test("dim_drivers UNKNOWN row falls back to 1900-01-01 without a sentinel (marts yml:20)") {
    val aggs = Seq(
      ("TAG-001", "2025-10-02 10:00:00", "2025-10-02 12:00:00", Some("Accepted"), Some("Accepted")))
      .toDF("id_tag", "f_s", "l_s", "first_authorization_status", "latest_authorization_status")
      .withColumn("first_seen_ts", to_timestamp(col("f_s")))
      .withColumn("last_seen_ts", to_timestamp(col("l_s")))
      .drop("f_s", "l_s")
    val got = dimDrivers(aggs)
      .select(col("id_tag"), col("is_known_driver"),
        col("first_seen_ts").cast("string"), col("last_seen_ts").cast("string"))
      .as[(String, Boolean, String, String)].collect().toSet
    assert(got == Set(
      ("TAG-001", true, "2025-10-02 10:00:00", "2025-10-02 12:00:00"),
      ("UNKNOWN", false, "1900-01-01 00:00:00", "1900-01-01 00:00:00")))
  }

  test("buffered preparing row gains next_status from new status changes (int yml:342)") {
    // int_connector_preparing incremental: the buffered row (next_status
    // null) is superseded by the new run's version of the SAME span
    // (unique_id) now carrying the transition — latest-wins coalesce merge
    val buffer = Seq(("CH-001", "1", "UID-001", "Preparing", None: Option[String]))
      .toDF("charger_id", "connector_id", "unique_id", "status", "next_status")
    val fresh = Seq(("CH-001", "1", "UID-001", "Preparing", Some("Charging")))
      .toDF("charger_id", "connector_id", "unique_id", "status", "n_next_status")
    val merged = buffer.join(fresh.withColumnRenamed("status", "n_status"),
        Seq("charger_id", "connector_id", "unique_id"), "full_outer")
      .select(
        col("charger_id"), col("connector_id"), col("unique_id"),
        coalesce(col("n_status"), col("status")).as("status"),
        coalesce(col("n_next_status"), col("next_status")).as("next_status"))
      .as[(String, String, String, String, Option[String])].collect().toSeq
    assert(merged == Seq(("CH-001", "1", "UID-001", "Preparing", Some("Charging"))))
  }

  private def mergeDrivers(existing: DataFrame, updates: DataFrame): DataFrame =
    Incremental.mergeFirstLast(
      existing, updates, "id_tag", "ts", "status",
      firstTsCol = "first_seen_ts", lastTsCol = "last_seen_ts",
      firstValCol = "first_authorization_status", lastValCol = "latest_authorization_status")

  test("driver aggregates: late-arriving event overwrites first_seen (yml:7)") {
    val existing = Seq(("TAG-001", "2025-10-02 11:00:00", "2025-10-02 12:00:00",
        Some("Accepted"), Some("Blocked")))
      .toDF("id_tag", "f_s", "l_s", "first_authorization_status", "latest_authorization_status")
      .withColumn("first_seen_ts", to_timestamp(col("f_s")))
      .withColumn("last_seen_ts", to_timestamp(col("l_s")))
    val updates = Seq(("TAG-001", "2025-10-02 09:00:00", Some("Invalid")))
      .toDF("id_tag", "ts_s", "status")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = mergeDrivers(existing, updates)
      .select("id_tag", "first_seen_ts", "last_seen_ts",
        "first_authorization_status", "latest_authorization_status")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, Option[String], Option[String])]
      .collect().toSeq
    assert(got == Seq(("TAG-001", sqlTs("2025-10-02 09:00:00"), sqlTs("2025-10-02 12:00:00"),
      Some("Invalid"), Some("Blocked"))))
  }

  test("driver aggregates: new latest event overwrites last_seen (yml:28)") {
    val existing = Seq(("TAG-001", "2025-10-02 11:00:00", "2025-10-02 12:00:00",
        Some("Accepted"), Some("Accepted")))
      .toDF("id_tag", "f_s", "l_s", "first_authorization_status", "latest_authorization_status")
      .withColumn("first_seen_ts", to_timestamp(col("f_s")))
      .withColumn("last_seen_ts", to_timestamp(col("l_s")))
    val updates = Seq(("TAG-001", "2025-10-02 14:00:00", Some("Blocked")))
      .toDF("id_tag", "ts_s", "status")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = mergeDrivers(existing, updates)
      .select("id_tag", "first_seen_ts", "last_seen_ts",
        "first_authorization_status", "latest_authorization_status")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, Option[String], Option[String])]
      .collect().toSeq
    assert(got == Seq(("TAG-001", sqlTs("2025-10-02 11:00:00"), sqlTs("2025-10-02 14:00:00"),
      Some("Accepted"), Some("Blocked"))))
  }

  test("driver aggregates: null tags accumulate under the __UNKNOWN__ sentinel (yml:49)") {
    val existing = Seq(("__UNKNOWN__", "2025-10-02 08:00:00", "2025-10-02 09:00:00",
        None: Option[String], None: Option[String]))
      .toDF("id_tag", "f_s", "l_s", "first_authorization_status", "latest_authorization_status")
      .withColumn("first_seen_ts", to_timestamp(col("f_s")))
      .withColumn("last_seen_ts", to_timestamp(col("l_s")))
    val updates = Seq((None: Option[String], "2025-10-02 07:00:00", None: Option[String]))
      .toDF("id_tag", "ts_s", "status")
      .withColumn("id_tag", coalesce(col("id_tag"), lit("__UNKNOWN__")))
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = mergeDrivers(existing, updates)
      .select("id_tag", "first_seen_ts", "last_seen_ts",
        "first_authorization_status", "latest_authorization_status")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, Option[String], Option[String])]
      .collect().toSeq
    assert(got == Seq(("__UNKNOWN__", sqlTs("2025-10-02 07:00:00"), sqlTs("2025-10-02 09:00:00"),
      None, None)))
  }
}
