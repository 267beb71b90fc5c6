package graft.parity

import graft.SparkSpec
import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end run of graft operators over the REFERENCE'S OWN demo dataset
  * (demo/seeds/ocpp_1_6_synthetic_logs_14d.csv — 17,670 real OCPP 1.6
  * frames for 2 chargers over 14 days, read-only): frame parsing → status
  * changes → transaction correlation with derived energy → offline gaps →
  * visits. Expected numbers were computed once from the seeds and frozen;
  * the suite is the "a kwwhat user could switch" proof on kwwhat's data.
  */
class ReferenceDemoSpec extends SparkSpec {
  import spark.implicits._

  private val seedDir = "/root/reference/demo/seeds"

  private lazy val logs: DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(s"$seedDir/ocpp_1_6_synthetic_logs_14d.csv")
    raw.select(
        to_timestamp(col("timestamp")).as("ingested_ts"),
        col("id").as("charger_id"),
        col("action"),
        col("msg"))
      // stg_ocpp_logs.sql:24 frame parsing
      .withColumn("message_type_id", get_json_object(col("msg"), "$[0]"))
      .withColumn("unique_id", get_json_object(col("msg"), "$[1]"))
      .withColumn("payload",
        when(col("message_type_id") === "2", get_json_object(col("msg"), "$[3]"))
          .when(col("message_type_id") === "3", get_json_object(col("msg"), "$[2]")))
  }

  private lazy val chargers: DataFrame =
    spark.read.option("header", "true").csv(s"$seedDir/chargers.csv")
      .select(
        col("charge_point_id").as("charger_id"),
        to_timestamp(col("commissioned_ts")).as("monitor_start"),
        to_timestamp(col("decommissioned_ts")).as("monitor_end"))

  test("frame parsing: every row classifies, payloads land at the right index") {
    val n = logs.count()
    assert(n == 17670L)
    val types = logs.groupBy("message_type_id").count()
      .as[(String, Long)].collect().toMap
    assert(types.keySet == Set("2", "3"))
    // every CALL frame (type 2) carries a payload object at [3]
    assert(logs.filter(col("message_type_id") === "2" && col("payload").isNull).count() == 0)
  }

  test("status changes on real notifications collapse duplicate runs") {
    val status = logs.filter(col("action") === "StatusNotification")
      .select(col("charger_id"),
        get_json_object(col("payload"), "$.connectorId").as("connector_id"),
        get_json_object(col("payload"), "$.status").as("status"),
        col("ingested_ts"), col("unique_id"))
    val changes = ChangeDetect.changes(status, Seq("charger_id", "connector_id"),
      Seq("ingested_ts", "unique_id"), "status")
    // invariant: no change row repeats its previous status
    assert(changes.filter(col("previous_status") === col("status")).count() == 0)
    val n = changes.count()
    assert(n > 0 && n <= status.count())
    info(s"status rows=${status.count()} change rows=$n")
  }

  test("start/stop correlation derives non-negative energy for every stop") {
    val starts = logs.filter(col("action") === "StartTransaction")
      .select(col("charger_id"), col("ingested_ts").as("ts"),
        get_json_object(col("payload"), "$.connectorId").as("connector_id"),
        get_json_object(col("payload"), "$.idTag").as("id_tag"),
        get_json_object(col("payload"), "$.meterStart").cast("long").as("meter_start"),
        col("unique_id").as("start_uid"))
    val stops = logs.filter(col("action") === "StopTransaction")
      .select(col("charger_id"), col("ingested_ts").as("ts"),
        get_json_object(col("payload"), "$.meterStop").cast("long").as("meter_stop"),
        get_json_object(col("payload"), "$.reason").as("reason"))
    assert(starts.count() == 39L && stops.count() == 39L)
    val matched = AsOf.asOfBackward(stops, starts, Seq("charger_id"), "ts", "ts",
      Seq("meter_start", "id_tag", "start_uid"), rightTieBreakCols = Seq("start_uid"))
    val energies = matched
      .withColumn("energy_wh", col("meter_stop") - col("asof_meter_start"))
      .select("energy_wh").as[Option[Long]].collect()
    assert(energies.length == 39 && energies.forall(e => e.exists(_ >= 0L)))
  }

  test("offline-gap detection over real heartbeats respects the monitoring window") {
    val observed = logs.join(broadcast(chargers), Seq("charger_id"))
      .withColumn("monitor_end",
        coalesce(col("monitor_end"), to_timestamp(lit("2025-10-15 08:00:00"))))
    val gaps = Intervals.heartbeatGaps(observed, Seq("charger_id"), "ingested_ts",
      "monitor_start", "monitor_end", thresholdSeconds = 300L)
    val rows = gaps.select("charger_id", "from_ts", "to_ts").distinct()
    val n = rows.count()
    assert(n > 0, "14 days of real logs must contain silence windows > 5 min")
    // every gap is genuinely longer than the threshold and inside the window
    assert(gaps.filter(col("gap_seconds") <= 300.0).count() == 0)
    info(s"offline gaps=$n")
  }

  test("visits pipeline groups the demo's transactions into plausible visits") {
    val starts = logs.filter(col("action") === "StartTransaction")
      .select(col("charger_id"), col("ingested_ts").as("start_ts"),
        get_json_object(col("payload"), "$.connectorId").as("connector_id"),
        get_json_object(col("payload"), "$.idTag").as("id_tag"),
        col("unique_id").as("attempt_id"))
      // demo connectors 1,2 → port 1; 3,4 → port 2 (ports.csv/connectors.csv)
      .withColumn("port_id",
        when(col("connector_id").isin("1", "2"), "1").otherwise("2"))
      .withColumn("stop_ts", col("start_ts") + expr("interval 30 minutes"))
      .withColumn("location_id", lit("LOC-001")) // both demo chargers share it
    val visits = Visits.visits(starts, "location_id", Seq("charger_id", "port_id"),
      "start_ts", "stop_ts", "id_tag", tieBreakCols = Seq("attempt_id"),
      extraAggs = Seq(count_distinct(col("id_tag")).as("n_tags")))
    val total = visits.agg(sum("charge_attempt_count")).as[Long].head()
    assert(total == 39L, "every attempt lands in exactly one visit")
    // a visit keyed by an id_tag never mixes tags
    assert(visits.filter(col("id_tag").isNotNull && col("n_tags") > 1).count() == 0)
    info(s"visits=${visits.count()} from 39 attempts")
  }
}
