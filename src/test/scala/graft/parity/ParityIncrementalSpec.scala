package graft.parity

import graft.SparkSpec
import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replicates the reference's INCREMENTAL unit tests — the dbt
  * `is_incremental` branches that merge previously-materialized state with
  * a new batch (models/marts/unit_tests.yml:769-990, 1266;
  * models/intermediate/unit_tests.yml:127, 309). graft's batch equivalent
  * is replay-and-recompute: stored rows re-enter the operator as pseudo
  * input (a buffered visit becomes one weighted pseudo-attempt, a buffered
  * outage merges with newly-detected gaps, a buffered last-status row seeds
  * change detection), which the reference achieves with buffer re-reads +
  * merge writes. The streaming counterparts keep this state in the state
  * store (`graft.streaming`).
  */
class ParityIncrementalSpec extends SparkSpec {
  import spark.implicits._

  /** (attempt_id, charger, port, start, stop, tag, energy, weight) —
    * buffered visits ride along as weight=count pseudo-attempts.
    */
  private def attempts(rows: (String, String, String, String, String, Option[String], Double, Long)*): DataFrame =
    rows.toDF("attempt_id", "charger_id", "port_id", "start_s", "stop_s", "id_tag", "energy", "weight")
      .withColumn("start_ts", to_timestamp(col("start_s")))
      .withColumn("stop_ts", to_timestamp(col("stop_s")))
      .withColumn("location_id", lit("LOC-001"))

  private def runVisits(df: DataFrame): DataFrame =
    Visits.visits(df, "location_id", Seq("charger_id", "port_id"),
      "start_ts", "stop_ts", "id_tag",
      authGapSeconds = 1800L, anonGapSeconds = 120L, chainGapSeconds = 120L,
      tieBreakCols = Seq("attempt_id"),
      extraAggs = Seq(
        sum(col("weight")).as("n_attempts"),
        sum(col("energy")).as("total_energy"),
        min_by(col("attempt_id"), struct(col("start_ts"), col("attempt_id"))).as("first_attempt_id"),
        max_by(col("attempt_id"), struct(col("start_ts"), col("attempt_id"))).as("last_attempt_id"),
        min_by(col("charger_id"), struct(col("start_ts"), col("attempt_id"))).as("first_charger_id"),
        max_by(col("charger_id"), struct(col("start_ts"), col("attempt_id"))).as("last_charger_id")))

  test("authorized visit from a previous batch merges with its continuation (yml:769)") {
    // buffer VISIT-001 replayed as a weighted pseudo-attempt
    val v = runVisits(attempts(
      ("CHA1", "CH-001", "1", "2025-10-02 10:00:00", "2025-10-02 10:10:00", Some("TAG-001"), 5.5, 1L),
      ("CHA2", "CH-002", "1", "2025-10-02 10:15:00", "2025-10-02 10:20:00", Some("TAG-001"), 6.2, 1L)))
    val r = v.select(
        col("id_tag"), col("n_attempts"), col("total_energy"),
        col("visit_start_ts").cast("string"), col("visit_end_ts").cast("string"),
        ((unix_micros(col("visit_end_ts")) - unix_micros(col("visit_start_ts"))) / 60000000L)
          .cast("long").as("duration_min"),
        col("first_attempt_id"), col("last_attempt_id"),
        col("first_charger_id"), col("last_charger_id"))
      .as[(String, Long, Double, String, String, Long, String, String, String, String)]
      .collect().toSeq
    assert(r == Seq(("TAG-001", 2L, 11.7, "2025-10-02 10:00:00", "2025-10-02 10:20:00",
      20L, "CHA1", "CHA2", "CH-001", "CH-002")))
  }

  test("unauthorized visit from a previous batch merges within the 2-min window (yml:842)") {
    val v = runVisits(attempts(
      ("CHA1", "CH-001", "1", "2025-10-02 11:00:00", "2025-10-02 11:00:30", None, 3.0, 1L),
      ("CHA2", "CH-001", "1", "2025-10-02 11:01:00", "2025-10-02 11:01:30", None, 2.5, 1L)))
    val r = v.select(col("n_attempts"), col("total_energy"),
        col("visit_start_ts").cast("string"), col("visit_end_ts").cast("string"))
      .as[(Long, Double, String, String)].collect().toSeq
    assert(r == Seq((2L, 5.5, "2025-10-02 11:00:00", "2025-10-02 11:01:30")))
  }

  test("buffered anonymous visit inherits the tag of an authorized continuation (yml:916)") {
    val v = runVisits(attempts(
      ("CHA1", "CH-001", "1", "2025-10-02 12:00:00", "2025-10-02 12:00:30", None, 3.0, 1L),
      ("CHA2", "CH-001", "1", "2025-10-02 12:01:00", "2025-10-02 12:05:00", Some("TAG-001"), 6.2, 1L)))
    val r = v.select(col("id_tag"), col("n_attempts"))
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("TAG-001", 2L)))
  }

  test("stored outage extends across the run boundary (int yml:309)") {
    val stored = Seq(("CH-001", "2025-10-01 09:00:00", "2025-10-01 10:00:00"))
      .toDF("charger_id", "f", "t")
      .select(col("charger_id"), to_timestamp(col("f")).as("from_ts"), to_timestamp(col("t")).as("to_ts"))
    // new batch: one heartbeat at 10:30; monitoring window starts at the
    // previous run boundary (10:00)
    val events = Seq(("CH-001", "2025-10-01 10:30:00")).toDF("charger_id", "ts_s")
      .withColumn("ingested_ts", to_timestamp(col("ts_s")))
      .withColumn("monitor_start", to_timestamp(lit("2025-10-01 10:00:00")))
      .withColumn("monitor_end", to_timestamp(lit("2025-10-01 10:30:00")))
    val newGaps = Intervals.heartbeatGaps(events, Seq("charger_id"), "ingested_ts",
        "monitor_start", "monitor_end", thresholdSeconds = 300L)
      .select("charger_id", "from_ts", "to_ts")
    val merged = Intervals.mergeIntervals(
        stored.unionAll(newGaps), Seq("charger_id"), "from_ts", "to_ts")
      .select(col("charger_id"), col("from_ts").cast("string"), col("to_ts").cast("string"))
      .as[(String, String, String)].collect().toSeq
    assert(merged == Seq(("CH-001", "2025-10-01 09:00:00", "2025-10-01 10:30:00")))
  }

  test("buffered last-status row seeds previous_status across the boundary (int yml:127)") {
    val buffer = Seq(("CH-001", "1", "2025-10-01 09:45:00", "UID-000", "Available"))
    val newBatch = Seq(("CH-001", "1", "2025-10-01 10:05:00", "UID-001", "Preparing"))
    val all = (buffer ++ newBatch)
      .toDF("charger_id", "connector_id", "ts_s", "unique_id", "status")
      .withColumn("ingested_ts", to_timestamp(col("ts_s")))
    val got = ChangeDetect.changes(all, Seq("charger_id", "connector_id"),
        Seq("ingested_ts", "unique_id"), "status")
      .orderBy("ingested_ts")
      .select("status", "previous_status", "next_status")
      .as[(String, Option[String], Option[String])].collect().toSeq
    assert(got == Seq(
      ("Available", None, Some("Preparing")),
      ("Preparing", Some("Available"), None)))
  }

  test("buffered attempt gains stop data from a new transaction (yml:1266)") {
    val buffer = Seq(("CH-001", "1", "TXN-001", "2025-10-01 10:00:00",
        None: Option[String], None: Option[Double], false))
      .toDF("charger_id", "connector_id", "transaction_id", "start_s", "stop_reason", "energy_kwh", "is_successful")
      .withColumn("charge_attempt_start_ts", to_timestamp(col("start_s")))
    val newTx = Seq(("CH-001", "1", "TXN-001", "2025-10-01 10:29:00", "Local", 5.0))
      .toDF("n_charger", "n_connector", "n_tx", "stop_s", "n_stop_reason", "n_energy")
      .withColumn("transaction_stop_ts", to_timestamp(col("stop_s")))
    val merged = buffer.join(newTx,
        col("charger_id") === col("n_charger") &&
          col("connector_id") === col("n_connector") &&
          col("transaction_id") === col("n_tx"), "left")
      .select(
        col("charger_id"), col("connector_id"), col("transaction_id"),
        coalesce(col("n_stop_reason"), col("stop_reason")).as("stop_reason"),
        coalesce(col("n_energy"), col("energy_kwh")).as("energy_kwh"),
        col("transaction_stop_ts"))
      .withColumn("is_successful", Attempts.isSuccessful(
        col("transaction_id"), lit(null).cast("string"), col("stop_reason"), col("energy_kwh")))
    val r = merged.select("is_successful", "stop_reason", "energy_kwh")
      .as[(Boolean, String, Double)].collect().toSeq
    assert(r == Seq((true, "Local", 5.0)))
  }
}
