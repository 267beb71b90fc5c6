package graft.parity

import graft.SparkSpec
import graft.operators.Attempts
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replicates the reference's fact_charge_attempts success-rule unit tests
  * (models/marts/unit_tests.yml:993-1265): full-outer merge of preparing
  * spans and transactions on (charger, connector, transaction_id) within the
  * authorize window, then the is_successful predicate.
  */
class ParityAttemptsSpec extends SparkSpec {
  import spark.implicits._

  private case class P(
      charger: String, connector: String, ingested: String,
      prevIngested: Option[String], nextIngested: Option[String],
      nextStatus: Option[String], txId: Option[String])
  private case class T(
      txId: String, charger: String, connector: String, ingested: String,
      stopReason: String, energyKwh: Double)

  private def merge(preparing: Seq[P], transactions: Seq[T]): DataFrame = {
    val p = preparing
      .map(x => (x.charger, x.connector, x.ingested, x.prevIngested, x.nextIngested, x.nextStatus, x.txId))
      .toDF("charger_id", "connector_id", "p_ing_s", "p_prev_s", "p_next_s", "next_status", "p_tx")
      .withColumn("p_ingested", to_timestamp(col("p_ing_s")))
      .withColumn("p_prev_ingested", to_timestamp(col("p_prev_s")))
      .withColumn("p_next_ingested", to_timestamp(col("p_next_s")))
      .select("charger_id", "connector_id", "p_ingested", "p_prev_ingested",
        "p_next_ingested", "next_status", "p_tx")
    val t = transactions
      .map(x => (x.txId, x.charger, x.connector, x.ingested, x.stopReason, x.energyKwh))
      .toDF("t_tx", "t_charger", "t_connector", "t_ing_s", "stop_reason", "energy_kwh")
      .withColumn("t_ingested", to_timestamp(col("t_ing_s")))
      .select("t_tx", "t_charger", "t_connector", "t_ingested", "stop_reason", "energy_kwh")
    val cond = col("charger_id") === col("t_charger") &&
      col("connector_id") === col("t_connector") &&
      col("p_tx") === col("t_tx") &&
      Attempts.withinAuthorizeWindow(
        col("t_ingested"), col("p_prev_ingested"), col("p_ingested"),
        col("p_next_ingested"), windowSeconds = 300L)
    p.join(t, cond, "full_outer")
      .withColumn("transaction_id", coalesce(col("p_tx"), col("t_tx")))
      .withColumn("is_successful", Attempts.isSuccessful(
        // the joined transaction row, not the preparing hint, proves a transaction
        col("t_tx"), col("next_status"), col("stop_reason"), col("energy_kwh")))
  }

  test("successful when transaction + valid stop reason + energy above threshold (yml:993)") {
    val got = merge(
      Seq(P("CH-001", "1", "2025-10-01 10:00:00", None, Some("2025-10-01 10:30:00"),
        None, Some("TXN-001"))),
      Seq(T("TXN-001", "CH-001", "1", "2025-10-01 10:29:00", "EVDisconnected", 5.0)))
    assert(got.select("is_successful").as[Boolean].collect().toSeq == Seq(true))
  }

  test("not successful when energy at or below 0.1 kWh (yml:1051)") {
    val got = merge(
      Seq(P("CH-001", "1", "2025-10-01 10:00:00", None, Some("2025-10-01 10:05:00"),
        None, Some("TXN-001"))),
      Seq(T("TXN-001", "CH-001", "1", "2025-10-01 10:04:00", "EVDisconnected", 0.05)))
    assert(got.select("is_successful").as[Boolean].collect().toSeq == Seq(false))
  }

  test("not successful when no transaction matched (yml:1109)") {
    val got = merge(
      Seq(P("CH-001", "1", "2025-10-01 10:00:00", None, None, None, None)),
      Seq.empty)
    assert(got.select("is_successful").as[Boolean].collect().toSeq == Seq(false))
  }

  test("not successful when the connector faulted right after (yml:1150)") {
    val got = merge(
      Seq(P("CH-001", "1", "2025-10-01 10:00:00", None, Some("2025-10-01 10:30:00"),
        Some("Faulted"), Some("TXN-001"))),
      Seq(T("TXN-001", "CH-001", "1", "2025-10-01 10:29:00", "EVDisconnected", 5.0)))
    assert(got.select("is_successful").as[Boolean].collect().toSeq == Seq(false))
  }

  test("not successful on an abnormal stop reason (yml:1208)") {
    val got = merge(
      Seq(P("CH-001", "1", "2025-10-01 10:00:00", None, Some("2025-10-01 10:30:00"),
        None, Some("TXN-001"))),
      Seq(T("TXN-001", "CH-001", "1", "2025-10-01 10:29:00", "HardReset", 5.0)))
    assert(got.select("is_successful").as[Boolean].collect().toSeq == Seq(false))
  }

  test("a transaction outside the authorize window does not match (fact_charge_attempts.sql:130)") {
    val got = merge(
      Seq(P("CH-001", "1", "2025-10-01 10:00:00", None, None, None, Some("TXN-001"))),
      Seq(T("TXN-001", "CH-001", "1", "2025-10-01 10:06:00", "EVDisconnected", 5.0)))
    // full-outer: both halves survive as separate rows — the preparing span
    // has no transaction (not successful); the orphan transaction still
    // satisfies the reference's rule on its own (no fault, valid stop,
    // energy above threshold)
    val rows = got.select(col("p_ingested").isNotNull, col("is_successful"))
      .as[(Boolean, Boolean)].collect().toSet
    assert(rows == Set((true, false), (false, true)))
  }
}
