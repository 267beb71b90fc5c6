package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Charge-attempt assembly rules from the reference's fact_charge_attempts
  * (models/marts/fact_charge_attempts.sql). The structural half — the
  * full-outer key+time-window merge of the two event-derived streams — is
  * the generic full-outer coalesce pattern (`q_fullouter_merge`) plus a
  * bounded-window join predicate; this object carries the declarative
  * business rules layered on top.
  */
object Attempts {

  /** fact_charge_attempts.sql:10 — `VALID_STOP_REASONS`. */
  val DefaultValidStopReasons: Seq[String] = Seq("Local", "Remote", "EVDisconnected")

  /** The success rule (fact_charge_attempts.sql:273-281): an attempt
    * succeeded iff a transaction exists, the connector did not fault right
    * after, the stop reason is a normal one, and real energy was delivered
    * (strictly above `energyThresholdKwh`, reference var
    * success_energy_threshold_kwh = 0.1).
    */
  def isSuccessful(
      transactionId: Column,
      nextStatus: Column,
      stopReason: Column,
      energyKwh: Column,
      energyThresholdKwh: Double = 0.1,
      validStopReasons: Seq[String] = DefaultValidStopReasons): Column =
    transactionId.isNotNull &&
      (nextStatus.isNull || nextStatus =!= "Faulted") &&
      stopReason.isin(validStopReasons: _*) &&
      energyKwh.isNotNull && energyKwh > energyThresholdKwh

  /** The bounded authorize window for matching a transaction to a preparing
    * span (fact_charge_attempts.sql:130-140): the transaction must be
    * ingested within `windowSeconds` of the preparing span's neighbors
    * (falling back to the span's own ingestion time when a neighbor is
    * missing). Keep this as a post-filter on an equi-key join — never the
    * join condition alone.
    */
  def withinAuthorizeWindow(
      txIngested: Column,
      prevIngested: Column,
      preparingIngested: Column,
      nextIngested: Column,
      windowSeconds: Long = 300L): Column = {
    val lo = coalesce(prevIngested, preparingIngested) - expr(s"interval $windowSeconds seconds")
    val hi = coalesce(nextIngested, preparingIngested) + expr(s"interval $windowSeconds seconds")
    txIngested > lo && txIngested <= hi
  }
}
