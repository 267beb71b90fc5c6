package graft.parity

import graft.SparkSpec
import graft.operators.Visits
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replicates the reference's own fact_visits unit tests
  * (models/marts/unit_tests.yml:35-766, non-incremental cases) against
  * [[Visits]]. Fixture dims come from tests/fixtures/dim_chargers_fixture.sql
  * and dim_connectors_fixture.sql: CH-001/CH-002 at LOC-001, CH-003 at
  * LOC-002; connectors 1,2 on port 1 and 3,4 on port 2 of every charger.
  */
class ParityVisitsSpec extends SparkSpec {
  import spark.implicits._
  import ParityVisitsSpec.Attempt

  /** charge_attempts_with_location (fact_visits.sql:26): attempts joined to
    * the connector→port and charger→location dims.
    */
  private def withLocation(rows: Seq[Attempt]): DataFrame = {
    val dims = Seq(
      ("CH-001", "LOC-001"), ("CH-002", "LOC-001"), ("CH-003", "LOC-002"))
      .toDF("charger_id", "location_id")
    val connectors = Seq("1" -> "1", "2" -> "1", "3" -> "2", "4" -> "2")
      .toDF("connector_id", "port_id")
    rows.toDF()
      .withColumnRenamed("ok", "is_successful")
      .withColumn("start_ts", to_timestamp(col("start_s")))
      .withColumn("stop_ts", to_timestamp(col("stop_s")))
      .join(broadcast(connectors), Seq("connector_id"))
      .join(broadcast(dims), Seq("charger_id"))
  }

  private def runVisits(rows: Attempt*): DataFrame =
    Visits.visits(
      withLocation(rows), "location_id", Seq("charger_id", "port_id"),
      "start_ts", "stop_ts", "id_tag",
      authGapSeconds = 1800L, anonGapSeconds = 120L, chainGapSeconds = 120L,
      tieBreakCols = Seq("attempt_id"),
      extraAggs = Seq(
        sum(col("energy")).as("total_energy"),
        max_by(col("is_successful"), struct(col("start_ts"), col("attempt_id")))
          .as("is_successful"),
        min_by(col("attempt_id"), struct(col("start_ts"), col("attempt_id")))
          .as("first_attempt_id"),
        max_by(col("attempt_id"), struct(col("start_ts"), col("attempt_id")))
          .as("last_attempt_id")))

  /** (location, tag, n_attempts) per visit, as a multiset. */
  private def shape(v: DataFrame): Seq[(String, String, Long)] =
    v.select(col("location_id"), coalesce(col("id_tag"), lit("∅")), col("charge_attempt_count"))
      .as[(String, String, Long)].collect().toSeq.sorted

  test("authorized attempts 15 min apart, same location → one visit (yml:35)") {
    val v = runVisits(
      Attempt("A1", "CH-001", "1", "2025-10-02 10:00:00", "2025-10-02 10:10:00", Some("TAG-001"), 5.5, ok = true),
      Attempt("A2", "CH-002", "1", "2025-10-02 10:25:00", "2025-10-02 10:35:00", Some("TAG-001"), 6.2, ok = true))
    assert(shape(v) == Seq(("LOC-001", "TAG-001", 2L)))
    val row = v.select("total_energy", "first_attempt_id", "last_attempt_id")
      .as[(Double, String, String)].head()
    assert(math.abs(row._1 - 11.7) < 1e-9 && row._2 == "A1" && row._3 == "A2")
  }

  test("authorized attempts 15 min apart, different locations → two visits (yml:110)") {
    val v = runVisits(
      Attempt("A1", "CH-001", "1", "2025-10-02 10:00:00", "2025-10-02 10:10:00", Some("TAG-001"), 5.5, ok = true),
      Attempt("A2", "CH-003", "1", "2025-10-02 10:25:00", "2025-10-02 10:35:00", Some("TAG-001"), 6.2, ok = true))
    assert(shape(v) == Seq(("LOC-001", "TAG-001", 1L), ("LOC-002", "TAG-001", 1L)))
  }

  test("authorized attempts 35 min apart, same location → two visits (yml:186)") {
    val v = runVisits(
      Attempt("A1", "CH-001", "1", "2025-10-02 10:00:00", "2025-10-02 10:05:00", Some("TAG-001"), 5.5, ok = true),
      Attempt("A2", "CH-001", "1", "2025-10-02 10:40:00", "2025-10-02 10:41:00", Some("TAG-001"), 6.2, ok = true))
    assert(shape(v) == Seq(("LOC-001", "TAG-001", 1L), ("LOC-001", "TAG-001", 1L)))
  }

  test("unauthorized attempts 15 min apart, same port → two visits (yml:262)") {
    val v = runVisits(
      Attempt("A1", "CH-001", "1", "2025-10-02 11:00:00", "2025-10-02 11:10:00", None, 3.0, ok = false),
      Attempt("A2", "CH-001", "2", "2025-10-02 11:25:00", "2025-10-02 11:35:00", None, 2.5, ok = false))
    assert(shape(v) == Seq(("LOC-001", "∅", 1L), ("LOC-001", "∅", 1L)))
  }

  test("unauthorized attempts 1 min apart, same port → one visit (yml:338)") {
    val v = runVisits(
      Attempt("A1", "CH-001", "1", "2025-10-02 11:00:00", "2025-10-02 11:00:30", None, 3.0, ok = false),
      Attempt("A2", "CH-001", "2", "2025-10-02 11:01:30", "2025-10-02 11:01:35", None, 2.5, ok = false))
    assert(shape(v) == Seq(("LOC-001", "∅", 2L)))
  }

  test("unauthorized attempts 1 min apart, different ports → two visits (yml:411)") {
    val v = runVisits(
      Attempt("A1", "CH-001", "1", "2025-10-02 12:00:00", "2025-10-02 12:00:30", None, 3.0, ok = false),
      Attempt("A2", "CH-001", "3", "2025-10-02 12:01:30", "2025-10-02 12:01:35", None, 2.5, ok = false))
    assert(shape(v) == Seq(("LOC-001", "∅", 1L), ("LOC-001", "∅", 1L)))
  }

  test("anonymous attempt inherits the tag of an authorized one 1 min later (yml:487)") {
    val v = runVisits(
      Attempt("A1", "CH-001", "1", "2025-10-02 11:00:00", "2025-10-02 11:00:30", None, 3.0, ok = false),
      Attempt("A2", "CH-001", "1", "2025-10-02 11:01:30", "2025-10-02 11:01:35", Some("TAG-001"), 2.5, ok = false))
    assert(shape(v) == Seq(("LOC-001", "TAG-001", 2L)))
  }

  test("no tag inference across a 3-minute gap (yml:562)") {
    val v = runVisits(
      Attempt("A1", "CH-001", "1", "2025-10-02 13:00:00", "2025-10-02 13:00:30", None, 3.0, ok = false),
      Attempt("A2", "CH-001", "1", "2025-10-02 13:03:30", "2025-10-02 13:03:35", Some("TAG-001"), 2.5, ok = false))
    assert(shape(v) == Seq(("LOC-001", "TAG-001", 1L), ("LOC-001", "∅", 1L)))
  }

  test("unauth,unauth,auth chain + later auth on another charger → one 4-attempt visit (yml:638)") {
    val v = runVisits(
      Attempt("A1", "CH-001", "1", "2025-10-02 10:58:00", "2025-10-02 10:58:30", None, 3.0, ok = false),
      Attempt("A2", "CH-001", "1", "2025-10-02 11:00:00", "2025-10-02 11:00:30", None, 3.0, ok = false),
      Attempt("A3", "CH-001", "1", "2025-10-02 11:01:00", "2025-10-02 11:01:30", Some("TAG-001"), 2.5, ok = false),
      Attempt("A4", "CH-002", "1", "2025-10-02 11:20:00", "2025-10-02 11:20:30", Some("TAG-001"), 2.5, ok = false))
    assert(shape(v) == Seq(("LOC-001", "TAG-001", 4L)))
  }
}

object ParityVisitsSpec {
  case class Attempt(
      attempt_id: String, charger_id: String, connector_id: String,
      start_s: String, stop_s: String, id_tag: Option[String],
      energy: Double, ok: Boolean)
}
