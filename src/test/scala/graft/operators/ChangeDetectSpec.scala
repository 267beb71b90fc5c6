package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangeDetectSpec extends SparkSpec {
  import spark.implicits._

  private def statuses = Seq(
    (1L, 1L, "Available"), (1L, 2L, "Available"), (1L, 3L, "Charging"),
    (1L, 4L, "Charging"), (1L, 5L, "Faulted"),
    (2L, 1L, "Faulted")
  ).toDF("key", "seq", "status")
    .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")) + expr("make_interval(0, 0, 0, 0, 0, seq, 0)"))
    .drop("seq")

  test("changes collapses duplicate runs and attaches prev/next over the collapsed stream") {
    val out = ChangeDetect.changes(statuses, Seq("key"), Seq("ts"), "status")
      .select("key", "status", "previous_status", "next_status")
      .as[(Long, String, Option[String], Option[String])]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, "Available", None, Some("Charging")),
      (1L, "Charging", Some("Available"), Some("Faulted")),
      (1L, "Faulted", Some("Charging"), None),
      (2L, "Faulted", None, None)))
  }

  test("latestByKey returns argmax row values per key") {
    val out = ChangeDetect.latestByKey(statuses, Seq("key"), Seq("ts"), Seq("status"))
      .select("key", "latest_status").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "Faulted"), (2L, "Faulted")))
  }
}
