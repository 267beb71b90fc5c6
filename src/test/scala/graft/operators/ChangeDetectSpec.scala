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

  test("scd2 builds contiguous validity versions with one open current row per key") {
    val out = ChangeDetect.scd2(statuses, Seq("key"), Seq("ts"), "status")
      .select("key", "status", "version", "is_current")
      .as[(Long, String, Long, Boolean)]
      .collect().sortBy(r => (r._1, r._3))
    assert(out.toSeq == Seq(
      (1L, "Available", 1L, false),
      (1L, "Charging", 2L, false),
      (1L, "Faulted", 3L, true),
      (2L, "Faulted", 1L, true)))
    // valid_to of version v == valid_from of version v+1 (contiguous, no gap)
    val spans = ChangeDetect.scd2(statuses, Seq("key"), Seq("ts"), "status")
      .filter(col("key") === 1L).orderBy("version")
      .select("valid_from", "valid_to")
      .as[(java.sql.Timestamp, Option[java.sql.Timestamp])].collect()
    spans.sliding(2).foreach {
      case Array((_, Some(to)), (from2, _)) => assert(to == from2)
      case _ =>
    }
    assert(spans.last._2.isEmpty)
  }

  test("latestByKey returns argmax row values per key") {
    val out = ChangeDetect.latestByKey(statuses, Seq("key"), Seq("ts"), Seq("status"))
      .select("key", "latest_status").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "Faulted"), (2L, "Faulted")))
  }
}
