package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
    .toDF("k", "name", "bal")

  test("latest op per key wins: delete, update, insert, untouched") {
    val log = Seq(
      (1L, 1L, "U", "a2", 11L),   // then deleted at seq 5
      (1L, 5L, "D", "xx", 0L),
      (2L, 3L, "D", "xx", 0L),    // deleted, then re-inserted at seq 7
      (2L, 7L, "I", "b2", 22L),
      (5L, 2L, "I", "e", 50L),    // brand-new key
      (6L, 4L, "I", "f", 60L),    // new key, deleted again
      (6L, 6L, "D", "xx", 0L))
      .toDF("k", "seq", "op", "name", "bal")
    val out = Cdc.applyLog(snap, log, Seq("k"), "seq", "op")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (2L, "b2", 22L),   // re-inserted payload
      (3L, "c", 30L),    // untouched snapshot row
      (4L, "d", 40L),    // untouched snapshot row
      (5L, "e", 50L)))   // new key inserted
  }

  test("a delete for an unknown key is a no-op; replay is idempotent") {
    val log = Seq((9L, 1L, "D", "x", 0L), (2L, 2L, "U", "b9", 99L))
      .toDF("k", "seq", "op", "name", "bal")
    val once = Cdc.applyLog(snap, log, Seq("k"), "seq", "op")
    val twice = Cdc.applyLog(once, log, Seq("k"), "seq", "op")
    assert(once.collect().map(_.toString).sorted.toSeq ==
      twice.collect().map(_.toString).sorted.toSeq)
    assert(once.count() == 4) // 9 never existed; 2 updated in place
  }

  test("log reduces via map-side aggregation, not a window sort") {
    val log = Seq((1L, 1L, "U", "a2", 11L)).toDF("k", "seq", "op", "name", "bal")
    val plan = Cdc.applyLog(snap, log, Seq("k"), "seq", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window over the raw log:\n$plan")
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"),
      s"expected a combinable aggregate:\n$plan")
  }
}
