package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff labels added/removed/changed/unchanged correctly") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val neu = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "text")
    val out = Diff.snapshotDiff(old, neu, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff of a corpus against itself is all unchanged") {
    val docs = (1L to 200L).map(i => (i, s"text $i")).toDF("id", "text")
    val statuses = Diff.snapshotDiff(docs, docs.repartition(5), "id", "text")
      .select($"status").distinct().as[String].collect().toSeq
    assert(statuses == Seq("unchanged"))
  }

  test("the diff join ships fingerprints, not text") {
    val docs = (1L to 50L).map(i => (i, s"text $i")).toDF("id", "text")
    val out = Diff.snapshotDiff(docs, docs, "id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the join's exchanges carry only id + the 8-byte hash: the text column
    // must not appear in any Exchange's output schema
    val exchangeLines = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchangeLines.nonEmpty, s"expected a shuffle join in:\n$plan")
    assert(!exchangeLines.exists(_.contains("text#")),
      s"text must be reduced to a fingerprint before the shuffle:\n$plan")
  }
}
