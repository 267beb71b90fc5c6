package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IndexSpec extends SparkSpec {
  import spark.implicits._

  test("invertedIndex: exact df, capped ordered postings, truncation flag") {
    // "hot" in docs 1..6, "rare" in doc 2 only, "dup dup" counts once
    val ds = Seq(
      (1L, "hot alpha"), (2L, "hot rare"), (3L, "hot beta"),
      (4L, "hot"), (5L, "hot"), (6L, "hot dup dup")).toDF("doc_id", "text")
    val out = Index.invertedIndex(ds, "doc_id", "text", maxPostings = 3)
      .select($"token", $"df_cnt", $"postings_csv", $"truncated")
      .as[(String, Long, String, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(out("hot") == ((6L, "1,2,3", 1L)))   // df exact despite the cap
    assert(out("rare") == ((1L, "2", 0L)))
    assert(out("dup") == ((1L, "6", 0L)))       // within-doc dup counts once
  }

  test("invertedIndex is deterministic under repartitioning") {
    val ds = (1L to 200L).map(i => (i, s"common w$i")).toDF("doc_id", "text")
    val a = Index.invertedIndex(ds, "doc_id", "text", 10)
      .orderBy($"token").collect().toSeq
    val b = Index.invertedIndex(ds.repartition(7), "doc_id", "text", 10)
      .orderBy($"token").collect().toSeq
    assert(a == b)
    val common = a.find(_.getString(0) == "common").get
    assert(common.getString(2) == (1L to 10L).mkString(","))
  }

  test("plan: bounded heaps for postings, no extra exchange before collect") {
    val ds = (1L to 50L).map(i => (i, s"common w$i")).toDF("doc_id", "text")
    val out = Index.invertedIndex(ds, "doc_id", "text", 5)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("TopKPerKey"), s"expected bounded-heap cap in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window rank in:\n$plan")
    // the collect_list aggregation must reuse TopKPerKey's partitioning:
    // no Exchange between TopKPerKeyExec and the postings aggregate
    val afterTopK = plan.split("TopKPerKey")(0) // physical plan prints top-down
    val aggThenTopK = "ObjectHashAggregate(?s).*TopKPerKey".r
    assert(aggThenTopK.findFirstIn(plan).isDefined)
    val between = plan.substring(
      plan.lastIndexOf("ObjectHashAggregate", plan.indexOf("TopKPerKey")))
    assert(!between.split("TopKPerKey")(0).contains("Exchange"),
      s"postings aggregate should reuse TopKPerKey's partitioning:\n$plan")
  }
}
