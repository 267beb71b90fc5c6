package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark spark spark common"),
    (2L, "duck duck common"),
    (3L, "flink common")).toDF("doc_id", "text")

  test("topTerms ranks rare repeated terms above ubiquitous ones") {
    val out = TfIdf.topTerms(corpus, "doc_id", "text", k = 2)
      .select($"doc_id", $"token", $"tf", $"df_cnt", $"score")
      .as[(Long, String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(t => (-t._5, t._2)).toList).toMap
    // doc 1: spark tf=3 df=1 → 3 * 4/2 = 6.0; common tf=1 df=3 → 4/4 = 1.0
    assert(out(1L).map(t => (t._2, t._3, t._4, t._5)) ==
      List(("spark", 3L, 1L, 6.0), ("common", 1L, 3L, 1.0)))
    // doc 2: duck 2 * 4/2 = 4.0 beats common 1.0
    assert(out(2L).head._2 == "duck" && out(2L).head._5 == 4.0)
    // doc 3: flink 1 * 4/2 = 2.0 beats common
    assert(out(3L).map(_._2) == List("flink", "common"))
  }

  test("k caps the per-doc output and ties break on the token") {
    // doc with 3 singleton terms, all same score — top-2 is alphabetical
    val ds = Seq((1L, "zeta alpha mid")).toDF("doc_id", "text")
    val out = TfIdf.topTerms(ds, "doc_id", "text", k = 2)
      .select($"token").as[String].collect().sorted.toSeq
    assert(out == Seq("alpha", "mid"))
  }

  test("plan: partial aggregation before every exchange, TopKPerKey heaps") {
    val out = TfIdf.topTerms(corpus, "doc_id", "text", k = 2)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKeyExec in:\n$plan")
    // no window/sort formulation anywhere — ranking is the bounded heap
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"),
      s"unexpected sort-based operator in:\n$plan")
    // the df-count path must partial-aggregate before its token exchange
    // (a stopword term collapses map-side, never fanning into one task)
    assert("partial_count".r.findAllIn(plan).size >= 2,
      s"expected map-side partial counts on tf and df paths:\n$plan")
  }
}
