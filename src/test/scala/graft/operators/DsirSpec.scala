package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target docs speak "alpha beta", raw-only docs speak "gamma delta"
  private def docs = Seq(
    (1L, "alpha beta alpha beta", "t"),
    (2L, "alpha beta beta alpha", "t"),
    (3L, "gamma delta gamma delta", "r"),
    (4L, "gamma delta delta gamma", "r"),
    (5L, "alpha beta gamma delta", "r"),
    (6L, "alpha alpha alpha alpha", "r")
  ).toDF("doc_id", "text", "cls")

  test("target-exclusive tokens get higher importance ratios than raw-only tokens") {
    val w = Dsir.importanceWeights(docs, "text", col("cls") === "t", 64, 5L)
    val ranked = Dsir.select(docs, "doc_id", "text", w, 5L, 6)
      .select("doc_id", "avg_importance").as[(Long, Double)].collect()
      .sortBy(-_._2).map(_._1)
    // the pure-target-vocabulary docs (1, 2, 6) outrank the pure-raw ones
    assert(ranked.takeWhile(id => Seq(1L, 2L, 6L).contains(id)).length == 3,
      s"target-like docs must lead the ranking, got ${ranked.mkString(",")}")
    assert(ranked.last == 3L || ranked.last == 4L)
  }

  test("weights and selection are invariant under repartitioning") {
    val w1 = Dsir.importanceWeights(docs.repartition(5), "text", col("cls") === "t", 64, 5L)
    val w2 = Dsir.importanceWeights(docs.coalesce(1), "text", col("cls") === "t", 64, 5L)
    assert(w1.toSeq == w2.toSeq) // exact: integer counts + fixed-association ratios
    val s1 = Dsir.select(docs.repartition(3), "doc_id", "text", w1, 5L, 6)
      .select("doc_id", "importance").as[(Long, Double)].collect().sortBy(_._1)
    val s2 = Dsir.select(docs.coalesce(1), "doc_id", "text", w2, 5L, 6)
      .select("doc_id", "importance").as[(Long, Double)].collect().sortBy(_._1)
    assert(s1.toSeq == s2.toSeq) // quantized grid sums: bit-equal, not approx
  }

  test("non-power-of-two bucket counts are rejected") {
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(docs, "text", col("cls") === "t", 100, 5L)
    }
  }

  test("scoring is scan-side: top-k plan has no join") {
    val w = Dsir.importanceWeights(docs, "text", col("cls") === "t", 64, 5L)
    val phys = Dsir.select(docs, "doc_id", "text", w, 5L, 3)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("Join"), s"scoring must not join:\n$phys")
    assert(phys.contains("TakeOrderedAndProject"),
      s"selection must be a bounded top-k, not a global sort:\n$phys")
  }
}
