package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  test("documents overlapping a benchmark above the n-gram threshold are flagged") {
    // doc 1 copies the benchmark verbatim (8 shared 3-grams), doc 2 shares a
    // 4-word prefix (2 shared 3-grams < minOverlap=3), doc 3 is unrelated
    val docs = Seq(
      (1L, benchText),
      (2L, "alpha beta gamma delta unrelated words follow here now right"),
      (3L, "completely different text with no shared trigrams at all okay")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("bench_id", "text")
    val flagged = Contamination.flagContaminated(
        docs, "doc_id", "text", bench, "bench_id", "text",
        n = 3, minOverlap = 3L)
      .select($"doc_id", $"n_bench_hits", $"max_overlap")
      .as[(Long, Long, Long)].collect().toSet
    assert(flagged == Set((1L, 1L, 8L)))
  }

  test("ubiquitous shingles are suppressed before counting overlap") {
    // the shared trigram appears in EVERY doc → with maxShingleDocFreq=2 it
    // is hot and cannot serve as contamination evidence
    val filler = Seq("one two three", "four five six", "seven eight nine")
    val docs = (1L to 3L).zip(filler).map { case (i, f) =>
      (i, s"common shared trigram $f")
    }.toDF("doc_id", "text")
    val bench = Seq((100L, "common shared trigram plus other words")).toDF("bench_id", "text")
    val out = Contamination.flagContaminated(
      docs, "doc_id", "text", bench, "bench_id", "text",
      n = 3, minOverlap = 1L, maxShingleDocFreq = 2L)
    assert(out.count() == 0)
  }

  test("benchmark postings broadcast: no shuffle of the corpus posting list") {
    val docs = Seq((1L, benchText)).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("bench_id", "text")
    val out = Contamination.flagContaminated(
      docs, "doc_id", "text", bench, "bench_id", "text", n = 3, minOverlap = 1L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side is not broadcast:\n$plan")
  }
}
