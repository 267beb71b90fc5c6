package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The multi-scorer amortization hook (Dedup.shingleSets +
  * ngramJaccardOn/overlapPairsOn): results must be row-identical to the
  * default single-scorer paths, the checkpoint must NOT re-trigger the
  * measured broadcast-planner trap, and the default paths must stay
  * exactly as they were (no checkpoint sneaking into single-scorer plans).
  */
class PairMiningReuseSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 0
    (2L, "alpha beta gamma delta epsilon zeta eta iota"),  // near-dup of 0
    (3L, "alpha beta gamma delta"),                        // contained in 0
    (4L, "omega psi chi phi upsilon tau sigma rho"),
    (5L, "one two three four five six seven eight nine ten")
  ).toDF("doc_id", "text")

  test("reuse path returns row-identical results to the default paths") {
    val sets = Dedup.shingleSets(corpus, "doc_id", "text", 3, 1000L)

    val jacDefault = Dedup.ngramJaccard(corpus, "doc_id", "text", 3, 0.8, 1000L)
      .collect().toSet
    val jacReuse = Dedup.ngramJaccardOn(sets, 0.8).collect().toSet
    assert(jacReuse == jacDefault)

    val conDefault = Dedup.overlapPairs(corpus, "doc_id", "text", 3, 0.8, 1000L)
      .collect().toSet
    val conReuse = Dedup.overlapPairsOn(sets, 0.8).collect().toSet
    assert(conReuse == conDefault)

    // sanity: the fixture exercises all three pair kinds
    assert(jacDefault.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L))
    assert(conDefault.exists(r => r.getLong(0) == 0L && r.getLong(1) == 3L))
  }

  test("default paths carry no checkpoint; reuse path reads the checkpointed RDD") {
    // the single-scorer plan was MEASURED optimal with recompute — a
    // checkpoint (or cache) appearing in it would be a regression
    val defaultPlan = Dedup.ngramJaccard(corpus, "doc_id", "text", 3, 0.8, 1000L)
      .queryExecution.optimizedPlan.toString
    assert(!defaultPlan.contains("LogicalRDD"),
      s"default path must not materialize intermediates:\n$defaultPlan")

    val sets = Dedup.shingleSets(corpus, "doc_id", "text", 3, 1000L)
    val reusePlan = Dedup.ngramJaccardOn(sets, 0.8)
      .queryExecution.optimizedPlan.toString
    assert(reusePlan.contains("LogicalRDD"),
      s"reuse path must read the checkpointed docsets:\n$reusePlan")
  }

  test("checkpointed docsets do NOT re-trigger the broadcast-planner trap") {
    // the trap: a CACHED docsets relation substitutes its ACTUAL
    // materialized size for the planner's estimates, flipping the
    // candidate join to broadcasting the exploded full-posting side
    // (12 s → 114 s at sf1). localCheckpoint carries the ORIGIN plan's
    // statistics instead — the same estimates the default path plans
    // with — so the scorer stage must make exactly the same join-strategy
    // choices as the recompute path: checkpointing changes where rows
    // come from, never the join shape.
    def scorerJoins(plan: String): Seq[String] = plan.linesIterator
      .map(_.trim.dropWhile(c => c == '+' || c == '-' || c == ':' || c == ' '))
      .filter(l => l.startsWith("BroadcastHashJoin") || l.startsWith("SortMergeJoin")
        || l.startsWith("ShuffledHashJoin") || l.startsWith("BroadcastNestedLoopJoin"))
      .filterNot(_.contains("LeftAnti")) // hot-shingle suppression: inside
      // shingleSets on the reuse path, inline on the default path
      .map(_.takeWhile(_ != '['))
      .toSeq.sorted
    val defaultJoins = scorerJoins(
      Dedup.overlapPairs(corpus, "doc_id", "text", 3, 0.8, 1000L)
        .queryExecution.executedPlan.toString)
    val sets = Dedup.shingleSets(corpus, "doc_id", "text", 3, 1000L)
    val reuseJoins = scorerJoins(
      Dedup.overlapPairsOn(sets, 0.8)
        .queryExecution.executedPlan.toString)
    assert(reuseJoins == defaultJoins,
      s"reuse path changed join strategies: default=$defaultJoins reuse=$reuseJoins")
  }
}
