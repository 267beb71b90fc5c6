package graft.operators

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.functions._

class NgramLMSpec extends SparkSpec {
  import spark.implicits._

  private val Q = 1099511627776.0 // 2^40

  test("wordShinglesAll keeps multiplicities in document order") {
    val out = Seq("A b a B").toDF("text")
      .select(Text.wordShinglesAll(col("text"), 2))
      .as[Seq[String]].collect().head
    assert(out == Seq("a b", "b a", "a b"))
    // distinct variant on the same text dedupes to first-occurrence order
    val dist = Seq("A b a B").toDF("text")
      .select(Text.wordShingles(col("text"), 2))
      .as[Seq[String]].collect().head
    assert(dist == Seq("a b", "b a"))
  }

  test("selfScoreBigram matches hand-computed add-one smoothing") {
    // corpus: c12 = {a b: 2, b a: 1, a c: 1}; c1 = {a: 3, b: 1}; V = 3
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = NgramLM.selfScoreBigram(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    // doc 1: p(a b)=3/6, p(b a)=2/4, p(a b)=3/6 — all exactly 0.5
    assert(out(0) == ((1L, 3L, 0.5, 0.5)))
    // doc 2: p(a c)=2/6, quantized to a 2^-40 multiple
    val pThird = math.floor(2.0 / 6.0 * Q) / Q
    assert(out(1) == ((2L, 1L, pThird, pThird)))
  }

  test("scoreBigram backs off on unseen bigrams and contexts") {
    val corpus = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val model = NgramLM.bigramCounts(corpus, "text")
    val vocab = corpus.select(explode(Text.tokens(col("text"))).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    // "x y": bigram unseen AND context unseen → p = (0+1)/(0+V) = 1/3
    // "a q": context a seen (c1=3), bigram unseen → p = 1/6
    val probe = Seq((10L, "x y"), (11L, "a q")).toDF("doc_id", "text")
    val out = NgramLM.scoreBigram(probe, "doc_id", "text", model, vocab)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(out(0)._3 == math.floor(1.0 / 3.0 * Q) / Q)
    assert(out(1)._3 == math.floor(1.0 / 6.0 * Q) / Q)
  }

  test("model build partial-aggregates map-side (hot bigrams collapse pre-shuffle)") {
    val docs = Seq.tabulate(50)(i => (i.toLong, "of the of the common bigram"))
      .toDF("doc_id", "text")
    val model = NgramLM.bigramCounts(docs, "text")
    model.collect() // finalize the AQE plan before asserting on it
    val plan = model.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val aggs = "HashAggregate".r.findAllIn(plan).size
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final aggregation, got:\n$plan")
    assert(exchanges == 1, s"model build must be ONE shuffle, got $exchanges:\n$plan")
  }

  test("documents with fewer than two tokens are absent, not scored") {
    val docs = Seq((1L, "a b"), (2L, "solo"), (3L, "   ")).toDF("doc_id", "text")
    val ids = NgramLM.selfScoreBigram(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("collocations ranks glued pairs above chance pairs, minCount guards hapax") {
    // "san francisco" always co-occurs (5×); "the" pairs with everything;
    // "rare gem" occurs once (hapax — excluded by minCount)
    val docs = Seq(
      (1L, "san francisco the city the bay"),
      (2L, "san francisco the fog the hills"),
      (3L, "san francisco the bridge rare gem"),
      (4L, "san francisco the mission the park"),
      (5L, "san francisco the beach the cliff")).toDF("doc_id", "text")
    val top = NgramLM.collocations(docs, "text", minCount = 2L, k = 3)
      .select($"w1", $"w2", $"c12", $"lift")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(top.head._1 == "san" && top.head._2 == "francisco" && top.head._3 == 5L)
    assert(!top.exists(t => t._1 == "rare"), "hapax pair must be pruned")
    // lift of the glued pair: c12=5, c(san)=c(francisco)=5 → maximal
    assert(top.head._4 > top(1)._4)
  }

  test("collocations plans as TakeOrdered with broadcast unigram joins") {
    val docs = (1L to 50L).map(i => (i, "a b c d e f")).toDF("doc_id", "text")
    val out = NgramLM.collocations(docs, "text", minCount = 2L, k = 5)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must be TakeOrdered, not a sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"unigrams must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }

  test("AQE skew-split absorbs a hot probe bigram in the scoring join") {
    // SURVEY §5 claims the scoring join's hot-probe-bigram shape ("of the"
    // lands in one shuffle partition) is exactly what AQE skew-join splits;
    // trip the same optimizer decision at local scale the way SkewSpec does
    // for saltedJoin: low skew thresholds, broadcast disabled (a real model
    // at corpus scale exceeds the broadcast threshold).
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 20k docs, every one dominated by the hot bigram: the probe stream
      // is ~90% "of the"/"the of" rows hashing to two partitions. The model
      // is MATERIALIZED (train once, score many — at 100 TB it is a stored
      // artifact, not a fused subplan): that also makes the scoring join's
      // model side a bare shuffle stage, the shape OptimizeSkewedJoin can
      // split — a model fused straight out of its groupBy is already
      // partitioned on the bigram and leaves AQE nothing to re-plan.
      val docs = spark.range(20000).select(
        col("id").as("doc_id"),
        concat(lit("of the of the of the of the of the of the tail"),
          col("id")).as("text"))
      val model = NgramLM.bigramCounts(docs, "text").localCheckpoint(true)
      val vocab = docs.select(explode(Text.tokens(col("text"))).as("t"))
        .agg(count_distinct(col("t")).as("v"))
      val scored = NgramLM.scoreBigram(docs, "doc_id", "text", model, vocab)
      val rows = scored.collect()
      assert(rows.length == 20000)
      val plan = scored.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot-bigram scoring join with skew=true:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
