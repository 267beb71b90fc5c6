package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 contracts the oracle gate cannot see: the quantized score matches a
  * driver-side re-derivation of the exact rational formula, ranking behaves
  * (more matching terms ⇒ higher score; rarer terms weigh more), the result
  * is partitioning-invariant, and the plan broadcasts the query side.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma"),
    (2L, "alpha alpha beta"),
    (3L, "delta epsilon zeta"),
    (4L, "alpha beta gamma delta"),
    (5L, "eta theta iota kappa")).toDF("doc_id", "text")

  private def queries(qs: (Long, String)*) = qs.toDF("query_id", "qtext")

  test("score matches the exact rational BM25 formula, quantized at 2^-20") {
    val out = Ranking.bm25TopK(docs, "doc_id", "text",
        queries((1L, "alpha")), "query_id", "qtext", k = 10)
      .select($"doc_id", $"score_q20").as[(Long, Long)].collect().toMap
    // corpus constants: N=5 docs, Σdl = 3+3+3+4+4 = 17; alpha: df=3
    val (n, sumdl, df) = (5L, 17L, 3L)
    def expected(tf: Long, dl: Long): Long = {
      val term = (2 * n - 2 * df + 1).toDouble * (22 * tf * sumdl).toDouble /
        ((2 * df + 1).toDouble *
          (10 * tf * sumdl + 3 * sumdl + 9 * dl * n).toDouble)
      math.floor(term * 1048576.0).toLong
    }
    assert(out(1L) == expected(tf = 1, dl = 3))
    assert(out(2L) == expected(tf = 2, dl = 3))
    assert(out(4L) == expected(tf = 1, dl = 4))
    assert(!out.contains(3L) && !out.contains(5L), s"non-matching docs scored: $out")
    // saturation + length normalization: doubled tf gains less than 2x,
    // and the longer doc scores below the shorter at equal tf
    assert(out(2L) > out(1L) && out(2L) < 2 * out(1L))
    assert(out(4L) < out(1L))
  }

  test("documents matching more query terms outrank partial matches") {
    val top = Ranking.bm25TopK(docs, "doc_id", "text",
        queries((7L, "alpha beta gamma delta")), "query_id", "qtext", k = 10)
      .orderBy($"score_q20".desc)
      .select($"doc_id", $"n_terms_hit").as[(Long, Long)].collect()
    assert(top.head._1 == 4L && top.head._2 == 4L,
      s"doc 4 matches all four terms and must rank first: ${top.toSeq}")
    val hits = top.toMap
    assert(hits(1L) == 3L && hits(2L) == 2L && hits(3L) == 1L)
  }

  test("results are invariant under corpus repartitioning") {
    val q = queries((1L, "alpha beta"), (2L, "delta"))
    val a = Ranking.bm25TopK(docs, "doc_id", "text", q, "query_id", "qtext", 10)
    val b = Ranking.bm25TopK(docs.repartition(7), "doc_id", "text",
      q, "query_id", "qtext", 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("tfidfTopK is pure-integer and favors rare terms over common ones") {
    // "beta" (df=3) vs "delta" (df=2): for equal tf, the rarer term scores
    // higher; and the score is exactly (tf·(N+1)·2^20) div (df+1)
    val out = Ranking.tfidfTopK(docs, "doc_id", "text",
        queries((1L, "beta"), (2L, "delta")), "query_id", "qtext", k = 10)
      .select($"query_id", $"doc_id", $"score_q20")
      .as[(Long, Long, Long)].collect()
    val betaDoc1 = out.find(r => r._1 == 1L && r._2 == 1L).get._3
    val deltaDoc3 = out.find(r => r._1 == 2L && r._2 == 3L).get._3
    assert(betaDoc1 == 1L * 6L * 1048576L / 4L) // tf=1, N=5, df=3
    assert(deltaDoc3 == 1L * 6L * 1048576L / 3L) // tf=1, df=2
    assert(deltaDoc3 > betaDoc1)
  }

  test("rrfFuse sums exact integer contributions and ranks candidates only") {
    val q = queries((1L, "alpha beta gamma delta"))
    val a = Ranking.bm25TopK(docs, "doc_id", "text", q, "query_id", "qtext", 10)
    val b = Ranking.tfidfTopK(docs, "doc_id", "text", q, "query_id", "qtext", 10)
    val fused = Ranking.rrfFuse(a, b, "query_id", "doc_id", k = 10)
      .select($"doc_id", $"rrf_q30", $"n_rankers")
      .as[(Long, Long, Long)].collect()
    def contrib(rank: Int) = 1073741824L / (60L + rank)
    // doc 4 matches all four query terms — rank 1 in BOTH rankers
    val top = fused.maxBy(_._2)
    assert(top._1 == 4L && top._3 == 2L)
    assert(top._2 == 2 * contrib(1), s"expected 2·⌊2^30/61⌋, got ${top._2}")
    // every fused score is a sum of valid per-ranker contributions
    val valid = (1 to 10).map(contrib).toSet
    fused.foreach { case (id, s, nr) =>
      assert(nr >= 1 && nr <= 2)
      if (nr == 1) assert(valid.contains(s), s"doc $id score $s not a contrib")
      else assert(valid.exists(c => valid.contains(s - c)),
        s"doc $id score $s not a sum of two contribs")
    }
  }

  test("hybridTopK == rrfFuse of standalone scorers, with ONE corpus fold") {
    val q = queries((1L, "alpha beta"), (2L, "delta epsilon"))
    val hybrid = Ranking.hybridTopK(docs, "doc_id", "text",
      q, "query_id", "qtext", k = 10)
    val composed = Ranking.rrfFuse(
      Ranking.bm25TopK(docs, "doc_id", "text", q, "query_id", "qtext", 10),
      Ranking.tfidfTopK(docs, "doc_id", "text", q, "query_id", "qtext", 10),
      "query_id", "doc_id", k = 10)
    assert(hybrid.exceptAll(composed).isEmpty && composed.exceptAll(hybrid).isEmpty)
    // the reuse contract: the corpus fold is OUTSIDE the fused plan (the
    // checkpointed tf shows up as ExistingRDD), so the only explodes left
    // are the tiny query-token ones — the composed plan re-tokenizes the
    // corpus per branch and carries strictly more explode generators
    val hPlan = hybrid.queryExecution.executedPlan.toString
    val cPlan = composed.queryExecution.executedPlan.toString
    assert(hPlan.contains("ExistingRDD"),
      s"hybrid must read the checkpointed tf, plan:\n$hPlan")
    val explodes = (p: String) => "Generate explode".r.findAllIn(p).length
    assert(explodes(hPlan) < explodes(cPlan),
      s"hybrid still re-tokenizes the corpus: ${explodes(hPlan)} vs ${explodes(cPlan)}")
  }

  test("evalRanking computes exact quantized RR/AP/recall from judgments") {
    // hand-built ranking for one query: ranks follow (score desc, id asc)
    val ranking = Seq(
      (1L, 2L, 500L), (1L, 1L, 400L), (1L, 3L, 300L), (1L, 4L, 200L),
      (1L, 5L, 100L),
      (2L, 7L, 900L)).toDF("query_id", "doc_id", "score_q20")
    // q1: relevant {1, 3, 9} → hits at ranks 2 (doc 1) and 3 (doc 3), doc 9
    // missed; q2: relevant {8} → zero hits
    val qrels = Seq((1L, 1L), (1L, 3L), (1L, 9L), (2L, 8L))
      .toDF("query_id", "doc_id")
    val out = Ranking.evalRanking(ranking, qrels, "query_id", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (_, nRel1, hits1, frr1, rr1, ap1) = out(1L)
    assert(nRel1 == 3L && hits1 == 2L && frr1 == 2L)
    assert(rr1 == 1073741824L / 2)
    // AP = (⌊2^20·1/2⌋ + ⌊2^20·2/3⌋) div 3
    assert(ap1 == (1048576L / 2 + 2 * 1048576L / 3) / 3)
    val (_, nRel2, hits2, frr2, rr2, ap2) = out(2L)
    assert(nRel2 == 1L && hits2 == 0L && frr2 == -1L && rr2 == 0L && ap2 == 0L)
  }

  test("the query side broadcasts; no sort-merge join on the token key") {
    val plan = Ranking.bm25TopK(docs, "doc_id", "text",
        queries((1L, "alpha beta")), "query_id", "qtext", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"query-token join must broadcast, plan:\n$plan")
    assert(!plan.matches("(?s).*SortMergeJoin \\[token.*"),
      s"the token key must never sort-merge (query side is tiny), plan:\n$plan")
  }
}
