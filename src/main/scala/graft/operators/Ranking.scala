package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval: score a (small) set of queries against the corpus
  * and return the top-k documents per query — the retrieval stage on top of
  * the [[Index]] posting representation, and the standard relevance baseline
  * every search / RAG-retrieval / contamination-triage stack starts from
  * (Robertson & Spärck Jones probabilistic relevance framework; the
  * k1/b parametrisation of Okapi BM25).
  *
  * Engine-portable scoring, same discipline as [[TfIdf]]'s rational idf:
  * `ln((N − df + 0.5)/(df + 0.5))` is NOT bit-portable across libm
  * implementations, so the idf factor is the RATIONAL form
  * `(2N − 2df + 1)/(2df + 1)` — the same quantity without the log. With
  * k1 = 6/5 and b = 3/4 folded through, each per-term score is a ratio of
  * two EXACT integer products:
  *
  *   term = (2N − 2df + 1)·22·tf·Σdl / ((2df + 1)·(10·tf·Σdl + 3·Σdl + 9·dl·N))
  *
  * evaluated as exactly two int→double casts, one IEEE multiply per side and
  * one IEEE divide — bit-identical in any IEEE engine. Per-document scores
  * sum the per-term values QUANTIZED to integers (`floor(term · 2^20)`), so
  * the sum is association-order-free — the same order-free-quantized-sum
  * device as [[NgramLM]] — and the final score hash-matches the oracle no
  * matter how Spark schedules the aggregation.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - tf / dl / df are the same map-side-combined folds as [[TfIdf]] — the
  *    raw token stream collapses per partition before any exchange;
  *  - the query side is tiny and BROADCAST: postings semi-join against the
  *    query-token set before anything else, so only postings of query terms
  *    flow into scoring — the corpus is never shuffled on the token key for
  *    terms nobody asked about;
  *  - corpus constants (N, Σdl) ride along as a one-row broadcast;
  *  - top-k per query runs through [[graft.plans.TopKPerKey]]'s bounded
  *    heaps, never a global sort.
  */
object Ranking {

  /** Exact integer floor-division `a div b` for non-negative operands:
    * a − (a mod b) is a long multiple of b, its double image is exact for
    * the magnitudes here (< 2^53 — term numerators cap at tf·N·2^20), and
    * the division is then exact by construction. No `div` is exposed in
    * the Column API; this avoids expr() string round-trips.
    */
  private def floorDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)).cast("double") / b.cast("double")).cast("long")

  /** The shared posting folds every lexical scorer needs: term frequencies
    * per (doc, token), doc lengths, document frequencies, and the corpus
    * constants (N over docs-with-tokens, Σdl). `nDocs` is the full corpus
    * count (TF-IDF's N — includes empty-text docs, unlike BM25's).
    */
  final case class PostingFolds(tf: DataFrame, dl: DataFrame, dfc: DataFrame,
    consts: DataFrame, nDocs: DataFrame)

  /** Build [[PostingFolds]]. With `materialize = true` the tf table is
    * localCheckpoint'ed — ONE tokenize + fold pass feeds every derived
    * frame (dl, dfc, consts) and every scorer, instead of Catalyst
    * re-deriving the corpus fold per branch (measured 7 parquet scans and
    * zero exchange reuse in the naive two-scorer fused plan; the
    * checkpointed hybrid runs the corpus exactly once). Same
    * plan-stability device as the dedup family's shingleSets reuse hook:
    * localCheckpoint keeps the frame OUTSIDE cached-relation stats, so the
    * broadcast planner cannot mis-size from it.
    */
  def postingFolds(docs: DataFrame, idCol: String, textCol: String,
      materialize: Boolean): PostingFolds = {
    val tf0 = docs
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val tf = if (materialize) tf0.localCheckpoint() else tf0
    val dl = tf.groupBy(col(idCol)).agg(sum("tf").as("dl"))
    PostingFolds(
      tf,
      dl,
      tf.groupBy(col("token")).agg(count(lit(1)).as("df_cnt")),
      dl.agg(count(lit(1)).as("_n"), sum("dl").as("_sumdl")),
      docs.agg(count(lit(1)).as("_n")))
  }

  private def queryTokens(queries: DataFrame, qidCol: String,
      qtextCol: String): DataFrame =
    queries.select(col(qidCol),
      explode(array_distinct(Text.tokens(col(qtextCol)))).as("token"))

  /** Top-k BM25 results per query. `queries` must be small (it is collected
    * into a broadcast join side): (qidCol, qtextCol) rows. Query terms are
    * DISTINCT per query (standard bag-of-terms BM25 with query tf capped at
    * 1 — repeated words in a query string do not double-score).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int): DataFrame =
    bm25TopKOn(postingFolds(docs, idCol, textCol, materialize = false),
      idCol, queries, qidCol, qtextCol, k)

  /** BM25 over pre-built [[PostingFolds]] — the reuse entry point. */
  def bm25TopKOn(folds: PostingFolds, idCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val qtok = queryTokens(queries, qidCol, qtextCol)
    val scoredTerms = folds.tf
      .join(broadcast(qtok), "token") // only query-term postings survive
      .join(broadcast(folds.dfc.join(broadcast(qtok.select("token").distinct()),
        "token")), "token")
      .join(folds.dl, idCol)
      .crossJoin(broadcast(folds.consts))
      .select(col(qidCol), col(idCol),
        floor(
          ((lit(2L) * col("_n") - lit(2L) * col("df_cnt") + lit(1L)).cast("double") *
            (lit(22L) * col("tf") * col("_sumdl")).cast("double") /
            ((lit(2L) * col("df_cnt") + lit(1L)).cast("double") *
              (lit(10L) * col("tf") * col("_sumdl") + lit(3L) * col("_sumdl") +
                lit(9L) * col("dl") * col("_n")).cast("double"))) *
          lit(1048576.0)).cast("long").as("term_q20"))
    val perDoc = scoredTerms
      .groupBy(col(qidCol), col(idCol))
      .agg(sum("term_q20").as("score_q20"), count(lit(1)).as("n_terms_hit"))
    graft.plans.TopK.perKey(
      perDoc, Seq(qidCol), Seq(col("score_q20").desc, col(idCol).asc), k)
  }

  /** Top-k TF-IDF retrieval — the second lexical ranker for [[rrfFuse]]:
    * score = Σ_t tf · (N+1)/(df+1), the classic tf·idf retrieval sum with
    * [[TfIdf]]'s rational idf, here kept ENTIRELY in integers:
    * `term_q20 = (tf · (N+1) · 2^20) div (df+1)` — floor of the exact
    * rational, no floating point anywhere, so scores (and the fused ranks
    * downstream) are trivially engine-exact. Differs from BM25 by design:
    * no tf saturation, no length normalization — which is exactly why the
    * two disagree enough for fusion to be worth running.
    *
    * Same scale shape as [[bm25TopK]]: broadcast query-term semi-join, map-
    * side-combined folds, bounded-heap top-k.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int): DataFrame =
    tfidfTopKOn(postingFolds(docs, idCol, textCol, materialize = false),
      idCol, queries, qidCol, qtextCol, k)

  /** TF-IDF retrieval over pre-built [[PostingFolds]]. */
  def tfidfTopKOn(folds: PostingFolds, idCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val qtok = queryTokens(queries, qidCol, qtextCol)
    val scored = folds.tf
      .join(broadcast(qtok), "token")
      .join(broadcast(folds.dfc.join(broadcast(qtok.select("token").distinct()),
        "token")), "token")
      .crossJoin(broadcast(folds.nDocs))
      .select(col(qidCol), col(idCol),
        floorDiv(col("tf") * (col("_n") + lit(1L)) * lit(1048576L),
          col("df_cnt") + lit(1L)).as("term_q20"))
    val perDoc = scored.groupBy(col(qidCol), col(idCol))
      .agg(sum("term_q20").as("score_q20"), count(lit(1)).as("n_terms_hit"))
    graft.plans.TopK.perKey(
      perDoc, Seq(qidCol), Seq(col("score_q20").desc, col(idCol).asc), k)
  }

  /** Hybrid retrieval: BM25 + TF-IDF over ONE materialized posting fold,
    * fused with [[rrfFuse]] — the corpus is tokenized and folded exactly
    * once (localCheckpoint'ed tf), where composing the standalone scorers
    * lets Catalyst re-derive the fold per branch (measured: 7 scans → this
    * runs 1; 43.5 s → materially less at sf10). This is the production
    * shape for multi-scorer retrieval at 100 TB.
    */
  def hybridTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, kRank: Int = 60): DataFrame = {
    val folds = postingFolds(docs, idCol, textCol, materialize = true)
    rrfFuse(
      bm25TopKOn(folds, idCol, queries, qidCol, qtextCol, k),
      tfidfTopKOn(folds, idCol, queries, qidCol, qtextCol, k),
      qidCol, idCol, k, kRank)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of two
    * rankings — the standard hybrid-retrieval combiner (lexical + dense, or
    * any pair of scorers): each ranker contributes `1/(kRank + rank)` per
    * document and the fused order is by the summed contribution. Kept in
    * exact integers: `contrib = 2^30 div (kRank + rank)` (floor), so the
    * fused score is an order-free integer sum, bit-identical anywhere —
    * the same quantization discipline as the scorers.
    *
    * Inputs are the scorers' top-k tables (`(qidCol, idCol, score_q20)`),
    * so fusion touches candidates only — queries × k rows per side, never
    * the corpus. Ranks derive from (score_q20 desc, id asc) row_number on
    * those tiny tables; ties inside a ranker get distinct ranks by id,
    * deterministically.
    */
  /** Retrieval-quality evaluation of a ranking against relevance judgments
    * (`qrels`: one row per relevant (query, doc) pair) — the measurement
    * stage that closes the retrieval loop (rank → fuse → EVALUATE), in the
    * same exact-integer discipline as the scorers so the metrics replay
    * cross-engine:
    *
    *  - `first_rel_rank`: rank of the first relevant hit (-1 when no
    *    relevant doc appears in the ranking);
    *  - `rr_q30 = 2^30 div first_rel_rank` — reciprocal rank, floor-
    *    quantized (0 when no hit), so MRR is a later exact integer mean;
    *  - `ap_q20 = (Σ_hits ⌊2^20 · hits_so_far / rank⌋) div n_rel` —
    *    average precision from floor-quantized precision-at-hit terms
    *    (n_rel from the judgments, so misses below the cutoff count
    *    against AP, per the standard definition);
    *  - `n_hits_at_k` / `n_rel` — recall@k as an exact pair, not a lossy
    *    ratio.
    *
    * nDCG is deliberately absent: its 1/log2(r+1) discount is not
    * bit-portable (libm), and RR/AP/recall cover the same ordering-quality
    * signal in exact arithmetic.
    *
    * Scale shape: everything happens on the ranking table (queries × k
    * rows) joined against qrels — window ranks over tiny per-query
    * partitions; the corpus is never touched.
    */
  def evalRanking(ranking: DataFrame, qrels: DataFrame,
      qidCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol))
      .orderBy(col("score_q20").desc, col(idCol).asc)
    val ranked = ranking.select(col(qidCol), col(idCol),
      row_number().over(w).cast("long").as("rank"))
    val nRel = qrels.groupBy(col(qidCol)).agg(count(lit(1)).as("n_rel"))
    val hits = ranked.join(qrels.select(col(qidCol), col(idCol)),
        Seq(qidCol, idCol))
      .withColumn("hits_so_far", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(qidCol)).orderBy(col("rank"))))
    val perQuery = hits.groupBy(col(qidCol)).agg(
      min(col("rank")).as("first_rel_rank"),
      count(lit(1)).as("n_hits_at_k"),
      sum(floorDiv(col("hits_so_far") * lit(1048576L), col("rank")))
        .as("_ap_num"))
    nRel.join(perQuery, Seq(qidCol), "left")
      .select(col(qidCol), col("n_rel"),
        coalesce(col("n_hits_at_k"), lit(0L)).as("n_hits_at_k"),
        coalesce(col("first_rel_rank"), lit(-1L)).as("first_rel_rank"),
        when(col("first_rel_rank").isNotNull,
          floorDiv(lit(1073741824L), col("first_rel_rank")))
          .otherwise(lit(0L)).as("rr_q30"),
        floorDiv(coalesce(col("_ap_num"), lit(0L)), col("n_rel")).as("ap_q20"))
  }

  def rrfFuse(a: DataFrame, b: DataFrame, qidCol: String, idCol: String,
      k: Int, kRank: Int = 60): DataFrame = {
    require(k > 0 && kRank > 0, s"k and kRank must be positive: $k, $kRank")
    def ranked(df: DataFrame, tag: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(qidCol))
        .orderBy(col("score_q20").desc, col(idCol).asc)
      df.select(col(qidCol), col(idCol),
        floorDiv(lit(1073741824L),
          row_number().over(w).cast("long") + lit(kRank.toLong))
          .as(s"contrib_$tag"))
    }
    val fused = ranked(a, "a").join(ranked(b, "b"), Seq(qidCol, idCol), "full_outer")
      .select(col(qidCol), col(idCol),
        (coalesce(col("contrib_a"), lit(0L)) +
          coalesce(col("contrib_b"), lit(0L))).as("rrf_q30"),
        (when(col("contrib_a").isNotNull, 1L).otherwise(0L) +
          when(col("contrib_b").isNotNull, 1L).otherwise(0L)).as("n_rankers"))
    graft.plans.TopK.perKey(
      fused, Seq(qidCol), Seq(col("rrf_q30").desc, col(idCol).asc), k)
  }
}
