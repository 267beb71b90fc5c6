package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction: the top-k most characteristic terms per
  * document — the classic corpus-statistics signal for topic tagging,
  * keyword search indexes, and near-dup triage over a training corpus.
  *
  * The idf factor is the RATIONAL form `(N + 1) / (df + 1)` rather than
  * `ln(N / df)`: it is the same monotone ranking (log is order-preserving),
  * but pure integer-derived IEEE arithmetic, so scores — not just ranks —
  * are bit-identical in any IEEE engine and the oracle hash-matches. `ln`
  * is NOT bit-portable across libm implementations.
  *
  * Scale shape: term frequency is one map-side-combined groupBy on
  * (doc, term); document frequency folds the tf table again (each
  * (doc, term) row counts once — never the raw token stream). Catalyst
  * column-prunes the df branch to a bare distinct — the two (doc,term)
  * exchanges end up non-identical (one carries counts), so the scan runs
  * twice, but BOTH passes keep map-side partial aggregation: a stopword
  * term collapses to one row per partition before every exchange, which is
  * the property that matters at 100 TB (forcing single-scan reuse would
  * need a raw-token-grain repartition on the term key — the hot-key shuffle
  * this formulation exists to avoid). The corpus total is a one-row
  * broadcast.
  * The tf⋈df join shuffles on the term key — stopword terms are hot there,
  * which AQE's skew split handles (the join is exercised under the skew
  * recipe in the spec suite's salted-join coverage); top-k per doc runs
  * through [[graft.plans.TopKPerKey]]'s bounded heaps, not a sort.
  */
object TfIdf {

  def topTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = df
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("token")).agg(count(lit(1)).as("df_cnt"))
    val n = df.agg(count(lit(1)).as("_n_docs"))
    val scored = tf.join(dfc, "token")
      .crossJoin(broadcast(n))
      .select(
        col(idCol), col("token"), col("tf"), col("df_cnt"),
        (col("tf").cast("double") *
          ((col("_n_docs") + lit(1L)).cast("double") /
            (col("df_cnt") + lit(1L)).cast("double"))).as("score"))
    graft.plans.TopK.perKey(
      scored, Seq(idCol), Seq(col("score").desc, col("token").asc), k)
  }
}
