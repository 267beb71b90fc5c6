package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: assign documents to fixed
  * token-budget chunks in the concat-then-chunk layout (documents are laid
  * out in a deterministic order and cut into chunks every `budgetTokens`
  * tokens; documents stay whole, so a chunk overflows its budget by at most
  * one document — the standard packing used when sequences are concatenated
  * and split for pretraining).
  *
  * Scale shape: packing is computed per SHARD (a caller-supplied bucketing
  * column, e.g. `pmod(hash(id), shards)`), so the running sum is one window
  * per shard — a single shuffle on the shard key, no global ordering, no
  * driver state. Shard count scales with the corpus; chunk ids are unique
  * within (shard, chunk_seq).
  */
object Packing {

  /** Adds `chunk_seq` (the document's chunk within its shard) and
    * `chunk_offset` (the token offset where the document starts inside the
    * concatenated shard stream). Deterministic given (`shardCol`, `idCol`);
    * `idCol` must be unique within a shard — it is the layout order, and a
    * duplicate would make the running sum order-dependent. A null
    * `tokenCol` row gets null chunk columns (sum skips it, so it occupies
    * no budget) — count tokens with a non-null expression upstream.
    */
  def packChunks(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budgetTokens: Long,
      shardCol: Column): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shardCol)
      .withColumn("_cum", sum(col(tokenCol)).over(w))
      .withColumn("chunk_offset", col("_cum") - col(tokenCol))
      // integer division (`div`), not floating /: exact at any magnitude
      // and identical to the oracle's `//`
      .withColumn("chunk_seq", expr(s"chunk_offset div $budgetTokens"))
      .drop("_cum")
  }

  /** [[packChunks]] with an explicit layout order: documents are laid out
    * within their shard by `orderCols` (ties MUST be broken by a unique
    * trailing key — pass the id last), then cut every `budgetTokens`
    * tokens. This is the semantic-packing primitive behind In-Context
    * Pretraining (Shi et al. 2023, arXiv:2310.10638): with shard = a
    * bounded-size similarity cell and order = centroid proximity, each
    * training context window holds RELATED documents instead of random
    * ones — the paper's gain — while the computation stays one window per
    * bounded cell: a single shuffle on the shard key, no global ordering,
    * no driver state (the same scale shape as [[packChunks]]).
    */
  def packChunksBy(
      df: DataFrame,
      tokenCol: String,
      budgetTokens: Long,
      shardCol: Column,
      orderCols: Seq[Column]): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(orderCols.nonEmpty, "orderCols must include a unique tiebreaker")
    val w = Window.partitionBy(col("shard")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shardCol)
      .withColumn("_cum", sum(col(tokenCol)).over(w))
      .withColumn("chunk_offset", col("_cum") - col(tokenCol))
      .withColumn("chunk_seq", expr(s"chunk_offset div $budgetTokens"))
      .drop("_cum")
  }

  /** Overlapping sliding-window chunking (the RAG/embedding layout, vs
    * [[packChunks]]' concat-then-chunk pretraining layout): each document is
    * cut into chunks of up to `window` tokens starting every `stride` tokens,
    * so consecutive chunks share `window - stride` tokens of context. A
    * trailing start whose chunk would add no token beyond the previous chunk
    * is dropped (`start + window - stride >= ntok`), matching the usual
    * text-splitter rule; documents with zero tokens produce zero chunks.
    *
    * Scale shape: pure scan-side projection + generator — the chunk array is
    * built per row with `sequence`/`filter`/`slice` and exploded in place,
    * so there is NO shuffle and no state; output size is corpus ×
    * ~(ntok/stride), produced streaming through the scan. The spec asserts
    * the plan has no Exchange.
    */
  def chunkSliding(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val starts = filter(
      sequence(lit(0), greatest(col("_n") - 1, lit(0)), lit(stride)),
      i => (i === 0 && col("_n") > 0) ||
        (i > 0 && i + lit(window - stride) < col("_n")))
    df.withColumn("_toks", graft.functions.Text.tokens(col(textCol)))
      .withColumn("_n", size(col("_toks")))
      .select(
        col(idCol), col("_toks"), col("_n"),
        posexplode(starts).as(Seq("chunk_idx", "start_tok")))
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(window), col("_n") - col("start_tok")).cast("long")
          .as("n_tokens"),
        array_join(slice(col("_toks"), col("start_tok") + 1, lit(window)), " ")
          .as("chunk_text"))
  }
}
