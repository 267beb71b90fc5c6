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
    * duplicate would make the running sum order-dependent.
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
}
