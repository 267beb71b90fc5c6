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

  /** Doc-ATOMIC bin packing, next-fit-decreasing (the padding-free layout
    * next to [[packChunks]]' concat-then-chunk: when training examples must
    * not cross document boundaries — no attention-mask surgery — documents
    * pack WHOLE into fixed-budget bins and the leftover is padding, so the
    * packer's job is minimizing it; NFD is the classic one-pass greedy:
    * place items longest-first, open a new bin when the current one cannot
    * take the next item). A document longer than `budget` lands alone in
    * its own (overflowing) bin — truncation is the tokenizer's decision,
    * not the packer's.
    *
    * Scale shape: packing is per SHARD (caller-supplied bucketing column;
    * derive the shard count from the corpus like [[graft.operators.Layout.shardsFor]]
    * so shard size stays bounded) — one shuffle on the shard key, then the
    * whole NFD fold runs INSIDE `aggregate` over the shard's sorted item
    * array: no driver state, no global ordering, no UDF. The fold is
    * sequential per shard by nature (a bin break depends on the running
    * fill — not window-expressible), which is exactly why the shard bound
    * matters; bins are unique within (shard, bin).
    *
    * Output: one row per document — (shard, `idCol`, len, bin, pos,
    * fill_after): bin = the document's bin within its shard, pos = its
    * 1-based position inside the bin, fill_after = the bin's running fill
    * after placing it (the LAST row of a bin carries the bin's final fill;
    * budget − that = the bin's padding).
    */
  def packBinsNoSplit(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      budget: Long,
      shardCol: Column): DataFrame = {
    require(budget > 0, "budget must be positive")
    // the fold struct casts the id to long: a non-numeric id column would
    // yield null ids for EVERY row (silent identity collapse), so the
    // integral requirement is enforced up front instead
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType
         | org.apache.spark.sql.types.ShortType
         | org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.LongType => ()
      // scale-0 decimals (the BIGINT surrogate-key flavor many warehouses
      // emit) cast to long exactly, as long as precision fits
      case d: org.apache.spark.sql.types.DecimalType if d.scale == 0 => ()
      case other => throw new IllegalArgumentException(
        s"packBinsNoSplit needs an integral id column; $idCol is $other " +
          "(Byte/Short/Int/Long or Decimal(p,0) — Float/Double are " +
          "rejected by design: their cast truncates and can collide ids; " +
          "map your id to a long — e.g. xxhash64 — before packing)")
    }
    // sort_array on (-len, id) = longest first, ties by id — deterministic
    val item = struct((-col(lenCol).cast("long")).as("nl"),
      col(idCol).cast("long").as("id"))
    val emptyOut = slice(array(struct(lit(0L).as("id"), lit(0L).as("len"),
      lit(0L).as("bin"), lit(0L).as("pos"), lit(0L).as("fill"))), 1, 0)
    // zero fill = budget + 1 forces the first item to OPEN bin 0
    val zero = struct(lit(-1L).as("bin"), lit(budget + 1L).as("fill"),
      lit(0L).as("pos"), emptyOut.as("out"))
    df.withColumn("shard", shardCol)
      .groupBy(col("shard"))
      .agg(sort_array(collect_list(item)).as("_items"))
      .withColumn("_st", aggregate(col("_items"), zero, (st, x) => {
        val len = -x.getField("nl")
        val newBin = st.getField("fill") + len > lit(budget)
        val bin = when(newBin, st.getField("bin") + 1L)
          .otherwise(st.getField("bin"))
        val fill = when(newBin, len).otherwise(st.getField("fill") + len)
        val pos = when(newBin, lit(1L)).otherwise(st.getField("pos") + 1L)
        struct(bin.as("bin"), fill.as("fill"), pos.as("pos"),
          concat(st.getField("out"), array(struct(
            x.getField("id").as("id"), len.as("len"), bin.as("bin"),
            pos.as("pos"), fill.as("fill")))).as("out"))
      }))
      .select(col("shard"), explode(col("_st").getField("out")).as("r"))
      .select(col("shard"), col("r.id").as(idCol), col("r.len").as("len"),
        col("r.bin").as("bin"), col("r.pos").as("pos"),
        col("r.fill").as("fill_after"))
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
