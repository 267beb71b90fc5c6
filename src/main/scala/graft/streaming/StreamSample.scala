package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming weighted sampling without replacement — the A-ES property
  * that makes [[graft.operators.Sampling.weightedFixedK]] a STREAMING
  * algorithm (Efraimidis–Spirakis 2006 §3): every row's priority key is
  * a deterministic function of (id, weight, seed), so maintaining the
  * running top-k of keys over any partitioning of the input into
  * micro-batches yields EXACTLY the batch draw. State is the k-row
  * sample itself, persisted as parquet inside `foreachBatch` — bounded
  * by k forever, no watermark needed (keys never expire).
  *
  * Restart contract: re-applying a batch after checkpoint recovery is
  * idempotent — union ∪ top-k is; a row already in the sample re-draws
  * the identical key and dedupes by id (max over the id's rows).
  *
  * Per-batch cost: the batch scan (scan-side key arithmetic) + one
  * TakeOrdered over batch ∪ k state rows, and a k-row rewrite.
  */
object StreamSample {

  private val KeyCol = "_aes_key"

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Fold one micro-batch into the persisted k-row sample — the
    * `foreachBatch` body. `batch` columns: idCol, weightCol (+ payload
    * carried along untouched). */
  def foldBatch(
      spark: SparkSession,
      batch: DataFrame,
      targetDir: String,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: Long): Unit = {
    val keyed = batch
      .filter(col(weightCol).cast("long") >= 1L)
      .withColumn(KeyCol,
        graft.operators.Sampling.aesKey(idCol, weightCol, seed))
    val merged =
      if (exists(spark, targetDir))
        spark.read.parquet(targetDir)
          .select(keyed.columns.map(col).toIndexedSeq: _*)
          .unionByName(keyed)
      else keyed
    // dedupe (a restart replay re-offers already-sampled rows; the key
    // is deterministic, so a re-offered row is bit-identical and
    // distinct() collapses it), then top-k
    val top = merged
      .distinct()
      .orderBy(col(KeyCol).desc, col(idCol))
      .limit(k)
      .localCheckpoint(true) // cut lineage before overwriting the source
    top.write.mode("overwrite").parquet(targetDir)
  }

  /** The current k-row sample (bookkeeping column dropped). */
  def current(spark: SparkSession, targetDir: String): DataFrame =
    spark.read.parquet(targetDir).drop(KeyCol)
}
