package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming CDC materialization — [[graft.operators.Cdc]] kept current
  * against a live change feed: each micro-batch's log slice folds into a
  * persisted, hash-bucketed parquet snapshot inside `foreachBatch`, and
  * only the buckets holding TOUCHED keys rewrite (dynamic partition
  * overwrite — the [[graft.operators.Upsert]] device, with buckets
  * standing in for dates so arbitrary keys localize). A batch's final
  * 'D' drops the key, 'I'/'U' upserts the payload, untouched keys —
  * and untouched BUCKETS, physically — stay as they are.
  *
  * Restart contract: the snapshot stores each row's last-applied
  * sequence (`_seq`; base-snapshot rows carry seq 0), and the fold is
  * max-by-(seq, op, payload) across {current state} ∪ {batch winners} —
  * so re-applying a batch after a checkpoint-recovery restart is
  * IDEMPOTENT (same winners win again; spec-pinned). The feed must
  * arrive in non-decreasing sequence order across batches (a CDC
  * stream's offset order — the replay harness guarantees it); a
  * deleted key leaves no tombstone, so an OLDER op replayed after the
  * delete would resurrect it — out of contract, as in any
  * tombstone-free materializer.
  *
  * Scale shape per batch: one map-side-combinable `max_by` over the
  * batch (winners per key), one bounded collect of TOUCHED BUCKET IDS
  * (≤ `nBuckets` values — parameters, not data), a partition-pruned
  * read of just those buckets, one key-partitioned full-outer fold,
  * and a dynamic-overwrite write of the touched buckets only.
  */
object StreamCdc {

  val BucketCol = "_bucket"
  val SeqCol = "_seq"

  private def bucketOf(key: Seq[String], nBuckets: Int) =
    pmod(xxhash64(key.map(col): _*), lit(nBuckets.toLong))

  /** Write the base snapshot (seq 0) as the bucketed target. */
  def initTarget(
      snapshot: DataFrame,
      targetDir: String,
      key: Seq[String],
      nBuckets: Int): Unit =
    snapshot
      .withColumn(SeqCol, lit(0L))
      .withColumn(BucketCol, bucketOf(key, nBuckets))
      .write.mode("overwrite")
      .partitionBy(BucketCol)
      .parquet(targetDir)

  /** Fold one micro-batch of log rows into the target — the
    * `foreachBatch` body. `log` columns: key ++ (seqCol, opCol) ++
    * payload, payload matching the snapshot's non-key columns.
    */
  def foldBatch(
      spark: SparkSession,
      log: DataFrame,
      targetDir: String,
      key: Seq[String],
      seqCol: String,
      opCol: String,
      nBuckets: Int): Unit = {
    val payload = log.columns.filterNot(c =>
      key.contains(c) || c == seqCol || c == opCol).toSeq
    // batch winners per key, carrying their bucket
    val winners = log
      .groupBy(key.map(col): _*)
      .agg(max(struct((seqCol +: opCol +: payload).map(col): _*)).as("_w"))
      .select(key.map(col) ++ Seq(
        col(s"_w.$seqCol").as(SeqCol),
        col(s"_w.$opCol").as("_op")) ++
        payload.map(c => col(s"_w.$c").as(c)): _*)
      .withColumn(BucketCol, bucketOf(key, nBuckets))
      .localCheckpoint(true)
    // bounded: bucket ids are parameters (≤ nBuckets rows), not data
    val touched = winners.select(col(BucketCol)).distinct()
      .collect().map(_.getLong(0))
    if (touched.nonEmpty) {
      val current = spark.read.parquet(targetDir)
        .filter(col(BucketCol).isin(touched.toIndexedSeq: _*))
      // current rows re-enter the fold as op-less 'U' at their stored
      // seq: a batch winner with a newer seq replaces them, an equal
      // seq (restart replay) re-picks the same winner — idempotent
      val folded = current
        .select(key.map(col) ++ Seq(col(SeqCol), lit("U").as("_op")) ++
          payload.map(col) :+ col(BucketCol): _*)
        .unionByName(winners)
        .groupBy(key.map(col): _*)
        .agg(max(struct(Seq(col(SeqCol), col("_op")) ++
          payload.map(col) :+ col(BucketCol): _*)).as("_w"))
        .filter(col(s"_w._op") =!= "D")
        .select(key.map(col) ++ Seq(col(s"_w.$SeqCol").as(SeqCol)) ++
          payload.map(c => col(s"_w.$c").as(c)) :+
          col(s"_w.$BucketCol").as(BucketCol): _*)
        // EAGER checkpoint: cuts lineage (the write overwrites the very
        // path `current` reads — legal only because the fold is fully
        // materialized first) and caches, so the remaining-bucket scan
        // below reads the checkpoint, never recomputing the fold
        .localCheckpoint(true)
      folded.write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BucketCol)
        .parquet(targetDir)
      // dynamic overwrite only replaces partitions PRESENT in the
      // output: a bucket whose last row was deleted produces no output
      // rows, so its stale files must be cleared explicitly (bounded:
      // bucket ids are parameters). Idempotent on restart replay.
      val remaining = folded.select(col(BucketCol)).distinct()
        .collect().map(_.getLong(0)).toSet
      val emptied = touched.filterNot(remaining)
      if (emptied.nonEmpty) {
        val base = new org.apache.hadoop.fs.Path(targetDir)
        val fsys = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
        emptied.foreach { b =>
          fsys.delete(
            new org.apache.hadoop.fs.Path(base, s"$BucketCol=$b"), true)
        }
      }
    }
  }

  /** The materialized current state (drops the bookkeeping columns). */
  def currentState(
      spark: SparkSession,
      targetDir: String): DataFrame =
    spark.read.parquet(targetDir).drop(BucketCol, SeqCol)
}
