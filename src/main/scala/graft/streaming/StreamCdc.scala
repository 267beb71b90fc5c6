package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming CDC materialization, MERGE-ON-READ with an LSM layout —
  * [[graft.operators.Cdc]] kept current against a live change feed with
  * pure write-through batch cost: each micro-batch APPENDS its rows
  * as-is (L0 — no shuffle, no fold, O(batch) bytes in the batch's own
  * partitioning); reads resolve base ∪ L1 ∪ L0 with the same
  * max-by-(seq, op, payload) winner fold the batch operator uses; and
  * compaction runs lazily in two tiers — L0 folds into bucket-
  * partitioned per-key winner files (L1, tombstones kept) when L0
  * outgrows a rows ratio or a file bound, and an L1 bucket merges into
  * the hash-bucketed base only when ITS winners still exceed
  * `compactRatio` × the bucket's base rows, i.e. the state genuinely
  * grew. The r11 design's touched-bucket REWRITE per batch (O(touched
  * buckets' full contents) write amplification; at 100 TB a
  * uniform-touch feed rewrites the whole snapshot continuously) is now
  * only the amortized, bucket-narrowed maintenance path — exactly the
  * Hudi/Paimon merge-on-read shape.
  *
  * Layout under `targetDir`: the base lives at the ROOT partitioned by
  * `_bucket` (pmod(xxhash64(key), nBuckets) — the [[graft.operators
  * .Upsert]] device, buckets standing in for dates so arbitrary keys
  * localize); raw appends under `_delta/l0` (bucket as a data column),
  * compacted winners under `_delta/l1` (bucket-partitioned). The
  * underscore prefix hides the delta tree from a plain
  * `spark.read.parquet(targetDir)` (Hadoop hides `_`/`.` paths from
  * data-source listing), so the base stays readable as an ordinary
  * bucketed table.
  *
  * Restart contract (single writer — the `foreachBatch` loop): every
  * row carries its sequence (`_seq`; base-snapshot rows seq 0) and
  * delta rows keep their op, so re-appending a replayed batch after
  * checkpoint recovery is IDEMPOTENT IN RESULT — duplicate rows fold
  * to the same winner (max over equal structs), a tombstone whose key
  * was already compacted away re-drops nothing, an 'I'/'U' already
  * folded re-picks the equal-seq winner. Both compaction tiers write
  * APPEND-THEN-DELETE (new files land before old ones are removed), so
  * any crash point leaves a readable state whose fold is unchanged;
  * only the L1→base merge inherits the dynamic-partition-overwrite
  * window the r11 per-batch fold already had. The feed must arrive in
  * non-decreasing sequence order across batches (a CDC stream's offset
  * order); a deleted key's tombstone lives in L0/L1 until its bucket
  * merges, after which the key is absent from the base — an OLDER op
  * replayed after that is out of contract, as in any
  * tombstone-expiring materializer.
  *
  * Scale shape per batch: ONE APPEND of the batch's rows (no exchange
  * — the only per-batch distributed work) plus a parquet-footer row
  * count of L0 (no data pages). Tier-1 (L0→L1) folds L0 ∪ L1 to
  * per-key winners — O(delta), base untouched; under repeated
  * key-touch this collapses cumulative deltas to ~distinct-keys, so a
  * uniform-update feed never rewrites the base between reads. Tier-2
  * (L1→base) runs the key-partitioned max_by + dynamic overwrite, but
  * ONLY for buckets past `compactRatio` — amortized O(1) rewrites per
  * appended row. Reads pay one fold of base ∪ L1 ∪ L0, bounded by the
  * ratios at ~(1 + 2·compactRatio) × base + one batch.
  */
object StreamCdc {

  val BucketCol = "_bucket"
  val SeqCol = "_seq"
  val DeltaDir = "_delta"

  private def l0Dir(targetDir: String) = s"$targetDir/$DeltaDir/l0"
  private def l1Dir(targetDir: String) = s"$targetDir/$DeltaDir/l1"

  private def bucketOf(key: Seq[String], nBuckets: Int) =
    pmod(xxhash64(key.map(col): _*), lit(nBuckets.toLong))

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def nonEmptyDir(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fsys = fs(spark, dir)
    fsys.exists(p) && fsys.listStatus(p).exists(s =>
      s.isDirectory || s.getPath.getName.endsWith(".parquet"))
  }

  /** Write the base snapshot (seq 0) as the bucketed target; clears any
    * stale delta tree from a previous materialization. */
  def initTarget(
      snapshot: DataFrame,
      targetDir: String,
      key: Seq[String],
      nBuckets: Int): Unit = {
    snapshot
      .withColumn(SeqCol, lit(0L))
      .withColumn(BucketCol, bucketOf(key, nBuckets))
      .write.mode("overwrite")
      .partitionBy(BucketCol)
      .parquet(targetDir)
    fs(snapshot.sparkSession, targetDir)
      .delete(new Path(targetDir, DeltaDir), true)
    statsCache.synchronized { statsCache.remove(targetDir) }
  }

  /** The shared winner fold: rows carrying (key, _seq, _op, payload,
    * _bucket) collapse to the max-by-(seq, op, payload) winner per key.
    * Base rows re-enter as op-less 'U' at their stored seq, so a delta
    * with a newer seq replaces them and an equal-seq replay re-picks
    * the same winner — idempotent. With `keepTombstones` the 'D'
    * winners survive as rows (L1 needs them to keep masking the base);
    * without, they drop (base merge / read resolution). */
  private def foldWinners(
      rows: DataFrame,
      key: Seq[String],
      payload: Seq[String],
      keepTombstones: Boolean = false): DataFrame = {
    val folded = rows
      .groupBy(key.map(col): _*)
      .agg(max(struct(Seq(col(SeqCol), col("_op")) ++
        payload.map(col) :+ col(BucketCol): _*)).as("_w"))
    val kept =
      if (keepTombstones) folded else folded.filter(col(s"_w._op") =!= "D")
    kept.select(key.map(col) ++ Seq(col(s"_w.$SeqCol").as(SeqCol),
        col(s"_w._op").as("_op")) ++
        payload.map(c => col(s"_w.$c").as(c)) :+
        col(s"_w.$BucketCol").as(BucketCol): _*)
  }

  private def baseAsU(
      base: DataFrame,
      key: Seq[String],
      payload: Seq[String]): DataFrame =
    base.select(key.map(col) ++ Seq(col(SeqCol), lit("U").as("_op")) ++
      payload.map(col) :+ col(BucketCol).cast("long").as(BucketCol): _*)

  /** Normalized delta projection: key ++ (_seq, _op) ++ payload ++
    * _bucket cast long (partition-dir read-back infers Int) — the
    * layout both delta levels share and [[currentState]] recovers the
    * key from. */
  private def deltaCols(
      key: Seq[String],
      payload: Seq[String]): Seq[org.apache.spark.sql.Column] =
    key.map(col) ++ Seq(col(SeqCol), col("_op")) ++
      payload.map(col) :+ col(BucketCol).cast("long").as(BucketCol)

  /** Land one micro-batch of log rows — the `foreachBatch` body. `log`
    * columns: key ++ (seqCol, opCol) ++ payload, payload matching the
    * snapshot's non-key columns. Appends the batch AS-IS (write-through,
    * zero shuffle), then compacts lazily per the ratio/file triggers.
    */
  def foldBatch(
      spark: SparkSession,
      log: DataFrame,
      targetDir: String,
      key: Seq[String],
      seqCol: String,
      opCol: String,
      nBuckets: Int,
      compactRatio: Double = 2.0,
      maxDeltaFiles: Int = 16): Unit = {
    val payload = log.columns.filterNot(c =>
      key.contains(c) || c == seqCol || c == opCol).toSeq
    // THE per-batch write: the batch's rows, normalized and appended in
    // the batch's own partitioning — O(batch) bytes, no exchange, no
    // base file touched (StreamCdcSpec pins both)
    log
      .select(key.map(col) ++ Seq(
        col(seqCol).as(SeqCol), col(opCol).as("_op")) ++
        payload.map(col): _*)
      .withColumn(BucketCol, bucketOf(key, nBuckets))
      .write.mode("append")
      .parquet(l0Dir(targetDir))

    // L0 trigger: parquet-footer row count (no data pages) + a driver
    // file listing (both bounded by the triggers themselves). The ratio
    // compares L0 to base PLUS L1 — L1 is already-merged state, so
    // counting it in the denominator makes the trigger size-tiered:
    // each appended row is re-folded O(log) times, not once per batch
    // (a base-only denominator re-folds the cumulative delta every few
    // batches — measured 6-7 s per fold at sf10 before this fix).
    val fsys = fs(spark, targetDir)
    val l0Files = fsys.listStatus(new Path(l0Dir(targetDir)))
      .count(_.getPath.getName.endsWith(".parquet"))
    val l0Rows = spark.read.parquet(l0Dir(targetDir)).count()
    val (baseRows, l1Rows) = statsCache.synchronized {
      statsCache.getOrElseUpdate(targetDir, (
        spark.read.parquet(targetDir).count(),
        if (nonEmptyDir(spark, l1Dir(targetDir)))
          spark.read.parquet(l1Dir(targetDir)).count()
        else 0L))
    }
    if (l0Rows > compactRatio * math.max(baseRows + l1Rows, 1L) ||
        l0Files > maxDeltaFiles) {
      statsCache.synchronized { statsCache.remove(targetDir) }
      compactL0(spark, targetDir, key, payload)
      // tier 2 — merge a bucket's winners into the base only if STILL
      // over ratio after the shrink (the state genuinely grew)
      def bucketCounts(dir: String): Map[Long, Long] =
        spark.read.parquet(dir)
          .groupBy(col(BucketCol).cast("long").as(BucketCol)).count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val l1Cnt =
        if (nonEmptyDir(spark, l1Dir(targetDir))) bucketCounts(l1Dir(targetDir))
        else Map.empty[Long, Long]
      val baseCnt = bucketCounts(targetDir)
      val toMerge = l1Cnt.keys.filter(b => l1Cnt(b) >
        compactRatio * math.max(baseCnt.getOrElse(b, 0L), 1L)).toSeq.sorted
      if (toMerge.nonEmpty)
        mergeIntoBase(spark, targetDir, key, payload, toMerge)
    }
  }

  /** base/L1 row counts per target — a pure CACHE of parquet footer
    * sums that change only under this object's own compactions (single
    * writer). Invalidated on compaction; a process restart just
    * recomputes on first use. Correctness never depends on it — a
    * stale value can only shift WHEN a compaction triggers by one
    * batch. */
  private val statsCache =
    scala.collection.mutable.Map.empty[String, (Long, Long)]

  /** Tier-1 compaction: fold L0 ∪ L1 to per-key winners (tombstones
    * kept) and rewrite L1, clearing L0 — O(delta) work, base untouched.
    * Crash-safe by LAND-then-DELETE: the folded winners are written to
    * a tmp dir (one materialization — no checkpoint double-write),
    * MOVED file-by-file into L1 (rename, no data copy), and only then
    * are the old L0/L1 files removed; any crash point leaves a readable
    * state whose fold is unchanged (duplicate rows fold to the same
    * winner). Single writer, as everywhere in this materializer. */
  private def compactL0(
      spark: SparkSession,
      targetDir: String,
      key: Seq[String],
      payload: Seq[String]): Unit = {
    val fsys = fs(spark, targetDir)
    def files(dir: String): Seq[Path] = {
      val p = new Path(dir)
      if (!fsys.exists(p)) Seq.empty
      else fsys.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) fsys.listStatus(s.getPath)
          .filter(_.isFile).map(_.getPath).toSeq
        else if (s.getPath.getName.endsWith(".parquet")) Seq(s.getPath)
        else Seq.empty
      }
    }
    // stale tmp dirs from a crashed compaction hold only duplicates of
    // rows still present in L0/L1 — clear them before a new attempt
    fsys.listStatus(new Path(s"$targetDir/$DeltaDir"))
      .filter(_.getPath.getName.startsWith("l1.tmp-"))
      .foreach(s => fsys.delete(s.getPath, true))
    val old = files(l0Dir(targetDir)) ++ files(l1Dir(targetDir))
    val l0 = spark.read.parquet(l0Dir(targetDir))
      .select(deltaCols(key, payload): _*)
    val both =
      if (nonEmptyDir(spark, l1Dir(targetDir)))
        l0.unionByName(spark.read.parquet(l1Dir(targetDir))
          .select(deltaCols(key, payload): _*))
      else l0
    // cluster by bucket: a partitionBy write otherwise fans every task
    // into every bucket dir (tasks × buckets small files)
    val tmp = s"$targetDir/$DeltaDir/l1.tmp-${System.nanoTime()}"
    foldWinners(both, key, payload, keepTombstones = true)
      .repartition(col(BucketCol))
      .write.partitionBy(BucketCol).parquet(tmp)
    // land the new winner files inside L1 (renames), then drop the old
    val stamp = System.nanoTime()
    fsys.listStatus(new Path(tmp)).filter(_.isDirectory).foreach { d =>
      val dst = new Path(l1Dir(targetDir), d.getPath.getName)
      fsys.mkdirs(dst)
      fsys.listStatus(d.getPath).filter(_.isFile).foreach { f =>
        val to = new Path(dst, s"c$stamp-${f.getPath.getName}")
        // Hadoop FileSystems signal most rename failures by RETURNING
        // false, not throwing — swallowing it here would delete the old
        // L0/L1 rows below while the folded winner never landed
        // (permanent data loss in the crash-safety path). Throw before
        // any delete: the stale tmp dir is cleaned up on the next attempt.
        if (!fsys.rename(f.getPath, to))
          throw new java.io.IOException(
            s"compactL0: rename ${f.getPath} -> $to returned false; " +
              "aborting before deleting source L0/L1 files")
      }
    }
    old.foreach(p => fsys.delete(p, false))
    fsys.delete(new Path(tmp), true)
  }

  /** Tier-2: fold the given buckets' L1 winners into the base and clear
    * them — the r11 touched-bucket rewrite, demoted to the amortized
    * maintenance path and narrowed to over-ratio buckets. */
  private def mergeIntoBase(
      spark: SparkSession,
      targetDir: String,
      key: Seq[String],
      payload: Seq[String],
      buckets: Seq[Long]): Unit = {
    statsCache.synchronized { statsCache.remove(targetDir) }
    val bs = buckets.toIndexedSeq
    val current = spark.read.parquet(targetDir)
      .filter(col(BucketCol).isin(bs: _*))
    val deltas = spark.read.parquet(l1Dir(targetDir))
      .filter(col(BucketCol).isin(bs: _*))
      .select(deltaCols(key, payload): _*)
    val folded = foldWinners(
      baseAsU(current, key, payload).unionByName(deltas), key, payload)
      .drop("_op")
      // EAGER checkpoint: cuts lineage (the write overwrites the very
      // path `current` reads — legal only because the fold is fully
      // materialized first) and caches, so the emptied-bucket scan
      // below reads the checkpoint, never recomputing the fold
      .localCheckpoint(true)
    folded.repartition(col(BucketCol))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BucketCol)
      .parquet(targetDir)
    // dynamic overwrite only replaces partitions PRESENT in the output:
    // a bucket whose last row was deleted produces no output rows, so
    // its stale base files must be cleared explicitly (bounded: bucket
    // ids are parameters). Idempotent on restart replay.
    val remaining = folded.select(col(BucketCol).cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    val fsys = fs(spark, targetDir)
    buckets.filterNot(remaining).foreach { b =>
      fsys.delete(new Path(targetDir, s"$BucketCol=$b"), true)
    }
    // winners now folded into the base — clear them (single-writer:
    // nothing appends between the read above and this delete)
    buckets.foreach { b =>
      fsys.delete(new Path(s"${l1Dir(targetDir)}/$BucketCol=$b"), true)
    }
  }

  /** The materialized current state: base ∪ L1 ∪ L0 resolved with the
    * winner fold (drops the bookkeeping columns). One shuffle, bounded
    * by the compaction ratios at ~(1 + 2·ratio) × base + one batch. */
  def currentState(
      spark: SparkSession,
      targetDir: String): DataFrame = {
    val base = spark.read.parquet(targetDir)
    val levels = Seq(l1Dir(targetDir), l0Dir(targetDir))
      .filter(nonEmptyDir(spark, _))
      .map(spark.read.parquet(_))
    if (levels.isEmpty) base.drop(BucketCol, SeqCol)
    else {
      // the key set is not stored, but the delta projection is
      // key ++ (_seq, _op) ++ payload (+ _bucket), so the delta's
      // columns BEFORE _seq are exactly the key
      val keyCols = levels.head.columns.takeWhile(_ != SeqCol).toSeq
      val payload = base.columns.toSeq
        .filterNot(c => c == BucketCol || c == SeqCol || keyCols.contains(c))
      val deltas = levels
        .map(_.select(deltaCols(keyCols, payload): _*))
        .reduce(_ unionByName _)
      foldWinners(
        baseAsU(base, keyCols, payload).unionByName(deltas),
        keyCols, payload)
        .drop(BucketCol, SeqCol, "_op")
    }
  }
}
