package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Replays a bounded DataFrame through the REAL file-stream source in
  * deterministic event-time order across MULTIPLE micro-batches — the gate
  * and test harness for cross-batch stateful semantics.
  *
  * [[writeOrdered]] range-partitions the frame on an event-time (or any
  * monotone ordering) column into `chunks` files whose value ranges are
  * non-overlapping and ascending (`repartitionByRange` partition ids are
  * range-ordered), then stamps strictly ascending modification times on
  * the part files in partition order. [[stream]] reads them back with
  * `maxFilesPerTrigger=1`; the file source processes pending files oldest
  * modification time first (`latestFirst=false`, the default), so
  * micro-batch k+1 carries only event times ≥ every event time in batch k
  * — ties can sit on a range boundary but never invert. This is the
  * production shape of a date-partitioned landing zone whose files arrive
  * in event-time order, compressed into a bounded deterministic replay.
  *
  * Harness, not operator: the global range partition is priced per gate
  * invocation on gate-sized data. A production backfill already HAS
  * time-ordered files and needs none of this.
  */
object FileReplay {

  /** Write `df` as `chunks` ascending-range files under `dir` (replaced),
    * ordered by `orderCols` (rows tied on the first column are kept
    * together or split in tail-column order — pass the tie-break column
    * too when cross-batch tie order matters, e.g. (ts, event_id)). */
  def writeOrdered(df: DataFrame, orderCols: Seq[String], chunks: Int, dir: String): Unit = {
    require(orderCols.nonEmpty, "orderCols must not be empty")
    // no sortWithinPartitions: only the CROSS-file range boundaries
    // carry the ordering contract (batch k+1's event times ≥ batch k's);
    // a micro-batch engine never guarantees row order WITHIN a batch —
    // any operator depending on it would already be broken by the first
    // shuffle — so the per-partition sort was pure harness cost
    // (~4 s of a 15M-row replay at sf10)
    df.repartitionByRange(chunks, orderCols.map(col): _*)
      .write.mode("overwrite").parquet(dir)
    val produced = partFiles(dir)
    // range partitioning writes no part file for an empty range, so ties or
    // low cardinality on orderCols can yield fewer files than requested —
    // fail HERE with the cause, not downstream in a >=N-micro-batch assert
    if (produced.length < chunks)
      throw new IllegalStateException(
        s"writeOrdered produced ${produced.length} part files but $chunks were requested: " +
          s"the input has too few distinct values (or too much skew) on " +
          s"${orderCols.mkString("(", ", ", ")")} to fill $chunks ranges — " +
          s"lower the chunk count or add a finer tie-break column")
    stampAscending(produced)
  }

  /** Append one more file (e.g. a sentinel batch) AFTER everything already
    * in `dir`: written as a single part file, renamed to sort last, and
    * stamped with a later modification time than any existing file. */
  def appendFile(df: DataFrame, dir: String): Unit = {
    val tmp = dir + ".append-" + System.nanoTime()
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val src = partFiles(tmp) match {
      case Array(one) => one
      case other => throw new IllegalStateException(
        s"expected exactly one part file in $tmp, found ${other.length}")
    }
    val existing = partFiles(dir)
    val n = existing.length
    val dst = new java.io.File(dir, f"part-z$n%05d-${System.nanoTime()}%d.snappy.parquet")
    if (!src.renameTo(dst))
      throw new IllegalStateException(s"could not move $src to $dst")
    deleteRecursively(new java.io.File(tmp))
    val latest = if (existing.isEmpty) System.currentTimeMillis() - 3600000L
      else existing.map(_.lastModified()).max
    require(dst.setLastModified(latest + 2000L), s"could not stamp mtime on $dst")
  }

  /** Stream `dir` back one file per micro-batch, oldest mtime first. */
  def stream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Recursive delete for harness temp dirs (input replays, checkpoints). */
  def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }

  private def partFiles(dir: String): Array[java.io.File] = {
    val fs = new java.io.File(dir).listFiles()
    if (fs == null) Array.empty
    else fs.filter(f => f.isFile && f.getName.startsWith("part-")).sortBy(_.getName)
  }

  /** Strictly ascending mtimes, 2 s apart, all in the past (the file
    * source keys its processing order on modification time). */
  private def stampAscending(files: Array[java.io.File]): Unit = {
    val base = System.currentTimeMillis() - (files.length + 2) * 2000L
    files.zipWithIndex.foreach { case (f, i) =>
      require(f.setLastModified(base + i * 2000L), s"could not stamp mtime on $f")
    }
  }
}
