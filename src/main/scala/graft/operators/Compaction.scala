package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction: rewrite a parquet table into size-targeted files
  * without changing its content.
  *
  * The operational reality of every streaming/incremental pipeline (and of
  * this library's own FileStreamSink and upsert paths): each micro-batch or
  * merge cycle appends a few small files, and a year later the table is a
  * million 2 MB files whose open/footer overhead dominates scan cost and
  * whose listing breaks planning. Compaction is the maintenance operator
  * that folds them back into ~`targetBytes` files. Design rules at 100 TB:
  *
  *  - sizing comes from FILE METADATA (one driver-side listing, bounded by
  *    file count — never a data read);
  *  - the rewrite is `repartition(n)` — round-robin, no key, because the
  *    goal is file count, not clustering (compose with [[Layout.zOrderBy]]
  *    when layout should change too);
  *  - content identity is the contract: compaction must be a no-op on the
  *    row multiset, which is exactly what the gate hash-checks (read-back
  *    of the compacted copy vs the oracle over the ORIGINAL files);
  *  - per-partition directories compact independently in a real lakehouse
  *    (only partitions whose small-file count crosses a threshold rewrite);
  *    here the unit is one directory — the primitive that per-partition
  *    loops call.
  */
object Compaction {

  /** Parquet data files under `dir` (recursively), ignoring metadata
    * sidecars (`_spark_metadata`, `_SUCCESS`).
    */
  def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(dir), true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && name.endsWith(".parquet") && !name.startsWith("_") &&
        !f.getPath.toString.contains("_spark_metadata"))
        out += ((f.getPath.toString, f.getLen))
    }
    out.toSeq
  }

  /** Compact `inputDir` into `outputDir` targeting `targetBytes` per file:
    * n_out = ceil(total_bytes / targetBytes). Returns (files_before,
    * files_after, bytes_total). Content is untouched — round-robin
    * repartition only changes the file boundaries.
    */
  def compact(spark: SparkSession, inputDir: String, outputDir: String,
      targetBytes: Long): (Int, Int, Long) = {
    require(targetBytes > 0)
    val files = dataFiles(spark, inputDir)
    val total = files.map(_._2).sum
    val nOut = math.max(1, ((total + targetBytes - 1) / targetBytes).toInt)
    spark.read.parquet(inputDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outputDir)
    (files.size, dataFiles(spark, outputDir).size, total)
  }
}
