package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write-side helpers: partitioned and bucketed parquet layouts.
  *
  * The reference materializes incremental dbt models with `cluster_by`
  * (e.g. models/intermediate/int_transactions.sql config) so downstream
  * reads prune; the Spark-native equivalents are (a) directory partitioning
  * for coarse pruning keys (dates), and (b) hash bucketing for join keys —
  * two tables bucketed on the same key join with zero shuffle.
  */
object Sink {

  /** Directory-partitioned parquet — partition pruning for free on
    * `partitionCols` predicates. Choose low-cardinality columns (date, not
    * user id): each distinct tuple is a directory.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Hash-bucketed table (requires the session catalog/warehouse). Joins and
    * aggregations on `bucketCols` between tables with the same bucket spec
    * run shuffle-free.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
