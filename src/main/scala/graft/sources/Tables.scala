package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Schema-typed loaders for the driver test tables.
  *
  * Reads go through `spark.read.parquet` so Catalyst handles column pruning
  * and predicate pushdown; callers should `select` only the columns they
  * need immediately after load so `ReadSchema` stays narrow at 100 TB.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** CSV ingest with an explicit schema — the reference seeds its raw layer
    * from CSV (demo/seeds); schema-on-read with a declared StructType keeps
    * the scan single-pass (no inference job) and types stable.
    */
  def loadCsv(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** JSON-lines ingest with an explicit schema (e.g. raw OCPP log frames). */
  def loadJson(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark only reads via
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench/specs).
    * Convert the raw nanos to a microsecond timestamp here so downstream
    * operators see a plain TimestampType column.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      // legacy generator: nanosecond INT64 read as plain bigint
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // micros with isAdjustedToUTC=false reads as NTZ; with the session
      // timezone pinned to UTC the cast is the identity on wall values —
      // the same instant DuckDB sees reading the file natively
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
