package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Child-JVM harness for the executor-loss soak (ExecutorLossSpec): runs a
  * REAL multi-process cluster (`local-cluster[2,2,1024]` — standalone
  * master + 2 workers in the driver JVM, 4 executor cores across 2
  * SEPARATE executor JVMs) and executes either a shuffle-heavy batch
  * aggregation or a multi-micro-batch file stream, while the parent spec
  * SIGKILLs one executor JVM mid-query from outside. The queries are
  * deterministic (exact integer checksums), so the parent can compare the
  * post-kill answer against the same query on its own unharmed session —
  * shuffle-retry and stream-recovery must change NOTHING.
  *
  * Markers on stdout (`HARNESS_QUERY_START` / `HARNESS_QUERY_END`) let the
  * parent prove the kill landed mid-query, not after.
  */
object FaultHarness {

  /** The batch leg: a two-exchange aggregation whose map side is slowed by
    * sha2 (so the kill window is seconds wide) and whose answer is an
    * exact integer — per-key long sums folded mod p. */
  def batchChecksum(spark: SparkSession, n: Long): Long =
    spark.range(0L, n, 1L, 16)
      .select(
        substring(sha2(col("id").cast("string"), 256), 1, 2).as("k"),
        col("id"))
      .groupBy(col("k"))
      .agg(sum(col("id")).as("s"))
      .agg(sum(pmod(col("s"), lit(1000000007L))).cast("long").as("chk"))
      .collect()(0).getLong(0)

  /** Per-batch fold for the streaming leg: same sha2-slowed exact-integer
    * checksum over one micro-batch's rows. */
  def batchFold(b: DataFrame): Long =
    b.select(
        pmod(
          conv(substring(sha2(col("id").cast("string"), 256), 1, 8), 16, 10)
            .cast("long"),
          lit(1000000007L)).as("h"))
      .agg(sum(col("h")).cast("long"))
      .collect()(0).getLong(0)

  /** Reference total for the streaming leg: [[batchFold]] over the whole
    * id range at once (the fold is a plain sum — batch-order-free). */
  def streamChecksum(spark: SparkSession, n: Long): Long =
    batchFold(spark.range(0L, n, 1L, 4).toDF("id"))

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val out = args(1)
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val testClasses = new java.io.File("target/scala-2.13/test-classes").getAbsolutePath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,1024]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.executor.extraClassPath", s"$classes:$testClasses")
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-fault-harness")
      .getOrCreate()
    try {
      val result = mode match {
        case "batch" =>
          println("HARNESS_QUERY_START"); Console.out.flush()
          val chk = batchChecksum(spark, 24000000L)
          println("HARNESS_QUERY_END"); Console.out.flush()
          s"$chk"
        case "stream" =>
          // five parquet files land before the stream starts; AvailableNow
          // + maxFilesPerTrigger=1 replays them as five real micro-batches
          val dir = java.nio.file.Files.createTempDirectory("graft_fault_in").toString
          val perFile = 600000L
          (0 until 5).foreach { i =>
            spark.range(i * perFile, (i + 1) * perFile, 1L, 1).toDF("id")
              .write.mode("append").parquet(dir)
          }
          val ckpt = java.nio.file.Files.createTempDirectory("graft_fault_ck").toString
          var total = 0L
          var batches = 0L
          println("HARNESS_QUERY_START"); Console.out.flush()
          val q = spark.readStream
            .schema("id BIGINT")
            .option("maxFilesPerTrigger", "1")
            .parquet(dir)
            .writeStream
            .foreachBatch { (b: DataFrame, _: Long) =>
              total += batchFold(b)
              batches += 1
            }
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          println("HARNESS_QUERY_END"); Console.out.flush()
          s"$total $batches"
      }
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), result)
    } finally spark.stop()
  }
}
