package graft.operators

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain inner join") {
    // skewed left: 90 rows on key 1, a few elsewhere
    val left = ((1 to 90).map(i => (1L, i.toLong)) ++ Seq((2L, 91L), (3L, 92L)))
      .toDF("k", "row_id")
    val right = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "v")
    val salted = Skew.saltedJoin(left, right, "k", "row_id", 4)
      .select("k", "row_id", "v").as[(Long, Long, String)].collect().toSet
    val plain = left.join(right, "k")
      .select("k", "row_id", "v").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 91)
  }

  test("AQE splits a skewed sort-merge join at runtime (scale path sanity)") {
    // one hot key carrying ~all rows; thresholds lowered so local-scale data
    // trips the same optimizer decision a hot key would at 100 TB
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val left = spark.range(200000).select(
        when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("row_id"))
      val right = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      // collect() executes THIS query execution, finalizing the adaptive plan
      // (count() would plan a separate aggregate query)
      val n = joined.collect().length
      // 198000 rows on hot key 7 + 10 cold ids (0,100,…,900) matching right
      assert(n == 198010)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot-key join with skew=true:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
