package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def withStrategy[T](f: => T): T = {
    spark.experimental.extraStrategies = Seq(TopKStrategy)
    try f finally spark.experimental.extraStrategies = Nil
  }

  test("TopK.perKey matches window row_number filter, without a sort in the plan") {
    withStrategy {
      val df = Seq(
        ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 40.0),
        ("b", 5L, 5.0), ("b", 6L, 15.0)
      ).toDF("g", "id", "score")
      val topk = TopK.perKey(df, Seq("g"), Seq($"score".desc, $"id".asc), 2)
      val got = topk.select("g", "id").as[(String, Long)].collect().toSet
      assert(got == Set(("a", 4L), ("a", 2L), ("b", 6L), ("b", 5L)))
      val plan = topk.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey")) // exec nodes print without the Exec suffix
      assert(!plan.contains("Sort "), s"expected heap-based top-k, no sort:\n$plan")
    }
  }

  test("TopK.perKey spill path (tiny threshold) matches the in-memory result") {
    withStrategy {
      val prev = spark.conf.getOption("graft.topk.spillThreshold")
      spark.conf.set("graft.topk.spillThreshold", "16") // force many spill runs
      try {
        val df = spark.range(5000).select(
          (col("id") % 101).as("g"), col("id"), (col("id") * 131 % 997).as("score"))
        val topk = TopK.perKey(df, Seq("g"), Seq(col("score").desc, col("id").asc), 4)
          .select("g", "id").as[(Long, Long)].collect().toSet
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
        val expected = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
          .select("g", "id").as[(Long, Long)].collect().toSet
        assert(topk == expected)
      } finally {
        prev match {
          case Some(v) => spark.conf.set("graft.topk.spillThreshold", v)
          case None => spark.conf.unset("graft.topk.spillThreshold")
        }
      }
    }
  }

  test("TopK.perKey handles ties-free total order deterministically across partitions") {
    withStrategy {
      val df = spark.range(1000).select(
        (col("id") % 7).as("g"), col("id"), (col("id") * 31 % 97).as("score"))
      val topk = TopK.perKey(df, Seq("g"), Seq(col("score").desc, col("id").asc), 3)
        .select("g", "id").as[(Long, Long)].collect().toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
      val expected = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("g", "id").as[(Long, Long)].collect().toSet
      assert(topk == expected)
    }
  }
}
