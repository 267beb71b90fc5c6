package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("writePartitioned lays out partition directories and prunes on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0))
      .toDF("id", "day", "v")
    Sink.writePartitioned(df, dir, Seq("day"))
    assert(new java.io.File(s"$dir/day=2024-01-01").exists())
    val read = spark.read.parquet(dir).filter($"day" === "2024-01-02")
    assert(read.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    Seq("bucketed_a", "bucketed_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    val a = (1L to 100L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "vb")
    Sink.writeBucketed(a, "bucketed_a", Seq("k"), 4)
    Sink.writeBucketed(b, "bucketed_b", Seq("k"), 4)
    // force a sort-merge join so the plan demonstrates bucketing (broadcast
    // would win at this toy size and hide it)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketing not used:\n$plan")
      assert(joined.count() == 100L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
