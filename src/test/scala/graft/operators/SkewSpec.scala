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

  test("adviseJoin: broadcast for a dim-sized side, shuffle when balanced, salt on a hot key") {
    import org.apache.spark.sql.functions._
    def cm(df: org.apache.spark.sql.DataFrame) =
      Sketch.countMinCounters(df, Nil, col("k"), depth = 4, width = 1024, seed = 5L)
    val uniformA = cm(spark.range(5000).select(pmod(col("id"), lit(500)).as("k")))
    val uniformB = cm(spark.range(6000).select(pmod(col("id"), lit(600)).as("k")))
    val dim = cm(spark.range(40).select(col("id").as("k")))
    // hot key: 3000 of 5000 rows land on key -1
    val hot = cm(spark.range(5000).select(
      when(col("id") < 3000, lit(-1L)).otherwise(col("id")).as("k")))

    val b = Skew.adviseJoin(uniformA, dim, broadcastMaxRows = 100L,
      hotKeyThreshold = 500L).collect().head
    assert(b.getAs[String]("decision") == "broadcast")
    assert(b.getAs[String]("broadcast_side") == "b")
    assert(b.getAs[Long]("n_rows_a") == 5000L && b.getAs[Long]("n_rows_b") == 40L)

    val sh = Skew.adviseJoin(uniformA, uniformB, broadcastMaxRows = 100L,
      hotKeyThreshold = 500L).collect().head
    assert(sh.getAs[String]("decision") == "shuffle")
    assert(sh.getAs[Long]("salt_buckets") == 1L)

    val sa = Skew.adviseJoin(hot, uniformB, broadcastMaxRows = 100L,
      hotKeyThreshold = 500L).collect().head
    assert(sa.getAs[String]("decision") == "salt")
    // hot_a is an upper bound on the hottest key (3000 repeats)
    assert(sa.getAs[Long]("hot_a") >= 3000L)
    // ceil(hot / threshold) buckets: at least 6
    assert(sa.getAs[Long]("salt_buckets") >= 6L)
  }

  test("adviseJoin cardinalities: n_rows exact, est_pairs >= true join size") {
    import org.apache.spark.sql.functions._
    val a = spark.range(2000).select(pmod(col("id"), lit(100)).as("k"))
    val b = spark.range(3000).select(pmod(col("id"), lit(150)).as("k"))
    def cm(df: org.apache.spark.sql.DataFrame) =
      Sketch.countMinCounters(df, Nil, col("k"), depth = 4, width = 1024, seed = 5L)
    val adv = Skew.adviseJoin(cm(a), cm(b), 10L, 1000000L).collect().head
    assert(adv.getAs[Long]("n_rows_a") == 2000L)
    assert(adv.getAs[Long]("n_rows_b") == 3000L)
    val truePairs = a.join(b, "k").count()
    assert(adv.getAs[Long]("est_pairs") >= truePairs)
  }

  test("executeAdvised: broadcast / sort-merge / salted plans, identical content") {
    import org.apache.spark.sql.functions._
    val factA = spark.range(5000)
      .select(pmod(col("id"), lit(500)).as("k"), col("id").as("a_id"))
    val factB = spark.range(6000)
      .select(pmod(col("id"), lit(600)).as("k"), (col("id") + 7).as("b_id"))
    val dim = spark.range(40).select(col("id").as("k"), (col("id") * 2).as("b_id"))
    val hot = spark.range(5000)
      .select(when(col("id") < 3000, lit(-1L)).otherwise(col("id")).as("k"),
        col("id").as("a_id"))
    def run(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Skew.executeAdvised(a, b, "k", "a_id", "b_id",
        broadcastMaxRows = 100L, hotKeyThreshold = 500L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().sorted.toSeq
    // the three scenarios take three DISTINCT physical strategies...
    val bPlan = run(factA, dim).queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin"), s"dim scenario must broadcast:\n$bPlan")
    val shPlan = run(factA, factB).queryExecution.executedPlan.toString
    assert(shPlan.contains("SortMergeJoin") && !shPlan.contains("BroadcastHashJoin"),
      s"balanced scenario must sort-merge:\n$shPlan")
    val saPlan = run(hot, factB).queryExecution.executedPlan.toString
    assert(saPlan.contains("_salt"), s"hot scenario must salt:\n$saPlan")
    // ...and every strategy preserves the plain join's content exactly
    assert(rows(run(factA, dim)) == rows(factA.join(dim, Seq("k"))))
    assert(rows(run(factA, factB)) == rows(factA.join(factB, Seq("k"))))
    assert(rows(run(hot, factB)) == rows(hot.join(factB, Seq("k"))))
    // replication guard: a salt decision whose replicated side ×buckets
    // exceeds the factor bound degrades to the plain sort-merge shuffle
    val guarded = Skew.executeAdvised(hot, factB, "k", "a_id", "b_id",
      broadcastMaxRows = 100L, hotKeyThreshold = 500L,
      maxReplicationFactor = 1L)
    val gPlan = guarded.queryExecution.executedPlan.toString
    assert(!gPlan.contains("_salt") && gPlan.contains("SortMergeJoin"),
      s"over-replicating salt must degrade to shuffle:\n$gPlan")
    assert(rows(guarded) == rows(hot.join(factB, Seq("k"))))
    // shared non-key column names are rejected up front, not at analysis
    val clash = factB.withColumnRenamed("b_id", "a_id")
    assertThrows[IllegalArgumentException] {
      Skew.executeAdvised(factA, clash, "k", "a_id", "a_id", 100L, 500L)
    }
  }
}
