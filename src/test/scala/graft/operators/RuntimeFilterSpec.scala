package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("bloomJoin equals the plain inner join (no false negatives)") {
    val probe = spark.range(0, 5000).select(col("id").as("k"), (col("id") * 3).as("pv"))
    val build = spark.range(0, 5000).filter(col("id") % 7 === 0)
      .select(col("id").as("k"), (col("id") + 1).as("bv"))
    val viaBloom = RuntimeFilter.bloomJoin(probe, build, "k", bloomBits = 1 << 12, nHashes = 4)
      .select("k", "pv", "bv").as[(Long, Long, Long)].collect().toSet
    val plain = probe.join(build, Seq("k"))
      .select("k", "pv", "bv").as[(Long, Long, Long)].collect().toSet
    assert(viaBloom == plain)
    assert(viaBloom.size == 715) // ceil(5000/7)
  }

  test("the pruned probe keeps every matching row and drops most non-matches") {
    val probe = spark.range(0, 100000).select(col("id").as("k"))
    val build = spark.range(0, 1000).select(col("id").as("k"))
    val words = RuntimeFilter.bloomWords(build, col("k"), bloomBits = 1 << 16, nHashes = 4)
    val passed = probe.filter(RuntimeFilter.mightContain(col("k"), words, 1 << 16, 4))
      .as[Long].collect().toSet
    assert((0L until 1000L).forall(passed.contains), "false negative: a build key was pruned")
    // 1000 keys in 2^16 bits, 4 hashes => fp rate well under 1%; allow 2%
    assert(passed.size <= 1000 + 2000, s"false-positive blowout: ${passed.size - 1000} extras")
  }

  test("bloom build is deterministic and bounded by sketch size") {
    val build = spark.range(0, 10000).select(concat(lit("key_"), col("id")).as("k"))
    val w1 = RuntimeFilter.bloomWords(build, col("k"), 1 << 14, 3)
    val w2 = RuntimeFilter.bloomWords(build.repartition(7), col("k"), 1 << 14, 3)
    assert(w1.toSeq == w2.toSeq, "word array must not depend on partitioning")
    assert(w1.length == (1 << 14) / 64)
  }

  test("the membership test is scan-side: no exchange below the probe filter") {
    val build = spark.range(0, 100).select(col("id").as("k"))
    val words = RuntimeFilter.bloomWords(build, col("k"), 1 << 10, 4)
    val plan = spark.range(0, 1000).select(col("id").as("k"))
      .filter(RuntimeFilter.mightContain(col("k"), words, 1 << 10, 4))
      .queryExecution.executedPlan
    val hasExchange = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.nonEmpty
    assert(!hasExchange, s"probe-side membership test must not shuffle:\n$plan")
  }
}
