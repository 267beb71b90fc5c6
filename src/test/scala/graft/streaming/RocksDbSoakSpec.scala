package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** S4/S5 scale check on the production state-store backend: the RocksDB
  * provider (the store a 1000-executor cluster would run — state lives off
  * the JVM heap and spills to local SSD, so per-executor state is bounded
  * by disk, not memory). Thousands of entities over a multi-batch soak:
  * state must stay O(entities) — one row per key — and must NOT grow with
  * the number of processed batches, which is what makes the heartbeat
  * operator viable over unbounded streams.
  */
class RocksDbSoakSpec extends SparkSpec {
  import spark.implicits._
  import StreamHeartbeat._

  private val Entities = 2000
  private val Batches = 6

  test("S4 heartbeat gaps on RocksDB: state stays O(entities) across a soak") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Heartbeat]
      val out = StreamHeartbeat.gaps(input.toDS(), thresholdSeconds = 300L)
      val query = out.writeStream.format("memory").queryName("rocks_out")
        .outputMode("append").start()
      try {
        val base = sqlTs("2024-01-01 10:00:00").getTime
        // each batch advances 10 min (> the 5-min threshold), so every
        // entity closes a gap every batch — constant churn through the store
        (0 until Batches).foreach { b =>
          input.addData((0 until Entities).map(k =>
            Heartbeat(k.toLong, new java.sql.Timestamp(base + b * 600000L))))
          query.processAllAvailable()
        }
        val progresses = query.recentProgress.filter(_.stateOperators.nonEmpty)
        assert(progresses.nonEmpty, "no state operator progress recorded")
        val stateRows = progresses.map(_.stateOperators.head.numRowsTotal)
        // O(entities): one state row per key, never more
        assert(stateRows.last == Entities.toLong,
          s"state rows ${stateRows.last} != $Entities entities")
        // and flat across the soak once all keys are seen — no per-batch growth
        val settled = stateRows.dropWhile(_ < Entities.toLong)
        assert(settled.nonEmpty && settled.forall(_ == Entities.toLong),
          s"state grew across batches: ${stateRows.mkString(",")}")
        // every entity surfaced its gaps: batches-1 closed gaps per key
        val n = spark.table("rocks_out").count()
        assert(n == Entities.toLong * (Batches - 1),
          s"expected ${Entities * (Batches - 1)} closed gaps, got $n")
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
