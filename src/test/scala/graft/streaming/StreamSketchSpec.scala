package graft.streaming

import graft.SparkSpec
import graft.operators.Sketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming registers converge to the batch registers, state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("grp", "v")
    val out = StreamSketch.registers(df, Seq("grp"), "v", seed = 3L)
    val query = out.writeStream.format("memory").queryName("sketch_regs")
      .outputMode("complete").start()
    try {
      input.addData((1L to 500L).map(i => (s"g${i % 2}", i)): _*)
      query.processAllAvailable()
      input.addData((400L to 900L).map(i => (s"g${i % 2}", i)): _*) // overlap re-sends
      query.processAllAvailable()

      val streamed = spark.table("sketch_regs")
        .select($"grp", $"bucket", $"reg").as[(String, Long, Int)]
        .collect().toSet
      val batch = Sketch.registers(
          (1L to 900L).map(i => (s"g${i % 2}", i)).toDF("grp", "v"),
          Seq("grp"), col("v"), seed = 3L)
        .select($"grp", $"bucket", $"reg").as[(String, Long, Int)]
        .collect().toSet
      assert(streamed == batch,
        "streaming registers must equal batch registers over the same data")

      // estimates from streaming registers = batch estimates, bit for bit
      val eS = Sketch.estimate(spark.table("sketch_regs"), Seq("grp"))
        .as[(String, Double, Long)].collect().toSet
      val eB = Sketch.estimate(
        Sketch.registers(
          (1L to 900L).map(i => (s"g${i % 2}", i)).toDF("grp", "v"),
          Seq("grp"), col("v"), seed = 3L),
        Seq("grp")).as[(String, Double, Long)].collect().toSet
      assert(eS == eB)

      // state is O(groups × 256), not O(rows seen)
      val stateRows = query.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 2 * 256,
        s"register state must stay bounded, got $stateRows rows")
    } finally query.stop()
  }
}
