package graft.streaming

import graft.SparkSpec
import graft.operators.Sampling

class StreamSampleSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = {
    val d = java.nio.file.Files.createTempDirectory("streamsample-spec-")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  test("running top-k over micro-batches == the one-shot batch draw") {
    val rows = (1L to 300L).map(i => (i, i % 11 + 1))
    val dir = freshDir()
    rows.grouped(50).foreach { chunk =>
      StreamSample.foldBatch(spark, chunk.toDF("id", "w"), dir,
        "id", "w", k = 40, seed = 3L)
    }
    val streamed = StreamSample.current(spark, dir)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val batch = Sampling.weightedFixedK(rows.toDF("id", "w"),
        "id", "w", k = 40, seed = 3L)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(streamed == batch)
  }

  test("re-applying a batch after restart is a no-op; state stays k rows") {
    val dir = freshDir()
    val b1 = (1L to 100L).map(i => (i, 5L)).toDF("id", "w")
    StreamSample.foldBatch(spark, b1, dir, "id", "w", k = 20, seed = 9L)
    val once = StreamSample.current(spark, dir)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    StreamSample.foldBatch(spark, b1, dir, "id", "w", k = 20, seed = 9L)
    val twice = StreamSample.current(spark, dir)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(once == twice && once.size == 20)
  }
}
