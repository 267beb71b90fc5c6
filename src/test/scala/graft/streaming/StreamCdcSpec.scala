package graft.streaming

import graft.SparkSpec
import graft.operators.Cdc
import org.apache.spark.sql.functions._

class StreamCdcSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = {
    val d = java.nio.file.Files.createTempDirectory("streamcdc-spec-")
    d.toFile.deleteOnExit()
    d.toString + "/t"
  }

  private def snap = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
    .toDF("k", "name", "bal")

  private def state(dir: String) =
    StreamCdc.currentState(spark, dir)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq

  test("incremental batch folds == the one-shot batch apply; deletes land") {
    val dir = freshDir()
    StreamCdc.initTarget(snap, dir, Seq("k"), nBuckets = 8)
    val b1 = Seq((1L, 1L, "U", "a2", 11L), (5L, 2L, "I", "e", 50L))
      .toDF("k", "seq", "op", "name", "bal")
    val b2 = Seq((1L, 3L, "D", "x", 0L), (2L, 4L, "U", "b2", 22L))
      .toDF("k", "seq", "op", "name", "bal")
    StreamCdc.foldBatch(spark, b1, dir, Seq("k"), "seq", "op", 8)
    StreamCdc.foldBatch(spark, b2, dir, Seq("k"), "seq", "op", 8)
    val oneShot = Cdc.applyLog(snap, b1.unionByName(b2), Seq("k"), "seq", "op")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(state(dir) == oneShot)
  }

  test("re-applying a batch after a restart is idempotent") {
    val dir = freshDir()
    StreamCdc.initTarget(snap, dir, Seq("k"), nBuckets = 8)
    val b = Seq((1L, 1L, "U", "a2", 11L), (3L, 2L, "D", "x", 0L),
      (6L, 3L, "I", "f", 60L)).toDF("k", "seq", "op", "name", "bal")
    StreamCdc.foldBatch(spark, b, dir, Seq("k"), "seq", "op", 8)
    val once = state(dir)
    StreamCdc.foldBatch(spark, b, dir, Seq("k"), "seq", "op", 8)
    assert(state(dir) == once, "checkpoint-recovery replay must be a no-op")
  }

  test("soak: 30 batch folds keep files bounded and state == one-shot") {
    // the foreachBatch analog of the RocksDB soaks: state lives in the
    // bucketed parquet target, so the bound to prove is FILES (per-fold
    // dynamic overwrite must replace, never accumulate) and content
    val dir = freshDir()
    StreamCdc.initTarget(snap, dir, Seq("k"), nBuckets = 4)
    val rnd = new scala.util.Random(7L)
    val log = (1L to 300L).map { seq =>
      val k = rnd.nextInt(40).toLong
      val op = rnd.nextInt(5) match {
        case 0 => "D"; case 1 => "I"; case _ => "U"
      }
      (k, seq, op, s"n$seq", seq * 10)
    }
    def files() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
    }
    val counts = log.grouped(10).map { chunk =>
      StreamCdc.foldBatch(spark, chunk.toDF("k", "seq", "op", "name", "bal"),
        dir, Seq("k"), "seq", "op", 4)
      files()
    }.toSeq
    assert(counts.max <= counts.head * 3 + 4,
      s"file count must stay bounded across folds: $counts")
    val streamed = state(dir)
    val oneShot = Cdc.applyLog(snap,
        log.toDF("k", "seq", "op", "name", "bal"), Seq("k"), "seq", "op")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(streamed == oneShot)
  }

  test("untouched buckets are not rewritten") {
    val dir = freshDir()
    // many buckets so the single-key batch leaves most buckets alone
    StreamCdc.initTarget(snap, dir, Seq("k"), nBuckets = 16)
    def bucketFiles(): Map[String, Set[String]] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith(StreamCdc.BucketCol + "="))
        .map(d => d.getName ->
          d.listFiles().map(f => f.getName + ":" + f.lastModified()).toSet)
        .toMap
    val before = bucketFiles()
    val b = Seq((1L, 1L, "U", "a2", 11L)).toDF("k", "seq", "op", "name", "bal")
    StreamCdc.foldBatch(spark, b, dir, Seq("k"), "seq", "op", 16)
    val after = bucketFiles()
    val touched = before.keySet.count(k => after.get(k) != before.get(k))
    assert(touched <= 1,
      s"only key 1's bucket may rewrite, but $touched buckets changed")
    assert(state(dir).find(_._1 == 1L).map(_._2) == Some("a2"))
  }
}
