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

  private def walk(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)

  private def parquetBytes(dir: java.io.File): Long =
    if (!dir.exists()) 0L
    else walk(dir).filter(_.getName.endsWith(".parquet")).map(_.length()).sum

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
    // state lives in the base + delta parquet layout, so the bound to
    // prove is FILES (appends must compact away, never accumulate
    // without bound) and content
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
    def files() =
      walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
    val counts = log.grouped(10).map { chunk =>
      StreamCdc.foldBatch(spark, chunk.toDF("k", "seq", "op", "name", "bal"),
        dir, Seq("k"), "seq", "op", 4)
      files()
    }.toSeq
    assert(counts.max <= counts.head * 3 + 8,
      s"file count must stay bounded across folds: $counts")
    val streamed = state(dir)
    val oneShot = Cdc.applyLog(snap,
        log.toDF("k", "seq", "op", "name", "bal"), Seq("k"), "seq", "op")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(streamed == oneShot)
  }

  test("merge-on-read: a non-compacting fold touches NO base file") {
    val dir = freshDir()
    // base large enough that a 1-row batch stays under the ratio
    val big = (1L to 400L).map(i => (i, s"name$i", i * 10)).toDF("k", "name", "bal")
    StreamCdc.initTarget(big, dir, Seq("k"), nBuckets = 16)
    def baseFiles(): Map[String, Set[String]] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith(StreamCdc.BucketCol + "="))
        .map(d => d.getName ->
          walk(d).map(f => f.getName + ":" + f.lastModified()).toSet)
        .toMap
    val before = baseFiles()
    val b = Seq((1L, 1L, "U", "a2", 11L)).toDF("k", "seq", "op", "name", "bal")
    StreamCdc.foldBatch(spark, b, dir, Seq("k"), "seq", "op", 16)
    assert(baseFiles() == before,
      "an under-ratio fold must append a delta, never rewrite base buckets")
    assert(state(dir).find(_._1 == 1L).map(_._2) == Some("a2"),
      "the delta must still resolve at read time")
  }

  test("write amplification is O(batch) bytes, not O(buckets)") {
    // the r11 design rewrote every touched bucket's FULL contents per
    // batch; merge-on-read must write only the batch's winners — so a
    // 1-row batch against a many-bucket, many-row base appends a few KB
    // regardless of base size or bucket count
    val dir = freshDir()
    val big = (1L to 4000L)
      .map(i => (i, s"name$i" * 8, i * 10)).toDF("k", "name", "bal")
    StreamCdc.initTarget(big, dir, Seq("k"), nBuckets = 32)
    val baseBytes = parquetBytes(new java.io.File(dir))
    val deltaDir = new java.io.File(dir, StreamCdc.DeltaDir)
    val b = Seq((1L, 1L, "U", "a2", 11L)).toDF("k", "seq", "op", "name", "bal")
    StreamCdc.foldBatch(spark, b, dir, Seq("k"), "seq", "op", 32)
    val written = parquetBytes(deltaDir)
    assert(written > 0, "the fold must persist the batch winners")
    assert(written * 20 < baseBytes,
      s"1-row fold wrote $written B against a $baseBytes B base — " +
        "that is bucket-rewrite amplification, not O(batch)")
  }

  test("over-ratio buckets compact: deltas fold into base and clear") {
    val dir = freshDir()
    StreamCdc.initTarget(snap, dir, Seq("k"), nBuckets = 2)
    // 20 winners against a 4-row base blows the default 2.0 ratio in
    // every touched bucket: deltas must fold into the base and vanish
    val b = (1L to 20L).map(i => (i, i, "U", s"u$i", i * 100))
      .toDF("k", "seq", "op", "name", "bal")
    StreamCdc.foldBatch(spark, b, dir, Seq("k"), "seq", "op", 2)
    val deltaDir = new java.io.File(dir, StreamCdc.DeltaDir)
    assert(parquetBytes(deltaDir) == 0L,
      "compaction must clear the folded delta files")
    // the BASE alone (no delta resolution) must now hold the winners
    val baseOnly = spark.read.parquet(dir)
      .select($"k", $"name", $"bal").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    val oneShot = Cdc.applyLog(snap, b, Seq("k"), "seq", "op")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(baseOnly == oneShot)
  }

  test("repeated key-touch self-compacts deltas WITHOUT rewriting base") {
    // the LSM tier-1 path: a feed that UPDATES the same keys over and
    // over grows deltas past ratio, but folding them to per-key winners
    // shrinks them back under — the base must never rewrite, delta file
    // counts must collapse, and reads stay correct
    val dir = freshDir()
    val big = (1L to 200L).map(i => (i, s"n$i", i)).toDF("k", "name", "bal")
    StreamCdc.initTarget(big, dir, Seq("k"), nBuckets = 2)
    def baseState(): Map[String, Set[String]] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith(StreamCdc.BucketCol + "="))
        .map(d => d.getName ->
          walk(d).map(f => f.getName + ":" + f.lastModified()).toSet)
        .toMap
    val before = baseState()
    var seq = 0L
    // 30 batches × 30 updates of the same 30 keys: cumulative deltas
    // (900 rows) dwarf the 200-row base, winners never exceed 30 keys
    (1 to 30).foreach { _ =>
      val b = (1L to 30L).map { k => seq += 1; (k, seq, "U", s"u$seq", seq) }
        .toDF("k", "seq", "op", "name", "bal")
      StreamCdc.foldBatch(spark, b, dir, Seq("k"), "seq", "op", 2)
    }
    assert(baseState() == before,
      "update-only churn must be absorbed by delta self-compaction")
    val deltaFiles = walk(new java.io.File(dir, StreamCdc.DeltaDir))
      .count(_.getName.endsWith(".parquet"))
    assert(deltaFiles <= 2 * 17,
      s"delta files must collapse on self-compaction, got $deltaFiles")
    assert(state(dir).find(_._1 == 1L).map(_._3) ==
      Some(seq - 29L), "reads must resolve the latest winner")
  }

  test("read amplification: currentState reads <= (1+2*ratio)*base + batch rows") {
    // the r13 probe, folded into the suite as a regression gate: append
    // 10%-of-base update batches so the live delta rides the worst read
    // point (just under the ratio-2 trigger) and assert the merge-on-read
    // fold's input rows stay inside the scaladoc's documented bound at
    // EVERY fold, not just on average
    val dir = freshDir()
    val n = 400L
    val base = (1L to n).map(i => (i, s"name$i", i * 10)).toDF("k", "name", "bal")
    StreamCdc.initTarget(base, dir, Seq("k"), nBuckets = 8)
    def rows(d: String): Long = {
      val f = new java.io.File(d)
      if (!f.exists() || walk(f).forall(!_.getName.endsWith(".parquet"))) 0L
      else spark.read.parquet(d).count()
    }
    val ratio = 2.0
    var worst = 0.0
    (0 until 30).foreach { b =>
      val batch = (1L to n / 10L).map { j =>
        val k = (b * 37L + j * 11L) % n + 1L
        (k, b * 100L + j, "U", s"u$b-$j", k)
      }.toDF("k", "seq", "op", "name", "bal")
      StreamCdc.foldBatch(spark, batch, dir, Seq("k"), "seq", "op", 8,
        compactRatio = ratio)
      // the three inputs currentState unions (the base read skips _delta —
      // underscore-prefixed dirs are invisible to Spark's file index)
      val b0 = spark.read.parquet(dir).count()
      val l0 = rows(s"$dir/${StreamCdc.DeltaDir}/l0")
      val l1 = rows(s"$dir/${StreamCdc.DeltaDir}/l1")
      val bound = (1.0 + 2.0 * ratio) * b0 + n / 10.0
      worst = math.max(worst, (b0 + l0 + l1).toDouble / bound)
      assert(b0 + l0 + l1 <= bound,
        s"fold $b reads ${b0 + l0 + l1} rows > bound $bound (base=$b0 l0=$l0 l1=$l1)")
    }
    assert(worst > 0.0) // the probe actually measured something
  }

  test("tombstones persist in the delta until compaction, then vanish") {
    val dir = freshDir()
    val big = (1L to 200L).map(i => (i, s"n$i", i)).toDF("k", "name", "bal")
    StreamCdc.initTarget(big, dir, Seq("k"), nBuckets = 2)
    val d = Seq((7L, 1L, "D", "x", 0L)).toDF("k", "seq", "op", "name", "bal")
    StreamCdc.foldBatch(spark, d, dir, Seq("k"), "seq", "op", 2)
    // under-ratio: the base still holds key 7, the read hides it
    assert(spark.read.parquet(dir).filter($"k" === 7L).count() == 1L)
    assert(state(dir).forall(_._1 != 7L), "read must resolve the tombstone")
    // force the bucket over ratio — compaction must drop the key from
    // the base physically
    val flood = (1000L to 1500L).map(i => (i, i, "I", s"i$i", i))
      .toDF("k", "seq", "op", "name", "bal")
    StreamCdc.foldBatch(spark, flood, dir, Seq("k"), "seq", "op", 2)
    assert(spark.read.parquet(dir).filter($"k" === 7L).count() == 0L,
      "compaction must apply the tombstone to the base")
    assert(state(dir).forall(_._1 != 7L))
  }
}
