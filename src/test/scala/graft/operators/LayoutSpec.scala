package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton interleave is bit-exact against a direct
  * per-bit reference, and range-partitioning on z gives measurably tighter
  * per-partition bounding boxes than a single-column layout — the property
  * file-level min/max skipping prices.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue matches the per-bit reference interleave, incl. 31-bit extremes") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (1023L, 511L),
      (0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL), (0x7FFFFFFFL, 0x7FFFFFFFL),
      (123456789L, 987654321L))
    val got = cases.toDF("x", "y")
      .select(Layout.zValue($"x", $"y")).as[Long].collect()
    val want = cases.map { case (x, y) => mortonRef(x, y) }
    assert(got.toSeq == want, s"interleave mismatch: $got vs $want")
    assert(want.forall(_ >= 0L), "62-bit z must stay positive in int64")
  }

  test("z layout prunes file-level min/max on BOTH dimensions, x layout on one") {
    // a 64x64 uniform grid split into 16 range partitions = 16 "files";
    // a file is READ when its (min,max) bbox intersects the predicate —
    // exactly the parquet min/max skipping rule
    val pts = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y").withColumn("z", Layout.zValue($"x", $"y"))
    def bboxes(partitionCol: String): Array[(Long, Long, Long, Long)] =
      pts.repartitionByRange(16, col(partitionCol))
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min($"x").as("x0"), max($"x").as("x1"),
          min($"y").as("y0"), max($"y").as("y1"))
        .select($"x0", $"x1", $"y0", $"y1")
        .as[(Long, Long, Long, Long)].collect()
    def filesRead(bb: Array[(Long, Long, Long, Long)], dim: String,
        lo: Long, hi: Long): Int =
      bb.count { case (x0, x1, y0, y1) =>
        if (dim == "x") x1 >= lo && x0 <= hi else y1 >= lo && y0 <= hi
      }
    val zb = bboxes("z")
    val xb = bboxes("x")
    // y-band predicates: the x layout reads EVERY file (stripes span all
    // of y); the z layout reads only the tiles in the band
    val yPreds = Seq((0L, 7L), (24L, 31L), (56L, 63L))
    for ((lo, hi) <- yPreds) {
      val zRead = filesRead(zb, "y", lo, hi)
      val xRead = filesRead(xb, "y", lo, hi)
      assert(xRead == 16, s"x-stripe layout cannot prune on y ($xRead)")
      assert(zRead * 2 <= xRead,
        s"z layout must prune y-predicates: z=$zRead vs x=$xRead for [$lo,$hi]")
    }
    // x-band predicates: both layouts prune (x best, z still well)
    for ((lo, hi) <- yPreds) {
      assert(filesRead(zb, "x", lo, hi) <= 8,
        "z layout must also prune x-predicates")
      assert(filesRead(xb, "x", lo, hi) <= 4)
    }
  }

  test("epochShuffle: each epoch is a complete permutation, shard positions contiguous") {
    val docs = (0L until 300L).toDF("doc_id")
    val sh = Layout.epochShuffle(docs, "doc_id", epochs = 3, shards = 4)
      .select($"doc_id", $"epoch", $"shard", $"pos")
      .as[(Long, Long, Long, Long)].collect()
    assert(sh.length == 900, "every doc placed once per epoch")
    for (e <- 0L to 2L) {
      val ep = sh.filter(_._2 == e)
      assert(ep.map(_._1).toSet == (0L until 300L).toSet)
      for ((_, rows) <- ep.groupBy(_._3))
        assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq,
          "positions within a shard must be 1..count with no gaps")
    }
  }

  test("shardsFor: shard count tracks the corpus so window sorts stay bounded") {
    // floor: small corpora keep the minimum shard fan-out
    assert(Layout.shardsFor(500L) == 8)
    assert(Layout.shardsFor(8192L * 8) == 8)
    // above the floor: ceil(n / target) — each (epoch, shard) window sorts
    // ~target rows at any corpus size (no O(N/shards) global-sort shape)
    assert(Layout.shardsFor(8192L * 8 + 1) == 9)
    assert(Layout.shardsFor(500000L) == 62)
    assert(Layout.shardsFor(5000000L) == 611)
    intercept[IllegalArgumentException] { Layout.shardsFor(10L, 0L) }
  }

  test("epochShuffle: epochs are independent orders; the assignment is deterministic") {
    val docs = (0L until 300L).toDF("doc_id")
    def order(e: Long) = Layout.epochShuffle(docs, "doc_id", 2, 4)
      .filter($"epoch" === e).orderBy($"shard", $"pos")
      .select($"doc_id").as[Long].collect().toSeq
    assert(order(0L) != order(1L), "two epochs must not replay the same order")
    assert(order(0L) == order(0L), "the same epoch always replays identically")
    intercept[IllegalArgumentException] {
      Layout.epochShuffle(docs, "doc_id", 0, 4)
    }
  }

  test("zOrderBy only repartitions — content is untouched") {
    val df = (1L to 100L).map(i => (i, i % 7, i % 11)).toDF("id", "a", "b")
    val out = Layout.zOrderBy(df, $"a", $"b", 4)
    assert(out.columns.toSeq == df.columns.toSeq, "helper column must be dropped")
    assert(out.exceptAll(df).isEmpty && df.exceptAll(out).isEmpty)
    assert(out.rdd.getNumPartitions == 4)
  }
}
