package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compaction: content identity through the real write path, file-count
  * math (ceil(bytes/target)), and metadata-only sizing.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction folds small files into the targeted count, content untouched") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_spec").toString
    val in = s"$tmp/in"
    val out = s"$tmp/out"
    val df = (1L to 20000L).map(i => (i, s"row-$i-${"x" * 50}")).toDF("id", "payload")
    df.repartition(32).write.parquet(in)
    val before = Compaction.dataFiles(spark, in)
    assert(before.size == 32, s"expected 32 small input files, got ${before.size}")

    val total = before.map(_._2).sum
    val target = total / 3 // should yield ceil(total / (total/3)) = 3..4 files
    val (nb, na, bytes) = Compaction.compact(spark, in, out, target)
    assert(nb == 32 && bytes == total)
    val expected = ((total + target - 1) / target).toInt
    assert(na == expected, s"files_after=$na, expected ceil=$expected")
    assert(na < nb)

    val back = spark.read.parquet(out)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
      "compaction must be a no-op on the row multiset")
  }

  test("dataFiles ignores _SUCCESS and non-parquet sidecars") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_ls").toString
    Seq((1, "a")).toDF("i", "s").write.parquet(s"$tmp/t")
    assert(new java.io.File(s"$tmp/t/_SUCCESS").exists, "spark writes _SUCCESS")
    val files = Compaction.dataFiles(spark, s"$tmp/t")
    assert(files.nonEmpty && files.forall(_._1.endsWith(".parquet")))
  }
}
