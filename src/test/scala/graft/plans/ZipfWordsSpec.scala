package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZipfWordsSpec extends SparkSpec {
  import spark.implicits._

  /** The r17-and-earlier HOF formulation of the zipf word array, kept
    * here verbatim as the reference: the kernel must reproduce it
    * element-for-element (this is also what the DuckDB ZdocsSql CTE
    * replays, so kernel ≡ HOF ⇒ kernel ≡ oracle). */
  private def hofWords(doc: org.apache.spark.sql.Column) = {
    def u20(s: org.apache.spark.sql.Column) =
      conv(substring(md5(s), 1, 5), 16, 10).cast("long")
    val n = lit(10L) + shiftright(
      u20(concat(doc.cast("string"), lit(":len"))) * lit(91L), 20)
    val seeds = transform(sequence(lit(1L), n), wi =>
      u20(concat(doc.cast("string"), lit(":"), wi.cast("string"))))
    transform(seeds, u => concat(lit("w"),
      shiftright(shiftright(u * u * u, 40) * lit(20000L), 20).cast("string")))
  }

  test("ZipfWords kernel is element-identical to the HOF formulation") {
    // dense low range (the gates' id space), odd strides, and large ids
    // (multi-digit decimal rendering, sign-bit-adjacent)
    val ids = (0L until 3000L) ++ (0L until 500L).map(_ * 7919L) ++
      Seq(Long.MaxValue, Long.MaxValue - 1, (1L << 40) + 12345L)
    val df = ids.toDF("doc_id")
    val mismatches = df.select(
        col("doc_id"),
        ZipfExpressions.zipfWords(col("doc_id")).as("kernel"),
        hofWords(col("doc_id")).as("hof"))
      .where(not(col("kernel") <=> col("hof")))
      .count()
    assert(mismatches == 0)
  }

  test("ZipfWords word count follows the length draw (10..100) and is null-safe") {
    val lens = (0L until 2000L).toDF("doc_id")
      .select(size(ZipfExpressions.zipfWords(col("doc_id"))).as("n"))
      .agg(min("n"), max("n")).as[(Int, Int)].head()
    assert(lens._1 >= 10 && lens._2 <= 100)
    val nulls = Seq(Option.empty[Long], Option(1L)).toDF("doc_id")
      .select(ZipfExpressions.zipfWords(col("doc_id")))
      .collect().count(_.isNullAt(0))
    assert(nulls == 1)
  }
}
