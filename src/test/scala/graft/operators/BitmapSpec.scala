package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bitmap index: exactness against count_distinct, merge algebra (per-slice
  * bitmaps OR up to the whole), set-operation identities, and the
  * map-side-combine plan shape.
  */
class BitmapSpec extends SparkSpec {
  import spark.implicits._

  // keys straddling word boundaries (62, 63, 64, 125, 126) plus duplicates
  private def keys = Seq(0L, 1L, 62L, 63L, 64L, 64L, 125L, 126L, 1000L, 1000L, 1000000L)
    .toDF("k")

  test("cardinality is exact, including word-boundary keys and duplicates") {
    val n = Bitmap.cardinality(Bitmap.words(keys, Nil, $"k"), Nil)
      .as[Long].head()
    val exact = keys.select(countDistinct($"k")).as[Long].head()
    assert(n == exact && n == 9L)
  }

  test("per-slice bitmaps merge to the whole-corpus bitmap") {
    val (a, b) = (keys.filter($"k" % 2 === 0), keys.filter($"k" % 2 =!= 0))
    val merged = Bitmap.merge(
      Bitmap.words(a, Nil, $"k"), Bitmap.words(b, Nil, $"k"), Nil)
      .as[(Long, Long)].collect().toSet
    val whole = Bitmap.words(keys, Nil, $"k").as[(Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("AND/OR cardinalities satisfy inclusion-exclusion") {
    val a = Seq(1L, 2L, 3L, 100L, 200L).toDF("k")
    val b = Seq(2L, 3L, 4L, 200L, 300L).toDF("k")
    val (wa, wb) = (Bitmap.words(a, Nil, $"k"), Bitmap.words(b, Nil, $"k"))
    val nAnd = Bitmap.andCardinality(wa, wb).as[Long].head()
    val nOr = Bitmap.orCardinality(wa, wb).as[Long].head()
    assert(nAnd == 3L, s"intersection {2,3,200}: $nAnd")
    assert(nOr == 7L, s"union: $nOr")
    assert(nOr == 5L + 5L - nAnd, "inclusion-exclusion identity")
    // disjoint word ranges: AND of frames sharing no word is 0, not null
    val c = Seq(10000L).toDF("k")
    assert(Bitmap.andCardinality(wa, Bitmap.words(c, Nil, $"k")).as[Long].head() == 0L)
  }

  test("word build combines map-side before the exchange") {
    val plan = Bitmap.words(keys, Nil, $"k").queryExecution.executedPlan.toString
    val partial = plan.indexOf("partial_bit_or")
    val exchange = plan.indexOf("Exchange hashpartitioning")
    assert(partial >= 0 && exchange >= 0 && partial > exchange,
      s"bit_or must partial-aggregate below the exchange:\n$plan")
  }
}
