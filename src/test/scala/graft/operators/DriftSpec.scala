package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("driftTable: shifted share scores high, stationary near zero, " +
      "appeared/vanished buckets kept") {
    // base: a=600 b=300 c=100; next: a=300 b=300 d=200 (a halved its
    // share, b flat-count but share moved mildly, c vanished, d appeared)
    def rows(k: String, n: Int) = Seq.fill(n)(k)
    val base = (rows("a", 600) ++ rows("b", 300) ++ rows("c", 100)).toDF("k")
    val next = (rows("a", 300) ++ rows("b", 300) ++ rows("d", 200)).toDF("k")
    val got = Drift.driftTable(base, next, Seq("k"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set("a", "b", "c", "d"), "all buckets present")
    assert(got("c")._2 == 100 && got("c")._3 == 0, "vanished bucket kept")
    assert(got("d")._2 == 0 && got("d")._3 == 200, "appeared bucket kept")
    // reference chi-square contribution, same quantization
    def ref(nb: Long, nn: Long, tb: Long, tn: Long): Long = {
      val num = (nb * tn - nn * tb).toDouble
      math.floor(num * num / ((nb + nn) * tb * tn).toDouble * 1048576.0).toLong
    }
    val (tb, tn) = (1000L, 800L)
    for ((k, r) <- got)
      assert(r._4 == ref(r._2, r._3, tb, tn), s"bucket $k chi2 mismatch")
    // ordering of severity: appeared/vanished and the halved-share bucket
    // all dominate the flat bucket
    assert(got("a")._4 > got("b")._4 && got("c")._4 > got("b")._4 &&
      got("d")._4 > got("b")._4)
  }

  test("driftTable: identical snapshots score zero everywhere; " +
      "partitioning does not change the table") {
    val df = (0L until 500L).map(i => (s"t${i % 7}", i % 4)).toDF("t", "vb")
    val same = Drift.driftTable(df, df, Seq("t", "vb"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(same.nonEmpty && same.forall(_._5 == 0L), "no drift → chi2 = 0")
    val a = Drift.driftTable(df, df.limit(400), Seq("t", "vb"))
      .collect().map(_.toString).sorted.toSeq
    val b = Drift.driftTable(df.repartition(11), df.limit(400).repartition(3),
      Seq("t", "vb")).collect().map(_.toString).sorted.toSeq
    assert(a == b, "partitioning-invariant")
  }
}
