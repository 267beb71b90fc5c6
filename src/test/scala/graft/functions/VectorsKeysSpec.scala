package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorsKeysSpec extends SparkSpec {
  import spark.implicits._

  test("dot and cosine compute exact values") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val (d, c) = df.select(
        Vectors.dot($"a", $"b").as("d"), Vectors.cosine($"a", $"b").as("c"))
      .as[(Double, Double)].collect().head
    assert(d == 11.0)
    assert(math.abs(c - 11.0 / (math.sqrt(5.0) * 5.0)) < 1e-12)
  }

  test("cosine of zero vector is 0") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(Vectors.cosine($"a", $"b")).as[Double].collect().head == 0.0)
  }

  test("int8 quantization: scale, round-clamp, and zero-vector handling") {
    val df = Seq(
      (1L, Array(12.7f, -12.7f, 6.35f, 0.0f)), // scale 0.1: q = 127,-127,64(63.5 rounds up),0
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))      // zero vector: scale 0, q all 0
    ).toDF("vec_id", "v")
    val out = df.select(
        $"vec_id",
        Vectors.int8Scale($"v").as("scale"),
        Vectors.quantizeInt8($"v", Vectors.int8Scale($"v")).as("q"))
      .as[(Long, Double, Seq[Long])].collect().sortBy(_._1)
    val (_, s1, q1) = out(0)
    assert(math.abs(s1 - 12.7f.toDouble / 127.0) < 1e-15)
    assert(q1 == Seq(127L, -127L, 64L, 0L))
    assert(out(1)._2 == 0.0 && out(1)._3 == Seq(0L, 0L, 0L, 0L))
    // reconstruction error of the max component is ~0 by construction
    val err = df.filter($"vec_id" === 1L).select(
        Vectors.int8SumAbsError($"v",
          Vectors.quantizeInt8($"v", Vectors.int8Scale($"v")),
          Vectors.int8Scale($"v")))
      .as[Double].collect().head
    assert(err >= 0.0 && err < 4 * s1) // per-component error bounded by scale/2 (+float noise)
  }

  test("surrogateKey is null-safe and order-significant") {
    val df = Seq(("x", Some(1)), ("x", None)).toDF("s", "i")
    val keys = df.select(Keys.surrogateKey($"s", $"i").as("k")).as[String].collect()
    assert(keys(0) != keys(1)) // null sentinel differs from value
    val swapped = df.limit(1).select(Keys.surrogateKey($"i", $"s").as("k")).as[String].collect()
    assert(swapped(0) != keys(0))
  }

  test("surrogateKeySql mirrors the Spark expression") {
    assert(Keys.surrogateKeySql("a", "b") ==
      "md5(concat_ws('-', coalesce(cast(a as varchar), '_null_'), coalesce(cast(b as varchar), '_null_')))")
  }
}
