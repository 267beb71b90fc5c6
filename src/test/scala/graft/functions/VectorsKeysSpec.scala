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
