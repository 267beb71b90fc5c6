package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashSpec extends SparkSpec {
  import spark.implicits._

  /** Independent BigInt reimplementation of the published definition —
    * guards the kernel (and its codegen path) against silent drift from the
    * arithmetic the DuckDB oracles replay.
    */
  private def reference(s: String, seed: Long): Long = {
    val M = BigInt(1) << 64
    def u(x: BigInt) = ((x % M) + M) % M
    var h = BigInt("14695981039346656037")
    s.getBytes("UTF-8").foreach { b =>
      h = u((h ^ BigInt(b & 0xff)) * BigInt("1099511628211"))
    }
    var z = u(h + u(BigInt(seed) * BigInt("11400714819323198485")))
    z = u((z ^ (z >> 30)) * BigInt("13787848793156543929"))
    z = u((z ^ (z >> 27)) * BigInt("10723151780598845931"))
    z = z ^ (z >> 31)
    (if (z >= (BigInt(1) << 63)) z - M else z).longValue
  }

  test("FnvMix matches the reference arithmetic for several strings and seeds") {
    val inputs = Seq("", "a", "the quick brown", "fox jumps over the lazy dog",
      "0123456789 0123456789 0123456789")
    val seeds = Seq(0L, 1L, 7L, 31L)
    val df = inputs.toDF("s")
    seeds.foreach { seed =>
      val got = df.select(col("s"), HashExpressions.fnvMix(col("s"), seed))
        .as[(String, Long)].collect().toMap
      inputs.foreach { s =>
        assert(got(s) == reference(s, seed), s"mismatch for '$s' seed=$seed")
      }
    }
  }

  test("FnvMix is null-safe and seeds decorrelate (distinct values per seed)") {
    val nulls = Seq(Option.empty[String], Option("x")).toDF("s")
      .select(HashExpressions.fnvMix(col("s"), 3L)).as[Option[Long]].collect()
    assert(nulls.count(_.isEmpty) == 1)
    val hs = (0 until 32).map(i => reference("same shingle", i))
    assert(hs.distinct.size == 32)
  }
}
