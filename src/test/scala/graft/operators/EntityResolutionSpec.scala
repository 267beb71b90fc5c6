package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Blocked edit-distance matching: equality with the exhaustive answer over
  * a corpus that exercises every blocking case — head edits, tail edits,
  * middle edits, short names, and the length band straddling the
  * short/long boundary (where a single indel carries a name across it).
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("blocked match equals exhaustive match across all length regimes") {
    val canon = Seq(
      "alpha-1", "alpha-2", "beta-12", "gamma-123", "delta-1234",
      "abcdefgh", "abcdefghi", "abcdeXgh", // len 8/9 boundary band (2*blockLen=8)
      "shorty", "shor", "sh",
      "verylongname-42", "verylongname-43").zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("cid", "cname")
    val dirty = Seq(
      "alpha-",      // tail deletion of alpha-1 / alpha-2 parent
      "lpha-1",      // head deletion
      "alpha-1",     // exact (distance 0)
      "bcdefgh",     // len 7 from len-8 canon: crosses the boundary band
      "abcdefghX",   // tail substitution of abcdefghi
      "abXdefgh",    // head-region substitution
      "abcdeYgh",    // middle substitution: matches abcdefgh AND abcdeXgh
      "short",       // short regime
      "verylongname-4", // tail deletion matching both -42 and -43? (dist 1 vs 1)
      "zzzzzzzzzz")  // no match
      .zipWithIndex.map { case (n, i) => (100L + i, n) }.toDF("did", "dname")

    val got = EntityResolution.matchByEditDistance(
        dirty, "did", "dname", canon, "cid", "cname", blockLen = 4, maxDist = 1)
      .select($"did", $"cid", $"edit_dist").as[(Long, Long, Int)]
      .collect().sorted
    val cs = canon.as[(Long, String)].collect()
    val ds = dirty.as[(Long, String)].collect()
    val want = (for {
      (did, dn) <- ds; (cid, cn) <- cs
      d = lev(dn, cn) if d <= 1
    } yield (did, cid, d)).sorted
    assert(got.toSeq == want.toSeq,
      s"blocked != exhaustive:\n got ${got.mkString(", ")}\nwant ${want.mkString(", ")}")
    // sanity: the boundary-band case actually matched (the bug this spec pins)
    assert(want.exists { case (did, _, _) => did == 103L },
      "len-7-vs-len-8 boundary pair must be in the expected set")
    assert(!want.exists { case (did, _, _) => did == 109L }, "zzz… must not match")
  }

  test("only one edit is supported by 2-piece blocking") {
    val df = Seq((1L, "x")).toDF("id", "n")
    intercept[IllegalArgumentException] {
      EntityResolution.matchByEditDistance(df, "id", "n", df, "id", "n",
        blockLen = 4, maxDist = 2)
    }
  }
}
