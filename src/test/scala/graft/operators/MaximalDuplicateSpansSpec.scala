package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins the variable-length ExactSubstr semantics (Lee et al. 2022) of
  * [[Dedup.maximalDuplicateSpans]] against BRUTE FORCE over ALL substrings:
  * the brute oracle enumerates every token substring of length ≥ L, counts
  * its (doc, position) occurrences corpus-wide, marks every position
  * covered by a duplicated one, and takes maximal runs. Equality proves
  * both the coverage theorem (L-window coverage ≡ ≥L-substring coverage)
  * and span maximality — the operator never reports an extendable or
  * truncated span.
  */
class MaximalDuplicateSpansSpec extends SparkSpec {

  private def toks(s: String): Array[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Brute-force Lee et al. spans: all substrings of length >= minLen,
    * occurrence counts at (doc, pos) grain, covered-position union,
    * maximal runs. O(corpus³) — test corpora stay tiny. */
  private def brute(docs: Seq[(Long, String)], minLen: Int,
      minOcc: Int = 2): Map[Long, Seq[(Long, Long, Long)]] = {
    val tk = docs.map { case (id, t) => id -> toks(t) }
    val occ = collection.mutable.HashMap.empty[Seq[String], Int]
    for ((_, ts) <- tk; s <- ts.indices; e <- (s + minLen - 1) until ts.length) {
      val sub = ts.slice(s, e + 1).toSeq
      occ(sub) = occ.getOrElse(sub, 0) + 1
    }
    tk.flatMap { case (id, ts) =>
      val cov = Array.fill(ts.length)(false)
      for (s <- ts.indices; e <- (s + minLen - 1) until ts.length
           if occ(ts.slice(s, e + 1).toSeq) >= minOcc; i <- s to e) cov(i) = true
      val runs = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var i = 0
      while (i < ts.length) {
        if (cov(i)) {
          var j = i
          while (j + 1 < ts.length && cov(j + 1)) j += 1
          runs += ((i.toLong, j.toLong, (j - i + 1).toLong))
          i = j + 1
        } else i += 1
      }
      if (runs.isEmpty) None else Some(id -> runs.toSeq)
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], minLen: Int,
      minOcc: Long = 2L): Map[Long, Seq[(Long, Long, Long)]] = {
    import spark.implicits._
    val df: DataFrame = docs.toDF("doc_id", "text")
    Dedup.maximalDuplicateSpans(df, "doc_id", "text", minLen, minOcc)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (id, rs) =>
        id -> rs.map(r => (r._2, r._3, r._4)).sortBy(_._1).toSeq
      }
  }

  test("planted 7-token passage at L=5 yields one VARIABLE-length span of 7 per doc") {
    val passage = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      1L -> s"one two three $passage four five six",
      2L -> s"red blue $passage green yellow purple orange")
    val got = run(docs, minLen = 5)
    assert(got == brute(docs, 5))
    assert(got(1L) == Seq((3L, 9L, 7L)), "span covers exactly the 7 planted tokens")
    assert(got(2L) == Seq((2L, 8L, 7L)))
    // maximality, asserted directly: neither neighbor position is covered
    // (extending the span by one token breaks duplication)
    assert(got(1L).head._1 == 3L && got(1L).head._2 == 9L)
  }

  test("two distinct duplicated substrings overlapping in one doc merge into one maximal region") {
    // doc 1 carries A-tail and B-head overlapped: A = a1..a5 x, B = x b1..b5;
    // A duplicates against doc 2, B against doc 3 — doc 1's covered region
    // is one 11-token span even though no single 11-token substring repeats
    val a = "a1 a2 a3 a4 a5"
    val b = "b1 b2 b3 b4 b5"
    val docs = Seq(
      1L -> s"$a x $b",
      2L -> s"pad1 pad2 $a x q1 q2 q3",
      3L -> s"r1 r2 r3 x $b pad3")
    val got = run(docs, minLen = 5)
    assert(got == brute(docs, 5))
    assert(got(1L) == Seq((0L, 10L, 11L)), "overlapped coverage merges")
  }

  test("intra-document repetition duplicates against itself") {
    val docs = Seq(
      1L -> "p q r s t u1 u2 p q r s t",
      2L -> "v w x y z zz")
    val got = run(docs, minLen = 5)
    assert(got == brute(docs, 5))
    assert(got.contains(1L) && !got.contains(2L))
  }

  test("shared runs shorter than L emit nothing") {
    val docs = Seq(
      1L -> "c1 c2 c3 c4 m n",   // only 4 shared tokens with doc 2 — under L
      2L -> "c1 c2 c3 c4 k l")
    assert(run(docs, minLen = 5).isEmpty)
    assert(brute(docs, 5).isEmpty)
  }

  test("randomized small-alphabet corpora match brute force exactly (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 7919)
      val docs = (1L to 6L).map { id =>
        val n = 15 + rnd.nextInt(20)
        id -> Seq.fill(n)("t" + rnd.nextInt(3)).mkString(" ")
      }
      val (got, want) = (run(docs, minLen = 4), brute(docs, 4))
      assert(got == want, s"seed $seed: $got vs $want")
    }
  }

  test("minOccurrences=3: a pair-duplicated passage no longer qualifies") {
    val passage = "h1 h2 h3 h4 h5 h6"
    val docs = Seq(
      1L -> s"s1 $passage s2",
      2L -> s"s3 s4 $passage",
      3L -> s"$passage s5 s6 s7")
    val got3 = run(docs, minLen = 5, minOcc = 3L)
    assert(got3 == brute(docs, 5, 3))
    assert(got3.keySet == Set(1L, 2L, 3L), "triple-occurring passage still marked at minOcc=3")
    val pairDocs = docs.take(2)
    assert(run(pairDocs, minLen = 5, minOcc = 3L).isEmpty)
  }
}
