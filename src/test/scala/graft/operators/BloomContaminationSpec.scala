package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Bloom-prefiltered decontamination path's contract is RESULT
  * IDENTITY with the exact path for any filter geometry: no false
  * negatives (a present shingle always passes), and false positives die in
  * the exact join they are admitted to. The driver gate pins one geometry
  * against the DuckDB oracle; this spec pins the identity itself across
  * geometries — including a pathologically small 64-bit filter where
  * nearly every probe is a false positive, the regime where a bug in the
  * admit-then-verify chain would surface as phantom contamination.
  */
class BloomContaminationSpec extends SparkSpec {
  import spark.implicits._

  // deterministic corpus: 40 docs over a 12-word vocabulary (dense
  // shingle collisions), every 5th doc is "benchmark"
  private def corpus = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rnd = new scala.util.Random(7)
    (0 until 40).map { i =>
      val words = Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def run(bloom: Option[(Int, Int)]) = {
    val docs = corpus.filter($"doc_id" % 5 =!= 0)
    val bench = corpus.filter($"doc_id" % 5 === 0)
    val out = bloom match {
      case Some((bits, hashes)) =>
        Contamination.flagContaminatedBloom(docs, "doc_id", "text",
          bench, "doc_id", "text", n = 2, minOverlap = 2L,
          maxShingleDocFreq = 1000L, bloomBits = bits, bloomHashes = hashes)
      case None =>
        Contamination.flagContaminated(docs, "doc_id", "text",
          bench, "doc_id", "text", n = 2, minOverlap = 2L,
          maxShingleDocFreq = 1000L)
    }
    out.select($"doc_id", $"n_bench_hits", $"max_overlap")
      .as[(Long, Long, Long)].collect().toSet
  }

  test("bloom-prefiltered decontamination equals the exact path") {
    val exact = run(None)
    assert(exact.nonEmpty, "test corpus produced no contamination — no signal")
    for ((bits, hashes) <- Seq((1 << 16, 3), (1 << 10, 2), (64, 1))) {
      assert(run(Some((bits, hashes))) == exact,
        s"bloom($bits bits, $hashes hashes) diverged from the exact path")
    }
  }

  test("driver-side build and in-plan probe agree on bit positions") {
    // a single-shingle benchmark: with a correct build/probe pair the one
    // true shingle must pass (no false negatives) even at minimal width
    val docs = Seq((1L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val bench = Seq((0L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val got = Contamination.flagContaminatedBloom(docs, "doc_id", "text",
      bench, "doc_id", "text", n = 2, minOverlap = 1L,
      maxShingleDocFreq = 1000L, bloomBits = 64, bloomHashes = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 2L)), s"got $got")
  }
}
