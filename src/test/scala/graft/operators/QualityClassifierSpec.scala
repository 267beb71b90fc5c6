package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val W = QualityClassifier.seededWeights(64, seed = 5L)

  /** Driver-side reference scorer straight from the definition. */
  private def brute(text: String): (Long, Long) = {
    val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val feats = tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    val sum = feats.map { f =>
      val h = graft.plans.HashKernels.fnvMix(
        org.apache.spark.unsafe.types.UTF8String.fromString(f), 5L)
      W(math.floorMod(h, W.length.toLong).toInt).toLong
    }.sum
    (feats.size.toLong, sum)
  }

  test("scored equals a brute-force hashed bag-of-ngrams dot product") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox"),
      (3L, "single"),
      (4L, ""),
      (5L, "repeat repeat repeat repeat"))
    val got = QualityClassifier.scored(docs.toDF("doc_id", "text"),
        "doc_id", "text", W, scale = 0.1, bias = -0.2, seed = 5L)
      .select($"doc_id", $"n_features", $"sum_w", $"logit", $"pass")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    got.foreach { case (id, n, s, logit, pass) =>
      val (wantN, wantS) = brute(docs.find(_._1 == id).get._2)
      assert((n, s) == ((wantN, wantS)), s"doc $id: got ($n,$s) want ($wantN,$wantS)")
      val wantLogit = -0.2 + 0.1 * (wantS.toDouble / math.max(wantN, 1L).toDouble)
      assert(logit == wantLogit, s"doc $id logit $logit != $wantLogit")
      assert(pass == (wantLogit > 0.0))
    }
  }

  test("seededWeights are int8-ranged and deterministic") {
    val a = QualityClassifier.seededWeights(256, 29L)
    val b = QualityClassifier.seededWeights(256, 29L)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(w => w >= -127 && w <= 127))
    // not degenerate: both signs present
    assert(a.exists(_ > 0) && a.exists(_ < 0))
  }

  test("non-power-of-two bucket counts are rejected (portable-mod contract)") {
    // the bit-for-bit cross-engine replay reduces fnv_mix(f) mod B to a
    // low-bit mask only when B is a power of two — anything else must fail
    // loudly, not silently void the oracle guarantee
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.weightSum(lit("a b"), Array.fill(300)(1), 5L)
    }
    assert(e.getMessage.contains("power of two"), e.getMessage)
    intercept[IllegalArgumentException] {
      QualityClassifier.weightSum(lit("a b"), Array.empty[Int], 5L)
    }
  }

  test("inference is scan-side: no Exchange anywhere in the plan") {
    val df = QualityClassifier.scored(
      Seq((1L, "a b c")).toDF("doc_id", "text"),
      "doc_id", "text", W, 0.1, 0.0, 5L)
    val plan = df.queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty,
      s"classifier inference must be a pure scan-side map, found:\n$plan")
  }
}
