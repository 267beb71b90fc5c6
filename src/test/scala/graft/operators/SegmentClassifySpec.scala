package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Segment-grain classification must degenerate to the doc-grain
  * classifier when a document fits in one segment, and the doc pooling
  * must be the exact feature-count-weighted combination of its segments —
  * the two invariants that make segment scores comparable to doc scores
  * in one curation pipeline.
  */
class SegmentClassifySpec extends SparkSpec {
  import spark.implicits._

  private val W = QualityClassifier.seededWeights(64, seed = 3L)

  private def segScored(df: org.apache.spark.sql.DataFrame, segWords: Int) =
    QualityClassifier.scored(
      df.select(col("doc_id"),
        posexplode(graft.plans.TextExpressions.wordSegments(col("text"), segWords))
          .as(Seq("seg_idx", "seg"))),
      "doc_id", "seg", W, scale = 0.05, bias = 0.0, seed = 3L)

  test("a single-segment doc scores identically at both grains") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "zeta eta"))
      .toDF("doc_id", "text")
    val doc = QualityClassifier.scored(docs, "doc_id", "text", W, 0.05, 0.0, 3L)
      .select($"doc_id", $"sum_w", $"n_features", $"logit")
      .as[(Long, Long, Long, Double)].collect().toSet
    val seg = segScored(docs, segWords = 8)
      .select($"doc_id", $"sum_w", $"n_features", $"logit")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(seg == doc, s"segment grain diverged on single-segment docs: $seg vs $doc")
  }

  test("doc pooling is the exact feature-weighted combination of segments") {
    val docs = Seq((1L, (1 to 20).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val segs = segScored(docs, segWords = 8)
      .select($"sum_w", $"n_features").as[(Long, Long)].collect()
    assert(segs.length == 3, s"expected 3 segments of 8/8/4 words, got ${segs.length}")
    val expectedPooled = 0.0 + 0.05 *
      (segs.map(_._1).sum.toDouble / math.max(segs.map(_._2).sum, 1L).toDouble)
    val segDf = segScored(docs, segWords = 8)
    val pooledCol = lit(0.0) + lit(0.05) *
      (col("_sw").cast("double") / greatest(col("_nf"), lit(1L)).cast("double"))
    val got = segDf.groupBy($"doc_id")
      .agg(sum($"sum_w").as("_sw"), sum($"n_features").as("_nf"))
      .select(pooledCol).as[Double].head()
    assert(got == expectedPooled, s"pooled logit $got != exact combination $expectedPooled")
  }
}
