package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractMeta runs distributed over binary payloads with the typed schema") {
    val df = Seq((1L, "abc"), (2L, "abcdef")).toDF("doc_id", "text")
      .withColumn("payload", encode($"text", "UTF-8"))
    val out = Multimodal.extractMeta(spark, df, "doc_id", "payload")
    assert(out.schema == Multimodal.metaSchema)
    val rows = out.select("doc_id", "n_bytes", "width", "height", "format")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, 3L, 67L, 157L, "jpeg"),
      (2L, 6L, 70L, 250L, "jpeg")))
  }

  test("extractPatchFeatures explodes payloads to patch grain deterministically") {
    val df = Seq((7L, "x" * 600)).toDF("doc_id", "text")
      .withColumn("payload", encode($"text", "UTF-8"))
    val out = Multimodal.extractPatchFeatures(spark, df, "doc_id", "payload",
      patchBytes = 256, featureDim = 4)
    val rows = out.select("doc_id", "patch_idx")
      .as[(Long, Int)].collect().sortBy(_._2).toSeq
    assert(rows == Seq((7L, 0), (7L, 1), (7L, 2))) // 600 bytes → 3 patches
    val feats = out.filter($"patch_idx" === 0).select("features")
      .as[Seq[Float]].collect().head
    assert(feats.length == 4 && feats.forall(_ > 0))
    // deterministic across runs
    val again = Multimodal.extractPatchFeatures(spark, df, "doc_id", "payload",
      patchBytes = 256, featureDim = 4)
      .filter($"patch_idx" === 0).select("features").as[Seq[Float]].collect().head
    assert(feats == again)
  }

  test("decodeStub is deterministic") {
    assert(Multimodal.decodeStub(100L) == Multimodal.decodeStub(100L))
    assert(Multimodal.decodeStub(100L) == (64L + 100L, 64L + 3100L % 768L, "png"))
  }
}
