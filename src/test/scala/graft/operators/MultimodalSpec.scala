package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractMeta parses real container bytes and nulls the rest") {
    val png = {
      System.setProperty("java.awt.headless", "true")
      val img = new java.awt.image.BufferedImage(
        21, 9, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, png),
      (2L, "definitely not an image".getBytes("UTF-8")),
      (3L, Array.emptyByteArray)).toDF("doc_id", "payload")
    val out = Multimodal.extractMeta(df, "doc_id", "payload")
    assert(out.schema == Multimodal.metaSchema)
    val rows = out
      .select($"doc_id", $"n_bytes", $"width", $"height", $"channels", $"format")
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getLong(1) == png.length.toLong)
    assert((rows(0).getInt(2), rows(0).getInt(3), rows(0).getInt(4),
      rows(0).getString(5)) == ((21, 9, 4, "png")))
    assert(rows(1).getLong(1) == 23L && rows(1).isNullAt(2) && rows(1).isNullAt(5))
    assert(rows(2).getLong(1) == 0L && rows(2).isNullAt(2))
  }

  test("extractMeta is a scan-side codegen projection (no shuffle, no rdd)") {
    val df = spark.range(0, 8).toDF("doc_id")
      .withColumn("payload",
        Multimodal.syntheticImage(lit(2), lit(20), lit(10), $"doc_id"))
    val exec = Multimodal.extractMeta(df, "doc_id", "payload")
      .queryExecution.executedPlan.toString
    assert(exec.contains("*(1)"), exec) // the '*' prefix == whole-stage codegen
    assert(!exec.contains("Exchange"), exec)
  }

  test("extractPatchFeatures explodes payloads to patch grain deterministically") {
    val df = Seq((7L, "x" * 600)).toDF("doc_id", "text")
      .withColumn("payload", encode($"text", "UTF-8"))
    val out = Multimodal.extractPatchFeatures(df, "doc_id", "payload",
      patchBytes = 256, featureDim = 4)
    assert(out.select("doc_id", "patch_idx", "features").schema ==
      Multimodal.patchSchema)
    val rows = out.select("doc_id", "patch_idx")
      .as[(Long, Int)].collect().sortBy(_._2).toSeq
    assert(rows == Seq((7L, 0), (7L, 1), (7L, 2))) // 600 bytes → 3 patches
    val feats = out.filter($"patch_idx" === 0).select("features")
      .as[Seq[Float]].collect().head
    assert(feats.length == 4 && feats.forall(_ > 0))
    // stripe arithmetic: 256 'x' bytes split over 4 stripes of 64
    assert(feats.forall(f => math.abs(f - 64.0 * ('x' / 255.0)) < 1e-4))
    // the 600-byte tail patch has 88 bytes -> stripes 0..3 get 22 each
    val tail = out.filter($"patch_idx" === 2).select("features")
      .as[Seq[Float]].collect().head
    assert(tail.forall(f => math.abs(f - 22.0 * ('x' / 255.0)) < 1e-4))
    // deterministic across runs
    val again = Multimodal.extractPatchFeatures(df, "doc_id", "payload",
      patchBytes = 256, featureDim = 4)
      .filter($"patch_idx" === 0).select("features").as[Seq[Float]].collect().head
    assert(feats == again)
  }

  test("extractPatchFeatures drops empty and null payloads") {
    val df = Seq(
      (1L, Some("abc")), (2L, Some("")), (3L, None)
    ).toDF("doc_id", "text")
      .withColumn("payload", encode($"text", "UTF-8"))
    val out = Multimodal.extractPatchFeatures(df, "doc_id", "payload",
      patchBytes = 4, featureDim = 2)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("decodeStub is deterministic (kept as a pixel-level test fixture)") {
    assert(Multimodal.decodeStub(100L) == Multimodal.decodeStub(100L))
    assert(Multimodal.decodeStub(100L) == (64L + 100L, 64L + 3100L % 768L, "png"))
  }
}
