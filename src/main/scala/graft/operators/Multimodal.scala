package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride along as opaque
  * `binary` columns with typed metadata. The Spark-side mechanics — schema,
  * per-partition batched processing, deterministic output contract — are
  * real; the actual media decode is STUBBED (no imaging libs in this
  * container) with a clearly-marked deterministic fake derived only from the
  * byte length, so the pipeline is testable end-to-end and oracle-checkable.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** STUB decode: deterministic pseudo-metadata from the payload size.
    * Replace with a real image header parse (e.g. javax.imageio) when the
    * runtime has media libs. Kept total + deterministic so the DuckDB oracle
    * can replicate it.
    */
  def decodeStub(nBytes: Long): (Long, Long, String) = {
    val width = 64L + nBytes % 1024L
    val height = 64L + (nBytes * 31L) % 768L
    val format = (nBytes % 3L) match {
      case 0L => "jpeg"
      case 1L => "png"
      case _ => "webp"
    }
    (width, height, format)
  }

  /** Extract media metadata from a binary column. Runs as `mapPartitions`
    * over the binary payloads — the shape a real decoder needs (per-partition
    * batches, one in-memory buffer at a time, no driver collect).
    */
  def extractMeta(spark: SparkSession, df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val rdd = df.select(col(idCol).cast("long"), col(binCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val n = if (bytes == null) 0L else bytes.length.toLong
        val (w, h, f) = decodeStub(n)
        Row(id, n, w, h, f)
      }
    }
    spark.createDataFrame(rdd, metaSchema)
  }

  val patchSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("patch_idx", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB feature extraction: split the payload into `patchBytes`-sized
    * chunks ("frames"/"patches") and emit a small deterministic feature
    * vector per chunk — the dataflow of frame-sampling + per-frame encoder
    * inference (explode to patch grain, bounded memory per row, features as
    * `array<float>` ready for the Similarity operators). Replace the inner
    * loop with a real decoder+model call when the runtime has one.
    */
  def extractPatchFeatures(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String,
      patchBytes: Int = 256,
      featureDim: Int = 8): DataFrame = {
    val rdd = df.select(col(idCol).cast("long"), col(binCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        bytes.grouped(patchBytes).zipWithIndex.map { case (chunk, idx) =>
          // deterministic fake "embedding": byte histogram moments per
          // stripe. Accumulated in double with ONE float rounding per
          // stripe, so an engine-portable oracle can reproduce the floats
          // exactly (sequential float += would round per byte).
          val acc = new Array[Double](featureDim)
          var i = 0
          while (i < chunk.length) {
            acc(i % featureDim) += (chunk(i) & 0xFF) / 255.0
            i += 1
          }
          val feats = new Array[Float](featureDim)
          var k = 0
          while (k < featureDim) { feats(k) = acc(k).toFloat; k += 1 }
          Row(id, idx, feats.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, patchSchema)
  }
}
