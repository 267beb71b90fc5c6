package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real byte-level media header parsing as a native codegen'd Catalyst
  * expression — the multimodal ingest path for a corpus where images ride
  * along as opaque `binary` columns. No imaging library involved: the
  * parser reads the container headers directly (JPEG SOFn segment walk,
  * PNG IHDR chunk, GIF logical screen descriptor, BMP BITMAPINFOHEADER,
  * WebP VP8/VP8L/VP8X), which is exactly what a 100 TB metadata pass
  * should do — O(header) per row, no full decode, no allocation beyond
  * the output struct, and the whole projection stays inside whole-stage
  * codegen (the generated code calls one static method; no
  * CodegenFallback).
  *
  * Returns `struct<width int, height int, channels int, format string>`,
  * or NULL for bytes that parse as none of the known containers
  * (truncated, corrupt, or not an image) — malformed media must surface
  * as a filterable null, never kill a 1000-executor job.
  */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_meta requires a binary input, got ${other.simpleString}")
  }

  override def dataType: DataType = ImageMeta.schema

  override def nullable: Boolean = true

  override def prettyName: String = "image_meta"

  override def nullSafeEval(input: Any): Any =
    ImageMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.plans.ImageMeta.parse($b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageMeta {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("format", StringType, nullable = true)))

  private def row(w: Int, h: Int, c: Int, fmt: String): InternalRow =
    if (w <= 0 || h <= 0 || c <= 0) null
    else InternalRow(w, h, c, UTF8String.fromString(fmt))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)
  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)

  /** Dispatch on the container signature; null when nothing matches. Called
    * from generated code — must stay a plain static-shaped method.
    */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 10) return null
    if (u8(b, 0) == 0x89 && u8(b, 1) == 0x50 && u8(b, 2) == 0x4E && u8(b, 3) == 0x47 &&
        u8(b, 4) == 0x0D && u8(b, 5) == 0x0A && u8(b, 6) == 0x1A && u8(b, 7) == 0x0A)
      return parsePng(b)
    if (u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) return parseJpeg(b)
    if (u8(b, 0) == 'G' && u8(b, 1) == 'I' && u8(b, 2) == 'F' && u8(b, 3) == '8' &&
        (u8(b, 4) == '7' || u8(b, 4) == '9') && u8(b, 5) == 'a')
      return parseGif(b)
    if (u8(b, 0) == 'B' && u8(b, 1) == 'M') return parseBmp(b)
    if (b.length >= 16 && u8(b, 0) == 'R' && u8(b, 1) == 'I' && u8(b, 2) == 'F' &&
        u8(b, 3) == 'F' && u8(b, 8) == 'W' && u8(b, 9) == 'E' && u8(b, 10) == 'B' &&
        u8(b, 11) == 'P')
      return parseWebp(b)
    null
  }

  /** PNG: signature (checked by the dispatcher), then the IHDR chunk —
    * 4-byte length (must be 13), "IHDR", width/height as big-endian u32,
    * bit depth, color type. Channels derive from the color type
    * (greyscale 1, truecolor 3, palette 1, grey+alpha 2, RGBA 4).
    */
  private def parsePng(b: Array[Byte]): InternalRow = {
    if (b.length < 26) return null
    if (be32(b, 8) != 13L) return null
    if (u8(b, 12) != 'I' || u8(b, 13) != 'H' || u8(b, 14) != 'D' || u8(b, 15) != 'R')
      return null
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
    val channels = u8(b, 25) match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette-indexed
      case 4 => 2 // greyscale + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return null
    }
    row(w.toInt, h.toInt, channels, "png")
  }

  /** JPEG: walk the marker segments from SOI until a start-of-frame
    * (SOF0–SOF15 minus DHT/JPG/DAC, which share the 0xCx range), whose
    * payload is precision, height u16, width u16, component count.
    * Every non-SOF segment is skipped by its declared length; an EOI or a
    * broken segment before any SOF yields null.
    */
  private def parseJpeg(b: Array[Byte]): InternalRow = {
    var pos = 2
    while (pos + 3 < b.length) {
      if (u8(b, pos) != 0xFF) return null
      var markerAt = pos + 1
      while (markerAt < b.length && u8(b, markerAt) == 0xFF) markerAt += 1 // fill bytes
      if (markerAt >= b.length) return null
      val m = u8(b, markerAt)
      if (m == 0xD9) return null // EOI before any SOF
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        pos = markerAt + 1 // standalone marker, no length field
      } else {
        if (markerAt + 2 >= b.length) return null
        val segLen = be16(b, markerAt + 1)
        if (segLen < 2) return null
        val isSof = (m >= 0xC0 && m <= 0xCF) && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          if (markerAt + 8 >= b.length || segLen < 8) return null
          val h = be16(b, markerAt + 4)
          val w = be16(b, markerAt + 6)
          val ncomp = u8(b, markerAt + 8)
          return row(w, h, ncomp, "jpeg")
        }
        pos = markerAt + 1 + segLen
      }
    }
    null
  }

  /** GIF: 6-byte version header then the logical screen descriptor with
    * width/height as little-endian u16. Indexed color decodes to RGB.
    */
  private def parseGif(b: Array[Byte]): InternalRow =
    row(le16(b, 6), le16(b, 8), 3, "gif")

  /** BMP: "BM" file header, then a BITMAPINFOHEADER (biSize >= 40): width
    * as signed LE i32 at 18, height at 22 (negative = top-down — the
    * magnitude is the pixel height), bits-per-pixel LE u16 at 28.
    */
  private def parseBmp(b: Array[Byte]): InternalRow = {
    if (b.length < 30) return null
    val biSize = le32(b, 14)
    if (biSize < 40) return null
    val w = le32(b, 18).toInt
    val hRaw = le32(b, 22).toInt
    val h = math.abs(hRaw)
    val bpp = le16(b, 28)
    if (bpp <= 0 || bpp % 8 != 0 && bpp != 1 && bpp != 4) return null
    val channels = math.max(1, bpp / 8)
    row(w, h, channels, "bmp")
  }

  /** WebP: RIFF container, first chunk VP8 (lossy — dimensions in the
    * frame tag after the 9D 01 2A start code), VP8L (lossless — packed
    * 14-bit fields after the 2F signature), or VP8X (extended — 24-bit
    * canvas size minus one, plus an alpha flag).
    */
  private def parseWebp(b: Array[Byte]): InternalRow = {
    if (b.length < 30) return null
    val tag = new String(Array(b(12), b(13), b(14), b(15)), "US-ASCII")
    tag match {
      case "VP8 " =>
        if (u8(b, 23) != 0x9D || u8(b, 24) != 0x01 || u8(b, 25) != 0x2A) return null
        row(le16(b, 26) & 0x3FFF, le16(b, 28) & 0x3FFF, 3, "webp")
      case "VP8L" =>
        if (u8(b, 20) != 0x2F) return null
        val bits = le32(b, 21)
        val w = (bits & 0x3FFF).toInt + 1
        val h = ((bits >> 14) & 0x3FFF).toInt + 1
        val alpha = ((bits >> 28) & 1L) == 1L
        row(w, h, if (alpha) 4 else 3, "webp")
      case "VP8X" =>
        val alpha = (u8(b, 20) & 0x10) != 0
        row(le24(b, 24) + 1, le24(b, 27) + 1, if (alpha) 4 else 3, "webp")
      case _ => null
    }
  }
}

/** Per-stripe byte-histogram moments over a binary chunk — the
  * deterministic patch "feature vector" of the multimodal pipeline
  * ([[graft.operators.Multimodal.extractPatchFeatures]]), as a native
  * codegen'd expression so the explode-to-patch-grain path needs no
  * `.rdd`/`mapPartitions` escape. Accumulates in double with ONE float
  * rounding per stripe (engine-portable: an oracle can reproduce the
  * floats exactly, which a per-byte float += would not allow).
  */
case class BinaryStripeMoments(child: Expression, dim: Int)
    extends UnaryExpression {

  require(dim > 0, "stripe dimension must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"binary_stripe_moments requires a binary input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def prettyName: String = "binary_stripe_moments"

  override def nullSafeEval(input: Any): Any =
    BinaryStripeMoments.moments(input.asInstanceOf[Array[Byte]], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"${ev.value} = graft.plans.BinaryStripeMoments.moments($b, $dim);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BinaryStripeMoments {
  def moments(bytes: Array[Byte], dim: Int): ArrayData = {
    val acc = new Array[Double](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xFF) / 255.0
      i += 1
    }
    val out = new Array[Float](dim)
    var k = 0
    while (k < dim) { out(k) = acc(k).toFloat; k += 1 }
    new GenericArrayData(out)
  }
}

object ImageExpressions {
  /** Column API for [[ImageMeta]]. */
  def imageMeta(bin: Column): Column =
    Bridge.column(ImageMeta(Bridge.expression(bin)))

  /** Column API for [[BinaryStripeMoments]]. */
  def stripeMoments(bin: Column, dim: Int): Column =
    Bridge.column(BinaryStripeMoments(Bridge.expression(bin), dim))
}
