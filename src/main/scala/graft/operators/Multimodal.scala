package graft.operators

import graft.plans.ImageExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride along as opaque
  * `binary` columns with typed metadata. The metadata pass is a REAL
  * byte-level container parse (JPEG SOF segment walk, PNG IHDR, GIF,
  * BMP, WebP — [[graft.plans.ImageMeta]], a native codegen'd Catalyst
  * expression; no imaging library, no full decode, O(header) per row).
  * Full pixel decode / model inference still needs libs this runtime
  * lacks — [[decodeStub]] remains as a clearly-marked deterministic test
  * fixture for pipelines that want fake pixel-level outputs.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("format", StringType, nullable = true)))

  /** STUB pixel decode (test fixture only): deterministic pseudo-metadata
    * from the payload size, kept for specs that exercise the plumbing
    * without constructing container bytes. Header-level metadata should
    * use [[extractMeta]], which parses the real bytes.
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

  /** Media metadata from a binary column by parsing the actual container
    * headers — a pure projection (scan-side, whole-stage codegen, no
    * shuffle, no `.rdd`). Unparseable payloads yield NULL metadata with
    * their byte length intact, so corrupt media is filterable, not fatal.
    */
  def extractMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val meta = ImageExpressions.imageMeta(col(binCol))
    df.select(
      col(idCol).cast("long").as("doc_id"),
      coalesce(octet_length(col(binCol)).cast("long"), lit(0L)).as("n_bytes"),
      meta.getField("width").as("width"),
      meta.getField("height").as("height"),
      meta.getField("channels").as("channels"),
      meta.getField("format").as("format"))
  }

  val patchSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("patch_idx", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Patch/frame feature extraction: split the payload into
    * `patchBytes`-sized chunks ("frames"/"patches") and emit a small
    * deterministic feature vector per chunk — the dataflow of
    * frame-sampling + per-frame encoder inference (explode to patch
    * grain, bounded memory per row, features as `array<float>` ready for
    * the Similarity operators). The per-chunk vector is
    * [[graft.plans.BinaryStripeMoments]] (byte-histogram stripe moments,
    * native codegen); swap that one expression for a real encoder call
    * when the runtime has one. Entirely declarative: explode over a
    * `sequence`, binary `substring` per patch — Catalyst prunes and
    * pipelines it like any other projection.
    */
  def extractPatchFeatures(
      df: DataFrame,
      idCol: String,
      binCol: String,
      patchBytes: Int = 256,
      featureDim: Int = 8): DataFrame = {
    val nPatches = ceil(octet_length(col(binCol)).cast("double") / lit(patchBytes))
      .cast("int")
    df.select(col(idCol).cast("long").as("doc_id"), col(binCol).as("_payload"),
        nPatches.as("_np"))
      .where(col("_np") > 0)
      .select(col("doc_id"), col("_payload"),
        explode(sequence(lit(0), col("_np") - 1)).as("patch_idx"))
      .select(
        col("doc_id"),
        col("patch_idx"),
        ImageExpressions.stripeMoments(
          substring(col("_payload"), col("patch_idx") * patchBytes + 1,
            lit(patchBytes)),
          featureDim).as("features"))
  }

  // ---- in-plan synthesis of real container bytes ------------------------

  private def hexBE(c: Column, nBytes: Int): Column =
    lpad(hex(c.cast("long")), nBytes * 2, "0")

  private def hexLE(c: Column, nBytes: Int): Column =
    concat((0 until nBytes).map(i =>
      lpad(hex(pmod(shiftright(c.cast("long"), 8 * i), lit(256L))), 2, "0")): _*)

  /** Real image-container bytes built in-plan from `(fmt, w, h, alt)` —
    * fmt 0=png 1=jpeg 2=gif 3=bmp, `alt` varies the channel layout. The
    * headers follow the container specs byte-for-byte (PNG signature +
    * IHDR + IEND, JPEG SOI + JFIF APP0 + SOF0 + EOI, GIF89a logical
    * screen descriptor, BMP BITMAPINFOHEADER); the one liberty is the PNG
    * IHDR CRC (a fixed placeholder — fast metadata scanners, this parser
    * included, do not validate checksums; fully-valid golden files are
    * pinned in ImageMetaSpec). Everything is `concat`/`hex`/`unhex` —
    * engine-portable, so an oracle can re-derive the expected metadata
    * and byte count arithmetically.
    */
  def syntheticImage(fmt: Column, w: Column, h: Column, alt: Column): Column = {
    val pngColorType = when(pmod(alt, lit(2)) === 0, lit("06")).otherwise(lit("02"))
    val png = concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D49484452"), // IHDR length 13 + type
      hexBE(w, 4), hexBE(h, 4),
      lit("08"), pngColorType, lit("000000"), // bit depth 8, compression/filter/interlace 0
      lit("DEADBEEF"), // IHDR CRC placeholder (not validated)
      lit("0000000049454E44AE426082")) // empty IEND chunk
    val nComp = when(pmod(alt, lit(5)) === 0, lit(1)).otherwise(lit(3))
    val comps = when(nComp === 1, lit("011100"))
      .otherwise(lit("011100021101031101"))
    val jpeg = concat(
      lit("FFD8"), // SOI
      lit("FFE000104A46494600010100000100010000"), // APP0 JFIF, length 16
      lit("FFC0"), hexBE(nComp * 3 + 8, 2), // SOF0 + length
      lit("08"), hexBE(h, 2), hexBE(w, 2), hexBE(nComp, 1), comps,
      lit("FFD9")) // EOI
    val gif = concat(
      lit("474946383961"), // "GIF89a"
      hexLE(w, 2), hexLE(h, 2),
      lit("000000"), // no GCT, background 0, aspect 0
      lit("3B")) // trailer
    val bpp = when(pmod(alt, lit(3)) === 0, lit(32)).otherwise(lit(24))
    val bmp = concat(
      lit("424D"), hexLE(lit(54), 4), lit("00000000"), hexLE(lit(54), 4), // BM, size, offset
      hexLE(lit(40), 4), hexLE(w, 4), hexLE(h, 4), // BITMAPINFOHEADER
      lit("0100"), hexLE(bpp, 2), // planes 1, bpp
      lit("0" * 48)) // compression..clrImportant all zero
    unhex(
      when(fmt === 0, png).when(fmt === 1, jpeg).when(fmt === 2, gif)
        .otherwise(bmp))
  }

  /** Expected metadata of [[syntheticImage]] bytes, derived arithmetically
    * (no byte parsing) — the oracle side of the construct-then-parse gate,
    * also usable in DuckDB via plain CASE arithmetic.
    */
  def syntheticImageExpected(fmt: Column, alt: Column): (Column, Column, Column) = {
    val channels = when(fmt === 0, when(pmod(alt, lit(2)) === 0, 4).otherwise(3))
      .when(fmt === 1, when(pmod(alt, lit(5)) === 0, 1).otherwise(3))
      .when(fmt === 2, lit(3))
      .otherwise(when(pmod(alt, lit(3)) === 0, 4).otherwise(3))
    val nBytes = when(fmt === 0, lit(45L))
      .when(fmt === 1, when(pmod(alt, lit(5)) === 0, 35L).otherwise(41L))
      .when(fmt === 2, lit(14L))
      .otherwise(lit(54L))
    val format = when(fmt === 0, "png").when(fmt === 1, "jpeg")
      .when(fmt === 2, "gif").otherwise(lit("bmp"))
    (channels, nBytes, format)
  }
}
