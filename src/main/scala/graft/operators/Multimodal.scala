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

  val avSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("channels", LongType, nullable = true),
    StructField("sample_rate", LongType, nullable = true),
    StructField("bits_per_sample", LongType, nullable = true),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Audio/video metadata from a binary column by parsing the actual
    * WAV/RIFF and MP4/ISO-BMFF headers ([[graft.plans.MediaMeta]]) — the
    * [[extractMeta]] discipline for the other two container families:
    * scan-side, whole-stage codegen, O(header) per row, NULL metadata
    * with the byte length intact on unparseable payloads.
    */
  def extractAvMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val meta = graft.plans.MediaExpressions.mediaMeta(col(binCol))
    df.select(
      col(idCol).cast("long").as("doc_id"),
      coalesce(octet_length(col(binCol)).cast("long"), lit(0L)).as("n_bytes"),
      meta.getField("format").as("format"),
      meta.getField("media_type").as("media_type"),
      meta.getField("channels").cast("long").as("channels"),
      meta.getField("sample_rate").cast("long").as("sample_rate"),
      meta.getField("bits_per_sample").cast("long").as("bits_per_sample"),
      meta.getField("width").cast("long").as("width"),
      meta.getField("height").cast("long").as("height"),
      meta.getField("duration_ms").as("duration_ms"))
  }

  // ---- in-plan synthesis of real container bytes ------------------------

  // both field writers NULL on out-of-range values instead of emitting
  // corrupt bytes: lpad TRUNCATES a hex string longer than the target
  // width (e.g. a width > 65535 into a 2-byte JPEG SOF field), and the
  // null propagates through concat/unhex to a null payload the parser
  // reports as unreadable — fail visibly, not byte-corrupted
  private def inRange(c: Column, nBytes: Int): Column =
    c.cast("long").between(0L, (1L << (8 * nBytes)) - 1L)

  private def hexBE(c: Column, nBytes: Int): Column =
    when(inRange(c, nBytes), lpad(hex(c.cast("long")), nBytes * 2, "0"))

  private def hexLE(c: Column, nBytes: Int): Column =
    when(inRange(c, nBytes), concat((0 until nBytes).map(i =>
      lpad(hex(pmod(shiftright(c.cast("long"), 8 * i), lit(256L))), 2, "0")): _*))

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

  // ---- in-plan synthesis of real AUDIO/VIDEO container bytes ------------
  //
  // The same construct-then-parse gate device as syntheticImage, for the
  // MediaMeta families: WAV/RIFF with a real fmt chunk and a zero-filled
  // data chunk, and MP4/ISO-BMFF with a spec-correct box tree
  // (ftyp + moov{mvhd + trak{tkhd + mdia{mdhd + hdlr + minf{stbl{stsd}}}}}).
  // Every box size is a layout constant; only the metadata fields vary, so
  // an oracle re-derives everything arithmetically.

  private val Mp4Matrix = // the identity transform matrix, 9 × 16.16/2.30
    "000100000000000000000000" + "000000000001000000000000" +
      "000000000000000040000000"

  private def mvhdHex(durMs: Column): Column = concat(
    lit("0000006C6D766864" + "00000000" + "00000000" + "00000000" + "000003E8"),
    hexBE(durMs, 4), // timescale 1000 ⇒ duration IS milliseconds
    lit("00010000" + "0100" + "0000" + "0000000000000000" + Mp4Matrix +
      ("0" * 48) + "00000002"))

  private def tkhdHex(w: Column, h: Column, durMs: Column): Column = concat(
    lit("0000005C746B6864" + "00000007" + "00000000" + "00000000" +
      "00000001" + "00000000"),
    hexBE(durMs, 4),
    lit("0000000000000000" + "0000" + "0000" + "0000" + "0000" + Mp4Matrix),
    hexBE(w, 2), lit("0000"), hexBE(h, 2), lit("0000"))

  private def mdhdHex(durMs: Column): Column = concat(
    lit("000000206D646864" + "00000000" + "00000000" + "00000000" + "000003E8"),
    hexBE(durMs, 4), lit("55C4" + "0000"))

  private def hdlrHex(handler: String): Column =
    lit("0000002168646C72" + "00000000" + "00000000" +
      handler.map(c => f"${c.toInt}%02X").mkString + ("0" * 24) + "00")

  // EBML/Matroska scaffolding (all layout constants; only the metadata
  // fields vary): a spec-correct EBML header (DocType "matroska"), an
  // Info with the default 1 ms TimestampScale, and a one-track Tracks.
  // Duration and SamplingFrequency are FLOAT elements in EBML and are
  // deliberately omitted (both optional; the parser falls back to the
  // spec defaults), keeping the synthesis integer-only and the oracle
  // arithmetic.
  private val MkvEbmlHeader = "1A45DFA3" + "A3" +
    "4286810142F7810142F2810442F38108" + // versions + max id/size lengths
    "4282886D6174726F736B61" + // DocType "matroska"
    "4287810442858102" // DocTypeVersion 4, DocTypeReadVersion 2
  private val MkvInfo = "1549A966" + "87" + "2AD7B1" + "83" + "0F4240"

  private def mkvVideoHex(w: Column, h: Column): Column = concat(
    lit(MkvEbmlHeader + "18538067" + "AE" + MkvInfo +
      "1654AE6B" + "9D" + "AE" + "9B" +
      "D78101" + "73C58101" + "838101" + // number 1, uid 1, type video
      "8685" + "565F414231" + // CodecID "V_AB1"
      "E0" + "88" + "B082"), // Video element: PixelWidth
    hexBE(w, 2), lit("BA82"), hexBE(h, 2))

  private def mkvAudioHex(ch: Column): Column = concat(
    lit(MkvEbmlHeader + "18538067" + "A9" + MkvInfo +
      "1654AE6B" + "98" + "AE" + "96" +
      "D78101" + "73C58101" + "838102" + // number 1, uid 1, type audio
      "8685" + "415F414231" + // CodecID "A_AB1"
      "E1" + "83" + "9F81"), // Audio element: Channels
    hexBE(ch, 1))

  /** Real media-container bytes built in-plan from `(fmt, …)` — fmt
    * 0 = WAV (channels `ch`, sample rate `rate`, bits `bits`, `dataBytes`
    * of zero samples), 1 = MP4 with one video track (`w`×`h`, `durMs`),
    * 2 = MP4 with one audio track (`ch`, `rate`, `durMs`),
    * 3 = truncated RIFF junk (the corrupt row — parser must yield NULL
    * metadata, n_bytes intact), 4 = MKV with one video track (`w`×`h`),
    * 5 = MKV with one audio track (`ch`; sampling frequency omitted — the
    * parser reports the spec default 8000). Headers follow the container
    * specs byte-for-byte; everything is `concat`/`hex`/`unhex`, so an
    * oracle re-derives the expected metadata and byte counts
    * arithmetically.
    */
  def syntheticMedia(fmt: Column, ch: Column, rate: Column, bits: Column,
      dataBytes: Column, w: Column, h: Column, durMs: Column): Column = {
    val bytesPerSample = shiftright(bits.cast("long"), 3) // bits/8, integer
    val byteRate = rate * ch * bytesPerSample
    val blockAlign = ch * bytesPerSample
    val wav = concat(
      lit("52494646"), hexLE(lit(36) + dataBytes, 4), lit("57415645"),
      lit("666D7420"), hexLE(lit(16), 4), lit("0100"),
      hexLE(ch, 2), hexLE(rate, 4), hexLE(byteRate, 4),
      hexLE(blockAlign, 2), hexLE(bits, 2),
      lit("64617461"), hexLE(dataBytes, 4),
      call_function("repeat", lit("00"), dataBytes))
    val ftyp = lit("0000001066747970" + "69736F6D" + "00000000")
    // video sample entry (avc1, 86 B) — dims repeated per the spec; the
    // parser takes canvas dims from tkhd
    val avc1 = concat(
      lit("0000005661766331" + "000000000000" + "0001" + "0000" + "0000" +
        ("0" * 24)),
      hexBE(w, 2), hexBE(h, 2),
      lit("00480000" + "00480000" + "00000000" + "0001" + ("0" * 64) +
        "0018" + "FFFF"))
    val stsdV = concat(lit("0000006673747364" + "00000000" + "00000001"), avc1)
    val minfV = concat(lit("000000766D696E66" + "0000006E7374626C"), stsdV)
    val mdiaV = concat(lit("000000BF6D646961"), mdhdHex(durMs),
      hdlrHex("vide"), minfV)
    val trakV = concat(lit("000001237472616B"), tkhdHex(w, h, durMs), mdiaV)
    val moovV = concat(lit("000001976D6F6F76"), mvhdHex(durMs), trakV)
    val mp4v = concat(ftyp, moovV)
    // audio sample entry (mp4a, 36 B): channels, 16-bit samples, 16.16 rate
    val mp4a_ = concat(
      lit("000000246D703461" + "000000000000" + "0001" + "0000000000000000"),
      hexBE(ch, 2), lit("0010" + "0000" + "0000"), hexBE(rate, 2), lit("0000"))
    val stsdA = concat(lit("0000003473747364" + "00000000" + "00000001"), mp4a_)
    val minfA = concat(lit("000000446D696E66" + "0000003C7374626C"), stsdA)
    val mdiaA = concat(lit("0000008D6D646961"), mdhdHex(durMs),
      hdlrHex("soun"), minfA)
    val trakA = concat(lit("000000F17472616B"),
      tkhdHex(lit(0), lit(0), durMs), mdiaA)
    val moovA = concat(lit("000001656D6F6F76"), mvhdHex(durMs), trakA)
    val mp4a = concat(ftyp, moovA)
    val corrupt = lit("524946460000") // RIFF sig cut short of any chunk
    unhex(
      when(fmt === 0, wav).when(fmt === 1, mp4v).when(fmt === 2, mp4a)
        .when(fmt === 4, mkvVideoHex(w, h))
        .when(fmt === 5, mkvAudioHex(ch))
        .otherwise(corrupt))
  }

  // ---- in-plan synthesis of real AUDIO-CODEC container bytes ------------
  //
  // The construct-then-parse device for the remaining MediaMeta families:
  // FLAC (STREAMINFO bit fields), MP3 (ID3v2 tag + MPEG-1 Layer III frame
  // header + CBR payload), and Ogg first pages carrying a Vorbis id packet
  // or an OpusHead. Every layout byte is a constant; only metadata fields
  // vary, so an oracle re-derives everything arithmetically.

  /** Real audio-container bytes built in-plan — fmt 0 = FLAC (channels
    * `ch` 1–8, sample rate `rate` < 2^19, bits 4–32, `samples` < 2^36
    * total samples), 1 = MP3 with a zero-size ID3v2.4 tag, an MPEG-1
    * Layer III frame header (`brIdx` 1–14, `srIdx` 0–2, `chMode` 0–3)
    * and `db` zero payload bytes, 2 = Ogg page 0 with a Vorbis
    * identification packet (`ch`, `rate`), 3 = Ogg page 0 with an
    * OpusHead (`ch`, `rate`), 4 = a FLAC whose STREAMINFO declares 34
    * bytes but truncates after 10 (the corrupt row — parser must yield
    * NULL metadata, n_bytes intact), 5 = VBR MP3 whose first frame
    * carries a Xing header with `samples` as the frame count.
    */
  def syntheticAudio(fmt: Column, ch: Column, rate: Column, bits: Column,
      samples: Column, brIdx: Column, srIdx: Column, chMode: Column,
      db: Column): Column = {
    // STREAMINFO packs rate:20 | ch-1:3 | bits-1:5 | samples:36 into one
    // big-endian 8-byte field; rate < 2^19 keeps the product far inside a
    // signed long, and the two 4-byte halves dodge hexBE's 7-byte limit
    val packed = rate.cast("long") * lit(1L << 44) +
      (ch.cast("long") - 1L) * lit(1L << 41) +
      (bits.cast("long") - 1L) * lit(1L << 36) + samples.cast("long")
    val packedHex = concat(
      hexBE(shiftright(packed, 32), 4), hexBE(pmod(packed, lit(1L << 32)), 4))
    val flacInfo = concat(
      lit("1000" + "1000"), // min/max block size 4096
      lit("000000" + "000000"), // min/max frame size unknown
      packedHex,
      lit("0" * 32)) // unpopulated MD5
    val flac = concat(lit("664C6143" + "80" + "000022"), flacInfo)
    val mp3 = concat(
      lit("494433" + "0400" + "00" + "00000000"), // ID3v2.4, flags 0, size 0
      lit("FFFB"), // frame sync + MPEG-1 + Layer III + no CRC
      hexBE(brIdx * 16 + srIdx * 4, 1), // bitrate/samplerate idx, no padding
      hexBE(chMode * 64, 1), // channel mode, no mode ext/copyright/emphasis
      call_function("repeat", lit("00"), db))
    // one Ogg page: header (27 B) + 1-entry lacing table + the id packet
    def oggPage(segLen: Int, packet: Column): Column = concat(
      lit("4F676753" + "00" + "02" + ("0" * 16) + // OggS, v0, BOS, granule 0
        ("0" * 8) + ("0" * 8) + ("0" * 8) + "01"), // serial/seq/crc 0, 1 seg
      lit(f"$segLen%02X"), packet)
    val vorbisPacket = concat(
      lit("01" + "766F72626973" + "00000000"), // \x01vorbis, version 0
      hexLE(ch, 1), hexLE(rate, 4),
      lit(("0" * 24) + "B8" + "01")) // bitrates 0, blocksizes 2^8/2^11, framing
    val opusPacket = concat(
      lit("4F70757348656164" + "01"), // OpusHead, version 1
      hexLE(ch, 1), lit("0000"), // pre-skip 0
      hexLE(rate, 4), lit("0000" + "00")) // output gain 0, mapping family 0
    val corrupt = concat(lit("664C6143" + "80" + "000022"), lit("0" * 20))
    // fmt 5 = VBR MP3: same tag + frame header, then the MPEG-1 side-info
    // region (17 B mono / 32 B otherwise, zeros) and a Xing header with the
    // FRAMES flag carrying `samples` as the total frame count — the
    // header-only exact-duration path (frames·1152/rate)
    val mp3vbr = concat(
      lit("494433" + "0400" + "00" + "00000000"),
      lit("FFFB"),
      hexBE(brIdx * 16 + srIdx * 4, 1),
      hexBE(chMode * 64, 1),
      call_function("repeat", lit("00"),
        when(chMode === 3, 17).otherwise(32)),
      lit("58696E67" + "00000001"), // "Xing", flags = FRAMES
      hexBE(samples, 4),
      call_function("repeat", lit("00"), db))
    unhex(
      when(fmt === 0, flac).when(fmt === 1, mp3)
        .when(fmt === 2, oggPage(30, vorbisPacket))
        .when(fmt === 3, oggPage(19, opusPacket))
        .when(fmt === 5, mp3vbr)
        .otherwise(corrupt))
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
