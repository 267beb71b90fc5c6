package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Audio/video container header parsing as a native codegen'd Catalyst
  * expression — the [[ImageMeta]] discipline extended to the container
  * families a training corpus's binary columns carry: WAV/RIFF
  * (fmt-chunk walk: channels, sample rate, bits per sample; duration from
  * the data chunk against the declared byte rate), MP4/ISO-BMFF (box
  * walk: `moov/mvhd` duration, `trak/tkhd` video dimensions,
  * `trak/mdia/hdlr` handler type, `stbl/stsd` audio sample entry for
  * channel count and sample rate), MKV/WebM (EBML element walk), FLAC
  * (STREAMINFO bit fields: rate/channels/bits/total-samples), MP3
  * (ID3v2 skip + first MPEG-1 Layer III frame header; duration from the
  * audio byte count against the frame bitrate) and Ogg (page 0's id
  * packet: Vorbis identification header or OpusHead). O(header) per
  * row — every walk skips by declared sizes and never touches media
  * payloads; no codec library, no full demux, and the projection stays
  * inside whole-stage codegen (one static call, no CodegenFallback).
  *
  * Returns `struct<format, media_type, channels, sample_rate,
  * bits_per_sample, width, height, duration_ms>` with NULL fields where a
  * container legitimately lacks them (a video-only MP4 has no channels;
  * WAV has no width), or NULL for bytes that parse as neither container —
  * corrupt media must surface as a filterable null, never kill a
  * 1000-executor job.
  */
case class MediaMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_meta requires a binary input, got ${other.simpleString}")
  }

  override def dataType: DataType = MediaMeta.schema

  override def nullable: Boolean = true

  override def prettyName: String = "media_meta"

  override def nullSafeEval(input: Any): Any =
    MediaMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.plans.MediaMeta.parse($b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaMeta {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def cc(b: Array[Byte], i: Int, a: Char, c2: Char, c3: Char, c4: Char): Boolean =
    u8(b, i) == a && u8(b, i + 1) == c2 && u8(b, i + 2) == c3 && u8(b, i + 3) == c4

  /** Dispatch on the container signature; null when nothing matches. Called
    * from generated code — must stay a plain static-shaped method.
    */
  def parse(b: Array[Byte]): InternalRow = {
    // 12 bytes covers every signature probe below (RIFF+WAVE and ftyp read
    // through offset 11); each family parser bounds-checks its own walk
    if (b == null || b.length < 12) return null
    if (cc(b, 0, 'R', 'I', 'F', 'F') && cc(b, 8, 'W', 'A', 'V', 'E'))
      return parseWav(b)
    // ISO BMFF: the first box must be ftyp (size u32 BE, then the fourcc)
    if (b.length >= 12 && cc(b, 4, 'f', 't', 'y', 'p')) return parseMp4(b)
    // EBML signature 1A 45 DF A3 opens Matroska/WebM
    if (u8(b, 0) == 0x1A && u8(b, 1) == 0x45 && u8(b, 2) == 0xDF && u8(b, 3) == 0xA3)
      return parseMkv(b)
    if (cc(b, 0, 'f', 'L', 'a', 'C')) return parseFlac(b)
    if (cc(b, 0, 'O', 'g', 'g', 'S')) return parseOgg(b)
    if (u8(b, 0) == 'I' && u8(b, 1) == 'D' && u8(b, 2) == '3') return parseMp3(b)
    if (u8(b, 0) == 0xFF && (u8(b, 1) & 0xE0) == 0xE0) return parseMp3(b)
    null
  }

  /** FLAC: `fLaC` marker, then metadata blocks (1-byte last-flag + type,
    * u24 BE length); STREAMINFO (type 0, ≥18 B of interest) packs
    * `rate:20 | channels−1:3 | bits−1:5 | total_samples:36` into the
    * 8 bytes after the block/frame size bounds. Duration is the exact
    * integer `samples·1000 / rate`; a block that overruns the buffer or
    * a stream whose last block arrives without STREAMINFO yields null.
    */
  private def parseFlac(b: Array[Byte]): InternalRow = {
    var pos = 4
    while (pos + 4 <= b.length) {
      val hdr = u8(b, pos)
      val len = (u8(b, pos + 1) << 16) | (u8(b, pos + 2) << 8) | u8(b, pos + 3)
      val payload = pos + 4
      if (payload + len > b.length) return null
      if ((hdr & 0x7F) == 0) {
        if (len < 18) return null
        val x = be64(b, payload + 10)
        val rate = (x >>> 44).toInt
        val ch = (((x >>> 41) & 7L) + 1L).toInt
        val bits = (((x >>> 36) & 0x1FL) + 1L).toInt
        val samples = x & ((1L << 36) - 1L)
        if (rate <= 0) return null
        val durationMs: Any = if (samples > 0) samples * 1000L / rate else null
        return InternalRow(
          UTF8String.fromString("flac"), UTF8String.fromString("audio"),
          ch, rate, bits, null, null, durationMs)
      }
      if ((hdr & 0x80) != 0) return null // last block, STREAMINFO never seen
      pos = payload + len
    }
    null
  }

  // MPEG-1 Layer III frame-header tables (bitrate kbit/s by index 1..14;
  // sample rate by the 2-bit index; index 0 is "free" and 15/3 invalid)
  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** MP3: optional ID3v2 tag (10-byte header + syncsafe u28 size) skipped,
    * then the first frame header — restricted to MPEG-1 Layer III (the
    * overwhelmingly dominant encoding; anything else yields null).
    * Channels from the mode bits (mono = 1, every other mode 2). Duration:
    * a Xing/Info header in the first frame (after the 17/32-byte MPEG-1
    * side info — still O(header)) with the FRAMES flag gives the exact
    * `frames·1152/rate`; otherwise the CBR estimate
    * `audio_bytes·8 / bitrate_kbps` in exact integer ms.
    */
  private def parseMp3(b: Array[Byte]): InternalRow = {
    var pos = 0
    if (u8(b, 0) == 'I' && u8(b, 1) == 'D' && u8(b, 2) == '3') {
      if (b.length < 10) return null
      var sz = 0
      var i = 6
      while (i < 10) {
        val v = u8(b, i)
        if ((v & 0x80) != 0) return null // syncsafe bytes keep the top bit 0
        sz = (sz << 7) | v
        i += 1
      }
      pos = 10 + sz
    }
    if (pos + 4 > b.length) return null
    if (u8(b, pos) != 0xFF) return null
    val b1 = u8(b, pos + 1)
    if ((b1 & 0xE0) != 0xE0) return null
    if (((b1 >> 3) & 3) != 3 || ((b1 >> 1) & 3) != 1) return null // MPEG-1 L3
    val b2 = u8(b, pos + 2)
    val brIdx = (b2 >> 4) & 0xF
    val srIdx = (b2 >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return null
    val mode = (u8(b, pos + 3) >> 6) & 3
    val ch = if (mode == 3) 1 else 2
    // VBR: a Xing/Info header sits in the FIRST frame right after the
    // side info (MPEG-1: 17 bytes mono, 32 stereo) — still O(header).
    // A CRC-protected frame (protection_bit = 0, header bit 0 of byte 1
    // clear) carries a 16-bit CRC between the header and the side info,
    // shifting the probe by 2. FRAMES flag set → duration = frames ·
    // 1152 samples / rate, exact integer ms; otherwise fall back to the
    // CBR byte-length estimate (wrong for VBR, the common
    // podcast/user-audio case).
    val xp = pos + 4 + (if ((b1 & 1) == 0) 2 else 0) +
      (if (mode == 3) 17 else 32)
    var durationMs: Any = (b.length - pos).toLong * 8L / Mp3Bitrates(brIdx)
    if (xp + 8 <= b.length &&
        (cc(b, xp, 'X', 'i', 'n', 'g') || cc(b, xp, 'I', 'n', 'f', 'o'))) {
      val flags = be32(b, xp + 4)
      if ((flags & 1L) != 0 && xp + 12 <= b.length) {
        val frames = be32(b, xp + 8)
        if (frames > 0) durationMs = frames * 1152L * 1000L / Mp3Rates(srIdx)
      }
    }
    InternalRow(UTF8String.fromString("mp3"), UTF8String.fromString("audio"),
      ch, Mp3Rates(srIdx), null, null, null, durationMs)
  }

  /** Ogg: the first page (27-byte header + lacing table) must carry the
    * stream's identification packet — a Vorbis id header (`\x01vorbis`:
    * version 0, channels u8, rate LE u32) or an `OpusHead` (channels u8
    * at +9, input sample rate LE u32 at +12). Duration lives in the LAST
    * page's granule position, out of O(header) scope — null.
    */
  private def parseOgg(b: Array[Byte]): InternalRow = {
    if (b.length < 28 || u8(b, 4) != 0) return null
    val nSegs = u8(b, 26)
    if (nSegs < 1) return null
    val p = 27 + nSegs
    if (p + 16 > b.length) return null
    if (u8(b, p) == 1 &&
        cc(b, p + 1, 'v', 'o', 'r', 'b') &&
        u8(b, p + 5) == 'i' && u8(b, p + 6) == 's') {
      if (le32(b, p + 7) != 0L) return null // vorbis_version must be 0
      val ch = u8(b, p + 11)
      val rate = le32(b, p + 12)
      if (ch <= 0 || rate <= 0) return null
      return InternalRow(UTF8String.fromString("ogg"), UTF8String.fromString("audio"),
        ch, rate.toInt, null, null, null, null)
    }
    if (cc(b, p, 'O', 'p', 'u', 's') && cc(b, p + 4, 'H', 'e', 'a', 'd')) {
      val ch = u8(b, p + 9)
      val rate = le32(b, p + 12)
      if (ch <= 0 || rate <= 0) return null
      return InternalRow(UTF8String.fromString("ogg"), UTF8String.fromString("audio"),
        ch, rate.toInt, null, null, null, null)
    }
    null
  }

  /** WAV: RIFF/WAVE chunk walk — `fmt ` carries channels (LE u16),
    * sample rate (LE u32), byte rate (LE u32), bits per sample (LE u16);
    * `data`'s declared size against the byte rate gives the duration
    * (exact integer ms: size·1000 / byteRate). Chunks pad to even offsets
    * (the RIFF word-alignment rule).
    */
  private def parseWav(b: Array[Byte]): InternalRow = {
    // pos is Long: a declared chunk size is unsigned 32-bit (up to 0xFFFFFFFF),
    // so Int arithmetic could wrap negative (crash) or to 0 (infinite loop).
    // With Long pos the increment is always >= 8, so the walk strictly advances
    // and a chunk whose declared size overruns the buffer simply ends the scan
    // (header-only probes of truncated files still yield the declared duration).
    var pos = 12L
    var channels = -1
    var sampleRate = -1L
    var byteRate = -1L
    var bits = -1
    var dataSize = -1L
    while (pos + 8 <= b.length) {
      val p = pos.toInt
      val size = le32(b, p + 4)
      if (cc(b, p, 'f', 'm', 't', ' ')) {
        if (size < 16 || pos + 8 + 16 > b.length) return null
        channels = le16(b, p + 10)
        sampleRate = le32(b, p + 12)
        byteRate = le32(b, p + 16)
        bits = le16(b, p + 22)
      } else if (cc(b, p, 'd', 'a', 't', 'a')) {
        dataSize = size
      }
      pos += 8L + size + (size & 1L)
    }
    if (channels <= 0 || sampleRate <= 0 || bits <= 0) return null
    val durationMs: Any =
      if (dataSize >= 0 && byteRate > 0) dataSize * 1000L / byteRate else null
    InternalRow(UTF8String.fromString("wav"), UTF8String.fromString("audio"),
      channels, sampleRate.toInt, bits, null, null, durationMs)
  }

  // MP4 trak scan result: handler + per-track fields
  private final class Trak {
    var handler: Int = 0 // 'v' for vide, 's' for soun, 0 unknown
    var width: Int = -1
    var height: Int = -1
    var channels: Int = -1
    var sampleRate: Int = -1
  }

  /** MP4/ISO-BMFF: top-level box walk to `moov`; inside it `mvhd`
    * (timescale + duration, versions 0 and 1) and every `trak` —
    * `tkhd` for the 16.16-fixed canvas dimensions, `mdia/hdlr` for the
    * handler type (`vide`/`soun`), `mdia/minf/stbl/stsd`'s first audio
    * sample entry for channel count and sample rate. media_type is
    * "video" if any video track exists, else "audio" if any audio track.
    * Box sizes of 1 (64-bit largesize) and 0 (to end-of-file) follow the
    * spec; a box that overruns its parent yields null.
    */
  private def parseMp4(b: Array[Byte]): InternalRow = {
    var timescale = -1L
    var duration = -1L
    var video: Trak = null
    var audio: Trak = null

    // returns the payload start of the box and its END offset, or -1 on a
    // malformed size; boxes are walked [start, limit)
    def walk(start: Int, limit: Int)(f: (Int, Int, Int) => Boolean): Boolean = {
      var pos = start
      while (pos + 8 <= limit) {
        val size32 = be32(b, pos)
        var payload = pos + 8
        var end = 0L
        if (size32 == 1L) {
          if (pos + 16 > limit) return false
          val large = be64(b, pos + 8)
          payload = pos + 16
          end = pos + large
        } else if (size32 == 0L) {
          end = limit.toLong
        } else {
          end = pos + size32
        }
        if (end < payload || end > limit) return false
        if (!f(pos, payload, end.toInt)) return false
        pos = end.toInt
      }
      true
    }

    def parseTkhd(t: Trak, payload: Int, end: Int): Unit = {
      if (payload >= end) return
      val v = u8(b, payload)
      // v0: cre 4 + mod 4 + id 4 + res 4 + dur 4 = 20; v1: 8+8+4+4+8 = 32
      val fixedAt = payload + 4 + (if (v == 1) 32 else 20) + 8 + 2 + 2 + 2 + 2 + 36
      if (fixedAt + 8 <= end) {
        t.width = (be32(b, fixedAt) >> 16).toInt
        t.height = (be32(b, fixedAt + 4) >> 16).toInt
      }
    }

    def parseStsd(t: Trak, payload: Int, end: Int): Unit = {
      if (payload + 8 > end || be32(b, payload + 4) < 1L) return
      val entry = payload + 8
      // audio sample entry: 8 header + 6 reserved + 2 dri + 8 reserved,
      // then channelcount u16, samplesize u16, predefined 4, rate 16.16
      if (t.handler == 's' && entry + 36 <= end) {
        t.channels = be16(b, entry + 24)
        t.sampleRate = (be32(b, entry + 32) >> 16).toInt
      }
    }

    def parseTrak(trakPayload: Int, trakEnd: Int): Boolean = {
      val t = new Trak
      val ok = walk(trakPayload, trakEnd) { (pos, payload, end) =>
        if (cc(b, pos + 4, 't', 'k', 'h', 'd')) { parseTkhd(t, payload, end); true }
        else if (cc(b, pos + 4, 'm', 'd', 'i', 'a')) {
          walk(payload, end) { (p2, pl2, e2) =>
            if (cc(b, p2 + 4, 'h', 'd', 'l', 'r')) {
              if (pl2 + 12 <= e2) {
                if (cc(b, pl2 + 8, 'v', 'i', 'd', 'e')) t.handler = 'v'
                else if (cc(b, pl2 + 8, 's', 'o', 'u', 'n')) t.handler = 's'
              }
              true
            } else if (cc(b, p2 + 4, 'm', 'i', 'n', 'f')) {
              walk(pl2, e2) { (p3, pl3, e3) =>
                if (cc(b, p3 + 4, 's', 't', 'b', 'l')) {
                  walk(pl3, e3) { (p4, pl4, e4) =>
                    if (cc(b, p4 + 4, 's', 't', 's', 'd')) parseStsd(t, pl4, e4)
                    true
                  }
                } else true
              }
            } else true
          }
        } else true
      }
      if (ok) {
        if (t.handler == 'v' && video == null) video = t
        if (t.handler == 's' && audio == null) audio = t
      }
      ok
    }

    val ok = walk(0, b.length) { (pos, payload, end) =>
      if (cc(b, pos + 4, 'm', 'o', 'o', 'v')) {
        walk(payload, end) { (p2, pl2, e2) =>
          if (cc(b, p2 + 4, 'm', 'v', 'h', 'd')) {
            if (pl2 + 4 > e2) false
            else {
              val v = u8(b, pl2)
              if (v == 1) {
                if (pl2 + 36 <= e2) {
                  timescale = be32(b, pl2 + 20)
                  duration = be64(b, pl2 + 24)
                }
              } else {
                if (pl2 + 24 <= e2) {
                  timescale = be32(b, pl2 + 12)
                  duration = be32(b, pl2 + 16)
                }
              }
              true
            }
          } else if (cc(b, p2 + 4, 't', 'r', 'a', 'k')) parseTrak(pl2, e2)
          else true
        }
      } else true
    }
    if (!ok) return null
    if (video == null && audio == null && timescale <= 0) return null
    val mediaType =
      if (video != null) "video" else if (audio != null) "audio" else return null
    val durationMs: Any =
      if (timescale > 0 && duration >= 0) duration * 1000L / timescale else null
    InternalRow(
      UTF8String.fromString("mp4"), UTF8String.fromString(mediaType),
      if (audio != null && audio.channels > 0) audio.channels else null,
      if (audio != null && audio.sampleRate > 0) audio.sampleRate else null,
      null,
      if (video != null && video.width > 0) video.width else null,
      if (video != null && video.height > 0) video.height else null,
      durationMs)
  }

  /** MKV/WebM: EBML element walk — the EBML header element, then the
    * Segment; inside it `Info` (TimestampScale + optional float Duration)
    * and `Tracks`/`TrackEntry` (TrackType 1=video 2=audio; `Video`'s
    * PixelWidth/PixelHeight; `Audio`'s Channels, optional float
    * SamplingFrequency — spec default 8000 — and optional BitDepth).
    * The walk stops at the first Cluster (media payload), so cost stays
    * O(header); unknown-size elements extend to their parent's limit per
    * the spec; any malformed vint yields null.
    */
  private def parseMkv(b: Array[Byte]): InternalRow = {
    import MkvSupport._
    var timestampScale = 1000000L // ns per tick, the spec default
    var durationTicks = Double.NaN
    var vWidth = -1L
    var vHeight = -1L
    var aChannels = -1L
    var aRate = Double.NaN
    var aBits = -1L
    var sawVideo = false
    var sawAudio = false

    // walk elements in [start, limit); f(id, payloadStart, payloadEnd)
    // returns false to abort (malformed)
    def walk(start: Int, limit: Int)(f: (Long, Int, Int) => Boolean): Boolean = {
      var pos = start
      while (pos < limit) {
        val (id, idW) = vint(b, pos, limit, keepMarker = true)
        if (idW == 0) return false
        val (sz, szW) = vint(b, pos + idW, limit, keepMarker = false)
        if (szW == 0) return false
        val payload = pos + idW + szW
        val end =
          if (sz == Long.MaxValue) limit
          else if (payload + sz > limit || sz < 0) return false
          else (payload + sz).toInt
        if (!f(id, payload, end)) return false
        pos = end
      }
      true
    }

    def parseTrackEntry(start: Int, limit: Int): Boolean = {
      var trackType = -1L
      var w = -1L; var h = -1L; var ch = -1L; var bits = -1L
      var rate = Double.NaN
      val ok = walk(start, limit) { (id, p, e) =>
        id match {
          case 0x83L => trackType = uintAt(b, p, e - p); true // TrackType
          case 0xE0L => // Video
            walk(p, e) { (id2, p2, e2) =>
              id2 match {
                case 0xB0L => w = uintAt(b, p2, e2 - p2); true // PixelWidth
                case 0xBAL => h = uintAt(b, p2, e2 - p2); true // PixelHeight
                case _ => true
              }
            }
          case 0xE1L => // Audio
            walk(p, e) { (id2, p2, e2) =>
              id2 match {
                case 0x9FL => ch = uintAt(b, p2, e2 - p2); true // Channels
                case 0xB5L => rate = floatAt(b, p2, e2 - p2); true // SamplingFrequency
                case 0x6264L => bits = uintAt(b, p2, e2 - p2); true // BitDepth
                case _ => true
              }
            }
          case _ => true
        }
      }
      if (ok) {
        if (trackType == 1L && !sawVideo) {
          sawVideo = true; vWidth = w; vHeight = h
        } else if (trackType == 2L && !sawAudio) {
          sawAudio = true
          aChannels = if (ch > 0) ch else 1L // spec default 1
          aRate = if (rate.isNaN) 8000.0 else rate // spec default 8000
          aBits = bits
        }
      }
      ok
    }

    // Cluster is a SUCCESSFUL early exit; a malformed walk is not. The
    // flag distinguishes the two, since both surface as `false` from walk.
    var clusterStop = false
    val ok = walk(0, b.length) { (id, p, e) =>
      id match {
        case 0x1A45DFA3L => true // EBML header: skip payload
        case 0x18538067L => // Segment
          walk(p, e) { (id2, p2, e2) =>
            id2 match {
              case 0x1F43B675L => clusterStop = true; false // Cluster: media payload — stop here
              case 0x1549A966L => // Info
                walk(p2, e2) { (id3, p3, e3) =>
                  id3 match {
                    case 0x2AD7B1L => timestampScale = uintAt(b, p3, e3 - p3); true
                    case 0x4489L => durationTicks = floatAt(b, p3, e3 - p3); true
                    case _ => true
                  }
                }
              case 0x1654AE6BL => // Tracks
                walk(p2, e2) { (id3, p3, e3) =>
                  if (id3 == 0xAE) parseTrackEntry(p3, e3) else true
                }
              case _ => true
            }
          } && !clusterStop // stop the whole walk once media payload starts
        case _ => true
      }
    }
    // success = a clean walk, or the intentional first-Cluster early exit;
    // a malformed vint / overrunning element anywhere before that is null
    if (!ok && !clusterStop) return null
    if (!sawVideo && !sawAudio) return null
    val mediaType = if (sawVideo) "video" else "audio"
    val durationMs: Any =
      if (!durationTicks.isNaN && timestampScale > 0)
        (durationTicks * timestampScale / 1e6).toLong
      else null
    InternalRow(
      UTF8String.fromString("mkv"), UTF8String.fromString(mediaType),
      if (sawAudio && aChannels > 0) aChannels.toInt else null,
      if (sawAudio && !aRate.isNaN && aRate > 0) aRate.toInt else null,
      if (sawAudio && aBits > 0) aBits.toInt else null,
      if (sawVideo && vWidth > 0) vWidth.toInt else null,
      if (sawVideo && vHeight > 0) vHeight.toInt else null,
      durationMs)
  }
}

object MediaExpressions {
  /** Column API for [[MediaMeta]]. */
  def mediaMeta(bin: Column): Column =
    Bridge.column(MediaMeta(Bridge.expression(bin)))
}

/** MKV/WebM (EBML) parsing support for [[MediaMeta]] — kept in its own
  * block: EBML is a variable-length-integer element tree, structurally
  * unlike the fixed-offset RIFF/BMFF walks above.
  */
private[plans] object MkvSupport {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  /** Variable-length EBML integer at `pos`: returns (value, width) packed
    * as (value << 4) | width (width 1..8; value fits 56 bits), or -1 on a
    * malformed/truncated vint. `keepMarker` reads element IDs (the length
    * marker stays part of the ID value, the EBML convention); size vints
    * strip it. An all-ones size value means "unknown" → returns the
    * special width-only marker with value Long.MaxValue >> 8.
    */
  def vint(b: Array[Byte], pos: Int, limit: Int, keepMarker: Boolean): (Long, Int) = {
    if (pos >= limit) return (-1L, 0)
    val fb = u8(b, pos)
    if (fb == 0) return (-1L, 0)
    val width = java.lang.Integer.numberOfLeadingZeros(fb) - 23 // 1..8
    if (pos + width > limit) return (-1L, 0)
    var v: Long = if (keepMarker) fb.toLong else (fb & (0xFF >>> width)).toLong
    var i = 1
    while (i < width) { v = (v << 8) | u8(b, pos + i); i += 1 }
    if (!keepMarker) {
      // all value bits set = unknown size (stream to end)
      val allOnes = (1L << (7 * width)) - 1L
      if (v == allOnes) v = Long.MaxValue
    }
    (v, width)
  }

  /** Unsigned big-endian integer payload of an element. */
  def uintAt(b: Array[Byte], pos: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | u8(b, pos + i); i += 1 }
    v
  }

  /** EBML float payload: 4 or 8 bytes IEEE big-endian; NaN on other widths. */
  def floatAt(b: Array[Byte], pos: Int, len: Int): Double = len match {
    case 4 => java.lang.Float.intBitsToFloat(uintAt(b, pos, 4).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(uintAt(b, pos, 8))
    case _ => Double.NaN
  }
}
