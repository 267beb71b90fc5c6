package graft.plans

import graft.SparkSpec
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The audio/video header parser against REAL encoder output: golden WAV
  * bytes come from the JDK's own javax.sound encoder (an independent
  * implementation of the RIFF spec), the MP4 golden is a ByteBuffer-built
  * box tree (an independent reimplementation of the layout the in-plan
  * hex synthesis emits — the two must agree byte-for-byte), and the
  * corrupt/truncated corner is pinned row by row.
  */
class MediaMetaSpec extends SparkSpec {
  import spark.implicits._

  private def parse(bytes: Array[Byte])
      : Option[(String, String, Option[Int], Option[Int], Option[Int],
        Option[Int], Option[Int], Option[Long])] = {
    val out = Seq(Tuple1(bytes)).toDF("payload")
      .select(MediaExpressions.mediaMeta($"payload").as("m"))
      .select($"m.format", $"m.media_type", $"m.channels", $"m.sample_rate",
        $"m.bits_per_sample", $"m.width", $"m.height", $"m.duration_ms")
      .collect().head
    if (out.isNullAt(0)) None
    else Some((out.getString(0), out.getString(1),
      if (out.isNullAt(2)) None else Some(out.getInt(2)),
      if (out.isNullAt(3)) None else Some(out.getInt(3)),
      if (out.isNullAt(4)) None else Some(out.getInt(4)),
      if (out.isNullAt(5)) None else Some(out.getInt(5)),
      if (out.isNullAt(6)) None else Some(out.getInt(6)),
      if (out.isNullAt(7)) None else Some(out.getLong(7))))
  }

  private def jdkWav(channels: Int, rate: Int, bits: Int, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, bits, channels,
      bits > 8, false)
    val data = new Array[Byte](frames * channels * (bits / 8))
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("parses JDK-encoded WAV at its true format parameters") {
    // 1600 frames at 16 kHz stereo 16-bit = 100 ms of audio
    assert(parse(jdkWav(2, 16000, 16, 1600)) ==
      Some(("wav", "audio", Some(2), Some(16000), Some(16), None, None, Some(100L))))
    assert(parse(jdkWav(1, 8000, 8, 4000)) ==
      Some(("wav", "audio", Some(1), Some(8000), Some(8), None, None, Some(500L))))
  }

  // independent MP4 builder: length-prefixed boxes via ByteBuffer
  private def box(tp: String, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length).put(tp.getBytes("US-ASCII")).put(payload)
    b.array()
  }
  private def beInts(parts: Seq[Any]): Array[Byte] = {
    val n = parts.map { case _: Int => 4; case _: Short => 2; case a: Array[Byte] => a.length }.sum
    val b = java.nio.ByteBuffer.allocate(n)
    parts.foreach {
      case i: Int => b.putInt(i)
      case s: Short => b.putShort(s)
      case a: Array[Byte] => b.put(a)
    }
    b.array()
  }
  private val matrix = beInts(Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000))

  private def goldenMp4(video: Boolean, w: Int, h: Int, ch: Int, rate: Int,
      durMs: Int): Array[Byte] = {
    val ftyp = box("ftyp", beInts(Seq("isom".getBytes("US-ASCII"), 0)))
    val mvhd = box("mvhd", beInts(Seq(0, 0, 0, 1000, durMs, 0x00010000,
      0x0100.toShort, 0.toShort, 0, 0, matrix, new Array[Byte](24), 2)))
    val tkhd = box("tkhd", beInts(Seq(7, 0, 0, 1, 0, durMs, 0, 0,
      0.toShort, 0.toShort, 0.toShort, 0.toShort, matrix, w << 16, h << 16)))
    // Seq[Any] is load-bearing: an all-numeric Seq(...) would infer
    // Seq[Int] and silently WIDEN the Shorts to 4 bytes
    val mdhd = box("mdhd", beInts(Seq[Any](0, 0, 0, 1000, durMs,
      0x55C4.toShort, 0.toShort)))
    val hdlr = box("hdlr", beInts(Seq(0, 0,
      (if (video) "vide" else "soun").getBytes("US-ASCII"),
      new Array[Byte](12), new Array[Byte](1))))
    val entry =
      if (video)
        box("avc1", beInts(Seq(new Array[Byte](6), 1.toShort, 0.toShort,
          0.toShort, new Array[Byte](12), w.toShort, h.toShort, 0x00480000,
          0x00480000, 0, 1.toShort, new Array[Byte](32), 24.toShort,
          0xFFFF.toShort)))
      else
        box("mp4a", beInts(Seq(new Array[Byte](6), 1.toShort,
          new Array[Byte](8), ch.toShort, 16.toShort, 0.toShort, 0.toShort,
          rate << 16)))
    val stsd = box("stsd", beInts(Seq(0, 1, entry)))
    val minf = box("minf", box("stbl", stsd))
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ moov
  }

  test("parses the ByteBuffer-built MP4 box trees (video and audio tracks)") {
    assert(parse(goldenMp4(video = true, 1280, 720, 0, 0, 5000)) ==
      Some(("mp4", "video", None, None, None, Some(1280), Some(720), Some(5000L))))
    assert(parse(goldenMp4(video = false, 0, 0, 2, 44100, 1234)) ==
      Some(("mp4", "audio", Some(2), Some(44100), None, None, None, Some(1234L))))
  }

  test("the in-plan hex synthesis agrees byte-for-byte with the independent builder") {
    def planBytes(fmt: Int, ch: Int, rate: Int, bits: Int, db: Int,
        w: Int, h: Int, durMs: Int): Array[Byte] =
      Seq(Tuple1(0)).toDF("x")
        .select(Multimodal.syntheticMedia(lit(fmt), lit(ch), lit(rate),
          lit(bits), lit(db), lit(w), lit(h), lit(durMs)).as("p"))
        .collect().head.getAs[Array[Byte]](0)
    assert(planBytes(1, 0, 0, 8, 0, 1280, 720, 5000).toSeq ==
      goldenMp4(video = true, 1280, 720, 0, 0, 5000).toSeq)
    assert(planBytes(2, 2, 44100, 8, 0, 0, 0, 1234).toSeq ==
      goldenMp4(video = false, 0, 0, 2, 44100, 1234).toSeq)
  }

  // independent EBML builder: element = id bytes + 1-byte size vint + payload
  private def ebml(idBytes: Array[Byte], payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 127, "test builder uses 1-byte size vints")
    idBytes ++ Array((0x80 | payload.length).toByte) ++ payload
  }
  private def idOf(v: Long): Array[Byte] = {
    val n = if (v <= 0xFF) 1 else if (v <= 0xFFFF) 2 else if (v <= 0xFFFFFF) 3 else 4
    (1 to n).map(i => ((v >> (8 * (n - i))) & 0xFF).toByte).toArray
  }
  private def uintPayload(v: Long, n: Int): Array[Byte] =
    (1 to n).map(i => ((v >> (8 * (n - i))) & 0xFF).toByte).toArray

  private def goldenMkv(video: Boolean, w: Int, h: Int, ch: Int, rate: Float,
      durTicks: Float, bits: Int): Array[Byte] = {
    val header = ebml(idOf(0x1A45DFA3L),
      ebml(idOf(0x4282L), "matroska".getBytes("US-ASCII")))
    val fb = java.nio.ByteBuffer.allocate(4)
      .putInt(java.lang.Float.floatToIntBits(durTicks)).array()
    val info = ebml(idOf(0x1549A966L),
      ebml(idOf(0x2AD7B1L), uintPayload(1000000L, 3)) ++
        ebml(idOf(0x4489L), fb))
    val trackBody =
      if (video)
        ebml(idOf(0x83L), uintPayload(1, 1)) ++
          ebml(idOf(0xE0L),
            ebml(idOf(0xB0L), uintPayload(w.toLong, 2)) ++
              ebml(idOf(0xBAL), uintPayload(h.toLong, 2)))
      else {
        val rb = java.nio.ByteBuffer.allocate(4)
          .putInt(java.lang.Float.floatToIntBits(rate)).array()
        ebml(idOf(0x83L), uintPayload(2, 1)) ++
          ebml(idOf(0xE1L),
            ebml(idOf(0x9FL), uintPayload(ch.toLong, 1)) ++
              ebml(idOf(0xB5L), rb) ++
              ebml(idOf(0x6264L), uintPayload(bits.toLong, 1)))
      }
    val tracks = ebml(idOf(0x1654AE6BL), ebml(idOf(0xAEL), trackBody))
    header ++ ebml(idOf(0x18538067L), info ++ tracks)
  }

  test("parses EBML-built MKV incl. float duration/sampling-rate elements") {
    // timestamp scale 1e6 ns => duration ticks are milliseconds
    assert(parse(goldenMkv(video = true, 1920, 1080, 0, 0f, 4500f, 0)) ==
      Some(("mkv", "video", None, None, None, Some(1920), Some(1080), Some(4500L))))
    assert(parse(goldenMkv(video = false, 0, 0, 2, 48000f, 1234f, 24)) ==
      Some(("mkv", "audio", Some(2), Some(48000), Some(24), None, None, Some(1234L))))
  }

  test("the in-plan MKV hex synthesis parses with spec defaults applied") {
    def planBytes(fmt: Int, ch: Int, w: Int, h: Int): Array[Byte] =
      Seq(Tuple1(0)).toDF("x")
        .select(Multimodal.syntheticMedia(lit(fmt), lit(ch), lit(8000),
          lit(8), lit(0), lit(w), lit(h), lit(100)).as("p"))
        .collect().head.getAs[Array[Byte]](0)
    val v = planBytes(4, 0, 640, 360)
    assert(v.length == 91, s"mkv video layout constant drifted: ${v.length}")
    assert(parse(v) ==
      Some(("mkv", "video", None, None, None, Some(640), Some(360), None)))
    val a = planBytes(5, 2, 0, 0)
    assert(a.length == 86, s"mkv audio layout constant drifted: ${a.length}")
    // SamplingFrequency omitted => the spec default 8000 is reported
    assert(parse(a) ==
      Some(("mkv", "audio", Some(2), Some(8000), None, None, None, None)))
  }

  test("truncated MKV yields null, never throws") {
    val full = goldenMkv(video = true, 64, 64, 0, 0f, 100f, 0)
    (16 to full.length - 1 by 7).foreach { cut =>
      parse(full.take(cut)) // must not throw; null or partial-null is fine
    }
    assert(parse(full.take(20)) == None)
  }

  test("corrupt, truncated and alien bytes all yield null, never throw") {
    assert(parse(Array[Byte]()) == None)
    assert(parse("RIFF\u0000\u0000".getBytes("US-ASCII")) == None)
    assert(parse("RIFFxxxxWAVEjunkjunkjunk".getBytes("US-ASCII")) == None)
    // truncated JDK WAV: cut inside the fmt chunk
    assert(parse(jdkWav(2, 16000, 16, 100).take(20)) == None)
    // MP4 with a box overrunning the file
    val bad = goldenMp4(video = true, 64, 64, 0, 0, 100).take(60)
    assert(parse(bad) == None)
    // a box size smaller than its header is malformed, not a crash
    val tiny = box("ftyp", beInts(Seq("isom".getBytes("US-ASCII"), 0))) ++
      Array[Byte](0, 0, 0, 2, 'm', 'o', 'o', 'v')
    assert(parse(tiny) == None)
    assert(parse(jdkEncodedPngIsNotMedia) == None)
  }

  test("WAV chunk sizes >= 2^31 neither crash nor hang the walk") {
    // declared size 0x80000000 (Int.MinValue when narrowed): must not
    // drive the walk position negative
    def riff(chunkSize: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(16)
        .put("WAVE".getBytes("US-ASCII"))
        .put("JUNK".getBytes("US-ASCII")).putInt(chunkSize.toInt)
        .putInt(0)
      b.array()
    }
    assert(parse(riff(0x80000000L)) == None)
    // declared size 0xFFFFFFF8 made the old Int increment exactly 0 —
    // an infinite loop; with a Long position the walk strictly advances
    assert(parse(riff(0xFFFFFFF8L)) == None)
    assert(parse(riff(0xFFFFFFFFL)) == None)
    // a valid fmt chunk followed by an oversized data declaration still
    // reports the header fields (header-only probe of a truncated file)
    val good = jdkWav(1, 8000, 16, 100)
    val probe = good.take(good.length - 100) // cut inside data payload
    assert(parse(probe).exists(_._3 == Some(1)))
  }

  test("MP3 Xing/Info VBR duration from the first-frame header") {
    // hand-built: ID3v2.4 zero-size tag, MPEG-1 L3 stereo frame header,
    // 32-byte side info, Xing header with FRAMES flag
    def mp3(tag4: String, frames: Int, mono: Boolean, flags: Int,
            crc: Boolean = false): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 0))
      // sync + MPEG-1 L3; bitrate idx 9 (128k), sr idx 0 (44100);
      // 0xFA = protection_bit 0 (a 16-bit CRC precedes the side info)
      bos.write(Array[Byte](0xFF.toByte,
        (if (crc) 0xFA else 0xFB).toByte, 0x90.toByte,
        if (mono) 0xC0.toByte else 0x00.toByte))
      if (crc) bos.write(new Array[Byte](2))
      bos.write(new Array[Byte](if (mono) 17 else 32))
      bos.write(tag4.getBytes("US-ASCII"))
      val bb = java.nio.ByteBuffer.allocate(8).putInt(flags).putInt(frames)
      bos.write(bb.array())
      bos.write(new Array[Byte](64))
      bos.toByteArray
    }
    // 4410 frames * 1152 / 44100 Hz = 115200 ms exactly
    assert(parse(mp3("Xing", 4410, mono = false, flags = 1)) ==
      Some(("mp3", "audio", Some(2), Some(44100), None, None, None, Some(115200L))))
    assert(parse(mp3("Info", 4410, mono = true, flags = 1))
      .exists(r => r._3 == Some(1) && r._8 == Some(115200L)))
    // FRAMES flag absent -> CBR byte-length fallback, not the Xing count
    val noFrames = parse(mp3("Xing", 4410, mono = false, flags = 0))
    assert(noFrames.exists(_._8 != Some(115200L)))
    // CRC-protected frame (0xFFFA): the Xing probe shifts past the 2
    // CRC bytes — both mono and stereo side-info widths
    assert(parse(mp3("Xing", 4410, mono = false, flags = 1, crc = true)) ==
      Some(("mp3", "audio", Some(2), Some(44100), None, None, None, Some(115200L))))
    assert(parse(mp3("Xing", 4410, mono = true, flags = 1, crc = true))
      .exists(r => r._3 == Some(1) && r._8 == Some(115200L)))
  }

  test("malformed EBML inside the MKV Segment yields null, not partial rows") {
    val full = goldenMkv(video = true, 64, 64, 0, 0f, 100f, 0)
    // corrupt a vint INSIDE the Segment (zero first byte = malformed):
    // find the Segment id 0x18538067 and zero a byte in its interior
    val segAt = full.indexOfSlice(Seq(0x18, 0x53, 0x80, 0x67).map(_.toByte))
    assert(segAt >= 0)
    val bad = full.clone()
    bad(segAt + 5) = 0 // first content byte (after 4-byte id + 1-byte size
                       // vint) → zero id vint, malformed
    assert(parse(bad) == None)
  }

  private def jdkEncodedPngIsNotMedia: Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ---- audio-codec containers (FLAC / MP3 / Ogg) --------------------------

  // independent FLAC builder: marker + STREAMINFO block via ByteBuffer
  private def goldenFlac(ch: Int, rate: Int, bits: Int, samples: Long): Array[Byte] = {
    val packed = (rate.toLong << 44) | ((ch - 1).toLong << 41) |
      ((bits - 1).toLong << 36) | samples
    val b = java.nio.ByteBuffer.allocate(4 + 4 + 34)
    b.put("fLaC".getBytes("US-ASCII"))
    b.put(0x80.toByte).put(0.toByte).put(0.toByte).put(34.toByte)
    b.putShort(4096.toShort).putShort(4096.toShort)
    b.put(new Array[Byte](6)) // min/max frame size unknown
    b.putLong(packed)
    b.put(new Array[Byte](16)) // md5
    b.array()
  }

  // independent MP3 builder with a REAL (non-empty) ID3v2 tag body — the
  // in-plan synthesis only emits size-0 tags, so this pins the syncsafe skip
  private def goldenMp3(brIdx: Int, srIdx: Int, mode: Int, tagBody: Int,
      payload: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(10 + tagBody + 4 + payload)
    b.put("ID3".getBytes("US-ASCII")).put(4.toByte).put(0.toByte).put(0.toByte)
    b.put(((tagBody >> 21) & 0x7F).toByte).put(((tagBody >> 14) & 0x7F).toByte)
    b.put(((tagBody >> 7) & 0x7F).toByte).put((tagBody & 0x7F).toByte)
    b.put(new Array[Byte](tagBody))
    b.put(0xFF.toByte).put(0xFB.toByte)
    b.put(((brIdx << 4) | (srIdx << 2)).toByte).put((mode << 6).toByte)
    b.put(new Array[Byte](payload))
    b.array()
  }

  // independent Ogg page builder (27-byte header + 1-seg lacing + packet)
  private def goldenOgg(packet: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(28 + packet.length)
    b.put("OggS".getBytes("US-ASCII")).put(0.toByte).put(2.toByte)
    b.put(new Array[Byte](20)) // granule + serial + seq + crc
    b.put(1.toByte).put(packet.length.toByte).put(packet)
    b.array()
  }
  private def vorbisId(ch: Int, rate: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put("vorbis".getBytes("US-ASCII")).putInt(0)
    b.put(ch.toByte).putInt(rate).putInt(0).putInt(0).putInt(0)
    b.put(0xB8.toByte).put(1.toByte)
    b.array()
  }
  private def opusHead(ch: Int, rate: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(19).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("OpusHead".getBytes("US-ASCII")).put(1.toByte).put(ch.toByte)
    b.putShort(0.toShort).putInt(rate).putShort(0.toShort).put(0.toByte)
    b.array()
  }

  test("parses FLAC STREAMINFO bit fields at their true values") {
    assert(parse(goldenFlac(2, 44100, 16, 441000L)) ==
      Some(("flac", "audio", Some(2), Some(44100), Some(16), None, None, Some(10000L))))
    assert(parse(goldenFlac(1, 8000, 8, 0L)) == // zero samples: no duration
      Some(("flac", "audio", Some(1), Some(8000), Some(8), None, None, None)))
    assert(parse(goldenFlac(8, 192000, 24, 19200L)) ==
      Some(("flac", "audio", Some(8), Some(192000), Some(24), None, None, Some(100L))))
  }

  test("parses MP3 across a real ID3v2 tag (syncsafe size skip) with CBR duration") {
    // 200-byte tag body, 128 kbps (idx 9), 44100 (idx 0), stereo, 3996 B
    // payload: audio bytes = 4 + 3996 => 32000 bits / 128 kbps = 250 ms
    assert(parse(goldenMp3(9, 0, 0, 200, 3996)) ==
      Some(("mp3", "audio", Some(2), Some(44100), None, None, None, Some(250L))))
    // mono (mode 3), 32 kbps, 32 kHz, no tag body
    assert(parse(goldenMp3(1, 2, 3, 0, 396)) ==
      Some(("mp3", "audio", Some(1), Some(32000), None, None, None, Some(100L))))
    // free-format (idx 0) and reserved (sr idx 3) headers are unparseable
    assert(parse(goldenMp3(0, 0, 0, 0, 100)) == None)
    assert(parse(goldenMp3(9, 3, 0, 0, 100)) == None)
  }

  test("parses Ogg id packets for both Vorbis and Opus streams") {
    assert(parse(goldenOgg(vorbisId(2, 44100))) ==
      Some(("ogg", "audio", Some(2), Some(44100), None, None, None, None)))
    assert(parse(goldenOgg(opusHead(1, 48000))) ==
      Some(("ogg", "audio", Some(1), Some(48000), None, None, None, None)))
    // an Ogg page whose first packet is neither id header is unparseable
    assert(parse(goldenOgg("notanidpacket!".getBytes("US-ASCII"))) == None)
  }

  test("the in-plan audio hex synthesis agrees byte-for-byte with the builders") {
    def planBytes(fmt: Int, ch: Int, rate: Int, bits: Int, samples: Long,
        brIdx: Int, srIdx: Int, chMode: Int, db: Int): Array[Byte] =
      Seq(Tuple1(0)).toDF("x")
        .select(Multimodal.syntheticAudio(lit(fmt), lit(ch), lit(rate),
          lit(bits), lit(samples), lit(brIdx), lit(srIdx), lit(chMode),
          lit(db)).as("p"))
        .collect().head.getAs[Array[Byte]](0)
    assert(planBytes(0, 2, 44100, 16, 441000L, 0, 0, 0, 0).toSeq ==
      goldenFlac(2, 44100, 16, 441000L).toSeq)
    assert(planBytes(1, 0, 0, 8, 0L, 9, 1, 2, 7).toSeq ==
      goldenMp3(9, 1, 2, 0, 7).toSeq)
    assert(planBytes(2, 2, 44100, 8, 0L, 0, 0, 0, 0).toSeq ==
      goldenOgg(vorbisId(2, 44100)).toSeq)
    assert(planBytes(3, 1, 48000, 8, 0L, 0, 0, 0, 0).toSeq ==
      goldenOgg(opusHead(1, 48000)).toSeq)
  }

  test("truncated audio containers yield null, never throw") {
    val flac = goldenFlac(2, 44100, 16, 441000L)
    (4 to flac.length - 1 by 3).foreach(cut => parse(flac.take(cut)))
    assert(parse(flac.take(20)) == None)
    val mp3 = goldenMp3(9, 0, 0, 30, 100)
    (2 to mp3.length - 1 by 3).foreach(cut => parse(mp3.take(cut)))
    assert(parse(mp3.take(12)) == None) // cut inside the tag
    val ogg = goldenOgg(vorbisId(2, 44100))
    (4 to ogg.length - 1 by 3).foreach(cut => parse(ogg.take(cut)))
    assert(parse(ogg.take(30)) == None)
    // ID3 bytes that are not syncsafe (top bit set) are malformed
    val badTag = mp3.clone(); badTag(6) = 0x80.toByte
    assert(parse(badTag) == None)
  }

  test("the parse projection stays scan-side (no exchange, no rdd)") {
    val df = Seq((1L, jdkWav(1, 8000, 8, 100))).toDF("doc_id", "payload")
    val out = Multimodal.extractAvMeta(df, "doc_id", "payload")
    val phys = out.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"must not shuffle:\n$phys")
  }
}
