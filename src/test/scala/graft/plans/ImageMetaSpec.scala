package graft.plans

import graft.SparkSpec
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The image header parser against REAL encoder output: golden bytes come
  * from the JDK's own ImageIO encoders (an independent implementation of
  * each container spec) plus the canonical 1×1 transparent PNG, and the
  * corrupt/truncated corner is pinned row by row.
  */
class ImageMetaSpec extends SparkSpec {
  import spark.implicits._

  private def parse(bytes: Array[Byte]): Option[(Int, Int, Int, String)] = {
    val out = Seq(Tuple1(bytes)).toDF("payload")
      .select(ImageExpressions.imageMeta($"payload").as("m"))
      .select($"m.width", $"m.height", $"m.channels", $"m.format")
      .collect().head
    if (out.isNullAt(0)) None
    else Some((out.getInt(0), out.getInt(1), out.getInt(2), out.getString(3)))
  }

  private def jdkEncoded(fmt: String, w: Int, h: Int, imgType: Int): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    // non-trivial pixels so encoders can't shortcut to an empty frame
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 17) | 0xFF000000)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK encoder for $fmt")
    bos.toByteArray
  }

  test("parses JDK-encoded PNG/JPEG/GIF/BMP at their true dimensions") {
    import java.awt.image.BufferedImage._
    assert(parse(jdkEncoded("png", 13, 7, TYPE_INT_ARGB)) ==
      Some((13, 7, 4, "png")))
    assert(parse(jdkEncoded("png", 640, 480, TYPE_3BYTE_BGR)) ==
      Some((640, 480, 3, "png")))
    assert(parse(jdkEncoded("jpg", 13, 7, TYPE_3BYTE_BGR)) ==
      Some((13, 7, 3, "jpeg")))
    assert(parse(jdkEncoded("jpg", 320, 200, TYPE_BYTE_GRAY)) ==
      Some((320, 200, 1, "jpeg")))
    assert(parse(jdkEncoded("gif", 13, 7, TYPE_INT_ARGB)) ==
      Some((13, 7, 3, "gif")))
    assert(parse(jdkEncoded("bmp", 13, 7, TYPE_3BYTE_BGR)) ==
      Some((13, 7, 3, "bmp")))
  }

  test("parses the canonical 1x1 transparent PNG (CRC-correct golden file)") {
    val golden = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    assert(parse(golden) == Some((1, 1, 4, "png")))
  }

  test("parses hand-built WebP VP8L and VP8X headers") {
    // VP8L: 2F signature then 14-bit (w-1), 14-bit (h-1), alpha bit
    def vp8l(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
      val bits = (w - 1).toLong | ((h - 1).toLong << 14) |
        (if (alpha) 1L << 28 else 0L)
      val payload = Array[Byte](0x2F,
        (bits & 0xFF).toByte, ((bits >> 8) & 0xFF).toByte,
        ((bits >> 16) & 0xFF).toByte, ((bits >> 24) & 0xFF).toByte,
        0, 0, 0, 0, 0)
      val riff = new java.io.ByteArrayOutputStream()
      riff.write("RIFF".getBytes("US-ASCII"))
      val size = 4 + 8 + payload.length
      riff.write(Array[Byte]((size & 0xFF).toByte, ((size >> 8) & 0xFF).toByte, 0, 0))
      riff.write("WEBP".getBytes("US-ASCII"))
      riff.write("VP8L".getBytes("US-ASCII"))
      riff.write(Array[Byte]((payload.length & 0xFF).toByte, 0, 0, 0))
      riff.write(payload)
      riff.toByteArray
    }
    assert(parse(vp8l(200, 100, alpha = false)) == Some((200, 100, 3, "webp")))
    assert(parse(vp8l(16384, 16384, alpha = true)) == Some((16384, 16384, 4, "webp")))

    // VP8X: flags byte (0x10 = alpha), 24-bit LE canvas minus one
    def vp8x(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      out.write(Array[Byte](30, 0, 0, 0))
      out.write("WEBP".getBytes("US-ASCII"))
      out.write("VP8X".getBytes("US-ASCII"))
      out.write(Array[Byte](10, 0, 0, 0))
      out.write(Array[Byte](if (alpha) 0x10 else 0, 0, 0, 0))
      val wm = w - 1; val hm = h - 1
      out.write(Array[Byte]((wm & 0xFF).toByte, ((wm >> 8) & 0xFF).toByte,
        ((wm >> 16) & 0xFF).toByte))
      out.write(Array[Byte]((hm & 0xFF).toByte, ((hm >> 8) & 0xFF).toByte,
        ((hm >> 16) & 0xFF).toByte))
      out.write(Array[Byte](0, 0, 0, 0)) // pad past the length-30 minimum
      out.toByteArray
    }
    assert(parse(vp8x(1920, 1080, alpha = true)) == Some((1920, 1080, 4, "webp")))
    assert(parse(vp8x(65536, 4, alpha = false)) == Some((65536, 4, 3, "webp")))
  }

  test("corrupt and truncated payloads yield NULL metadata, never errors") {
    import java.awt.image.BufferedImage._
    val png = jdkEncoded("png", 13, 7, TYPE_INT_ARGB)
    val jpg = jdkEncoded("jpg", 13, 7, TYPE_3BYTE_BGR)
    assert(parse(png.take(20)) == None) // PNG cut inside IHDR
    assert(parse(png.take(7)) == None) // partial signature
    assert(parse(jpg.take(3)) == None) // SOI then nothing
    assert(parse(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte)) == None) // EOI before SOF
    assert(parse("not an image at all".getBytes) == None)
    assert(parse(Array.emptyByteArray) == None)
    val badChunk = png.clone // flip IHDR tag -> unknown first chunk
    badChunk(12) = 'X'.toByte
    assert(parse(badChunk) == None)
    // segment length lying past the buffer must not read out of bounds
    val lying = jpg.take(6) ++ Array[Byte](0x7F, 0x7F)
    assert(parse(lying) == None)
  }

  test("in-plan synthetic containers parse back to their parameters (all variants)") {
    val df = spark.range(0, 400).toDF("doc_id").select(
      col("doc_id"),
      pmod(col("doc_id"), lit(4)).cast("int").as("fmt"),
      (lit(16) + pmod(col("doc_id") * 3, lit(1000))).cast("int").as("w"),
      (lit(16) + pmod(col("doc_id") * 7, lit(800))).cast("int").as("h"))
    val (expCh, expBytes, expFmt) =
      Multimodal.syntheticImageExpected(col("fmt"), col("doc_id"))
    val bad = df
      .withColumn("payload",
        Multimodal.syntheticImage(col("fmt"), col("w"), col("h"), col("doc_id")))
      .withColumn("m", ImageExpressions.imageMeta(col("payload")))
      .where(
        !(col("m.width") === col("w") && col("m.height") === col("h") &&
          col("m.channels") === expCh && col("m.format") === expFmt &&
          octet_length(col("payload")) === expBytes))
    assert(bad.count() == 0)
  }

  test("image_meta stays inside whole-stage codegen") {
    val df = spark.range(0, 4).toDF("doc_id")
      .withColumn("payload",
        Multimodal.syntheticImage(lit(0), lit(32), lit(32), col("doc_id")))
      .select(ImageExpressions.imageMeta($"payload").as("m"))
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("*(1)"), exec) // the '*' prefix == whole-stage codegen
    assert(!exec.contains("Fallback"), exec)
  }
}
