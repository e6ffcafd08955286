package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, Array[Byte](10, 20, 30)),
    (2L, Array.fill[Byte](250)(7)),
    (3L, Array.empty[Byte])).toDF("media_id", "payload")

  // hand-built container headers: the real pure-JVM parsing paths
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(26)
    b.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(w).putInt(h).put(8.toByte).put(2.toByte)
    b.array()
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(64)
    b.put(0xff.toByte).put(0xd8.toByte)                 // SOI
    b.put(0xff.toByte).put(0xe0.toByte).putShort(16)    // APP0, len 16
    b.put(new Array[Byte](14))                          //   JFIF payload
    b.put(0xff.toByte).put(0xc4.toByte).putShort(5)     // DHT (NOT a SOF)
    b.put(new Array[Byte](3))
    b.put(0xff.toByte).put(0xc2.toByte).putShort(11)    // SOF2 (progressive)
    b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    b.array()
  }

  private def wavBytes(rate: Int, channels: Int, frames: Int): Array[Byte] = {
    val blockAlign = channels * 2 // 16-bit PCM
    val b = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + frames * blockAlign)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(channels.toShort).putInt(rate)
    b.putInt(rate * blockAlign).putShort(blockAlign.toShort).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(frames * blockAlign)
    b.array()
  }

  test("decode parses real PNG IHDR / JPEG SOF / WAV fmt headers from raw bytes") {
    val png = Multimodal.decode(pngBytes(640, 480))
    (png.width, png.height, png.nFrames, png.format) shouldBe
      (640, 480, 1, "png")
    // the SOF walk must skip APP0 and DHT segments and read SOF2
    val jpg = Multimodal.decode(jpegBytes(1024, 768))
    (jpg.width, jpg.height, jpg.format) shouldBe (1024, 768, "jpeg")
    val wav = Multimodal.decode(wavBytes(44100, 2, 1000))
    (wav.width, wav.height, wav.nFrames, wav.format) shouldBe
      (44100, 2, 1000, "wav")
    // ...and the same paths through the Spark UDF, partition-parallel
    val rows = Seq((1L, pngBytes(32, 16)), (2L, jpegBytes(8, 4)),
        (3L, wavBytes(8000, 1, 50)))
      .toDF("media_id", "payload")
    val out = Multimodal.withDecodedMeta(rows, $"payload")
      .select($"media_meta.format", $"media_meta.width")
      .orderBy("media_id").collect()
    out.map(_.getString(0)).toSeq shouldBe Seq("png", "jpeg", "wav")
    out.map(_.getInt(1)).toSeq shouldBe Seq(32, 8, 8000)
  }

  test("truncated / corrupt headers fall back to the fake, never throw") {
    for (full <- Seq(pngBytes(9, 9), jpegBytes(9, 9), wavBytes(9, 1, 9));
         n <- Seq(0, 1, 3, 8, 12)) {
      val m = Multimodal.decode(full.take(n))
      m.format shouldBe "fake"
    }
    // marker desync mid-JPEG (a segment where 0xff must be): corrupt,
    // falls back
    val bad = jpegBytes(9, 9); bad(2) = 0x00
    Multimodal.decode(bad).format shouldBe "fake"
  }

  test("withDecodedMeta (fallback decode path) yields deterministic struct metadata") {
    val out = Multimodal.withDecodedMeta(media, $"payload")
      .select($"media_id", $"media_meta.width", $"media_meta.height",
        $"media_meta.nFrames", $"media_meta.format")
      .orderBy("media_id").collect()
    out(0).getInt(1) shouldBe (10 % 64 + 16)
    out(0).getInt(2) shouldBe (20 % 64 + 16)
    out(0).getInt(3) shouldBe 1        // 3 bytes -> 1 frame
    out(1).getInt(3) shouldBe 3        // 250 bytes -> 3 frames
    out(2).getInt(1) shouldBe 16       // empty payload -> floor dims
    out.map(_.getString(4)).distinct.toSeq shouldBe Seq("fake")
  }

  test("decode runs partition-parallel (no collect to driver)") {
    val wide = media.repartition(3)
    Multimodal.withDecodedMeta(wide, $"payload").rdd.getNumPartitions shouldBe 3
  }

  test("frameOffsets samples every stride-th offset up to maxFrames") {
    val df = Seq(Tuple1(250)).toDF("n_bytes")
    val offs = df.select(
      Multimodal.frameOffsets($"n_bytes", stride = 100, maxFrames = 5).as("o"))
      .as[Seq[Int]].head()
    offs shouldBe Seq(0, 100, 200)
  }

  test("pooledFeatures average-pools the stub-decoded grid exactly") {
    // side=2, pool=2: one output cell = avg of the 4 codepoints
    // 'a'=97 'b'=98 'c'=99 'e'=101 -> (97+98+99+101) DIV 4 = 98
    val docs = Seq((7L, "abce")).toDF("id", "payload")
    val r = Multimodal.pooledFeatures(docs, $"id", $"payload",
      side = 2, pool = 2).head()
    (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)) shouldBe
      (7L, 0, 0, 98L)
    // short payloads pad with spaces (32): 'a'=97 + 3 spaces -> 193 DIV 4 = 48
    val short = Multimodal.pooledFeatures(
      Seq((1L, "a")).toDF("id", "payload"), $"id", $"payload", 2, 2).head()
    short.getLong(3) shouldBe ((97L + 32 * 3) / 4)
    // a 4x4 grid pools to 2x2 = 4 cells
    Multimodal.pooledFeatures(
      Seq((1L, "x" * 16)).toDF("id", "payload"), $"id", $"payload", 4, 2)
      .count() shouldBe 4L
  }

  test("nativeMeta matches the stub decode for ascii payloads") {
    val docs = Seq((1L, "AB hello")).toDF("doc_id", "text")
    val r = Multimodal.nativeMeta(docs, $"text").head()
    // 'A' = 65 -> 65 % 64 + 16 = 17; 'B' = 66 -> 18
    r.getAs[Int]("width") shouldBe 17
    r.getAs[Int]("height") shouldBe 18
    r.getAs[Long]("n_bytes") shouldBe 8L
  }
}
