package graft

import graft.multimodal.{MediaPipeline, Multimodal, PngCodec, WavCodec}

/** Full-codec laws for the real PNG/WAV decode path (q348/q349):
  * round trips per filter type and per color type, spec-vector
  * unfiltering, and hostile-bytes totality.
  */
class PngCodecSpec extends SparkSpec {

  private def gradient(w: Int, h: Int, ch: Int): PngCodec.Raster = {
    val px = new Array[Byte](w * h * ch)
    var i = 0
    while (i < px.length) { px(i) = ((i * 31 + 7) % 256).toByte; i += 1 }
    PngCodec.Raster(w, h, ch, px)
  }

  test("PNG round trip is exact under every filter type") {
    val r = gradient(13, 9, 3) // odd width: exercises non-aligned strides
    (0 to 4).foreach { f =>
      val bytes = PngCodec.encode(r, _ => f)
      val back = PngCodec.decode(bytes)
      withClue(s"filter $f: ") {
        back.isDefined shouldBe true
        back.get.width shouldBe 13
        back.get.height shouldBe 9
        back.get.channels shouldBe 3
        back.get.pixels.toSeq shouldBe r.pixels.toSeq
      }
    }
    // mixed filters (the q348 default: cycle all five)
    val mixed = PngCodec.encode(r)
    PngCodec.decode(mixed).get.pixels.toSeq shouldBe r.pixels.toSeq
  }

  test("PNG round trip covers gray and RGBA color types") {
    Seq(1, 4).foreach { ch =>
      val r = gradient(8, 5, ch)
      val back = PngCodec.decode(PngCodec.encode(r))
      withClue(s"channels $ch: ") {
        back.get.channels shouldBe ch
        back.get.pixels.toSeq shouldBe r.pixels.toSeq
      }
    }
  }

  test("PNG Paeth predictor follows the spec tie-breaking order") {
    // §6.6: ties prefer left, then up, then upper-left. Round-trip a
    // raster engineered to hit Paeth ties (constant rows + ramps).
    val px = Array.tabulate(6 * 4 * 3)(i => ((i / 3) % 2 * 128).toByte)
    val r = PngCodec.Raster(6, 4, 3, px)
    PngCodec.decode(PngCodec.encode(r, _ => 4)).get.pixels.toSeq shouldBe
      px.toSeq
  }

  test("PNG decode is total on hostile bytes") {
    PngCodec.decode(Array.emptyByteArray) shouldBe None
    PngCodec.decode(Array.fill[Byte](64)(0x42)) shouldBe None
    val good = PngCodec.encode(gradient(4, 4, 3))
    PngCodec.decode(good.take(good.length - 6)) shouldBe None // truncated
    val flipped = good.clone()
    flipped(30) = (flipped(30) ^ 0x01).toByte // corrupt IDAT payload
    PngCodec.decode(flipped) shouldBe None // CRC catches it
    // hostile IHDR: claim 2^15 x 2^15 pixels (over the sample cap)
    val hostile = good.clone()
    hostile(16) = 0; hostile(17) = 0; hostile(18) = Byte.MinValue
    PngCodec.decode(hostile) shouldBe None // (also CRC-invalid)
    // header decode (Multimodal, total with fake fallback) and full
    // decode agree on dimensions and format
    val meta = Multimodal.decode(good)
    (meta.width, meta.height, meta.format) shouldBe ((4, 4, "png"))
  }

  test("WAV round trip is exact, mono and stereo") {
    Seq(1, 2).foreach { ch =>
      val samples = Array.tabulate[Short](600 * ch)(k =>
        ((k * 131 % 4096) - 2048).toShort)
      val p = WavCodec.Pcm(16000, ch, samples)
      val back = WavCodec.decode(WavCodec.encode(p))
      back.get.sampleRate shouldBe 16000
      back.get.channels shouldBe ch
      back.get.frames shouldBe 600
      back.get.samples.toSeq shouldBe samples.toSeq
    }
  }

  test("WAV decode is total on hostile bytes and agrees with the header walk") {
    WavCodec.decode(Array.fill[Byte](80)(0x11)) shouldBe None
    val good = WavCodec.encode(WavCodec.Pcm(8000, 1,
      Array.tabulate[Short](100)(_.toShort)))
    // hostile chunk size (the ADVICE u32 wrap case) must not hang/throw
    val evil = good.clone()
    evil(16) = -1; evil(17) = -1; evil(18) = -1; evil(19) = -1
    WavCodec.decode(evil) shouldBe None
    val meta = Multimodal.decode(good)
    val full = WavCodec.decode(good).get
    meta.format shouldBe "wav"
    meta.width shouldBe full.sampleRate
    meta.height shouldBe full.channels
    meta.nFrames shouldBe full.frames
  }

  test("q348/q349 fixtures match their closed forms") {
    // spot-check the generator against the oracle's formula for id=5
    val r = MediaPipeline.raster(5L)
    r.width shouldBe 21; r.height shouldBe 31 // 16+5, 16+15
    val x = 3; val y = 7
    (r.pixels((y * r.width + x) * 3) & 0xff) shouldBe
      ((7 * x + 3 * y + 5) % 256)
    val p = MediaPipeline.pcm(5L)
    p.channels shouldBe 2
    p.frames shouldBe 1000
    p.sampleRate shouldBe 12000
    (p.samples(11) & 0xffff).toShort shouldBe
      (((37 * 11 + 11 * 5) % 4096) - 2048).toShort
  }
}
