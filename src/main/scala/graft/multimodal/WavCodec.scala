package graft.multimodal

/** Real PCM WAV codec — 16-bit little-endian samples in a RIFF/WAVE
  * container (the format every recorder and ASR pipeline emits before
  * compression). Companion to [[Multimodal.decodeWav]]'s header walk:
  * this one also materializes the SAMPLES, completing the
  * decode boundary for audio the way [[PngCodec]] does for images.
  *
  * Totality: `decode` never throws and never hangs — the chunk walk
  * uses a Long cursor with unsigned 32-bit sizes (the same hostile-size
  * hardening as decodeWav) and a sample-count cap.
  */
object WavCodec {

  /** Decoded audio: interleaved 16-bit samples, `frames` per channel. */
  final case class Pcm(sampleRate: Int, channels: Int,
      samples: Array[Short]) {
    def frames: Int = if (channels > 0) samples.length / channels else 0
  }

  /** 32 M samples (64 MB) — hostile-header allocation cap. */
  private val MaxSamples = 1 << 25

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def putU16le(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putU32le(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
    b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
  }
  private def ascii4(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Encode interleaved s16le PCM as a canonical 44-byte-header WAV. */
  def encode(p: Pcm): Array[Byte] = {
    require(p.channels > 0, "channels must be positive")
    val dataBytes = p.samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    putU32le(out, 4, (36 + dataBytes).toLong)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    putU32le(out, 16, 16L) // fmt chunk size
    putU16le(out, 20, 1) // PCM
    putU16le(out, 22, p.channels)
    putU32le(out, 24, p.sampleRate.toLong)
    putU32le(out, 28, p.sampleRate.toLong * p.channels * 2) // byte rate
    putU16le(out, 32, p.channels * 2) // block align
    putU16le(out, 34, 16) // bits per sample
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    putU32le(out, 40, dataBytes.toLong)
    var i = 0
    while (i < p.samples.length) {
      putU16le(out, 44 + 2 * i, p.samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Full sample decode. None unless the container is RIFF/WAVE with a
    * 16-bit PCM `fmt ` chunk and an in-bounds `data` chunk.
    */
  def decode(b: Array[Byte]): Option[Pcm] = {
    if (b.length < 44 || ascii4(b, 0) != "RIFF" || ascii4(b, 8) != "WAVE")
      return None
    var i = 12L
    var channels = 0; var sampleRate = 0; var bits = 0; var fmt = 0
    var dataOff = -1L; var dataLen = -1L
    while (i + 8 <= b.length && (channels == 0 || dataOff < 0)) {
      val ii = i.toInt
      val id = ascii4(b, ii)
      val size = u32le(b, ii + 4)
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        fmt = u16le(b, ii + 8)
        channels = u16le(b, ii + 10)
        sampleRate = u32le(b, ii + 12).toInt
        bits = u16le(b, ii + 22)
      } else if (id == "data") { dataOff = i + 8; dataLen = size }
      i += 8 + size + (size & 1) // word-aligned; Long cursor never cycles
    }
    if (fmt != 1 || bits != 16 || channels <= 0 || dataOff < 0) return None
    if (dataOff + dataLen > b.length) return None
    val n = (dataLen / 2).toInt
    if (n > MaxSamples) return None
    val samples = new Array[Short](n)
    var k = 0
    while (k < n) {
      samples(k) = u16le(b, (dataOff + 2L * k).toInt).toShort
      k += 1
    }
    Some(Pcm(sampleRate, channels, samples))
  }
}
