package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Spark surface for the REAL media codecs ([[PngCodec]], [[WavCodec]]):
  * deterministic fixture generators (closed-form pixel/sample values per
  * id, so a DuckDB oracle can re-derive every statistic analytically)
  * and decode→stats kernels. The encode→decode round trip under the
  * oracle gate proves the full codec path bit-for-bit: any filter,
  * deflate, CRC, or unfilter bug changes a channel sum and fails the
  * hash compare.
  *
  * The kernels are JVM Scala UDFs — the documented decode boundary
  * (binary → typed struct), partition-parallel, no Python worker. At
  * 100 TB the same shape holds: payload bytes stay columnar, decode is
  * a narrow per-row projection, stats aggregate map-side.
  */
object MediaPipeline {

  // --------------------------------------------------------------- fixtures

  /** Deterministic RGB raster for `id`: w = 16 + id%16,
    * h = 16 + (3·id)%16, R=(7x+3y+id)%256, G=(5x+11y+2id)%256,
    * B=(13x+y+3id)%256 — each channel sum has a closed form an oracle
    * can compute with two nested generate_series.
    */
  private[graft] def raster(id: Long): PngCodec.Raster = {
    val w = (16 + id % 16).toInt
    val h = (16 + (id * 3) % 16).toInt
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (y * w + x) * 3
        px(base) = ((7L * x + 3L * y + id) % 256).toByte
        px(base + 1) = ((5L * x + 11L * y + 2 * id) % 256).toByte
        px(base + 2) = ((13L * x + y + 3 * id) % 256).toByte
        x += 1
      }
      y += 1
    }
    PngCodec.Raster(w, h, 3, px)
  }

  /** Deterministic PCM fixture for `id`: rate = 8000 + (id%4)·4000,
    * channels = 1 + id%2, frames = 500 + (id%10)·100, interleaved
    * sample k = ((37k + 11·id) % 4096) − 2048.
    */
  private[graft] def pcm(id: Long): WavCodec.Pcm = {
    val channels = (1 + id % 2).toInt
    val frames = (500 + (id % 10) * 100).toInt
    val n = frames * channels
    val s = new Array[Short](n)
    var k = 0
    while (k < n) {
      s(k) = (((37L * k + 11 * id) % 4096) - 2048).toShort
      k += 1
    }
    WavCodec.Pcm((8000 + (id % 4) * 4000).toInt, channels, s)
  }

  // ---------------------------------------------------------------- kernels

  final case class PngStats(width: Int, height: Int, r_sum: Long,
      g_sum: Long, b_sum: Long)

  final case class WavStats(rate: Int, channels: Int, frames: Long,
      sum_sq: Long, peak: Long)

  /** id → real PNG bytes (filters cycling 0..4 across rows). */
  val encodePng = udf((id: Long) => PngCodec.encode(raster(id)))

  /** PNG bytes → per-channel pixel sums via the FULL decode
    * (inflate + unfilter); None/null for undecodable payloads.
    */
  val pngStats = udf((b: Array[Byte]) =>
    PngCodec.decode(b).collect { case r if r.channels == 3 =>
      var rs = 0L; var gs = 0L; var bs = 0L
      var i = 0
      while (i < r.pixels.length) {
        rs += r.pixels(i) & 0xff
        gs += r.pixels(i + 1) & 0xff
        bs += r.pixels(i + 2) & 0xff
        i += 3
      }
      PngStats(r.width, r.height, rs, gs, bs)
    })

  /** id → real WAV bytes. */
  val encodeWav = udf((id: Long) => WavCodec.encode(pcm(id)))

  /** WAV bytes → energy stats from the FULL sample decode. */
  val wavStats = udf((b: Array[Byte]) =>
    WavCodec.decode(b).map { p =>
      var ss = 0L; var peak = 0L
      var i = 0
      while (i < p.samples.length) {
        val v = p.samples(i).toLong
        ss += v * v
        val a = math.abs(v)
        if (a > peak) peak = a
        i += 1
      }
      WavStats(p.sampleRate, p.channels, p.frames.toLong, ss, peak)
    })

  def pngRoundtrip(id: Column): Column = pngStats(encodePng(id))
  def wavRoundtrip(id: Column): Column = wavStats(encodeWav(id))
}
