package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star set): media payloads travel as
  * opaque `binary` columns with typed metadata alongside. Container
  * HEADER decode is REAL for PNG / JPEG / WAV — pure-JVM byte parsing,
  * no codec library needed (round 8). FULL payload decode is also real
  * for PNG pixels ([[PngCodec]]: inflate + all five filters, round 9)
  * and WAV PCM samples ([[WavCodec]]) — both oracle-gated end-to-end
  * (q348/q349). Payloads in no recognized container fall back to a
  * deterministic fake (`format = "fake"`), so synthetic fixtures keep
  * flowing; only formats needing codec libraries absent from this
  * environment (JPEG entropy decode, video) stay behind the same
  * signature — drop a real decoder into [[decode]]'s fallback arm at
  * deployment, the dataflow is unchanged.
  *
  * Scale: payload bytes stay columnar in parquet; metadata extraction is a
  * narrow projection. Decode runs partition-parallel via a JVM-resident
  * Scala UDF (no Python-worker round trip — the Scala analogue of the
  * reference's pandas-UDF escalation, `udf_complex_logic.py:118`).
  */
object Multimodal {

  /** Decoded-media metadata. Image formats: pixel width/height, 1 frame.
    * WAV: `width` = sample rate (Hz), `height` = channel count,
    * `nFrames` = sample frames (data bytes / block align) — the three
    * numbers an audio curation pass filters on.
    */
  case class MediaMeta(width: Int, height: Int, nFrames: Int, format: String)

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def ascii4(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** PNG: 8-byte signature, then the IHDR chunk — width/height are the
    * two big-endian u32 at bytes 16 and 20 (PNG spec §11.2.2).
    */
  private[multimodal] def decodePng(b: Array[Byte]): Option[MediaMeta] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length < 24 || !sig.indices.forall(i => (b(i) & 0xff) == sig(i)) ||
        ascii4(b, 12) != "IHDR") None
    else Some(MediaMeta(u32be(b, 16), u32be(b, 20), 1, "png"))
  }

  /** JPEG: FFD8 SOI, then a marker-segment walk to the first
    * start-of-frame (SOF0/SOF2 and friends — every SOFn except
    * DHT/JPG/DAC), whose payload is [len][precision][height u16be]
    * [width u16be] (ITU T.81 §B.2.2). Standalone markers (RSTn, TEM)
    * have no length field and are skipped as bare bytes.
    */
  private[multimodal] def decodeJpeg(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // lost marker sync: corrupt
      val marker = b(i + 1) & 0xff
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
      else if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        if (i + 8 >= b.length) return None
        return Some(MediaMeta(u16be(b, i + 7), u16be(b, i + 5), 1, "jpeg"))
      } else i += 2 + u16be(b, i + 2)
    }
    None
  }

  /** WAV: RIFF/WAVE container, then a chunk walk — `fmt ` carries
    * channels (u16le at +2) and sample rate (u32le at +4) and block
    * align (u16le at +12); `data`'s size / block align = sample frames.
    */
  private[multimodal] def decodeWav(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 36 || ascii4(b, 0) != "RIFF" || ascii4(b, 8) != "WAVE")
      return None
    // Long cursor + unsigned chunk sizes: a hostile size like 0xFFFFFFF8
    // read as a signed Int makes the cursor advance by zero (or cycle)
    // and spins the executor forever — the decoder must be total in TIME
    // as well as in exceptions. With u32 & 0xFFFFFFFFL the step is
    // always ≥ 8 and the Long never overflows, so the walk terminates.
    var i = 12L
    var channels = 0; var sampleRate = 0; var blockAlign = 0
    var dataBytes = -1L
    while (i + 8 <= b.length && (channels == 0 || dataBytes < 0)) {
      val ii = i.toInt
      val id = ascii4(b, ii)
      val size = u32le(b, ii + 4) & 0xFFFFFFFFL
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        channels = u16le(b, ii + 10)
        sampleRate = u32le(b, ii + 12)
        blockAlign = u16le(b, ii + 20)
      } else if (id == "data") dataBytes = size
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (channels == 0) None
    else Some(MediaMeta(sampleRate, channels,
      if (blockAlign > 0 && dataBytes > 0)
        math.min(dataBytes / blockAlign, Int.MaxValue).toInt
      else 0,
      "wav"))
  }

  /** Deterministic fake for payloads in no recognized container (the
    * remaining documented stub — synthetic fixtures and the formats a
    * real deployment would route to codec libraries).
    */
  private def fakeMeta(bytes: Array[Byte]): MediaMeta = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    MediaMeta(
      width = b0 % 64 + 16,
      height = b1 % 64 + 16,
      nFrames = bytes.length / 100 + 1,
      format = "fake")
  }

  /** Header decoder: real PNG/JPEG/WAV parsing, deterministic fake
    * otherwise. Total — never throws on arbitrary bytes.
    */
  val decode: Array[Byte] => MediaMeta = { bytes =>
    try decodePng(bytes)
      .orElse(decodeJpeg(bytes))
      .orElse(decodeWav(bytes))
      .getOrElse(fakeMeta(bytes))
    catch { case _: IndexOutOfBoundsException |
                 _: ArithmeticException => fakeMeta(bytes) }
  }

  private val decodeUdf = udf(decode)

  /** Attach decoded metadata as a struct column next to the payload. */
  def withDecodedMeta(df: DataFrame, payload: Column): DataFrame =
    df.withColumn("media_meta", decodeUdf(payload))

  /** Pure-native metadata (no UDF): byte length, content hash, fake
    * dimensions from the first bytes — the oracle-checkable projection
    * mirroring [[stubDecode]] for ASCII payloads.
    */
  def nativeMeta(df: DataFrame, textPayload: Column): DataFrame =
    df.select(col("*"),
      octet_length(textPayload).as("n_bytes"),
      md5(textPayload.cast("binary")).as("content_hash"),
      (ascii(substring(textPayload, 1, 1)) % 64 + 16).as("width"),
      (ascii(substring(textPayload, 2, 1)) % 64 + 16).as("height"))

  /** Deterministic frame sampling plan for a fake video payload: every
    * `stride`-th byte offset, up to `maxFrames` — the partition/batch shape
    * of a real frame sampler.
    */
  /** Stub-decode → RESIZE (average-pool) feature extraction — the
    * "thumbnail" step of a media pipeline with the codec stubbed by a
    * deterministic fake decode: the payload's first `side`² characters
    * (space-padded/truncated) are a `side`×`side` grayscale grid of
    * codepoints, pooled `pool`×`pool` by integer-average. The Spark-side
    * plumbing is the real thing — per-row grid explode (no shuffle),
    * hash aggregation to (id, pool_y, pool_x) cells — and all math is
    * exact integers, so a real decoder drops in by replacing ONE
    * projection. Output: (id, pool_y, pool_x, pool_val).
    */
  def pooledFeatures(df: DataFrame, idCol: Column, payload: Column,
                     side: Int = 16, pool: Int = 2): DataFrame = {
    require(side % pool == 0, s"side $side must be divisible by pool $pool")
    df.select(idCol.as("id"),
        rpad(payload, side * side, " ").as("padded"))
      .select(col("id"), col("padded"),
        explode(sequence(lit(0), lit(side * side - 1))).as("pos"))
      .select(col("id"),
        (col("pos") / (side * pool)).cast("int").as("pool_y"),
        ((col("pos") % side) / pool).cast("int").as("pool_x"),
        expr("ascii(substr(padded, pos + 1, 1))").as("v"))
      .groupBy("id", "pool_y", "pool_x")
      .agg(expr(s"CAST(sum(v) DIV ${pool * pool} AS BIGINT)").as("pool_val"))
  }

  def frameOffsets(nBytes: Column, stride: Int, maxFrames: Int): Column =
    slice(sequence(lit(0), greatest(nBytes - 1, lit(0)), lit(stride)),
      1, maxFrames)
}
