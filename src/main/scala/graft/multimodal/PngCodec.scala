package graft.multimodal

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

/** A real, pure-JVM PNG codec — no media library, only `java.util.zip`
  * (the zlib bindings the JDK ships). Closes the "pixel decode remains
  * stubbed" boundary for the one mainstream image format whose payload
  * is exactly zlib: PNG spec (W3C/ISO 15948) §5 chunk layout, §6 filter
  * types, §11.2.2 IHDR.
  *
  * Scope: 8-bit samples, color types 0 (gray), 2 (RGB) and 6 (RGBA),
  * no interlace — the overwhelmingly common deflate path. All five
  * row filters (None/Sub/Up/Average/Paeth) are implemented on both
  * sides; the encoder deliberately cycles filters across rows so a
  * round-trip exercises the full unfilter matrix.
  *
  * Totality (same contract as [[Multimodal.decode]]): `decode` never
  * throws and never hangs on arbitrary bytes — Long chunk cursor,
  * CRC verification, a pixel-count cap against hostile headers, and
  * every zlib error mapped to None.
  *
  * Scale: the codec is a per-row scalar kernel (bytes in, bytes out) —
  * it runs partition-parallel inside a JVM UDF with no Python round
  * trip, and payloads stay columnar in parquet.
  */
object PngCodec {

  /** Decoded raster: `channels` ∈ {1, 3, 4}, `pixels` is row-major
    * unfiltered sample bytes (width·height·channels of them).
    */
  final case class Raster(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Refuse to allocate rasters above this many samples when decoding
    * (hostile IHDR protection — 64 MB of pixel bytes).
    */
  private val MaxSamples = 1 << 26

  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def putU32be(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = ((v >>> 24) & 0xff).toByte
    b(i + 1) = ((v >>> 16) & 0xff).toByte
    b(i + 2) = ((v >>> 8) & 0xff).toByte
    b(i + 3) = (v & 0xff).toByte
  }

  /** PNG §6.6 Paeth predictor — exact spec arithmetic. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ---------------------------------------------------------------- encode

  /** Encode an 8-bit raster as a valid PNG. `filterOf(row)` picks the
    * per-row filter (0..4); the default cycles through all five so any
    * consumer must implement the full unfilter matrix.
    */
  def encode(r: Raster, filterOf: Int => Int = _ % 5): Array[Byte] = {
    require(r.channels == 1 || r.channels == 3 || r.channels == 4,
      s"unsupported channel count ${r.channels}")
    require(r.pixels.length == r.width * r.height * r.channels,
      "pixel buffer does not match dimensions")
    val bpp = r.channels
    val stride = r.width * bpp
    val raw = new Array[Byte](r.height * (1 + stride))
    var y = 0
    while (y < r.height) {
      val f = filterOf(y) % 5
      raw(y * (1 + stride)) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = r.pixels(y * stride + i) & 0xff
        val left = if (i >= bpp) r.pixels(y * stride + i - bpp) & 0xff else 0
        val up = if (y > 0) r.pixels((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp)
          r.pixels((y - 1) * stride + i - bpp) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + i) = (enc & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    val idat =
      try {
        deflater.setInput(raw); deflater.finish()
        val buf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
        val tmp = new Array[Byte](8192)
        while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
        buf.toByteArray
      } finally deflater.end()

    val colorType = r.channels match {
      case 1 => 0; case 3 => 2; case 4 => 6
    }
    val ihdr = new Array[Byte](13)
    putU32be(ihdr, 0, r.width.toLong); putU32be(ihdr, 4, r.height.toLong)
    ihdr(8) = 8; ihdr(9) = colorType.toByte // bit depth 8
    // compression 0, filter 0, interlace 0 already zero

    val out = new java.io.ByteArrayOutputStream(idat.length + 64)
    out.write(Signature, 0, Signature.length)
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      val head = new Array[Byte](8)
      putU32be(head, 0, data.length.toLong)
      tpe.getBytes("US-ASCII").copyToArray(head, 4)
      out.write(head, 0, 8)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(head, 4, 4); crc.update(data, 0, data.length)
      val tail = new Array[Byte](4)
      putU32be(tail, 0, crc.getValue)
      out.write(tail, 0, 4)
    }
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** Full pixel decode. None on anything that is not a supported,
    * well-formed PNG (bad signature, CRC mismatch, unsupported color
    * type / bit depth / interlace, zlib errors, truncation, or a pixel
    * count above the hostile-header cap). Never throws, never hangs.
    */
  def decode(b: Array[Byte]): Option[Raster] =
    try decodeImpl(b)
    catch { case _: DataFormatException | _: RuntimeException => None }

  private def decodeImpl(b: Array[Byte]): Option[Raster] = {
    if (b.length < Signature.length + 12 ||
        !Signature.indices.forall(i => b(i) == Signature(i))) return None
    var pos: Long = Signature.length
    var width = -1L; var height = -1L; var channels = -1
    var seenEnd = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenEnd && pos + 12 <= b.length) {
      val p = pos.toInt
      val len = u32be(b, p)
      val next = pos + 12 + len // next must strictly advance (len >= 0)
      if (len > Int.MaxValue - 12 || next > b.length) return None
      val tpe = new String(b, p + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(b, p + 4, 4 + len.toInt)
      if (crc.getValue != u32be(b, p + 8 + len.toInt)) return None
      tpe match {
        case "IHDR" =>
          if (len != 13) return None
          width = u32be(b, p + 8); height = u32be(b, p + 12)
          val bitDepth = b(p + 16) & 0xff
          val colorType = b(p + 17) & 0xff
          val interlace = b(p + 20) & 0xff
          if (bitDepth != 8 || interlace != 0) return None
          channels = colorType match {
            case 0 => 1; case 2 => 3; case 6 => 4; case _ => return None
          }
          // bound each dimension BEFORE multiplying: u32 w·h·ch can wrap
          // a Long (2^32·2^32·4), which would sneak past the cap
          if (width <= 0 || height <= 0 || width > MaxSamples ||
              height > MaxSamples ||
              width * height * channels > MaxSamples) return None
        case "IDAT" =>
          if (channels < 0) return None // IDAT before IHDR: corrupt
          idat.write(b, p + 8, len.toInt)
        case "IEND" => seenEnd = true
        case _ => () // ancillary chunk: skip
      }
      pos = next
    }
    if (!seenEnd || channels < 0) return None

    val w = width.toInt; val h = height.toInt
    val bpp = channels
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    val inflater = new Inflater()
    try {
      inflater.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        // n == 0 with input already fully provided means the stream can
        // make no progress: truncated data, or an FDICT preset-dictionary
        // zlib header (needsDictionary) we'll never satisfy — bail rather
        // than spin (totality: decode never hangs on crafted IDAT).
        if (n == 0) return None
        off += n
      }
      if (off != raw.length) return None
    } finally inflater.end()

    val px = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + stride)) & 0xff
      if (f > 4) return None
      var i = 0
      while (i < stride) {
        val enc = raw(y * (1 + stride) + 1 + i) & 0xff
        val left = if (i >= bpp) px(y * stride + i - bpp) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp)
          px((y - 1) * stride + i - bpp) & 0xff else 0
        val dec = f match {
          case 0 => enc
          case 1 => enc + left
          case 2 => enc + up
          case 3 => enc + ((left + up) >> 1)
          case 4 => enc + paeth(left, up, ul)
        }
        px(y * stride + i) = (dec & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Some(Raster(w, h, channels, px))
  }
}
