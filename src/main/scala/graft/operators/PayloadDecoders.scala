package graft.operators

import graft.operators.MultimodalOps.{Features, Payload}

/** Pluggable multimodal payload decoders (SURVEY §2.11b).
  *
  * The multimodal pipeline treats image/audio/video as opaque binary
  * columns; decoding happens inside the partition-batched transform
  * (MultimodalOps.decoded). Each decoder sniffs its format from magic
  * bytes and produces the fixed-width [[Features]] row: real
  * dimensions from the container header and a 16-bin luminance
  * histogram over the decoded pixels.
  *
  * Four REAL formats are implemented: binary PPM and uncompressed
  * 24-bit BMP (pure-JVM header+pixel parsers), PNG (r11) and JPEG
  * (r12) via the JDK's javax.imageio codecs. Payloads matching none
  * fall back to [[OpaqueDecoder]], the deterministic byte-level stub
  * that stands in for formats whose codecs genuinely aren't in this
  * container (audio, video). The dispatch, batch shape, and output
  * schema are identical across all five, so swapping further codecs
  * in is purely additive.
  */
trait PayloadDecoder extends Serializable {
  def name: String
  /** cheap magic-byte sniff — must not read past the header */
  def accepts(bytes: Array[Byte]): Boolean
  /** decode to the fixed-width feature row */
  def decode(p: Payload): Features
}

object PayloadDecoder {
  /** BT.601 integer luma (0–255) → 16-bin index */
  @inline def lumaBin(r: Int, g: Int, b: Int): Int =
    ((r * 299 + g * 587 + b * 114) / 1000) >> 4

  /** histogram normalized to sum 1 (±rounding), 4dp — the same output
    * discipline as every float column in the engine */
  def normalize(hist: Array[Double], n: Int): Array[Double] = {
    val d = math.max(n, 1).toDouble
    hist.map(v => math.rint(v / d * 10000) / 10000)
  }
}

/** Binary PPM (P6): `P6 <ws> width <ws> height <ws> 255 <single-ws>`
  * then width×height RGB byte triples. `#` comments allowed between
  * header tokens. */
object PpmDecoder extends PayloadDecoder {
  import PayloadDecoder._
  val name = "ppm"

  def accepts(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 'P'.toByte && b(1) == '6'.toByte

  def decode(p: Payload): Features = {
    val b = p.payload
    var i = 2
    def skipWs(): Unit = {
      var done = false
      while (!done && i < b.length) {
        if (b(i) == '#'.toByte) { while (i < b.length && b(i) != '\n'.toByte) i += 1 }
        else if (Character.isWhitespace(b(i).toChar)) i += 1
        else done = true
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      while (i < b.length && b(i) >= '0'.toByte && b(i) <= '9'.toByte) {
        v = v * 10 + (b(i) - '0'.toByte); i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    i += 1 // exactly one whitespace byte separates the header from pixels
    require(w > 0 && h > 0 && maxv == 255,
      s"unsupported PPM header: w=$w h=$h maxval=$maxv")
    // long arithmetic: a crafted 65536×65536 header would wrap w*h*3 to
    // 0 in Int and slip past both requires with garbage dimensions
    require(w.toLong * h * 3 <= Int.MaxValue,
      s"implausible PPM dimensions: ${w}x$h")
    require(b.length.toLong - i >= w.toLong * h * 3,
      s"truncated PPM payload: need ${w.toLong * h * 3} pixel bytes, have ${b.length - i}")
    val hist = new Array[Double](16)
    var px = 0
    while (px < w * h) {
      hist(lumaBin(b(i) & 0xff, b(i + 1) & 0xff, b(i + 2) & 0xff)) += 1.0
      i += 3; px += 1
    }
    Features(p.doc_id, p.source, b.length, w, h, normalize(hist, w * h))
  }
}

/** Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB): little-endian
  * header fields, BGR pixel order, rows padded to 4 bytes, bottom-up
  * (or top-down when height is negative — irrelevant to a histogram). */
object BmpDecoder extends PayloadDecoder {
  import PayloadDecoder._
  val name = "bmp"

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  def accepts(b: Array[Byte]): Boolean =
    b.length > 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte

  def decode(p: Payload): Features = {
    val b = p.payload
    val dataOff = le32(b, 10)
    val w = le32(b, 18)
    val h = math.abs(le32(b, 22))
    val bpp = le16(b, 28)
    val comp = le32(b, 30)
    require(bpp == 24 && comp == 0,
      s"only uncompressed 24bpp BMP supported (bpp=$bpp compression=$comp)")
    // validate header arithmetic in Long: a sign-bit width or an
    // overflowing rowBytes*h would otherwise skip the pixel loops and
    // return garbage dimensions without ever throwing (which is what
    // routes malformed payloads to the opaque fallback)
    require(w > 0 && h > 0 && dataOff >= 54 &&
      w.toLong * h * 3 <= Int.MaxValue,
      s"implausible BMP header: w=$w h=$h dataOffset=$dataOff")
    // row stride in Long: w near Int.MaxValue/3 passes the area guard
    // with h=1, but w*3+3 in Int would wrap negative and make the
    // truncation require below vacuously true
    val rowBytesL = (w.toLong * 3 + 3) / 4 * 4
    require(rowBytesL * h <= Int.MaxValue, s"implausible BMP stride: w=$w h=$h")
    val rowBytes = rowBytesL.toInt
    require(b.length.toLong >= dataOff.toLong + rowBytes.toLong * h,
      "truncated BMP payload")
    val hist = new Array[Double](16)
    var y = 0
    while (y < h) {
      val ro = dataOff + y * rowBytes
      var x = 0
      while (x < w) {
        val o = ro + x * 3
        hist(lumaBin(b(o + 2) & 0xff, b(o + 1) & 0xff, b(o) & 0xff)) += 1.0
        x += 1
      }
      y += 1
    }
    Features(p.doc_id, p.source, b.length, w, h, normalize(hist, w * h))
  }
}

/** Shared ImageIO decode tail for the codec formats (PNG, JPEG): the
  * caller has already read the CLAIMED dimensions from the container
  * header bytes and passed the pixel cap — only then is the full
  * decode paid. Pixels are read through BufferedImage.getRGB, so any
  * color model (grayscale, palette, RGB, RGBA, YCbCr) lands in the
  * same sRGB luma histogram the PPM/BMP decoders produce; alpha is
  * ignored (histogram semantics, not compositing). */
private[graft] object ImageIoDecode {
  import PayloadDecoder._

  /** decompression-bomb ceiling (r12, ADVICE r11 #1): a malformed or
    * adversarial header declaring huge dimensions would make
    * ImageIO.read allocate width×height×4 bytes BEFORE any pixel data
    * is validated — and OutOfMemoryError is not an exception the
    * opaque-fallback dispatch can catch, so one bad payload in a
    * large lake would kill the executor instead of degrading. 2²⁴
    * pixels (a 4096×4096 frame, 64 MiB of INT_RGB) is far above any
    * sane payload on this pipeline and small enough that 32
    * concurrent decodes fit a 128 GiB heap with room to spare. */
  val MaxDecodePixels: Long = 1L << 24

  /** big-endian u16/u32 readers for the header pre-checks */
  @inline def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  @inline def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  def guardDims(fmt: String, w: Long, h: Long): Unit =
    require(w > 0 && h > 0 && w * h <= MaxDecodePixels,
      s"$fmt header declares ${w}x$h - over the $MaxDecodePixels-pixel " +
        "decode cap (decompression-bomb guard); routing to opaque")

  def decode(p: Payload, fmt: String): Features = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(p.payload))
    require(img != null, s"ImageIO could not decode $fmt payload")
    val w = img.getWidth
    val h = img.getHeight
    guardDims(fmt, w, h) // decoded dims re-checked against the same cap
    val hist = new Array[Double](16)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        hist(lumaBin((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)) += 1.0
        x += 1
      }
      y += 1
    }
    Features(p.doc_id, p.source, p.payload.length, w, h, normalize(hist, w * h))
  }
}

/** PNG via the JDK's ImageIO (r11, VERDICT r10 #4): a REAL codec-format
  * decode — deflate decompression, filtering, interlacing all handled
  * by javax.imageio, which ships in the JDK (no new dependency).
  * Claimed dimensions are read from the IHDR bytes (fixed offsets 16 /
  * 20 after the 8-byte magic — IHDR is required to be the first chunk)
  * and checked against [[ImageIoDecode.MaxDecodePixels]] BEFORE
  * ImageIO.read allocates anything (r12 decompression-bomb guard).
  * Decode failures (truncated stream, dirty data behind a valid magic,
  * bomb headers) throw and degrade to the opaque path via the dispatch
  * below, like the other decoders. */
object PngDecoder extends PayloadDecoder {
  val name = "png"

  private val Magic =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def accepts(b: Array[Byte]): Boolean =
    b.length > Magic.length && Magic.indices.forall(i => b(i) == Magic(i))

  def decode(p: Payload): Features = {
    val b = p.payload
    require(b.length >= 24, "PNG payload shorter than its IHDR")
    ImageIoDecode.guardDims("PNG",
      ImageIoDecode.be32(b, 16), ImageIoDecode.be32(b, 20))
    ImageIoDecode.decode(p, "PNG")
  }
}

/** JPEG via the JDK's ImageIO (r12, VERDICT r11 #1): the JDK in this
  * container DOES ship a JPEG ImageIO reader
  * (`ImageIO.getReaderFormatNames()` lists JPEG/JPG), so the decode is
  * available at zero dependency cost through the identical path PNG
  * uses — baseline and progressive DCT, chroma subsampling, EXIF/JFIF
  * wrappers all handled by javax.imageio. Claimed dimensions come from
  * the first SOF marker segment (height/width big-endian at payload
  * offsets 1/3 after the precision byte), walked marker-by-marker so
  * APPn/EXIF segments of any length are skipped — checked against the
  * pixel cap BEFORE ImageIO.read allocates (decompression-bomb guard).
  * JPEG is lossy, so unlike PNG the histogram is pinned to the PPM
  * encoding of the same pixels within a declared tolerance, not
  * bit-identically (Round12Spec). */
object JpegDecoder extends PayloadDecoder {
  val name = "jpeg"

  def accepts(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  /** walk the marker stream to the first SOFn (C0–CF minus C4/C8/CC,
    * which are DHT/JPG/DAC) and return its claimed (width, height) */
  private[graft] def sofDims(b: Array[Byte]): (Long, Long) = {
    var i = 2
    while (i + 3 < b.length) {
      require((b(i) & 0xff) == 0xff, s"JPEG marker stream broken at $i")
      val m = b(i + 1) & 0xff
      if (m == 0xff) i += 1 // fill bytes before a marker are legal
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) i += 2 // standalone
      else {
        // SOS (FF DA) starts entropy-coded scan data: a SOF must
        // precede it in any decodable JPEG, so reaching it without one
        // means the walk would continue into compressed bytes where
        // FF Cx pairs are data, not markers — stop loudly instead of
        // claiming garbage dimensions (r13, ADVICE r12 #3; outcome is
        // the same opaque fallback, but via the honest path)
        if (m == 0xda)
          throw new IllegalArgumentException(
            "JPEG SOS reached with no preceding SOF marker")
        val len = ImageIoDecode.be16(b, i + 2)
        require(len >= 2, s"JPEG segment with impossible length $len")
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          require(i + 8 < b.length, "truncated JPEG SOF segment")
          return (ImageIoDecode.be16(b, i + 7).toLong, // width
            ImageIoDecode.be16(b, i + 5).toLong) // height
        }
        i += 2 + len
      }
    }
    throw new IllegalArgumentException("no SOF marker in JPEG payload")
  }

  def decode(p: Payload): Features = {
    val (w, h) = sofDims(p.payload)
    ImageIoDecode.guardDims("JPEG", w, h)
    ImageIoDecode.decode(p, "JPEG")
  }
}

/** Fallback for formats without an in-container codec (audio, video —
  * the JDK ships no decoder for those): deterministic byte-nibble
  * histogram + hash-derived fake dimensions. CLEARLY A STUB — it keeps
  * the pipeline runnable end-to-end on arbitrary payloads; a real
  * audio/video decoder would slot in beside the four real decoders
  * above. */
object OpaqueDecoder extends PayloadDecoder {
  import PayloadDecoder._
  val name = "opaque"
  def accepts(bytes: Array[Byte]): Boolean = true
  def decode(p: Payload): Features = {
    val bytes = p.payload
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1.0; i += 1 }
    val h = java.util.Arrays.hashCode(bytes)
    Features(p.doc_id, p.source, bytes.length,
      width = 64 + (math.abs(h) % 64), height = 64 + (math.abs(h >> 8) % 64),
      feat = normalize(hist, bytes.length))
  }
}

/** format dispatch: first sniffing decoder wins; opaque stub last.
  * A payload that matches a magic-byte sniff but fails to parse (dirty
  * data, or text that happens to start with "P6"/"BM") degrades to the
  * opaque path instead of failing the whole partition batch — the only
  * sane behavior over a 100 TB lake where a per-mille of payloads are
  * malformed. */
object PayloadDecoders {
  val all: Seq[PayloadDecoder] =
    Seq(PpmDecoder, BmpDecoder, PngDecoder, JpegDecoder, OpaqueDecoder)
  def decode(p: Payload): Features = {
    val d = all.find(_.accepts(p.payload)).get
    if (d eq OpaqueDecoder) d.decode(p)
    else
      try d.decode(p)
      catch { case _: IllegalArgumentException |
          _: ArrayIndexOutOfBoundsException | _: java.io.IOException =>
        OpaqueDecoder.decode(p) }
  }
}
