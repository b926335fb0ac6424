package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded-media record produced by the (stubbed) decoder. */
final case class DecodedMedia(
    id: Long, format: String, nBytes: Long,
    width: Int, height: Int, channels: Int, checksum: Long)

/** Per-record image features over real pixels ([[Multimodal.features]]):
  * per-channel mean/std plus an 8-bin luminance histogram. `decoded=false`
  * rows carry deterministic stub features (no pure-JVM pixel decode for
  * that format).
  */
final case class MediaFeatures(
    id: Long, format: String, decoded: Boolean,
    width: Int, height: Int, channels: Int,
    chanMean: Array[Double], chanStd: Array[Double], lumaHist: Array[Double])

/** Box-average-resized image re-encoded as PNG ([[Multimodal.resize]]);
  * undecodable payloads pass through unchanged with `decoded=false` —
  * carrying the payload's true header geometry where one parses (JPEG SOF,
  * WAV), 0×0×0 otherwise.
  */
final case class ResizedMedia(
    id: Long, decoded: Boolean, width: Int, height: Int, channels: Int,
    payload: Array[Byte])

/** One sampled video frame ([[Multimodal.frameSamples]]): container-exact
  * byte range + presentation time from the MP4 sample tables. `payload`
  * holds the frame's bytes (in production: the ranged-GET result).
  */
final case class FrameSample(
    id: Long, frameIdx: Int, ptsMs: Long, offset: Long, payload: Array[Byte])

/** Multimodal-column plumbing (SURVEY.md §2.8 north-star "multimodal
  * columns"): media as opaque `binary` columns with typed metadata.
  *
  * [[decode]] REALLY decodes the formats parseable in pure JVM with no
  * codec libraries — BMP (BI_RGB, 24/32-bit), binary PPM (P6),
  * PNG of every color type and layout (gray 1-16 bit, RGB/RGBA,
  * palette+tRNS, gray+alpha, Adam7 interlaced; zlib inflate ships in
  * `java.util.zip`), PCM WAV (RIFF, format code 1), and Huffman JPEG —
  * baseline, extended-sequential, AND progressive SOF2 — via the in-repo
  * T.81 codec ([[Jpeg]]) — yielding true dimensions/channels and a
  * checksum over the decoded samples (row padding / filter bytes /
  * container chunks excluded). JPEGs outside the Huffman envelope
  * (arithmetic, 12-bit, CMYK) get a real HEADER parse: true geometry from
  * SOF, checksum over the entropy-coded scan.
  * Formats with no pure-JVM parse at all (compressed audio) fall back to
  * the clearly-marked deterministic STUB ([[decodeStub]]), as does any
  * payload whose sniff passes but whose parse fails — one corrupt record
  * degrades, never kills the job. Everything
  * around the codec is the real 100-TB-shaped plumbing: binary column +
  * metadata struct schema, partition-parallel `mapPartitions` batch
  * iteration (the Scala analog of `mapInPandas` batches), and a typed
  * `Dataset[DecodedMedia]` output that downstream relational operators
  * consume normally.
  */
object Multimodal {

  /** Attach an opaque binary payload + typed metadata struct. In production
    * the payload would come from an object store; here it is the UTF-8 bytes
    * of the text column (real bytes, fake media).
    */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        length(col(textCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** Decoder dispatch: REAL parse for the headerless-friendly uncompressed
    * formats (BMP `BM`, PPM `P6`), deterministic stub for everything else
    * (compressed codecs are not available in this container). Dispatch is on
    * the payload's magic bytes, not the metadata format string — corrupt or
    * mislabeled metadata must not route bytes to the wrong parser.
    */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select(col("id"), col("payload"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, fmt) =>
          // A payload that passes a sniff but then fails its parser (lying
          // header, unsupported sub-format like RLE BMP or interlaced PNG,
          // truncated pixel data) degrades to the stub record instead of
          // failing the executor task: one corrupt record must never kill a
          // 100-TB decode job.
          try {
            if (isBmp(bytes)) decodeBmp(id, bytes)
            else if (isPpm(bytes)) decodePpm(id, bytes)
            else if (isPng(bytes)) decodePng(id, bytes)
            else if (isWav(bytes)) decodeWav(id, bytes)
            else if (Flac.isFlac(bytes)) decodeFlac(id, bytes)
            else if (isJpeg(bytes)) decodeJpeg(id, bytes)
            else if (Gif.isGif(bytes)) decodeGif(id, bytes)
            else if (Mp4.isMp4(bytes)) decodeMp4(id, bytes)
            else mp3GeometryOpt(bytes) match {
              case Some(g) => decodeMp3(id, bytes, g)
              case None => stubRecord(id, bytes, fmt)
            }
          } catch {
            case scala.util.control.NonFatal(_) => stubRecord(id, bytes, fmt)
          }
        }
      }
  }

  /** Magic alone is not enough — payloads may be arbitrary bytes (text that
    * happens to start with "BM"), so the sniff also demands structural
    * consistency: the header's declared file size must equal the actual
    * length and the DIB header size must be a known value. A false positive
    * would then require text to embed its own little-endian byte count at
    * offset 2 — not something that happens by accident.
    */
  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B' && b(1) == 'M' &&
      le32(b, 2) == b.length &&
      Set(40, 52, 56, 108, 124).contains(le32(b, 14))

  private def isPpm(b: Array[Byte]): Boolean =
    b.length >= 3 && b(0) == 'P' && b(1) == '6' &&
      (b(2) == '\n' || b(2) == ' ' || b(2) == '\t' || b(2) == '\r') &&
      ppmConsistent(b)

  /** A P6 header is only believed if its declared width×height×3 payload
    * exactly fits the remaining bytes.
    */
  private def ppmConsistent(b: Array[Byte]): Boolean =
    try {
      val (w, h, _, off) = ppmHeader(b)
      w > 0 && h > 0 && b.length == off + w * h * 3
    } catch { case _: Exception => false }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** FNV-1a over a byte range — the pixel checksum primitive. */
  private def fnv(b: Array[Byte], from: Int, until: Int, seed: Long): Long = {
    var cs = seed
    var i = from
    while (i < until) { cs = (cs ^ (b(i) & 0xffL)) * 1099511628211L; i += 1 }
    cs
  }

  private val FnvSeed = 1469598103934665603L

  /** Uncompressed BMP (BITMAPINFOHEADER, BI_RGB, 24/32-bit). Width/height
    * are int32 LE at offsets 18/22 (height may be negative = top-down);
    * pixel rows are padded to 4-byte boundaries — the checksum covers pixel
    * bytes only, so a re-encode with different padding garbage hashes
    * identically.
    */
  private def decodeBmp(id: Long, b: Array[Byte]): DecodedMedia = {
    val pixelOff = le32(b, 10)
    val width = le32(b, 18)
    val height = math.abs(le32(b, 22))
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    require(compression == 0, s"BMP $id: only BI_RGB (0) supported, got $compression")
    require(bpp == 24 || bpp == 32, s"BMP $id: only 24/32-bit supported, got $bpp")
    require(width > 0 && height > 0, s"BMP $id: bad dimensions ${width}x$height")
    val channels = bpp / 8
    val rowBytes = width * channels
    val stride = (rowBytes + 3) & ~3 // rows pad to 4-byte boundaries
    // a lying header must throw here (→ stub), not index past the array
    require(pixelOff >= 54 && pixelOff.toLong + height.toLong * stride <= b.length,
      s"BMP $id: declared pixel data exceeds payload")
    var cs = FnvSeed
    var row = 0
    while (row < height) {
      val start = pixelOff + row * stride
      cs = fnv(b, start, start + rowBytes, cs)
      row += 1
    }
    DecodedMedia(id, "image/bmp", b.length.toLong, width, height, channels, cs)
  }

  /** Binary PPM (`P6`) header: ASCII whitespace-separated width, height,
    * maxval (with `#` comments), one whitespace, then width×height×3 raw
    * bytes. Returns (width, height, maxval, pixelOffset).
    */
  private def ppmHeader(b: Array[Byte]): (Int, Int, Int, Int) = {
    var i = 2 // past "P6"
    def skipWs(): Unit = {
      var more = true
      while (more && i < b.length) {
        val c = b(i).toChar
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else more = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
      v
    }
    val width = int()
    val height = int()
    val maxval = int()
    require(maxval > 0 && maxval < 256, s"PPM: only 8-bit maxval supported, got $maxval")
    i += 1 // the single whitespace after maxval
    (width, height, maxval, i)
  }

  private def decodePpm(id: Long, b: Array[Byte]): DecodedMedia = {
    val (width, height, _, off) = ppmHeader(b)
    val n = width * height * 3
    require(b.length >= off + n, s"PPM $id: truncated pixel data")
    DecodedMedia(id, "image/ppm", b.length.toLong, width, height, 3,
      fnv(b, off, off + n, FnvSeed))
  }

  /** STUB decoder — stands in for a compressed-codec call the container
    * cannot make. Derives deterministic pseudo-dimensions from the bytes so
    * the full pipeline (schema, batching, typed output) is exercised and
    * testable without codec libraries.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select(col("id"), col("payload"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(it => it.map { case (id, bytes, fmt) => stubRecord(id, bytes, fmt) })
  }

  private def stubRecord(id: Long, bytes: Array[Byte], fmt: String): DecodedMedia = {
    val cs = fnv(bytes, 0, bytes.length, FnvSeed)
    val w = 64 + (math.abs(cs) % 577).toInt
    val h = 64 + (math.abs(cs / 769) % 433).toInt
    DecodedMedia(id, fmt, bytes.length.toLong, w, h, 3, cs)
  }

  /** Minimal 24-bit BI_RGB BMP encoder — the test-fixture counterpart of
    * [[decodeBmp]] (rows written bottom-up with 4-byte padding, exactly the
    * layout the decoder walks). `rgb` is row-major top-down (r,g,b)*.
    */
  def encodeBmp24(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be width*height*3 bytes")
    val stride = (width * 3 + 3) & ~3
    val pixelBytes = stride * height
    val size = 54 + pixelBytes
    val out = new Array[Byte](size)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, size); putLe32(10, 54)
    putLe32(14, 40) // BITMAPINFOHEADER
    putLe32(18, width); putLe32(22, height)
    out(26) = 1 // planes
    out(28) = 24 // bpp
    putLe32(30, 0) // BI_RGB
    putLe32(34, pixelBytes)
    var row = 0
    while (row < height) {
      // BMP stores rows bottom-up; pixels are (b,g,r)
      val srcRow = height - 1 - row
      var x = 0
      while (x < width) {
        val s = (srcRow * width + x) * 3
        val d = 54 + row * stride + x * 3
        out(d) = rgb(s + 2); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s)
        x += 1
      }
      row += 1
    }
    out
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG sniff: 8-byte signature followed immediately by a 13-byte IHDR
    * chunk (mandatory first chunk per the spec) — random bytes shaped like
    * the signature alone are not believed.
    */
  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 33 && PngSig.indices.forall(i => b(i) == PngSig(i)) &&
      be32(b, 8) == 13 &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Pure-JVM PNG decode — every color type and layout: gray (depths
    * 1/2/4/8/16, sub-byte scaled to 0-255, 16-bit reduced to the high
    * byte), RGB/RGBA (8/16-bit), palette (PLTE, depths 1/2/4/8, expanded
    * to RGB — RGBA when a tRNS alpha table is present), gray+alpha
    * (expanded to RGBA), progressive-rendering Adam7 interlacing (the 7
    * sub-images are unfiltered independently and gathered into one sample
    * grid). IDAT chunks are concatenated, inflated with the JDK's
    * `Inflater` (zlib is in `java.util.zip`, no codec library needed),
    * and each scanline is un-filtered (None/Sub/Up/Average/Paeth) at the
    * file's own byte layout. The checksum covers the reconstructed pixel
    * bytes, so the same image re-encoded with different per-row filter
    * choices, interlacing, or deflate levels hashes identically.
    */
  private def decodePng(id: Long, b: Array[Byte]): DecodedMedia = {
    val (width, height, channels, pix) = decodePngPixels(b)
    DecodedMedia(id, "image/png", b.length.toLong, width, height, channels,
      fnv(pix, 0, pix.length, FnvSeed))
  }

  /** Reconstructed PNG pixels (top-down interleaved); throws on unsupported
    * shapes — callers catch and degrade.
    */
  private def decodePngPixels(b: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    val width = be32(b, 16)
    val height = be32(b, 20)
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    require(width > 0 && height > 0, s"PNG: bad dimensions ${width}x$height")
    require(interlace == 0 || interlace == 1, s"PNG: bad interlace method $interlace")
    // file-side samples per pixel + the legal depths per color type
    // (PNG spec §11.2.2); depth 16 is decoded by taking the high byte
    // (the spec-recommended 16→8 reduction), sub-byte gray scales to 0-255
    val fileCh = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // RGB
      case 3 => 1 // palette indices
      case 4 => 2 // gray + alpha
      case 6 => 4 // RGBA
      case t => throw new IllegalArgumentException(
        s"PNG: color type $t not supported")
    }
    val depthLegal = colorType match {
      case 0 => Set(1, 2, 4, 8, 16)
      case 3 => Set(1, 2, 4, 8)
      case _ => Set(8, 16)
    }
    require(depthLegal(bitDepth),
      s"PNG: depth $bitDepth illegal for color type $colorType")
    // output channels: palette expands to RGB (RGBA with tRNS), gray+alpha
    // to RGBA; worst case for the bomb guard below
    val outChMax = colorType match {
      case 0 => 1; case 2 => 3; case _ => 4
    }
    // decompression-bomb guard (same rationale as Jpeg.MaxDecodedBytes): a
    // crafted IHDR can declare gigabytes while the IDAT is tiny, and the
    // allocation would OOM the task before the inflate-length check fires.
    // Allocation = filtered rows (raw) + reconstructed pixels, counted with
    // the REAL channel count so grayscale is not over-rejected; layouts
    // that go through the int sample grid (interlaced / sub-byte / 16-bit /
    // palette) add 4 bytes per file sample on top
    val fastLayout = interlace == 0 && bitDepth == 8 &&
      (colorType == 0 || colorType == 2 || colorType == 6)
    val perPx = 2L * outChMax + (if (fastLayout) 0L else 4L * fileCh)
    require(width.toLong * height * perPx <= Jpeg.MaxDecodedBytes,
      s"PNG: declared ${width}x$height too large to decode inline")
    // Walk the chunk list: concatenate IDAT payloads, pick up PLTE/tRNS.
    val idat = new java.io.ByteArrayOutputStream()
    var palette: Array[Byte] = null
    var trns: Array[Byte] = null
    var i = 8
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = be32(b, i)
      require(len >= 0 && i + 12 + len <= b.length, s"PNG: corrupt chunk at $i")
      val typ = new String(b, i + 4, 4, "US-ASCII")
      typ match {
        case "IDAT" => idat.write(b, i + 8, len)
        case "PLTE" =>
          require(len % 3 == 0 && len > 0 && len <= 3 * 256, "PNG: bad PLTE length")
          palette = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
        case "tRNS" if colorType == 3 =>
          trns = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
        case "IEND" => done = true
        case _ => ()
      }
      i += 12 + len
    }
    // un-filter at the FILE's layout: filters operate on scanline bytes
    // with a bpp step of whole bytes (spec §9.2), whatever the depth.
    // Interlaced images are 7 independent Adam7 sub-images (each with its
    // own scanlines and filtering) concatenated in the IDAT stream; a
    // non-interlaced image is the single full pass.
    val bpp = math.max(1, (fileCh * bitDepth) / 8)
    val passes: Seq[(Int, Int, Int, Int)] = // (xStart, yStart, xStep, yStep)
      if (interlace == 0) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = (
      if (width > p._1) (width - p._1 + p._3 - 1) / p._3 else 0,
      if (height > p._2) (height - p._2 + p._4 - 1) / p._4 else 0)
    def rowBytesOf(w: Int): Int = (w * fileCh * bitDepth + 7) / 8
    val rawLen = passes.map { p =>
      val (w, h) = passDims(p)
      if (w == 0 || h == 0) 0 else (rowBytesOf(w) + 1) * h
    }.sum
    val raw = new Array[Byte](rawLen) // +1 filter byte per scanline
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // a zero-progress inflate must FAIL, never spin: truncated input
        // (needsInput), a preset-dictionary stream (needsDictionary — legal
        // zlib, never produced by PNG encoders), or any other stall would
        // otherwise hang the task instead of degrading the record
        require(n > 0, s"PNG: IDAT stream stalled (truncated or FDICT)")
        off += n
      }
    } finally inf.end()
    require(off == raw.length, s"PNG: pixel data does not match dimensions")

    def unfilter(srcOff: Int, rowBytes: Int, rows: Int): Array[Byte] = {
      val unf = new Array[Byte](rowBytes * rows)
      var row = 0
      while (row < rows) {
        val f = raw(srcOff + row * (rowBytes + 1)) & 0xff
        val rs = srcOff + row * (rowBytes + 1) + 1
        val ps = row * rowBytes
        val pp = ps - rowBytes // prior row start (valid when row > 0)
        var x = 0
        f match {
          case 0 => System.arraycopy(raw, rs, unf, ps, rowBytes)
          case 1 => // Sub: left neighbor
            while (x < rowBytes) {
              val left = if (x >= bpp) unf(ps + x - bpp) & 0xff else 0
              unf(ps + x) = ((raw(rs + x) & 0xff) + left).toByte
              x += 1
            }
          case 2 => // Up: prior-row neighbor
            while (x < rowBytes) {
              val up = if (row > 0) unf(pp + x) & 0xff else 0
              unf(ps + x) = ((raw(rs + x) & 0xff) + up).toByte
              x += 1
            }
          case 3 => // Average of left and up (floor)
            while (x < rowBytes) {
              val left = if (x >= bpp) unf(ps + x - bpp) & 0xff else 0
              val up = if (row > 0) unf(pp + x) & 0xff else 0
              unf(ps + x) = ((raw(rs + x) & 0xff) + ((left + up) >> 1)).toByte
              x += 1
            }
          case 4 => // Paeth predictor
            while (x < rowBytes) {
              val left = if (x >= bpp) unf(ps + x - bpp) & 0xff else 0
              val up = if (row > 0) unf(pp + x) & 0xff else 0
              val ul = if (row > 0 && x >= bpp) unf(pp + x - bpp) & 0xff else 0
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
              val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
              unf(ps + x) = ((raw(rs + x) & 0xff) + pred).toByte
              x += 1
            }
          case other =>
            throw new IllegalArgumentException(s"PNG: unknown filter $other")
        }
        row += 1
      }
      unf
    }

    // fast path: the layout that IS the output (non-interlaced 8-bit
    // gray/RGB/RGBA) skips the sample-grid indirection
    if (fastLayout)
      return (width, height, fileCh, unfilter(0, rowBytesOf(width), height))

    // gather every pass into one full-resolution sample grid (sub-byte
    // samples raw 0..2^d-1; 8-bit as-is; 16-bit reduced to the high byte —
    // the spec-recommended 16→8 reduction)
    val samples = new Array[Int](width * height * fileCh)
    def sampleOf(unf: Array[Byte], rowStart: Int, x: Int, c: Int): Int = bitDepth match {
      case 8 => unf(rowStart + x * fileCh + c) & 0xff
      case 16 => unf(rowStart + (x * fileCh + c) * 2) & 0xff
      case d => // packed MSB-first (spec §7.2); only fileCh == 1 has d < 8
        val bit = (x * fileCh + c) * d
        ((unf(rowStart + (bit >> 3)) & 0xff) >> (8 - d - (bit & 7))) & ((1 << d) - 1)
    }
    var rawOff = 0
    passes.foreach { p =>
      val (wP, hP) = passDims(p)
      if (wP > 0 && hP > 0) {
        val rb = rowBytesOf(wP)
        val unf = unfilter(rawOff, rb, hP)
        rawOff += (rb + 1) * hP
        var py = 0
        while (py < hP) {
          val y = p._2 + py * p._4
          var px = 0
          while (px < wP) {
            val x = p._1 + px * p._3
            var c = 0
            while (c < fileCh) {
              samples((y * width + x) * fileCh + c) = sampleOf(unf, py * rb, px, c)
              c += 1
            }
            px += 1
          }
          py += 1
        }
      }
    }

    // expand the sample grid to 8-bit interleaved output
    val outCh = colorType match {
      case 0 => 1
      case 2 => 3
      case 3 => if (trns != null) 4 else 3
      case _ => 4 // gray+alpha and RGBA
    }
    if (colorType == 3) require(palette != null, "PNG: palette image without PLTE")
    val maxSub = (1 << bitDepth) - 1
    val out = new Array[Byte](width * height * outCh)
    var pxi = 0
    while (pxi < width * height) {
      val s0 = pxi * fileCh
      val d = pxi * outCh
      colorType match {
        case 0 =>
          out(d) =
            if (bitDepth >= 8) samples(s0).toByte
            else (samples(s0) * 255 / maxSub).toByte
        case 2 =>
          out(d) = samples(s0).toByte; out(d + 1) = samples(s0 + 1).toByte
          out(d + 2) = samples(s0 + 2).toByte
        case 6 =>
          out(d) = samples(s0).toByte; out(d + 1) = samples(s0 + 1).toByte
          out(d + 2) = samples(s0 + 2).toByte; out(d + 3) = samples(s0 + 3).toByte
        case 4 => // gray+alpha → RGBA (r = g = b = gray)
          val g = samples(s0).toByte
          out(d) = g; out(d + 1) = g; out(d + 2) = g
          out(d + 3) = samples(s0 + 1).toByte
        case 3 =>
          val idx = samples(s0)
          require(idx * 3 + 2 < palette.length, s"PNG: palette index $idx out of range")
          out(d) = palette(idx * 3); out(d + 1) = palette(idx * 3 + 1)
          out(d + 2) = palette(idx * 3 + 2)
          if (outCh == 4)
            out(d + 3) = if (idx < trns.length) trns(idx) else 0xff.toByte
      }
      pxi += 1
    }
    (width, height, outCh, out)
  }

  /** PNG encoder — fixture counterpart of [[decodePng]]. `filter` selects
    * the per-row filter (0–4) so tests can drive every un-filter branch of
    * the decoder; the filtered bytes are computed as the exact spec inverse
    * of the decoder's reconstruction. `channels` 1/3/4 map to color types
    * 0/2/6.
    */
  def encodePng(width: Int, height: Int, rgb: Array[Byte],
      channels: Int = 3, filter: Int = 0): Array[Byte] = {
    require(rgb.length == width * height * channels,
      "rgb must be width*height*channels bytes")
    require(filter >= 0 && filter <= 4, "filter must be 0..4")
    val colorType = channels match {
      case 1 => 0; case 3 => 2; case 4 => 6
      case c => throw new IllegalArgumentException(s"channels $c unsupported")
    }
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    var row = 0
    while (row < height) {
      raw(row * (stride + 1)) = filter.toByte
      val ps = row * stride
      val pp = ps - stride
      var x = 0
      while (x < stride) {
        val cur = rgb(ps + x) & 0xff
        val left = if (x >= channels) rgb(ps + x - channels) & 0xff else 0
        val up = if (row > 0) rgb(pp + x) & 0xff else 0
        val ul = if (row > 0 && x >= channels) rgb(pp + x - channels) & 0xff else 0
        val filtered = filter match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            cur - pred
        }
        raw(row * (stride + 1) + 1 + x) = filtered.toByte
        x += 1
      }
      row += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be(v: Int): Array[Byte] = Array(
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      val t = typ.getBytes("US-ASCII")
      out.write(be(data.length), 0, 4)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.write(be(crc.getValue.toInt), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    def putBe32(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >> 24) & 0xff).toByte; ihdr(off + 1) = ((v >> 16) & 0xff).toByte
      ihdr(off + 2) = ((v >> 8) & 0xff).toByte; ihdr(off + 3) = (v & 0xff).toByte
    }
    putBe32(0, width); putBe32(4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    // ihdr(10..12): compression 0, filter method 0, interlace 0
    chunk("IHDR", ihdr)
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Fixture-grade PNG writer for the layouts [[encodePng]] cannot emit:
    * any legal (bitDepth, colorType) with caller-packed scanlines (no
    * filtering — filter byte 0 per row), optional PLTE/tRNS, optional
    * Adam7 interlacing. `rows` is the UNFILTERED full-resolution scanline
    * data, exactly `ceil(width·samples·depth/8) × height` bytes; with
    * `interlace` the encoder scatters it into the 7 passes itself — the
    * independent inverse of the decoder's pass gather. Tests use this to
    * drive the palette / sub-byte / 16-bit / gray+alpha / interlaced
    * decode paths with independent fixtures.
    */
  def encodePngRaw(width: Int, height: Int, bitDepth: Int, colorType: Int,
      rows: Array[Byte], palette: Array[Byte] = Array.emptyByteArray,
      trns: Array[Byte] = Array.emptyByteArray,
      interlace: Boolean = false): Array[Byte] = {
    val fileCh = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case t => throw new IllegalArgumentException(s"bad color type $t")
    }
    val rowBytes = (width * fileCh * bitDepth + 7) / 8
    require(rows.length == rowBytes * height,
      s"rows must be $rowBytes x $height bytes, got ${rows.length}")
    // full-res sample accessor + per-pass bit packer (MSB-first)
    def sampleAt(x: Int, y: Int, c: Int): Int = {
      val rs = y * rowBytes
      bitDepth match {
        case 8 => rows(rs + x * fileCh + c) & 0xff
        case 16 => // full 16 bits, big-endian pair
          ((rows(rs + (x * fileCh + c) * 2) & 0xff) << 8) |
            (rows(rs + (x * fileCh + c) * 2 + 1) & 0xff)
        case d =>
          val bit = (x * fileCh + c) * d
          ((rows(rs + (bit >> 3)) & 0xff) >> (8 - d - (bit & 7))) & ((1 << d) - 1)
      }
    }
    val raw: Array[Byte] =
      if (!interlace) {
        val a = new Array[Byte]((rowBytes + 1) * height)
        var r = 0
        while (r < height) {
          // a(r * (rowBytes + 1)) stays 0: filter None
          System.arraycopy(rows, r * rowBytes, a, r * (rowBytes + 1) + 1, rowBytes)
          r += 1
        }
        a
      } else {
        val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
        val buf = new java.io.ByteArrayOutputStream()
        passes.foreach { case (x0, y0, dx, dy) =>
          val wP = if (width > x0) (width - x0 + dx - 1) / dx else 0
          val hP = if (height > y0) (height - y0 + dy - 1) / dy else 0
          if (wP > 0 && hP > 0) {
            val rbP = (wP * fileCh * bitDepth + 7) / 8
            var py = 0
            while (py < hP) {
              buf.write(0) // filter None
              val line = new Array[Byte](rbP)
              var px = 0
              while (px < wP) {
                var c = 0
                while (c < fileCh) {
                  val v = sampleAt(x0 + px * dx, y0 + py * dy, c)
                  bitDepth match {
                    case 8 => line(px * fileCh + c) = v.toByte
                    case 16 =>
                      line((px * fileCh + c) * 2) = ((v >> 8) & 0xff).toByte
                      line((px * fileCh + c) * 2 + 1) = (v & 0xff).toByte
                    case d =>
                      val bit = (px * fileCh + c) * d
                      val sh = 8 - d - (bit & 7)
                      line(bit >> 3) = (line(bit >> 3) | (v << sh)).toByte
                  }
                  c += 1
                }
                px += 1
              }
              buf.write(line, 0, rbP)
              py += 1
            }
          }
        }
        buf.toByteArray
      }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be(v: Int): Array[Byte] = Array(
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      val t = typ.getBytes("US-ASCII")
      out.write(be(data.length), 0, 4)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.write(be(crc.getValue.toInt), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    def putBe32(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >> 24) & 0xff).toByte; ihdr(off + 1) = ((v >> 16) & 0xff).toByte
      ihdr(off + 2) = ((v >> 8) & 0xff).toByte; ihdr(off + 3) = (v & 0xff).toByte
    }
    putBe32(0, width); putBe32(4, height)
    ihdr(8) = bitDepth.toByte
    ihdr(9) = colorType.toByte
    ihdr(12) = if (interlace) 1 else 0 // compression/filter stay 0
    chunk("IHDR", ihdr)
    if (palette.nonEmpty) chunk("PLTE", palette)
    if (trns.nonEmpty) chunk("tRNS", trns)
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** WAV sniff: RIFF container whose declared size matches the actual byte
    * count (a text blob starting "RIFF" would have to embed its own length
    * to pass) and whose form type is WAVE.
    */
  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      le32(b, 4) == b.length - 8 &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Parsed WAV layout: fmt fields + data-chunk position. `fmtCode` 1 = PCM
    * (bits 8/16/24/32), 6 = G.711 A-law, 7 = G.711 µ-law; anything else is
    * a compressed codec this container can't decode (geometry still parses
    * — see [[wavGeometry]]).
    */
  private final case class WavLayout(
      fmtCode: Int, channels: Int, bits: Int, blockAlign: Int,
      dataOff: Int, dataLen: Int)

  private def wavLayout(b: Array[Byte]): WavLayout = {
    var i = 12
    var fmtCode = -1
    var channels = -1
    var bits = -1
    var blockAlign = -1
    var dataOff = -1
    var dataLen = -1
    while (i + 8 <= b.length && (fmtCode < 0 || dataOff < 0)) {
      val size = le32(b, i + 4)
      require(size >= 0 && i + 8 + size <= b.length, s"WAV: corrupt chunk at $i")
      val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' '
      val isData = b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a'
      if (isFmt) {
        require(size >= 16, "WAV: fmt chunk too short")
        fmtCode = le16(b, i + 8)
        channels = le16(b, i + 10)
        blockAlign = le16(b, i + 20)
        bits = le16(b, i + 22)
        require(channels > 0, s"WAV: bad channel count $channels")
      }
      if (isData) { dataOff = i + 8; dataLen = size }
      i += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    require(fmtCode >= 0 && dataOff >= 0, "WAV: missing fmt or data chunk")
    WavLayout(fmtCode, channels, bits, blockAlign, dataOff, dataLen)
  }

  /** G.711 µ-law/A-law byte → 16-bit linear sample, the standard CCITT
    * expansion formulas (public ITU-T G.711 tables; same curves the JDK's
    * sound codecs implement, which the tests use as referee).
    */
  private val UlawTable: Array[Short] = Array.tabulate(256) { u0 =>
    val u = ~u0 & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }
  private val AlawTable: Array[Short] = Array.tabulate(256) { a0 =>
    val a = a0 ^ 0x55
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else { t += 0x108; t <<= seg - 1 }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  /** WAV audio decode — PCM (format 1, 8/16/24/32-bit) and G.711 µ-law /
    * A-law (formats 7/6; telephony audio, expanded through the standard
    * tables to 16-bit linear). The record maps audio onto the image-shaped
    * schema as width = frames per channel, height = 1, channels = channel
    * count. The checksum covers the SAMPLES: raw `data` payload bytes for
    * PCM (re-containering the same samples — extra LIST/INFO chunks,
    * different chunk order — hashes identically), and the EXPANDED 16-bit
    * stream for G.711 (consistent with the image codecs hashing
    * reconstructed pixels, not compressed bits). Compressed codecs
    * (MP3-in-WAV etc.) degrade to [[decodeWavHeader]] — true geometry from
    * the fmt chunk, payload-bytes checksum — never to a failure.
    */
  private def decodeWav(id: Long, b: Array[Byte]): DecodedMedia =
    try {
      val l = wavLayout(b)
      l.fmtCode match {
        case 1 =>
          require(Set(8, 16, 24, 32).contains(l.bits), s"WAV: unsupported bit depth ${l.bits}")
          val bytesPerSample = l.bits / 8
          val frames = l.dataLen / (l.channels * bytesPerSample)
          DecodedMedia(id, "audio/wav", b.length.toLong, frames, 1, l.channels,
            fnv(b, l.dataOff, l.dataOff + l.dataLen, FnvSeed))
        case 6 | 7 =>
          require(l.bits == 8, s"WAV: G.711 must be 8-bit, got ${l.bits}")
          val table = if (l.fmtCode == 7) UlawTable else AlawTable
          val frames = l.dataLen / l.channels
          // hash the expanded 16-bit little-endian stream without
          // materializing it
          var cs = FnvSeed
          var i = l.dataOff
          while (i < l.dataOff + l.dataLen) {
            val s = table(b(i) & 0xff)
            cs = (cs ^ (s & 0xff)) * 0x100000001b3L
            cs = (cs ^ ((s >> 8) & 0xff)) * 0x100000001b3L
            i += 1
          }
          DecodedMedia(id, "audio/wav", b.length.toLong, frames, 1, l.channels, cs)
        case _ => decodeWavHeader(id, b)
      }
    } catch { case scala.util.control.NonFatal(_) => decodeWavHeader(id, b) }

  /** WAV header fallback for compressed codecs: TRUE geometry from the fmt
    * chunk (frames estimated via blockAlign — exact for any constant-block
    * codec), checksum over the compressed `data` payload (container
    * metadata excluded, like the JPEG header parse hashes scan bytes).
    */
  private def decodeWavHeader(id: Long, b: Array[Byte]): DecodedMedia = {
    val l = wavLayout(b)
    val frames = if (l.blockAlign > 0) l.dataLen / l.blockAlign else 0
    DecodedMedia(id, "audio/wav", b.length.toLong, frames, 1, l.channels,
      fnv(b, l.dataOff, l.dataOff + l.dataLen, FnvSeed))
  }

  /** Canonical 44-byte-header WAV encoder — fixture counterpart of
    * [[decodeWav]]. `pcm` is the raw interleaved sample bytes (for G.711
    * format codes 6/7, the compressed 8-bit log-PCM bytes; for any other
    * non-PCM `formatCode`, opaque codec bytes — used to exercise the
    * header-fallback path).
    */
  def encodeWav(channels: Int, bitsPerSample: Int, sampleRate: Int,
      pcm: Array[Byte], formatCode: Int = 1): Array[Byte] = {
    require(formatCode != 1 || Set(8, 16, 24, 32).contains(bitsPerSample),
      "PCM bits must be 8/16/24/32")
    val out = new Array[Byte](44 + pcm.length)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putAscii(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (c, j) => out(off + j) = c }
    val blockAlign = math.max(1, channels * bitsPerSample / 8)
    putAscii(0, "RIFF"); putLe32(4, 36 + pcm.length); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16)
    putLe16(20, formatCode)
    putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * blockAlign); putLe16(32, blockAlign)
    putLe16(34, bitsPerSample)
    putAscii(36, "data"); putLe32(40, pcm.length)
    System.arraycopy(pcm, 0, out, 44, pcm.length)
    out
  }

  /** FLAC: REAL pure-JVM sample decode ([[Flac.decode]] — full subset:
    * fixed/LPC prediction, Rice partitions, all stereo decorrelations,
    * CRC-8/16 + MD5 verified). The record maps onto the audio shape like
    * WAV: width = frames per channel, height = 1. The checksum covers the
    * DECODED samples as little-endian bytes at native depth — byte-
    * identical to the `data` chunk of a PCM WAV carrying the same audio,
    * so one recording hashes to the SAME value through either container
    * (cross-codec exact dedup; holds for the signed depths 16/24 — WAV
    * 8-bit is unsigned by format). Streams outside the envelope (unknown
    * total, bad CRC, >64 MB decoded) degrade to the STREAMINFO header
    * record — true geometry, frame-bytes checksum — never to a failure.
    */
  private def decodeFlac(id: Long, b: Array[Byte]): DecodedMedia =
    try {
      val d = Flac.decode(b)
      val pcm = Flac.samplesToLeBytes(d.samples, d.bitsPerSample)
      DecodedMedia(id, "audio/flac", b.length.toLong, d.samples.length / d.channels,
        1, d.channels, fnv(pcm, 0, pcm.length, FnvSeed))
    } catch { case scala.util.control.NonFatal(_) => decodeFlacHeader(id, b) }

  /** FLAC header fallback: TRUE geometry from STREAMINFO, checksum over
    * the audio-frame region (metadata blocks — tags, padding — excluded,
    * so re-tagging the same stream hashes identically, matching the MP3
    * and JPEG-header conventions).
    */
  private def decodeFlacHeader(id: Long, b: Array[Byte]): DecodedMedia = {
    val si = Flac.streamInfo(b)
    val off = try Flac.audioStart(b) catch { case scala.util.control.NonFatal(_) => 42 }
    DecodedMedia(id, "audio/flac", b.length.toLong,
      math.min(si.totalSamples, Int.MaxValue.toLong).toInt, 1, si.channels,
      fnv(b, math.min(off, b.length), b.length, FnvSeed))
  }

  /** Normalized interleaved samples for the decodable audio envelope —
    * PCM 8 (unsigned) / 16 / 24 / 32 (signed LE), G.711 µ-law/A-law, and
    * FLAC — in [-1, 1]. Returns (framesPerChannel, channels, samples);
    * None outside the envelope. The features() audio branch runs on these.
    */
  private def audioSamplesOf(b: Array[Byte]): Option[(Int, Int, Array[Double])] =
    try {
      if (Flac.isFlac(b)) {
        val d = Flac.decode(b)
        if (d.samples.length == 0) None
        else {
          val scale = (1L << (d.bitsPerSample - 1)).toDouble
          val out = new Array[Double](d.samples.length)
          var i = 0
          while (i < d.samples.length) { out(i) = d.samples(i) / scale; i += 1 }
          Some((d.samples.length / d.channels, d.channels, out))
        }
      } else if (!isWav(b)) None
      else {
        val l = wavLayout(b)
        // an empty data chunk has no samples to featurize — stub path
        // (mean/std over zero frames would be NaN with decoded=true)
        if (l.dataLen <= 0) return None
        l.fmtCode match {
          case 1 if Set(8, 16, 24, 32).contains(l.bits) =>
            val bps = l.bits / 8
            val n = l.dataLen / bps
            val out = new Array[Double](n)
            var i = 0
            while (i < n) {
              val o = l.dataOff + i * bps
              out(i) = l.bits match {
                case 8 => ((b(o) & 0xff) - 128) / 128.0 // 8-bit WAV is unsigned
                case 16 => le16(b, o).toShort / 32768.0
                case 24 =>
                  val v = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) << 16)
                  v / 8388608.0
                case _ => le32(b, o) / 2147483648.0
              }
              i += 1
            }
            Some((n / l.channels, l.channels, out))
          case 6 | 7 if l.bits == 8 =>
            val table = if (l.fmtCode == 7) UlawTable else AlawTable
            val out = new Array[Double](l.dataLen)
            var i = 0
            while (i < l.dataLen) {
              out(i) = table(b(l.dataOff + i) & 0xff) / 32768.0
              i += 1
            }
            Some((l.dataLen / l.channels, l.channels, out))
          case _ => None
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---- MPEG audio (MP3): frame-header chain parse. A psychoacoustic
  // decode (hybrid filterbank + Huffman) is a poor pure-JVM trade, but the
  // frame-header chain yields TRUE geometry — channels, total samples per
  // channel — exactly like the JPEG header parse yields true dimensions for
  // non-Huffman codecs. Sniffing demands >= 2 CHAINED valid Layer-III
  // frames (each header's length lands exactly on the next sync), so
  // arbitrary bytes containing a stray 0xFFEx word don't sniff as audio.

  private val Mp3BitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3SampleRateV1 = Array(44100, 48000, 32000)

  /** One MPEG-1/2/2.5 Layer III frame header at `off` →
    * (frameBytes, samplesPerFrameAndChannel, channels); None if invalid.
    */
  private def mp3Frame(b: Array[Byte], off: Int): Option[(Int, Int, Int)] = {
    if (off + 4 > b.length) return None
    val h1 = b(off + 1) & 0xff
    val h2 = b(off + 2) & 0xff
    if ((b(off) & 0xff) != 0xff || (h1 & 0xe0) != 0xe0) return None
    val version = (h1 >> 3) & 3 // 0 = MPEG2.5, 2 = MPEG2, 3 = MPEG1
    val layer = (h1 >> 1) & 3 // 1 = Layer III
    if (version == 1 || layer != 1) return None
    val brIdx = (h2 >> 4) & 15
    val srIdx = (h2 >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free-format out
    val v1 = version == 3
    val bitrate = (if (v1) Mp3BitrateV1L3 else Mp3BitrateV2L3)(brIdx) * 1000
    val sampleRate = Mp3SampleRateV1(srIdx) / (if (v1) 1 else if (version == 2) 2 else 4)
    val samplesPerFrame = if (v1) 1152 else 576
    val frameLen = samplesPerFrame / 8 * bitrate / sampleRate + ((h2 >> 1) & 1)
    val channels = if (((b(off + 3) & 0xff) >> 6) == 3) 1 else 2
    if (frameLen < 24) None else Some((frameLen, samplesPerFrame, channels))
  }

  /** (audioStart, totalSamplesPerChannel, channels): skips an ID3v2 tag,
    * finds the first sync that chains (bounded 64 KB search — real encoders
    * put junk/padding before frame 1), then walks header-to-header.
    * Trailing bytes that aren't a frame (ID3v1 tag, truncated last frame)
    * end the walk; >= 2 chained frames required.
    */
  private def mp3Geometry(b: Array[Byte]): (Int, Int, Int) = {
    var start = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      // ID3v2.4 footer flag (header flag byte, bit 4): the tag carries a
      // 10-byte trailing footer NOT counted in the size field — skipping
      // only 10+sz would leave the footer inside the checksum region and
      // break re-tagging invariance between footer/no-footer tags
      val footer = if ((b(5) & 0x10) != 0) 10 else 0
      start = 10 + sz + footer
    }
    def chains(j: Int): Boolean = mp3Frame(b, j) match {
      case Some((len, _, _)) => j + len + 4 <= b.length && mp3Frame(b, j + len).isDefined
      case None => false
    }
    var first = start
    val bound = math.min(b.length - 4, start + 65536)
    while (first < bound && !chains(first)) first += 1
    require(first < bound, "MP3: no chained frame sync found")
    var frames = 0
    var samples = 0L
    var ch = 1
    var i = first
    var more = true
    while (more) {
      mp3Frame(b, i) match {
        case Some((len, spf, c)) if i + len <= b.length =>
          frames += 1; samples += spf; ch = c; i += len
        case _ => more = false
      }
    }
    require(frames >= 2, "MP3: fewer than 2 chained frames")
    (first, math.min(samples, Int.MaxValue.toLong).toInt, ch)
  }

  /** Sniff and parse in ONE walk — the 64 KB sync search + frame chain is
    * the expensive part, so callers take the parsed result instead of
    * re-walking (a separate isMp3-then-parse pair would double the
    * per-record CPU on the media path).
    */
  private def mp3GeometryOpt(b: Array[Byte]): Option[(Int, Int, Int)] =
    try Some(mp3Geometry(b)) catch { case _: Exception => None }

  /** MP3 record: width = total samples per channel (from the frame walk),
    * height = 1, channels from the frame header; checksum over the frame
    * chain region (the leading ID3v2 tag — container metadata — excluded,
    * so re-tagging the same audio hashes identically).
    */
  private def decodeMp3(id: Long, b: Array[Byte],
      g: (Int, Int, Int)): DecodedMedia = {
    val (audioOff, samples, ch) = g
    DecodedMedia(id, "audio/mpeg", b.length.toLong, samples, 1, ch,
      fnv(b, audioOff, b.length, FnvSeed))
  }

  /** ISO-BMFF (MP4) container parse ([[Mp4]]): width/height from the video
    * track's tkhd, width slot reused as frame count is NOT done — geometry
    * mirrors the image convention (w × h), channels = track count. The
    * checksum folds the SAMPLE byte ranges from the stbl tables, not the
    * raw file — a re-mux (same frames, different chunking/box order)
    * hashes identically, the cross-container dedup property the WAV/FLAC
    * pair also has.
    */
  private def decodeMp4(id: Long, b: Array[Byte]): DecodedMedia = {
    val info = Mp4.parse(b)
    val v = info.videoTrack.getOrElse(info.tracks.headOption.getOrElse(
      throw new IllegalArgumentException("mp4 with no tracks")))
    var cs = FnvSeed
    info.tracks.foreach(_.sampleRanges.foreach { case (off, len) =>
      cs = fnv(b, off.toInt, (off + len).toInt, cs)
    })
    DecodedMedia(id, "video/mp4", b.length.toLong, v.width, v.height,
      info.tracks.size, cs)
  }

  /** JPEG sniff: SOI marker followed by a structurally valid marker chain
    * (every segment's big-endian length must land on another `FF`-led
    * marker inside the buffer) reaching a start-of-frame before the scan.
    * Random bytes shaped like `FF D8 FF` fail the chain walk immediately.
    */
  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff &&
      (try { jpegSof(b); true } catch { case _: Exception => false })

  /** Walk the marker chain to the first start-of-frame (SOF0–SOF15 except
    * DHT/JPG/DAC) and return (height, width, components, sosPayloadOffset).
    * The offset is the first entropy-coded byte after the SOS header, -1 if
    * no scan is present.
    */
  private def jpegSof(b: Array[Byte]): (Int, Int, Int, Int) = {
    var i = 2 // past SOI
    var sof: (Int, Int, Int) = null
    while (i + 4 <= b.length) {
      require((b(i) & 0xff) == 0xff, s"JPEG: marker expected at $i")
      var m = b(i + 1) & 0xff
      while (m == 0xff && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xff } // fill bytes
      require(i + 4 <= b.length, "JPEG: truncated segment header")
      require(m != 0xd8 && !(m >= 0xd0 && m <= 0xd7) && m != 0x01 && m != 0x00,
        s"JPEG: standalone marker $m before scan")
      if (m == 0xd9) throw new IllegalArgumentException("JPEG: EOI before SOF/SOS")
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      require(len >= 2 && i + 2 + len <= b.length, s"JPEG: segment overruns buffer at $i")
      val isSofMarker = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
      if (isSofMarker) {
        require(len >= 8, "JPEG: SOF too short")
        val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
        val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
        val nc = b(i + 9) & 0xff
        require(h > 0 && w > 0 && nc > 0, "JPEG: bad SOF dimensions")
        sof = (h, w, nc)
      }
      if (m == 0xda) { // SOS — entropy-coded data follows its header
        require(sof != null, "JPEG: SOS before SOF")
        return (sof._1, sof._2, sof._3, i + 2 + len)
      }
      i += 2 + len
    }
    require(sof != null, "JPEG: no SOF marker found")
    (sof._1, sof._2, sof._3, -1)
  }

  /** JPEG: REAL pure-JVM pixel decode for the Huffman envelope —
    * baseline/extended-sequential AND progressive SOF2 ([[Jpeg.decode]] —
    * DQT/DHT parse, entropy decode incl. spectral-selection/successive-
    * approximation scan accumulation, dequant, IDCT, chroma upsample,
    * YCbCr→RGB; checksum over reconstructed pixels like the other image
    * codecs). Payloads outside that envelope (arithmetic coding, 12-bit,
    * CMYK) degrade to the header parse below — true geometry, scan-bytes
    * checksum — never to a failure.
    */
  /** GIF first frame through [[Gif.decode]]: checksum over the
    * palette-expanded samples, so interlaced/sequential and different LZW
    * run boundaries hash identically (the PNG filter-invariance analog).
    */
  private def decodeGif(id: Long, b: Array[Byte]): DecodedMedia = {
    val (w, h, ch, pix) = Gif.decode(b)
    DecodedMedia(id, "image/gif", b.length.toLong, w, h, ch,
      fnv(pix, 0, pix.length, FnvSeed))
  }

  private def decodeJpeg(id: Long, b: Array[Byte]): DecodedMedia =
    try {
      val (w, h, ch, pix) = Jpeg.decode(b)
      DecodedMedia(id, "image/jpeg", b.length.toLong, w, h, ch,
        fnv(pix, 0, pix.length, FnvSeed))
    } catch { case scala.util.control.NonFatal(_) => decodeJpegHeader(id, b) }

  /** JPEG header parse — the fallback when the payload uses a coding mode
    * [[Jpeg.decode]] does not cover: TRUE width/height/channels from SOF,
    * checksum over the entropy-coded scan bytes (container metadata —
    * APPn/EXIF/comment segments — excluded, so re-tagging the same image
    * hashes identically; unlike the pixel decodes the hash is over
    * compressed bits, not pixels).
    */
  private def decodeJpegHeader(id: Long, b: Array[Byte]): DecodedMedia = {
    val (h, w, nc, scanOff) = jpegSof(b)
    // scan runs to EOI (FF D9) if present, else to end-of-buffer
    val end =
      if (b.length >= 2 && (b(b.length - 2) & 0xff) == 0xff &&
        (b(b.length - 1) & 0xff) == 0xd9) b.length - 2
      else b.length
    val cs = if (scanOff >= 0) fnv(b, scanOff, math.max(scanOff, end), FnvSeed) else FnvSeed
    DecodedMedia(id, "image/jpeg", b.length.toLong, w, h, nc, cs)
  }

  /** Minimal structurally-valid JPEG writer — fixture counterpart of
    * [[decodeJpegHeader]] (SOI, JFIF APP0, SOF0 with the given geometry,
    * SOS, `scan` as the entropy payload, EOI). The scan bytes are opaque to
    * the header parser, so any `FF`-free payload works.
    */
  def encodeJpegShell(width: Int, height: Int, channels: Int,
      scan: Array[Byte]): Array[Byte] = {
    require(scan.forall(s => (s & 0xff) != 0xff), "fixture scan must be FF-free")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xe0, "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val sof = new Array[Byte](6 + 3 * channels)
    sof(0) = 8 // precision
    sof(1) = ((height >> 8) & 0xff).toByte; sof(2) = (height & 0xff).toByte
    sof(3) = ((width >> 8) & 0xff).toByte; sof(4) = (width & 0xff).toByte
    sof(5) = channels.toByte
    for (c <- 0 until channels) {
      sof(6 + 3 * c) = (c + 1).toByte; sof(7 + 3 * c) = 0x11; sof(8 + 3 * c) = 0
    }
    marker(0xc0, sof)
    val sos = new Array[Byte](1 + 2 * channels + 3)
    sos(0) = channels.toByte
    for (c <- 0 until channels) { sos(1 + 2 * c) = (c + 1).toByte; sos(2 + 2 * c) = 0 }
    sos(1 + 2 * channels + 1) = 63
    marker(0xda, sos)
    out.write(scan, 0, scan.length)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Binary PPM (P6) encoder — fixture counterpart of [[decodePpm]]. */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be width*height*3 bytes")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    header ++ rgb
  }

  /** Frame sampling over a decoded stream: every `stride`-th record per
    * partition-ordered id (deterministic, no shuffle beyond the sort).
    */
  def sampleEvery(decoded: Dataset[DecodedMedia], stride: Int): Dataset[DecodedMedia] =
    decoded.filter(d => d.id % stride == 0)

  /** Canonical pixel decode for the image formats parseable in pure JVM:
    * row-major TOP-DOWN, interleaved channels, RGB(A) order — BMP's
    * bottom-up BGR(A) rows are reordered, PPM/PNG already match. None for
    * container-only parses (WAV, JPEG header) and undecodable payloads.
    */
  private def pixelsOf(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try {
      if (isBmp(b)) {
        val pixelOff = le32(b, 10)
        val rawH = le32(b, 22)
        val width = le32(b, 18)
        val height = math.abs(rawH)
        val bpp = le16(b, 28)
        if (le32(b, 30) != 0 || (bpp != 24 && bpp != 32) || width <= 0 || height <= 0)
          return None
        val ch = bpp / 8
        val stride = (width * ch + 3) & ~3
        if (pixelOff < 54 || pixelOff.toLong + height.toLong * stride > b.length) return None
        val out = new Array[Byte](width * height * ch)
        var y = 0
        while (y < height) {
          // positive height = bottom-up storage; negative = top-down
          val srcRow = if (rawH > 0) height - 1 - y else y
          var x = 0
          while (x < width) {
            val s = pixelOff + srcRow * stride + x * ch
            val d = (y * width + x) * ch
            out(d) = b(s + 2); out(d + 1) = b(s + 1); out(d + 2) = b(s) // BGR→RGB
            if (ch == 4) out(d + 3) = b(s + 3)
            x += 1
          }
          y += 1
        }
        Some((width, height, ch, out))
      } else if (isPpm(b)) {
        val (w, h, _, off) = ppmHeader(b)
        if (w <= 0 || h <= 0 || b.length < off + w * h * 3) None
        else Some((w, h, 3, java.util.Arrays.copyOfRange(b, off, off + w * h * 3)))
      } else if (isPng(b)) {
        val d = decodePngPixels(b)
        Some(d)
      } else if (isJpeg(b)) {
        Some(Jpeg.decode(b)) // Huffman envelope (incl. progressive); outside it → catch → None
      } else if (Gif.isGif(b)) {
        Some(Gif.decode(b))
      } else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** True geometry from a container/header parse where a full pixel decode
    * is impossible in pure JVM (JPEG SOF frame header; WAV fmt/data chunks).
    * This keeps [[features]] and [[resize]] in agreement with [[decode]] on
    * the same payload's dimensions even for formats whose PIXELS stay
    * stubbed — two APIs must never report different geometry for one record.
    */
  private def headerGeometry(b: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      // geometry only — no checksum pass over the payload (features/resize
      // call this per record on the hot path; hashing megabytes of audio to
      // then discard the hash would double the byte traffic), and one
      // marker-chain walk, not the isJpeg-sniff-then-parse double walk
      if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
          (b(2) & 0xff) == 0xff) {
        val (h, w, nc, _) = jpegSof(b)
        Some((w, h, nc))
      } else if (isWav(b)) Some(wavGeometry(b))
      else if (Flac.isFlac(b)) {
        val si = Flac.streamInfo(b)
        Some((math.min(si.totalSamples, Int.MaxValue.toLong).toInt, 1, si.channels))
      } else mp3GeometryOpt(b).map { case (_, samples, ch) => (samples, 1, ch) }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** WAV frame/channel geometry from the fmt and data chunks — the header
    * walk of [[decodeWav]] without its checksum loop over the payload. Works
    * for ANY format code: compressed codecs estimate frames via blockAlign
    * (exact for constant-block codecs), so even undecodable audio carries
    * true geometry through features/resize, matching [[decodeWavHeader]].
    */
  private def wavGeometry(b: Array[Byte]): (Int, Int, Int) = {
    val l = wavLayout(b)
    val frames = l.fmtCode match {
      case 1 if Set(8, 16, 24, 32).contains(l.bits) =>
        l.dataLen / (l.channels * (l.bits / 8))
      case 6 | 7 if l.bits == 8 => l.dataLen / l.channels
      case _ => if (l.blockAlign > 0) l.dataLen / l.blockAlign else 0
    }
    (frames, 1, l.channels)
  }

  /** Per-record media features over REAL samples — the feature-extraction
    * stage of a multimodal pipeline, feeding the embedding/similarity
    * operators. Images: per-channel mean/std (0-255 units) and an 8-bin
    * luminance histogram over decoded pixels. Audio (PCM + G.711 WAV):
    * per-channel sample mean/std in normalized [-1,1] units and an 8-bin
    * histogram of |amplitude| (bin k = [k/8, (k+1)/8)) — the same record
    * shape, so downstream operators are modality-agnostic.
    * Undecodable payloads yield `decoded=false` with deterministic
    * stub-derived features (pipeline shape holds; no record is dropped);
    * their width/height/channels still come from the real header parse
    * where one exists (JPEG SOF, WAV fmt incl. compressed codecs, MP3
    * frame header) so the record's geometry matches what [[decode]]
    * reports for the same payload.
    * Same 100-TB shape as [[decode]]: partition-parallel mapPartitions,
    * media bytes never shuffle, only the small feature vectors do.
    */
  /** Frame sampling over the video column: every `everyNth` sample of the
    * MP4 video track, located by the container's stbl math (exact byte
    * ranges, [[Mp4.Track.sampleRanges]]) and stamped with its presentation
    * time. One flatMap — each row expands to its sampled frames with no
    * shuffle; at 100 TB the (offset, size) pairs become object-store
    * ranged GETs instead of slices, and nothing else changes. Non-video
    * payloads and parse failures contribute zero rows (degrade-per-record,
    * never a dead task).
    */
  def frameSamples(spark: SparkSession, media: DataFrame,
      everyNth: Int = 1): Dataset[FrameSample] = {
    require(everyNth >= 1, s"everyNth must be >= 1: $everyNth")
    import spark.implicits._
    media.select(col("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            if (!Mp4.isMp4(bytes)) Iterator.empty
            else Mp4.parse(bytes).videoTrack.iterator.flatMap { t =>
              val ranges = t.sampleRanges
              val times = t.sampleTimes
              val scale = math.max(1L, t.timescale)
              Iterator.range(0, ranges.length, everyNth).map { i =>
                val (off, len) = ranges(i)
                FrameSample(id, i, times(i) * 1000L / scale, off,
                  java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt))
              }
            }
          } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
        }
      }
  }

  def features(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("payload"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, fmt) =>
          audioSamplesOf(bytes) match {
            case Some((frames, ch, smp)) =>
              val mean = new Array[Double](ch)
              val m2 = new Array[Double](ch)
              val hist = new Array[Double](8)
              var i = 0
              while (i < smp.length) {
                val c = i % ch
                mean(c) += smp(i)
                m2(c) += smp(i) * smp(i)
                hist(math.min(7, (math.abs(smp(i)) * 8).toInt)) += 1.0
                i += 1
              }
              val std = new Array[Double](ch)
              var c = 0
              while (c < ch) {
                mean(c) /= frames
                std(c) = math.sqrt(math.max(0.0, m2(c) / frames - mean(c) * mean(c)))
                c += 1
              }
              var k = 0
              while (k < 8) { hist(k) /= math.max(1, smp.length); k += 1 }
              MediaFeatures(id, fmt, decoded = true, frames, 1, ch, mean, std, hist)
            case None => imageOrStubFeatures(id, bytes, fmt)
          }
        }
      }
  }

  private def imageOrStubFeatures(id: Long, bytes: Array[Byte],
      fmt: String): MediaFeatures = {
    pixelsOf(bytes) match {
      case Some((w, h, ch, px)) =>
        val n = w * h
        val mean = new Array[Double](ch)
        val m2 = new Array[Double](ch)
        var i = 0
        while (i < px.length) {
          val c = i % ch
          mean(c) += px(i) & 0xff
          m2(c) += (px(i) & 0xff).toDouble * (px(i) & 0xff)
          i += 1
        }
        val std = new Array[Double](ch)
        var c = 0
        while (c < ch) {
          mean(c) /= n
          std(c) = math.sqrt(math.max(0.0, m2(c) / n - mean(c) * mean(c)))
          c += 1
        }
        val hist = new Array[Double](8)
        var p = 0
        while (p < n) {
          val base = p * ch
          val luma =
            if (ch == 1) (px(base) & 0xff).toDouble
            else 0.299 * (px(base) & 0xff) + 0.587 * (px(base + 1) & 0xff) +
              0.114 * (px(base + 2) & 0xff)
          hist(math.min(7, (luma / 32).toInt)) += 1.0
          p += 1
        }
        var k = 0
        while (k < 8) { hist(k) /= n; k += 1 }
        MediaFeatures(id, fmt, decoded = true, w, h, ch, mean, std, hist)
      case None =>
        // deterministic stub features from the byte checksum — the
        // downstream pipeline shape is exercised even where no pure-JVM
        // pixel decode exists (JPEG pixels, audio); geometry is the
        // REAL header parse when available so decode()/features()
        // agree on the same payload's dimensions
        val s = stubRecord(id, bytes, fmt)
        val (w, h, ch) = headerGeometry(bytes).getOrElse((s.width, s.height, 3))
        // one independent value per (array, index): splitmix64 of
        // seed + index. Byte-offsetting into a single 64-bit seed
        // aliased channel 8 onto channel 0 within the same array
        // (a 64-bit seed holds only 8 bytes), so high-channel audio
        // got period-8 repeating stats; mixing the index through a
        // full-avalanche permutation makes every entry independent
        val seed = s.checksum
        val seed2 = seed * 0x9E3779B97F4A7C15L + 0xD1B54A32D192ED03L
        val mk = (sd: Long) => Array.tabulate(ch) { i =>
          var z = sd + (i + 1) * 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          ((z ^ (z >>> 31)) & 0xffL).toDouble
        }
        MediaFeatures(id, fmt, decoded = false, w, h, ch,
          mk(seed), mk(seed2), Array.fill(8)(0.125))
    }
  }

  /** Box-average resize to `tw`×`th` over REAL pixels, re-encoded as PNG
    * (a binary→binary transform, the shape a 100-TB media pipeline runs).
    * Each target pixel averages its source box — downsampling never
    * aliases away thin features the way nearest-neighbor does.
    * Undecodable payloads pass through unchanged with `decoded=false`.
    */
  def resize(spark: SparkSession, media: DataFrame, tw: Int, th: Int): Dataset[ResizedMedia] = {
    require(tw > 0 && th > 0, "target dimensions must be positive")
    import spark.implicits._
    media.select(col("id"), col("payload"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, fmt) =>
          pixelsOf(bytes) match {
            case Some((w, h, ch, px)) =>
              val out = new Array[Byte](tw * th * ch)
              var ty = 0
              while (ty < th) {
                val y0 = ty * h / th
                val y1 = math.max(y0 + 1, (ty + 1) * h / th)
                var tx = 0
                while (tx < tw) {
                  val x0 = tx * w / tw
                  val x1 = math.max(x0 + 1, (tx + 1) * w / tw)
                  val cnt = (y1 - y0) * (x1 - x0)
                  var c = 0
                  while (c < ch) {
                    var acc = 0L
                    var y = y0
                    while (y < y1) {
                      var x = x0
                      while (x < x1) { acc += px((y * w + x) * ch + c) & 0xff; x += 1 }
                      y += 1
                    }
                    // round-half-up box average
                    out((ty * tw + tx) * ch + c) = ((acc + cnt / 2) / cnt).toByte
                    c += 1
                  }
                  tx += 1
                }
                ty += 1
              }
              ResizedMedia(id, decoded = true, tw, th, ch, encodePng(tw, th, out, ch))
            case None =>
              // passthrough — but still report the payload's TRUE geometry
              // when a header parse exists (JPEG SOF, WAV), matching decode()
              val (w, h, ch) = headerGeometry(bytes).getOrElse((0, 0, 0))
              ResizedMedia(id, decoded = false, w, h, ch, bytes)
          }
        }
      }
  }

  /** Byte-statistics projection used by the declared multimodal query —
    * pure relational ops over the binary column (no decode).
    */
  def byteStats(media: DataFrame): DataFrame =
    media.select(
      col("id"),
      col("meta.n_bytes").as("n_bytes"),
      (col("meta.n_bytes") % 256).as("fake_channel"))
}
