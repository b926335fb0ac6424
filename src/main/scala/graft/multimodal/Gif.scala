package graft.multimodal

/** Pure-JVM GIF (87a/89a) codec — decoder + fixture encoder.
  *
  * GIF is the remaining image container a web-scale corpus actually
  * carries (alongside PNG/JPEG/BMP already decoded here): palette-indexed
  * pixels, variable-width LSB-first LZW entropy coding (the GIF dialect:
  * clear/end codes, 12-bit cap, deferred-clear tolerant), optional 4-pass
  * row interlacing, and 89a extension blocks (graphic-control transparency
  * honored; comment/application/plain-text blocks skipped structurally).
  *
  * Decode contract matches [[Multimodal]]'s other image paths: first frame
  * → top-down interleaved 8-bit samples, palette expanded to RGB (RGBA
  * when the frame's graphic-control extension declares a transparent
  * index — the PNG tRNS analog), so the SAME image stored interlaced vs
  * sequential, or with different LZW code-run boundaries, checksums
  * identically. Malformed structure throws — [[Multimodal.decode]]'s
  * per-record degrade turns that into a stub record, never a dead task.
  *
  * The encoder is the test fixture counterpart (same role as
  * [[Multimodal.encodePng]]): indexed pixels + palette → a real
  * spec-conformant 89a stream, interlace and transparency switchable, so
  * specs can drive every decoder branch and cross-validate against the
  * JDK's own ImageIO GIF plugin in both directions.
  */
object Gif {

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Magic + structural sniff: version tag and positive screen geometry.
    * (Text bytes that happen to start with "GIF8" would also need "7a"/"9a"
    * and a sane little-endian screen descriptor to get past this; the
    * parser's own requires degrade anything that still lies.)
    */
  def isGif(b: Array[Byte]): Boolean =
    b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a' &&
      le16(b, 6) > 0 && le16(b, 8) > 0

  /** Interlaced GIFs store rows in 4 passes (8/8 from 0, 8/8 from 4, 4/4
    * from 2, 2/2 from 1): stored row k lands on display row order(k).
    */
  private[multimodal] def interlaceOrder(h: Int): Array[Int] = {
    val order = new Array[Int](h)
    var k = 0
    Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
      var y = start
      while (y < h) { order(k) = y; k += 1; y += step }
    }
    order
  }

  /** Decode the first image: (width, height, channels, interleaved 8-bit
    * samples top-down). Frame-local geometry (an animation's later frames
    * and their offsets are out of scope — the first frame is the record's
    * image, the same convention as MP4 frame 0 thumbnails).
    */
  def decode(b: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(isGif(b), "not a GIF")
    var i = 6
    val packed = b(i + 4) & 0xff
    i += 7
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      require(i + 3 * n <= b.length, "GIF: truncated global color table")
      gct = java.util.Arrays.copyOfRange(b, i, i + 3 * n)
      i += 3 * n
    }
    var transparentIdx = -1
    while (true) {
      require(i < b.length, "GIF: no image before end of payload")
      (b(i) & 0xff) match {
        case 0x21 => // extension block: label + length-prefixed sub-blocks
          require(i + 2 <= b.length, "GIF: truncated extension")
          val label = b(i + 1) & 0xff
          i += 2
          if (label == 0xf9) {
            require(i + 6 <= b.length && (b(i) & 0xff) == 4,
              "GIF: malformed graphic control extension")
            if ((b(i + 1) & 1) != 0) transparentIdx = b(i + 4) & 0xff
            require((b(i + 5) & 0xff) == 0, "GIF: GCE missing terminator")
            i += 6
          } else {
            while ({ require(i < b.length, "GIF: truncated sub-blocks"); (b(i) & 0xff) != 0 })
              i += 1 + (b(i) & 0xff)
            i += 1
          }
        case 0x2c => // image descriptor
          require(i + 10 <= b.length, "GIF: truncated image descriptor")
          val w = le16(b, i + 5)
          val h = le16(b, i + 7)
          val ip = b(i + 9) & 0xff
          i += 10
          var pal = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            require(i + 3 * n <= b.length, "GIF: truncated local color table")
            pal = java.util.Arrays.copyOfRange(b, i, i + 3 * n)
            i += 3 * n
          }
          require(pal != null, "GIF: image with neither local nor global color table")
          require(w > 0 && h > 0, s"GIF: bad frame dimensions ${w}x$h")
          require(w.toLong * h <= 64L * 1024 * 1024,
            s"GIF: ${w}x$h exceeds the decode bomb guard") // same guard class as PNG/JPEG
          require(i < b.length, "GIF: missing LZW minimum code size")
          val minCode = b(i) & 0xff
          require(minCode >= 2 && minCode <= 8, s"GIF: LZW min code size $minCode")
          i += 1
          val data = new java.io.ByteArrayOutputStream()
          while ({ require(i < b.length, "GIF: truncated image data"); (b(i) & 0xff) != 0 }) {
            val n = b(i) & 0xff
            require(i + 1 + n <= b.length, "GIF: truncated image sub-block")
            data.write(b, i + 1, n)
            i += 1 + n
          }
          val indices = lzwDecode(data.toByteArray, minCode, w * h)
          val order = if ((ip & 0x40) != 0) interlaceOrder(h) else null
          val ch = if (transparentIdx >= 0) 4 else 3
          val out = new Array[Byte](w * h * ch)
          var k = 0
          while (k < h) {
            val dy = if (order == null) k else order(k)
            var x = 0
            while (x < w) {
              val idx = indices(k * w + x) & 0xff
              require(idx * 3 + 2 < pal.length, s"GIF: palette index $idx out of range")
              val d = (dy * w + x) * ch
              out(d) = pal(idx * 3); out(d + 1) = pal(idx * 3 + 1)
              out(d + 2) = pal(idx * 3 + 2)
              if (ch == 4) out(d + 3) = if (idx == transparentIdx) 0 else 0xff.toByte
              x += 1
            }
            k += 1
          }
          return (w, h, ch, out)
        case 0x3b => throw new IllegalArgumentException("GIF: trailer before any image")
        case other => throw new IllegalArgumentException(
          f"GIF: unknown block 0x$other%02x")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** GIF-dialect LZW decode: variable code width from minCode+1 to 12 bits,
    * LSB-first, clear resets the table, table freezes at 4096 (deferred
    * clear tolerated). Emits exactly `expected` indices; anything short is
    * a truncation error.
    */
  private[multimodal] def lzwDecode(
      data: Array[Byte], minCode: Int, expected: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val MaxCodes = 4096
    val prefix = new Array[Int](MaxCodes)
    val suffix = new Array[Byte](MaxCodes)
    val firstB = new Array[Byte](MaxCodes)
    val length = new Array[Int](MaxCodes)
    var c = 0
    while (c < clear) {
      prefix(c) = -1; suffix(c) = c.toByte; firstB(c) = c.toByte; length(c) = 1
      c += 1
    }
    var nextCode = clear + 2
    var codeSize = minCode + 1
    val out = new Array[Byte](expected)
    var outPos = 0
    var acc = 0L
    var accBits = 0
    var pos = 0
    def readCode(): Int = {
      while (accBits < codeSize) {
        if (pos >= data.length) return end // truncated stream → implicit end
        acc |= (data(pos) & 0xffL) << accBits
        accBits += 8
        pos += 1
      }
      val v = (acc & ((1L << codeSize) - 1)).toInt
      acc >>>= codeSize
      accBits -= codeSize
      v
    }
    var prev = -1
    var running = true
    while (running && outPos < expected) {
      val code = readCode()
      if (code == clear) { nextCode = clear + 2; codeSize = minCode + 1; prev = -1 }
      else if (code == end) running = false
      else if (prev == -1) {
        require(code < clear, s"GIF LZW: first code $code after clear is not a root")
        out(outPos) = suffix(code); outPos += 1
        prev = code
      } else {
        require(code <= nextCode && code < MaxCodes,
          s"GIF LZW: code $code out of range (next free $nextCode)")
        require(code < nextCode || nextCode < MaxCodes,
          "GIF LZW: KwKwK against a frozen table")
        // the entry this code pairs with prev: str(prev) + first byte of
        // str(code) — for the KwKwK case (code == nextCode) that first byte
        // is prev's own
        if (nextCode < MaxCodes) {
          val entryFirst = if (code == nextCode) firstB(prev) else firstB(code)
          prefix(nextCode) = prev
          suffix(nextCode) = entryFirst
          firstB(nextCode) = firstB(prev)
          length(nextCode) = length(prev) + 1
          nextCode += 1
          if (nextCode < MaxCodes && nextCode == (1 << codeSize) && codeSize < 12)
            codeSize += 1
        }
        val len = length(code)
        require(outPos + len <= expected,
          s"GIF LZW: decoded run exceeds the frame's ${expected} pixels")
        var p = code
        var wi = outPos + len - 1
        while (p != -1) { out(wi) = suffix(p); wi -= 1; p = prefix(p) }
        outPos += len
        prev = code
      }
    }
    require(outPos == expected,
      s"GIF LZW: stream ended at $outPos of $expected pixels")
    out
  }

  // ---- fixture encoder ----

  /** Encode indexed pixels (top-down) + packed RGB palette as GIF89a.
    * `transparentIdx >= 0` writes a graphic control extension (→ the
    * decoder expands to RGBA); `interlaced` stores rows in pass order.
    */
  def encodeIndexed(width: Int, height: Int, indices: Array[Byte],
      palette: Array[Byte], interlaced: Boolean = false,
      transparentIdx: Int = -1): Array[Byte] = {
    require(indices.length == width * height, "indices must be width*height")
    require(palette.length % 3 == 0 && palette.length >= 3 * 2 &&
      palette.length <= 3 * 256, s"palette size ${palette.length}")
    val nColors = palette.length / 3
    var k = 1
    while ((1 << k) < nColors) k += 1
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(width); w16(height)
    out.write(0x80 | (k - 1)) // GCT present, 2^k entries
    out.write(0); out.write(0) // background index, aspect
    out.write(palette, 0, palette.length)
    var pad = nColors
    while (pad < (1 << k)) { out.write(0); out.write(0); out.write(0); pad += 1 }
    if (transparentIdx >= 0) {
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(1) // transparent color flag
      out.write(0); out.write(0) // delay
      out.write(transparentIdx)
      out.write(0)
    }
    out.write(0x2c); w16(0); w16(0); w16(width); w16(height)
    out.write(if (interlaced) 0x40 else 0)
    val minCode = math.max(2, k)
    out.write(minCode)
    val src =
      if (!interlaced) indices
      else {
        val order = interlaceOrder(height)
        val r = new Array[Byte](indices.length)
        var row = 0
        while (row < height) {
          System.arraycopy(indices, order(row) * width, r, row * width, width)
          row += 1
        }
        r
      }
    val lzw = lzwEncode(src, minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0)
    out.write(0x3b)
    out.toByteArray
  }

  /** RGB convenience wrapper: builds the palette from the image's distinct
    * colors (must be ≤ 256 — fixtures, not a quantizer).
    */
  def encodeRgb(width: Int, height: Int, rgb: Array[Byte],
      interlaced: Boolean = false): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be width*height*3")
    val colorToIdx = new java.util.LinkedHashMap[Int, Integer]()
    val indices = new Array[Byte](width * height)
    var p = 0
    while (p < width * height) {
      val cVal = ((rgb(p * 3) & 0xff) << 16) |
        ((rgb(p * 3 + 1) & 0xff) << 8) | (rgb(p * 3 + 2) & 0xff)
      var idx = colorToIdx.get(cVal)
      if (idx == null) {
        idx = colorToIdx.size()
        require(idx < 256, "encodeRgb: more than 256 distinct colors")
        colorToIdx.put(cVal, idx)
      }
      indices(p) = idx.byteValue()
      p += 1
    }
    val palette = new Array[Byte](math.max(2, colorToIdx.size()) * 3)
    colorToIdx.forEach { (cVal, idx) =>
      palette(idx * 3) = ((cVal >> 16) & 0xff).toByte
      palette(idx * 3 + 1) = ((cVal >> 8) & 0xff).toByte
      palette(idx * 3 + 2) = (cVal & 0xff).toByte
    }
    encodeIndexed(width, height, indices, palette, interlaced)
  }

  /** GIF-dialect LZW encode, the exact inverse of [[lzwDecode]]'s state
    * machine: the encoder's post-add bump fires at nextCode == (1<<size)+1
    * — one step after the decoder's nextCode == 1<<size — because the
    * decoder learns each table entry one code later than the encoder
    * creates it.
    */
  private[multimodal] def lzwEncode(data: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    var codeSize = minCode + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += codeSize
      while (accBits >= 8) {
        out.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8
      }
    }
    var nextCode = clear + 2
    def countAdd(): Unit = {
      // mirrors the decoder's add-then-maybe-bump, shifted by one
      if (nextCode < 4096) {
        nextCode += 1
        if (nextCode - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
    }
    val dict = new java.util.HashMap[Long, Integer]()
    emit(clear)
    var prev = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      require(b < clear, s"GIF LZW encode: index $b needs a larger min code size")
      if (prev == -1) prev = b
      else {
        val key = (prev.toLong << 8) | b
        val ext = dict.get(key)
        if (ext != null) prev = ext.intValue()
        else {
          emit(prev)
          if (nextCode < 4096) dict.put(key, nextCode)
          countAdd()
          prev = b
        }
      }
      i += 1
    }
    if (prev != -1) { emit(prev); countAdd() }
    emit(end)
    if (accBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }
}
