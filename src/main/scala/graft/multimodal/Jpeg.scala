package graft.multimodal

/** Pure-JVM JPEG codec — no codec libraries, written against the public
  * ITU-T T.81 spec (the same no-dependency discipline as the BMP/PPM/
  * PNG/WAV codecs in [[Multimodal]]; the reference repo contains no codec,
  * this is engine capability for the multimodal column family).
  *
  * Decoder ([[decode]]): Huffman JPEG, 8-bit samples, 1 or 3 components,
  * sampling factors 1–2 in each axis (4:4:4, 4:2:2, 4:2:0), restart
  * markers, FF00 byte-stuffing — in BOTH process families:
  *  - baseline + extended-sequential (SOF0/SOF1): single interleaved scan,
  *    decoded MCU-at-a-time straight to pixels;
  *  - progressive (SOF2): multi-scan spectral selection + successive
  *    approximation (T.81 G.2) — DC first/refine, AC first/refine with
  *    EOB-run accumulation — into per-component coefficient planes,
  *    dequantized + IDCT'd once after the last scan. Progressive is the
  *    majority format of real web crawls, so this path is first-class.
  * Output is row-major top-down interleaved gray or RGB (JFIF YCbCr
  * full-range). Anything outside that envelope (arithmetic coding, 12-bit,
  * 4-component CMYK, hierarchical/lossless SOFs) throws — callers degrade
  * to the header-only parse, exactly like the other codecs degrade to the
  * stub.
  *
  * Encoder ([[encode]], fixture-grade): baseline JFIF, 4:4:4 or 4:2:0,
  * Annex K quantization tables scaled by a quality factor, Annex K.3
  * Huffman tables. The encoder exists so tests can round-trip real entropy
  * data through the decoder — JPEG is lossy, so round-trip assertions are
  * tolerance-based, not bit-exact. (Progressive fixtures come from the
  * JDK's ImageIO writer in tests, which emits the standard 10-scan
  * progression script — both spectral selection and successive
  * approximation — so the decoder's progressive paths are driven by an
  * independent encoder.)
  *
  * Everything here is per-record CPU work running inside mapPartitions —
  * no Spark coupling, no shared mutable state, safe on 32 concurrent tasks.
  */
private[graft] object Jpeg {

  // ---------------------------------------------------------------- tables

  /** Zigzag order: zz(i) = natural index of the i-th zigzag coefficient. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1/K.2 base quantization tables (natural order). */
  private val QLumBase: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)
  private val QChromBase: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  /** Annex K.3 Huffman table specs: (bits-per-length[1..16], values). */
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChromBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChromBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** Canonical Huffman decoding tables from a (bits, vals) spec:
    * mincode/maxcode/valptr per code length (T.81 F.2.2.3 DECODE).
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Byte] = vals
    private var code = 0
    private var k = 0
    private var l = 1
    while (l <= 16) {
      valPtr(l) = k
      minCode(l) = code
      code += bits(l)
      k += bits(l)
      maxCode(l) = if (bits(l) > 0) code - 1 else -1
      code <<= 1
      l += 1
    }
  }

  /** Canonical Huffman ENCODING map: symbol → (code, length). */
  private def encTable(bits: Array[Int], vals: Array[Byte]): Array[Int] = {
    // packed (length << 16 | code), indexed by symbol byte
    val out = new Array[Int](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        out(vals(k) & 0xff) = (l << 16) | code
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    out
  }

  // ------------------------------------------------------------------ DCT

  /** Static scaled cosine basis, computed ONCE: Cos(u)(x) =
    * c(u)·cos((2x+1)uπ/16). The transforms run per 8×8 block on the
    * per-record decode hot path — a 4096×4096 image has 262k luma blocks,
    * so recomputing 1024 transcendental cos calls per block would dominate
    * the decode; a 64-entry table gives identical (still deterministic)
    * results.
    */
  private val CosBasis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    (if (u == 0) math.sqrt(0.125) else 0.5) * math.cos((2 * x + 1) * u * math.Pi / 16)
  }

  /** Separable double-precision 2-D IDCT on one 8×8 block (in place,
    * `tmp` caller-provided scratch — no allocation per block).
    */
  private def idct8x8(blk: Array[Double], tmp: Array[Double]): Unit = {
    // rows
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += blk(y * 8 + u) * CosBasis(u)(x); u += 1 }
        tmp(y * 8 + x) = acc
        x += 1
      }
      y += 1
    }
    // columns
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += tmp(v * 8 + x) * CosBasis(v)(yy); v += 1 }
        blk(yy * 8 + x) = acc
        yy += 1
      }
      x += 1
    }
  }

  /** Forward DCT (encoder side), same separable definition and scratch
    * discipline.
    */
  private def fdct8x8(blk: Array[Double], tmp: Array[Double]): Unit = {
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0.0
        var x = 0
        while (x < 8) { acc += blk(y * 8 + x) * CosBasis(u)(x); x += 1 }
        tmp(y * 8 + u) = acc
        y += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) {
      var uu = 0
      while (uu < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < 8) { acc += tmp(yy * 8 + uu) * CosBasis(v)(yy); yy += 1 }
        blk(v * 8 + uu) = acc
        uu += 1
      }
      v += 1
    }
  }

  // -------------------------------------------------------------- decoder

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0

    /** Next bit of entropy data, honoring FF00 stuffing. Hitting a real
      * marker mid-symbol is a corrupt stream.
      */
    def bit(): Int = {
      if (bitCnt == 0) {
        require(pos < b.length, "JPEG: entropy stream truncated")
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          require(pos < b.length, "JPEG: entropy stream truncated at FF")
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed FF
          else throw new IllegalArgumentException(
            s"JPEG: marker $m inside entropy segment")
        }
        bitBuf = v
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Skip to the RSTn marker that must come next and reset bit state.
      * T.81 B.1.1.2 allows any number of 0xFF fill bytes before the marker
      * code, so the scan must stop at an FF whose follower is a real code —
      * neither a stuffed 0x00 nor another fill FF.
      */
    def restart(expected: Int): Unit = {
      bitCnt = 0
      while (pos + 1 < b.length && !((b(pos) & 0xff) == 0xff &&
          (b(pos + 1) & 0xff) != 0x00 && (b(pos + 1) & 0xff) != 0xff))
        pos += 1
      require(pos + 1 < b.length, "JPEG: missing restart marker")
      val m = b(pos + 1) & 0xff
      require(m == 0xd0 + expected, f"JPEG: expected RST$expected%d, got $m%02x")
      pos += 2
    }

    /** Byte-align after a scan's entropy data: drop buffered bits so `pos`
      * is the next unconsumed stream byte (used between progressive scans).
      */
    def align(): Unit = bitCnt = 0

    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
        code = (code << 1) | bit()
        l += 1
      }
      require(l <= 16, "JPEG: invalid Huffman code")
      t.values(t.valPtr(l) + code - t.minCode(l)) & 0xff
    }
  }

  /** EXTEND (T.81 F.2.2.1): map a magnitude-category bit pattern to its
    * signed value.
    */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  private final case class Component(
      id: Int, h: Int, v: Int, qId: Int, var dcTab: Int = 0, var acTab: Int = 0)

  /** Decompression-bomb guard: a crafted SOF header can declare up to
    * 65535×65535×3 (~12 GB) while the payload is a few hundred bytes — the
    * allocation would OOM the executor BEFORE the entropy decode fails, and
    * OutOfMemoryError is not a NonFatal the degrade path catches. 64 MB of
    * decoded pixels per record is far above any legitimate inline media
    * payload and far below executor headroom at 32 concurrent tasks.
    * (Sequential decode allocates ≈2·nc bytes/pixel — planes + output;
    * progressive holds int coefficient planes, ≈4–6·nc bytes/pixel, so its
    * guard multiplier is higher and its size ceiling correspondingly lower.)
    */
  private[multimodal] val MaxDecodedBytes: Long = 64L << 20

  /** Decode a Huffman JPEG (baseline, extended-sequential, or progressive)
    * to (width, height, channels, top-down interleaved pixels). Throws on
    * anything outside the supported envelope — the caller degrades.
    */
  def decode(b: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8, "JPEG: no SOI")
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var progressive = false
    var hMax = 0; var vMax = 0
    var mcusX = 0; var mcusY = 0
    var planeW: Array[Int] = null
    var planeH: Array[Int] = null
    var planes: Array[Array[Byte]] = null // sequential result
    var coefs: Array[Array[Int]] = null   // progressive accumulation
    var scans = 0

    /** First position ≥ `from` holding a marker FF (not entropy FF00; a
      * FF-FF fill run is left for the main loop's fill-byte skip).
      */
    def nextMarkerPos(from: Int): Int = {
      var j = from
      while (j + 1 < b.length &&
          !((b(j) & 0xff) == 0xff && (b(j + 1) & 0xff) != 0x00)) j += 1
      require(j + 1 < b.length, "JPEG: truncated after scan data")
      j
    }

    // ---- sequential scan: single interleaved pass, straight to pixels
    def sequentialScan(r: BitReader): Unit = {
      planes = comps.indices.map(ci => new Array[Byte](planeW(ci) * planeH(ci))).toArray
      val dcPred = new Array[Int](comps.length)
      val blk = new Array[Double](64)
      val scratch = new Array[Double](64)
      var mcu = 0
      var rstCount = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            r.restart(rstCount % 8)
            rstCount += 1
            java.util.Arrays.fill(dcPred, 0)
          }
          var ci = 0
          while (ci < comps.length) {
            val comp = comps(ci)
            val q = quant(comp.qId)
            require(q != null, "JPEG: SOS before its quant table")
            val dcT = dcTabs(comp.dcTab)
            val acT = acTabs(comp.acTab)
            require(dcT != null && acT != null, "JPEG: SOS before its Huffman tables")
            var by = 0
            while (by < comp.v) {
              var bx = 0
              while (bx < comp.h) {
                // --- one 8x8 block
                java.util.Arrays.fill(blk, 0.0)
                val dcSize = r.decodeHuff(dcT)
                require(dcSize <= 11, "JPEG: DC size out of range")
                dcPred(ci) += extend(r.bits(dcSize), dcSize)
                blk(0) = dcPred(ci).toDouble * q(0)
                var k = 1
                while (k < 64) {
                  val rs = r.decodeHuff(acT)
                  val run = rs >> 4
                  val size = rs & 0x0f
                  if (size == 0) {
                    if (run == 15) k += 16 // ZRL
                    else k = 64 // EOB
                  } else {
                    k += run
                    require(k < 64, "JPEG: AC index overrun")
                    val nat = Zigzag(k)
                    blk(nat) = extend(r.bits(size), size).toDouble * q(nat)
                    k += 1
                  }
                }
                idct8x8(blk, scratch)
                // place into the component plane
                val px0 = (mx * comp.h + bx) * 8
                val py0 = (my * comp.v + by) * 8
                val pw = planeW(ci)
                var yy = 0
                while (yy < 8) {
                  var xx = 0
                  while (xx < 8) {
                    val s = math.round(blk(yy * 8 + xx) + 128.0).toInt
                    planes(ci)((py0 + yy) * pw + (px0 + xx)) =
                      (if (s < 0) 0 else if (s > 255) 255 else s).toByte
                    xx += 1
                  }
                  yy += 1
                }
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    }

    // ---- progressive scan: accumulate coefficients (T.81 G.2)
    def progressiveScan(r: BitReader, scanCis: Array[Int],
        ss: Int, se: Int, ah: Int, al: Int): Unit = {
      require(ss >= 0 && se <= 63 && ss <= se, "JPEG: bad spectral range")
      require(al <= 13 && (ah == 0 || ah == al + 1),
        "JPEG: bad successive-approximation bits")
      val dcPred = new Array[Int](comps.length)
      var eobrun = 0
      var mcu = 0
      var rstCount = 0
      def maybeRestart(): Unit =
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          r.restart(rstCount % 8)
          rstCount += 1
          java.util.Arrays.fill(dcPred, 0)
          eobrun = 0
        }
      def refineNonzero(coef: Array[Int], idx: Int, p1: Int): Unit =
        if (r.bit() == 1 && (coef(idx) & p1) == 0)
          coef(idx) += (if (coef(idx) >= 0) p1 else -p1)

      if (ss == 0) { // ---- DC scan (interleaved if ns > 1)
        require(se == 0, "JPEG: DC scan with AC coefficients")
        def dcBlock(ci: Int, off: Int): Unit = {
          val coef = coefs(ci)
          if (ah == 0) {
            val dcT = dcTabs(comps(ci).dcTab)
            require(dcT != null, "JPEG: DC scan before its Huffman table")
            val dcSize = r.decodeHuff(dcT)
            require(dcSize <= 11, "JPEG: DC size out of range")
            dcPred(ci) += extend(r.bits(dcSize), dcSize)
            coef(off) = dcPred(ci) << al
          } else if (r.bit() == 1) coef(off) |= 1 << al
        }
        if (scanCis.length > 1) { // interleaved MCU order
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              maybeRestart()
              var s = 0
              while (s < scanCis.length) {
                val ci = scanCis(s)
                val c = comps(ci)
                val colsB = planeW(ci) / 8
                var by = 0
                while (by < c.v) {
                  var bx = 0
                  while (bx < c.h) {
                    dcBlock(ci, ((my * c.v + by) * colsB + (mx * c.h + bx)) * 64)
                    bx += 1
                  }
                  by += 1
                }
                s += 1
              }
              mcu += 1
              mx += 1
            }
            my += 1
          }
        } else { // single-component: the component's own block grid
          val ci = scanCis(0)
          val c = comps(ci)
          val colsB = planeW(ci) / 8
          val wB = ((width * c.h + hMax - 1) / hMax + 7) / 8
          val hB = ((height * c.v + vMax - 1) / vMax + 7) / 8
          var by = 0
          while (by < hB) {
            var bx = 0
            while (bx < wB) {
              maybeRestart()
              dcBlock(ci, (by * colsB + bx) * 64)
              mcu += 1
              bx += 1
            }
            by += 1
          }
        }
      } else { // ---- AC scan: always single-component (T.81 G.1.1.1.1)
        require(scanCis.length == 1, "JPEG: interleaved AC scan")
        val ci = scanCis(0)
        val c = comps(ci)
        val acT = acTabs(c.acTab)
        require(acT != null, "JPEG: AC scan before its Huffman table")
        val coef = coefs(ci)
        val colsB = planeW(ci) / 8
        val wB = ((width * c.h + hMax - 1) / hMax + 7) / 8
        val hB = ((height * c.v + vMax - 1) / vMax + 7) / 8
        val p1 = 1 << al

        def acFirstBlock(off: Int): Unit =
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            while (k <= se) {
              val rs = r.decodeHuff(acT)
              val run = rs >> 4
              val size = rs & 0x0f
              if (size != 0) {
                k += run
                require(k <= se, "JPEG: AC index overrun")
                coef(off + Zigzag(k)) = extend(r.bits(size), size) << al
                k += 1
              } else if (run == 15) k += 16 // ZRL
              else { // EOBn: this block is the first member of the run
                eobrun = (1 << run) - 1
                if (run > 0) eobrun += r.bits(run)
                k = se + 1
              }
            }
          }

        /** AC refinement (T.81 G.2 / the standard correction-bit walk):
          * every nonzero-history coefficient passed over consumes one
          * correction bit; newly nonzero coefficients are placed with value
          * ±2^Al; EOBn covers the rest of the block with correction bits
          * only.
          */
        def acRefineBlock(off: Int): Unit = {
          var k = ss
          if (eobrun == 0) {
            var atEob = false
            while (k <= se && !atEob) {
              val rs = r.decodeHuff(acT)
              var run = rs >> 4
              val size = rs & 0x0f
              var newVal = 0
              if (size != 0) {
                require(size == 1, "JPEG: AC refinement size must be 1")
                newVal = if (r.bit() == 1) p1 else -p1
              } else if (run != 15) {
                eobrun = 1 << run
                if (run > 0) eobrun += r.bits(run)
                atEob = true
              }
              if (!atEob) {
                // advance over `run` zero-history coefficients, emitting a
                // correction bit at every nonzero-history one on the way
                var placed = false
                while (k <= se && !placed) {
                  val idx = off + Zigzag(k)
                  if (coef(idx) != 0) { refineNonzero(coef, idx, p1); k += 1 }
                  else if (run == 0) {
                    if (newVal != 0) coef(idx) = newVal
                    placed = true
                    k += 1
                  } else { run -= 1; k += 1 }
                }
              }
            }
          }
          if (eobrun > 0) {
            while (k <= se) {
              val idx = off + Zigzag(k)
              if (coef(idx) != 0) refineNonzero(coef, idx, p1)
              k += 1
            }
            eobrun -= 1
          }
        }

        var by = 0
        while (by < hB) {
          var bx = 0
          while (bx < wB) {
            maybeRestart()
            val off = (by * colsB + bx) * 64
            if (ah == 0) acFirstBlock(off) else acRefineBlock(off)
            mcu += 1
            bx += 1
          }
          by += 1
        }
      }
      r.align()
      scans += 1
    }

    // ---- marker walk. Bounds discipline: every length/offset read is
    // re-validated AFTER the fill-FF skip (a truncated stream must surface
    // as IllegalArgumentException, never ArrayIndexOutOfBoundsException).
    var i = 2
    var done = false
    while (!done) {
      require(i + 1 < b.length, "JPEG: truncated stream")
      require((b(i) & 0xff) == 0xff, s"JPEG: marker expected at $i")
      while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1 // fill FFs
      require(i + 1 < b.length, "JPEG: truncated stream")
      val m = b(i + 1) & 0xff
      if (m == 0xd9) done = true // EOI
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // TEM / stray RST
      else {
        require(i + 4 <= b.length, "JPEG: truncated segment header")
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        require(len >= 2 && i + 2 + len <= b.length, s"JPEG: segment overruns buffer at $i")
        val seg = i + 4
        val segEnd = i + 2 + len
        var nextI = segEnd
        m match {
          case 0xdb => // DQT — one or more tables
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) & 0xff) >> 4
              val tq = b(p) & 0x0f
              require(pq == 0, "JPEG: 16-bit quant tables not supported")
              require(p + 65 <= segEnd, "JPEG: truncated DQT")
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(Zigzag(k)) = b(p + 1 + k) & 0xff; k += 1 }
              quant(tq) = t
              p += 65
            }
          case 0xc4 => // DHT — one or more tables
            var p = seg
            while (p < segEnd) {
              require(p + 17 <= segEnd, "JPEG: truncated DHT")
              val tc = (b(p) & 0xff) >> 4
              val th = b(p) & 0x0f
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { bits(l) = b(p + l) & 0xff; total += bits(l); l += 1 }
              require(p + 17 + total <= segEnd, "JPEG: truncated DHT")
              val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + total)
              val tab = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + total
            }
          case 0xc0 | 0xc1 | 0xc2 => // SOF0 / SOF1 / SOF2 progressive
            require(comps == null, "JPEG: multiple frames not supported")
            progressive = m == 0xc2
            require(seg + 6 <= segEnd, "JPEG: truncated SOF")
            require(b(seg) == 8, "JPEG: only 8-bit precision supported")
            height = ((b(seg + 1) & 0xff) << 8) | (b(seg + 2) & 0xff)
            width = ((b(seg + 3) & 0xff) << 8) | (b(seg + 4) & 0xff)
            val nc = b(seg + 5) & 0xff
            require(width > 0 && height > 0, "JPEG: bad dimensions")
            require(nc == 1 || nc == 3, s"JPEG: $nc components not supported")
            require(seg + 6 + 3 * nc <= segEnd, "JPEG: truncated SOF")
            // actual allocation ≈ component planes + output buffer for
            // sequential (≈2·nc bytes/px); progressive holds 4-byte int
            // coefficient planes instead (≈4–6·nc bytes/px) — size the
            // guard to what THIS decode will really allocate
            val perPx = (if (progressive) 6L else 2L) * nc
            require(width.toLong * height * perPx <= MaxDecodedBytes,
              s"JPEG: declared ${width}x$height too large to decode inline")
            comps = Array.tabulate(nc) { c =>
              val o = seg + 6 + 3 * c
              val cid = b(o) & 0xff
              val hv = b(o + 1) & 0xff
              val comp = Component(cid, hv >> 4, hv & 0x0f, b(o + 2) & 0xff)
              require(comp.h >= 1 && comp.h <= 2 && comp.v >= 1 && comp.v <= 2,
                s"JPEG: sampling ${comp.h}x${comp.v} not supported")
              comp
            }
            hMax = comps.map(_.h).max
            vMax = comps.map(_.v).max
            mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            planeW = comps.map(c => mcusX * c.h * 8)
            planeH = comps.map(c => mcusY * c.v * 8)
            if (progressive)
              coefs = comps.indices.map(ci => new Array[Int](planeW(ci) * planeH(ci))).toArray
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            throw new IllegalArgumentException(
              "JPEG: lossless/hierarchical/arithmetic SOF not supported")
          case 0xdd => // DRI
            require(seg + 2 <= segEnd, "JPEG: truncated DRI")
            restartInterval = ((b(seg) & 0xff) << 8) | (b(seg + 1) & 0xff)
          case 0xda => // SOS
            require(comps != null, "JPEG: SOS before SOF")
            require(seg < segEnd, "JPEG: truncated SOS")
            val ns = b(seg) & 0xff
            require(ns >= 1 && ns <= comps.length, "JPEG: bad scan component count")
            require(seg + 1 + 2 * ns + 3 <= segEnd, "JPEG: truncated SOS")
            val scanCis = Array.tabulate(ns) { c =>
              val cid = b(seg + 1 + 2 * c) & 0xff
              val tabs = b(seg + 2 + 2 * c) & 0xff
              val ci = comps.indexWhere(_.id == cid)
              require(ci >= 0, "JPEG: SOS names unknown component")
              comps(ci).dcTab = tabs >> 4
              comps(ci).acTab = tabs & 0x0f
              ci
            }
            val ss = b(seg + 1 + 2 * ns) & 0xff
            val se = b(seg + 2 + 2 * ns) & 0xff
            val ahal = b(seg + 3 + 2 * ns) & 0xff
            val r = new BitReader(b, segEnd)
            if (!progressive) {
              require(ns == comps.length, "JPEG: sequential partial scans not supported")
              require(ss == 0 && se == 63 && ahal == 0, "JPEG: bad sequential scan header")
              sequentialScan(r)
              scans += 1
              done = true // single scan carries the whole frame
            } else {
              progressiveScan(r, scanCis, ss, se, ahal >> 4, ahal & 0x0f)
              nextI = nextMarkerPos(r.pos)
            }
          case _ => () // APPn / COM / DNL / others: skip
        }
        if (!done) i = nextI
      }
    }
    require(comps != null, "JPEG: no SOF before EOI")
    require(scans > 0, "JPEG: no scan data before EOI")

    if (progressive) {
      // final pass: dequantize + IDCT every block of every component plane
      planes = comps.indices.map(ci => new Array[Byte](planeW(ci) * planeH(ci))).toArray
      val blk = new Array[Double](64)
      val scratch = new Array[Double](64)
      var ci = 0
      while (ci < comps.length) {
        val q = quant(comps(ci).qId)
        require(q != null, "JPEG: missing quant table at end of frame")
        val coef = coefs(ci)
        val pw = planeW(ci)
        val colsB = pw / 8
        val rowsB = planeH(ci) / 8
        var by = 0
        while (by < rowsB) {
          var bx = 0
          while (bx < colsB) {
            val off = (by * colsB + bx) * 64
            var k = 0
            while (k < 64) { blk(k) = coef(off + k).toDouble * q(k); k += 1 }
            idct8x8(blk, scratch)
            val px0 = bx * 8
            val py0 = by * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val s = math.round(blk(yy * 8 + xx) + 128.0).toInt
                planes(ci)((py0 + yy) * pw + (px0 + xx)) =
                  (if (s < 0) 0 else if (s > 255) 255 else s).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
    }

    // compose: upsample every component to full resolution, color-convert.
    // Y is NOT assumed max-sampled: a legal (if unusual) stream may sample
    // luma 1x1 against 2x2 chroma, so each component gets its own divisor.
    val nc = comps.length
    val out = new Array[Byte](width * height * (if (nc == 1) 1 else 3))
    if (nc == 1) {
      val pw = planeW(0)
      val sx = hMax / comps(0).h; val sy = vMax / comps(0).v
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = planes(0)((y / sy) * pw + (x / sx))
          x += 1
        }
        y += 1
      }
      (width, height, 1, out)
    } else {
      val pwY = planeW(0); val pwCb = planeW(1); val pwCr = planeW(2)
      val sxY = hMax / comps(0).h; val syY = vMax / comps(0).v
      val sxCb = hMax / comps(1).h; val syCb = vMax / comps(1).v
      val sxCr = hMax / comps(2).h; val syCr = vMax / comps(2).v
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = planes(0)((y / syY) * pwY + (x / sxY)) & 0xff
          val cb = (planes(1)((y / syCb) * pwCb + (x / sxCb)) & 0xff) - 128
          val cr = (planes(2)((y / syCr) * pwCr + (x / sxCr)) & 0xff) - 128
          val d = (y * width + x) * 3
          out(d) = clamp(yy + 1.402 * cr)
          out(d + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          out(d + 2) = clamp(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
      (width, height, 3, out)
    }
  }

  private def clamp(v: Double): Byte = {
    val r = math.round(v).toInt
    (if (r < 0) 0 else if (r > 255) 255 else r).toByte
  }

  // -------------------------------------------------------------- encoder

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { put(0x7f, 8 - cnt) } // pad with 1s
    /** Byte-align and emit a restart marker (unstuffed, outside entropy). */
    def restartMarker(n: Int): Unit = {
      flush()
      out.write(0xff); out.write(0xd0 + (n % 8))
    }
  }

  private def qualityScale(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { v =>
      val s = (v * scale + 50) / 100
      math.max(1, math.min(255, s))
    }
  }

  /** Encode top-down interleaved pixels (1 = gray or 3 = RGB channels) as a
    * baseline JFIF JPEG. `subsample` selects 4:2:0 (true) or 4:4:4 (false)
    * chroma layout for 3-channel input. `restartInterval` > 0 emits a DRI
    * segment and an RSTn marker every that-many MCUs (the error-resilience
    * feature real camera streams carry — lets tests drive the decoder's
    * restart path with an in-repo fixture).
    */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
      quality: Int = 90, subsample: Boolean = false,
      restartInterval: Int = 0): Array[Byte] = {
    require(channels == 1 || channels == 3, "channels must be 1 or 3")
    require(pixels.length == width * height * channels, "pixel buffer size mismatch")
    val qLum = qualityScale(QLumBase, quality)
    val qChrom = qualityScale(QChromBase, quality)

    // color convert to per-component planes
    val (h0, v0) = if (channels == 3 && subsample) (2, 2) else (1, 1)
    val hMax = h0; val vMax = v0
    val mcuW = 8 * hMax; val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    val yW = mcusX * h0 * 8; val yH = mcusY * v0 * 8
    val cW = mcusX * 8; val cH = mcusY * 8
    val yP = new Array[Double](yW * yH)
    val cbP = new Array[Double](cW * cH)
    val crP = new Array[Double](cW * cH)
    // fill with edge-replicated samples so padding blocks compress cleanly
    var y = 0
    while (y < yH) {
      val sy = math.min(y, height - 1)
      var x = 0
      while (x < yW) {
        val sx = math.min(x, width - 1)
        if (channels == 1) yP(y * yW + x) = (pixels(sy * width + sx) & 0xff) - 128.0
        else {
          val s = (sy * width + sx) * 3
          val r = pixels(s) & 0xff; val g = pixels(s + 1) & 0xff; val b = pixels(s + 2) & 0xff
          yP(y * yW + x) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        }
        x += 1
      }
      y += 1
    }
    if (channels == 3) {
      var cy = 0
      while (cy < cH) {
        var cx = 0
        while (cx < cW) {
          // box-average the chroma source box (1x1 or 2x2)
          var rAcc = 0.0; var gAcc = 0.0; var bAcc = 0.0
          var n = 0
          var dy = 0
          while (dy < v0) {
            var dx = 0
            while (dx < h0) {
              val sy = math.min(cy * v0 + dy, height - 1)
              val sx = math.min(cx * h0 + dx, width - 1)
              val s = (sy * width + sx) * 3
              rAcc += pixels(s) & 0xff; gAcc += pixels(s + 1) & 0xff; bAcc += pixels(s + 2) & 0xff
              n += 1; dx += 1
            }
            dy += 1
          }
          val r = rAcc / n; val g = gAcc / n; val b = bAcc / n
          cbP(cy * cW + cx) = -0.168736 * r - 0.331264 * g + 0.5 * b
          crP(cy * cW + cx) = 0.5 * r - 0.418688 * g - 0.081312 * b
          cx += 1
        }
        cy += 1
      }
    }

    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xe0, "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT (zigzag order on the wire)
    def dqt(id: Int, t: Array[Int]): Array[Byte] =
      Array(id.toByte) ++ Array.tabulate(64)(k => t(Zigzag(k)).toByte)
    marker(0xdb, dqt(0, qLum) ++ (if (channels == 3) dqt(1, qChrom) else Array.emptyByteArray))
    // SOF0
    val sof = new Array[Byte](6 + 3 * channels)
    sof(0) = 8
    sof(1) = ((height >> 8) & 0xff).toByte; sof(2) = (height & 0xff).toByte
    sof(3) = ((width >> 8) & 0xff).toByte; sof(4) = (width & 0xff).toByte
    sof(5) = channels.toByte
    sof(6) = 1; sof(7) = ((h0 << 4) | v0).toByte; sof(8) = 0
    if (channels == 3) {
      sof(9) = 2; sof(10) = 0x11; sof(11) = 1
      sof(12) = 3; sof(13) = 0x11; sof(14) = 1
    }
    marker(0xc0, sof)
    // DHT
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Byte]): Array[Byte] =
      Array(((cls << 4) | id).toByte) ++ (1 to 16).map(l => bits(l).toByte) ++ vals
    marker(0xc4, dht(0, 0, DcLumBits, DcLumVals) ++ dht(1, 0, AcLumBits, AcLumVals) ++
      (if (channels == 3) dht(0, 1, DcChromBits, DcChromVals) ++ dht(1, 1, AcChromBits, AcChromVals)
       else Array.emptyByteArray))
    if (restartInterval > 0)
      marker(0xdd, Array(((restartInterval >> 8) & 0xff).toByte,
        (restartInterval & 0xff).toByte))
    // SOS
    val sos = new Array[Byte](1 + 2 * channels + 3)
    sos(0) = channels.toByte
    sos(1) = 1; sos(2) = 0x00
    if (channels == 3) { sos(3) = 2; sos(4) = 0x11; sos(5) = 3; sos(6) = 0x11 }
    sos(1 + 2 * channels + 1) = 63
    marker(0xda, sos)

    val dcLum = encTable(DcLumBits, DcLumVals)
    val acLum = encTable(AcLumBits, AcLumVals)
    val dcChrom = encTable(DcChromBits, DcChromVals)
    val acChrom = encTable(AcChromBits, AcChromVals)
    val w = new BitWriter(out)
    val blk = new Array[Double](64)
    val scratch = new Array[Double](64)
    val dcPred = new Array[Int](3)

    def magnitude(v: Int): Int = {
      var s = 0
      var a = math.abs(v)
      while (a > 0) { a >>= 1; s += 1 }
      s
    }
    def putSym(tab: Array[Int], sym: Int): Unit = {
      val e = tab(sym)
      w.put(e & 0xffff, e >> 16)
    }
    def encodeBlock(plane: Array[Double], pw: Int, px0: Int, py0: Int,
        q: Array[Int], dcTab: Array[Int], acTab: Array[Int], ci: Int): Unit = {
      var k = 0
      while (k < 64) { blk(k) = plane((py0 + k / 8) * pw + (px0 + k % 8)); k += 1 }
      fdct8x8(blk, scratch)
      val coef = new Array[Int](64)
      k = 0
      while (k < 64) {
        coef(k) = math.round(blk(k) / q(k)).toInt
        k += 1
      }
      val dcDiff = coef(0) - dcPred(ci)
      dcPred(ci) = coef(0)
      val dcSize = magnitude(dcDiff)
      putSym(dcTab, dcSize)
      if (dcSize > 0)
        w.put(if (dcDiff < 0) dcDiff + (1 << dcSize) - 1 else dcDiff, dcSize)
      var run = 0
      k = 1
      while (k < 64) {
        val v = coef(Zigzag(k))
        if (v == 0) run += 1
        else {
          while (run >= 16) { putSym(acTab, 0xf0); run -= 16 } // ZRL
          val size = magnitude(v)
          putSym(acTab, (run << 4) | size)
          w.put(if (v < 0) v + (1 << size) - 1 else v, size)
          run = 0
        }
        k += 1
      }
      if (run > 0) putSym(acTab, 0x00) // EOB
    }

    var my = 0
    var mcu = 0
    var rst = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          w.restartMarker(rst)
          rst += 1
          java.util.Arrays.fill(dcPred, 0) // DC predictors reset at restart
        }
        var by = 0
        while (by < v0) {
          var bx = 0
          while (bx < h0) {
            encodeBlock(yP, yW, (mx * h0 + bx) * 8, (my * v0 + by) * 8, qLum, dcLum, acLum, 0)
            bx += 1
          }
          by += 1
        }
        if (channels == 3) {
          encodeBlock(cbP, cW, mx * 8, my * 8, qChrom, dcChrom, acChrom, 1)
          encodeBlock(crP, cW, mx * 8, my * 8, qChrom, dcChrom, acChrom, 2)
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    w.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
