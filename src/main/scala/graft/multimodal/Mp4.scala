package graft.multimodal

import scala.collection.mutable

/** Pure-JVM ISO-BMFF (MP4) container parse — the video face of the
  * multimodal column (SURVEY.md §2.8: image/audio/VIDEO as opaque binary
  * columns with typed metadata). No codec is decoded (no H.264 in this
  * container, by design); what IS real is everything a 100-TB video
  * pipeline needs from the container:
  *
  *  - box-tree walk (size+type headers, 64-bit largesize, nesting),
  *  - per-track geometry: handler (vide/soun), tkhd presentation size
  *    (16.16 fixed point), mdhd timescale/duration,
  *  - the full sample-table math: `stsz` sample sizes, `stsc`
  *    sample-to-chunk runs, `stco`/`co64` chunk offsets, `stts` time
  *    deltas — composed into exact per-sample (offset, size, pts) byte
  *    ranges inside `mdat`, which is precisely the "frame sample" read
  *    pattern a distributed frame extractor pushes to object storage as
  *    ranged GETs.
  *
  * Truncated or inconsistent structures throw; [[Multimodal.decode]]'s
  * per-record degrade turns that into a stub record, never a dead task.
  */
object Mp4 {

  final case class Track(
      handler: String, // "vide" / "soun" / other 4cc
      width: Int, height: Int, // tkhd presentation size (rounded 16.16)
      timescale: Long, duration: Long, // mdhd
      sampleSizes: Array[Long], // stsz (expanded if constant)
      chunkOffsets: Array[Long], // stco / co64
      sampleToChunk: Array[(Long, Long)], // stsc runs: (firstChunk, samplesPerChunk)
      timeDeltas: Array[(Long, Long)]) { // stts runs: (count, delta)

    def sampleCount: Int = sampleSizes.length

    /** Exact byte range of every sample: chunk base (stco) + sum of the
      * preceding samples' sizes within the chunk (stsc run expansion).
      */
    def sampleRanges: Array[(Long, Long)] = {
      val out = new Array[(Long, Long)](sampleSizes.length)
      var sample = 0
      var runIdx = 0
      var chunk = 0
      while (sample < sampleSizes.length && chunk < chunkOffsets.length) {
        // samples-per-chunk for THIS chunk: the last stsc run whose
        // firstChunk <= chunk+1
        while (runIdx + 1 < sampleToChunk.length &&
          sampleToChunk(runIdx + 1)._1 <= chunk + 1) runIdx += 1
        val perChunk = sampleToChunk(runIdx)._2.toInt
        var off = chunkOffsets(chunk)
        var i = 0
        while (i < perChunk && sample < sampleSizes.length) {
          out(sample) = (off, sampleSizes(sample))
          off += sampleSizes(sample)
          sample += 1
          i += 1
        }
        chunk += 1
      }
      require(sample == sampleSizes.length,
        s"stsc/stco tables cover $sample of ${sampleSizes.length} samples")
      out
    }

    /** Presentation timestamps (in timescale units) per sample from the
      * stts run-length table.
      */
    def sampleTimes: Array[Long] = {
      val out = new Array[Long](sampleSizes.length)
      var t = 0L
      var sample = 0
      timeDeltas.foreach { case (count, delta) =>
        var i = 0L
        while (i < count && sample < out.length) {
          out(sample) = t; t += delta; sample += 1; i += 1
        }
      }
      out
    }
  }

  final case class Mp4Info(brand: String, tracks: Seq[Track]) {
    def videoTrack: Option[Track] = tracks.find(_.handler == "vide")
  }

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "ISO-8859-1")

  /** (boxType, payloadStart, payloadEnd, nextBoxStart) or None at EOF. */
  private def box(b: Array[Byte], o: Int, limit: Int): Option[(String, Int, Int, Int)] = {
    if (o + 8 > limit) return None
    var size = be32(b, o)
    val typ = fourcc(b, o + 4)
    var payload = o + 8
    if (size == 1) { // 64-bit largesize
      require(o + 16 <= limit, "truncated largesize box")
      size = be64(b, o + 8)
      payload = o + 16
    } else if (size == 0) size = (limit - o).toLong // box extends to EOF
    require(size >= (payload - o) && o + size <= limit,
      s"box $typ size $size escapes its container")
    Some((typ, payload, o + size.toInt, o + size.toInt))
  }

  private def children(b: Array[Byte], from: Int, until: Int): Seq[(String, Int, Int)] = {
    val out = mutable.ArrayBuffer.empty[(String, Int, Int)]
    var o = from
    while (o < until) box(b, o, until) match {
      case Some((t, p, e, n)) => out += ((t, p, e)); o = n
      case None => o = until
    }
    out.toSeq
  }

  /** Structural sniff: leading `ftyp`, and the top-level box chain tiles
    * the buffer exactly. Random bytes cannot satisfy both.
    */
  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 16 && fourcc(b, 4) == "ftyp" &&
      (try { parse(b); true } catch { case _: Exception => false })

  def parse(b: Array[Byte]): Mp4Info = {
    val top = children(b, 0, b.length)
    require(top.nonEmpty && top.head._1 == "ftyp", "not an ISO-BMFF file")
    val brand = fourcc(b, top.head._2)
    val tracks = top.collectFirst { case ("moov", p, e) => children(b, p, e) }
      .getOrElse(Seq.empty)
      .collect { case ("trak", p, e) => parseTrak(b, p, e) }
    Mp4Info(brand, tracks)
  }

  private def parseTrak(b: Array[Byte], from: Int, until: Int): Track = {
    var width = 0; var height = 0
    var handler = "????"
    var timescale = 0L; var duration = 0L
    var sizes: Array[Long] = Array.empty
    var offsets: Array[Long] = Array.empty
    var stsc: Array[(Long, Long)] = Array.empty
    var stts: Array[(Long, Long)] = Array.empty

    children(b, from, until).foreach {
      case ("tkhd", p, _) =>
        val version = b(p) & 0xff
        // width/height are the LAST two 16.16 fields of tkhd
        val base = p + (if (version == 1) 4 + 8 + 8 + 4 + 8 else 4 + 4 + 4 + 4 + 4) +
          4 + 8 + 2 + 2 + 2 + 2 + 36
        width = (be32(b, base) >> 16).toInt
        height = (be32(b, base + 4) >> 16).toInt
      case ("mdia", p, e) =>
        children(b, p, e).foreach {
          case ("mdhd", mp, _) =>
            val version = b(mp) & 0xff
            if (version == 1) { timescale = be32(b, mp + 20); duration = be64(b, mp + 24) }
            else { timescale = be32(b, mp + 12); duration = be32(b, mp + 16) }
          case ("hdlr", hp, _) => handler = fourcc(b, hp + 8)
          case ("minf", ip, ie) =>
            children(b, ip, ie).foreach {
              case ("stbl", sp, se) =>
                children(b, sp, se).foreach {
                  case ("stsz", zp, _) =>
                    val constSize = be32(b, zp + 4)
                    val n = be32(b, zp + 8).toInt
                    sizes =
                      if (constSize != 0) Array.fill(n)(constSize)
                      else Array.tabulate(n)(i => be32(b, zp + 12 + 4 * i))
                  case ("stco", cp, _) =>
                    val n = be32(b, cp + 4).toInt
                    offsets = Array.tabulate(n)(i => be32(b, cp + 8 + 4 * i))
                  case ("co64", cp, _) =>
                    val n = be32(b, cp + 4).toInt
                    offsets = Array.tabulate(n)(i => be64(b, cp + 8 + 8 * i))
                  case ("stsc", scp, _) =>
                    val n = be32(b, scp + 4).toInt
                    stsc = Array.tabulate(n)(i =>
                      (be32(b, scp + 8 + 12 * i), be32(b, scp + 12 + 12 * i)))
                  case ("stts", tp, _) =>
                    val n = be32(b, tp + 4).toInt
                    stts = Array.tabulate(n)(i =>
                      (be32(b, tp + 8 + 8 * i), be32(b, tp + 12 + 8 * i)))
                  case _ => ()
                }
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    Track(handler, width, height, timescale, duration, sizes, offsets, stsc, stts)
  }

  // ---- fixture encoder: a minimal but STRUCTURALLY VALID MP4 so tests
  // can round-trip the sample-table math without shipping binaries ----

  private def u32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def boxBytes(typ: String, payload: Array[Byte]): Array[Byte] =
    u32(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload

  /** Build a one-video-track MP4 whose mdat holds the given frames,
    * chunked `framesPerChunk` at a time. Deterministic; parseable by this
    * object AND by any ISO-BMFF reader.
    */
  def build(width: Int, height: Int, timescale: Long, frameDelta: Long,
      frames: Seq[Array[Byte]], framesPerChunk: Int = 2): Array[Byte] = {
    val ftyp = boxBytes("ftyp", "isom".getBytes ++ u32(512) ++ "isomiso2".getBytes)
    // layout: ftyp ++ moov ++ mdat; chunk offsets point into mdat payload,
    // so build moov with a placeholder, measure, then rebuild
    def moov(chunkOffsets: Seq[Long]): Array[Byte] = {
      val tkhd = boxBytes("tkhd", Array.fill[Byte](4)(0) ++ // version+flags
        u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(0) ++ // times, id
        Array.fill[Byte](8 + 2 + 2 + 2 + 2 + 36)(0) ++
        u32(width.toLong << 16) ++ u32(height.toLong << 16))
      val mdhd = boxBytes("mdhd", Array.fill[Byte](4)(0) ++ u32(0) ++ u32(0) ++
        u32(timescale) ++ u32(frameDelta * frames.length) ++ u32(0x55c40000L))
      val hdlr = boxBytes("hdlr", Array.fill[Byte](8)(0) ++ "vide".getBytes ++
        Array.fill[Byte](12)(0) ++ "g ".getBytes)
      val stsd = boxBytes("stsd", Array.fill[Byte](4)(0) ++ u32(0))
      val stts = boxBytes("stts", Array.fill[Byte](4)(0) ++ u32(1) ++
        u32(frames.length.toLong) ++ u32(frameDelta))
      val nChunks = (frames.length + framesPerChunk - 1) / framesPerChunk
      val lastChunkFrames = frames.length - (nChunks - 1) * framesPerChunk
      val stscRuns =
        if (nChunks == 1 || lastChunkFrames == framesPerChunk)
          Seq((1L, framesPerChunk.toLong))
        else Seq((1L, framesPerChunk.toLong), (nChunks.toLong, lastChunkFrames.toLong))
      val stsc = boxBytes("stsc", Array.fill[Byte](4)(0) ++ u32(stscRuns.length.toLong) ++
        stscRuns.flatMap { case (f, s) => u32(f) ++ u32(s) ++ u32(1) }.toArray)
      val stsz = boxBytes("stsz", Array.fill[Byte](4)(0) ++ u32(0) ++
        u32(frames.length.toLong) ++ frames.flatMap(f => u32(f.length.toLong)).toArray)
      val stco = boxBytes("stco", Array.fill[Byte](4)(0) ++ u32(chunkOffsets.length.toLong) ++
        chunkOffsets.flatMap(u32).toArray)
      val stbl = boxBytes("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
      val minf = boxBytes("minf", stbl)
      val mdia = boxBytes("mdia", mdhd ++ hdlr ++ minf)
      val trak = boxBytes("trak", tkhd ++ mdia)
      val mvhd = boxBytes("mvhd", Array.fill[Byte](4)(0) ++ u32(0) ++ u32(0) ++
        u32(timescale) ++ u32(frameDelta * frames.length) ++ Array.fill[Byte](80)(0))
      boxBytes("moov", mvhd ++ trak)
    }
    val nChunks = (frames.length + framesPerChunk - 1) / framesPerChunk
    val provisional = moov(Seq.fill(nChunks)(0L))
    val mdatPayloadStart = ftyp.length + provisional.length + 8L
    val chunkOffsets = mutable.ArrayBuffer.empty[Long]
    var off = mdatPayloadStart
    frames.grouped(framesPerChunk).foreach { chunk =>
      chunkOffsets += off
      off += chunk.map(_.length.toLong).sum
    }
    val mdat = boxBytes("mdat", frames.flatten.toArray)
    val out = ftyp ++ moov(chunkOffsets.toSeq) ++ mdat
    require(out.length.toLong == off, s"layout math: ${out.length} != $off")
    out
  }
}
