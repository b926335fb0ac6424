package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal binary-column plumbing (SURVEY.md §2.8): schema shape, the
  * deterministic decode stub, frame sampling.
  */
class MultimodalSpec extends SparkSpec {

  private def media() = Multimodal.attachBinary(
    Tables.load(spark, sf, "documents").limit(100), "doc_id", "text")

  test("attachBinary produces binary payload + typed metadata struct") {
    val m = media()
    assert(m.schema("payload").dataType === BinaryType)
    val meta = m.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta("format").dataType === StringType)
    assert(meta("n_bytes").dataType === LongType)
    // n_bytes metadata must equal the actual payload length
    val bad = m.filter(length(col("payload")).cast("long") =!= col("meta.n_bytes")).count()
    assert(bad === 0)
  }

  test("decodeStub is deterministic, partition-parallel, and typed") {
    val d1 = Multimodal.decodeStub(spark, media()).collect().sortBy(_.id)
    val d2 = Multimodal.decodeStub(spark, media().repartition(7)).collect().sortBy(_.id)
    assert(d1.length === 100)
    assert(d1.toSeq === d2.toSeq) // same results regardless of partitioning
    assert(d1.forall(m => m.width >= 64 && m.height >= 64 && m.channels === 3))
    assert(d1.map(_.checksum).distinct.length > 90) // content-derived, not constant
  }

  test("decode really parses fixture-generated BMP and PPM payloads") {
    import spark.implicits._
    // 5x3 gradient image, encoded both ways — identical pixels
    val (w, h) = (5, 3)
    val rgb = Array.tabulate(w * h * 3)(i => (i * 7 % 251).toByte)
    val bmp = Multimodal.encodeBmp24(w, h, rgb)
    val ppm = Multimodal.encodePpm(w, h, rgb)
    val media = Seq(
      (1L, bmp, ("image/bmp", bmp.length.toLong)),
      (2L, ppm, ("image/ppm", ppm.length.toLong)),
      (3L, "plain text payload, no magic".getBytes("UTF-8"), ("fake/raw", 28L)))
      .toDF("id", "payload", "meta")
      .select(col("id"), col("payload"),
        struct(col("meta._1").as("format"), col("meta._2").as("n_bytes")).as("meta"))
    val out = Multimodal.decode(spark, media).collect().sortBy(_.id)
    assert(out.length === 3)
    val Array(db, dp, ds) = out
    // real dimensions, not FNV-derived fakes
    assert((db.width, db.height, db.channels) === ((w, h, 3)))
    assert((dp.width, dp.height, dp.channels) === ((w, h, 3)))
    assert(db.format === "image/bmp" && dp.format === "image/ppm")
    // checksum covers pixel bytes only — same pixels through two container
    // formats (different headers, BMP row padding + BGR order) agree on
    // dimensions; PPM checksum is FNV over the raw rgb bytes
    assert(dp.checksum === {
      var cs = 1469598103934665603L
      rgb.foreach(b => cs = (cs ^ (b & 0xffL)) * 1099511628211L)
      cs
    })
    // non-image payload falls back to the stub (format preserved)
    assert(ds.format === "fake/raw" && ds.width >= 64 && ds.height >= 64)
  }

  test("decode sniffs by structure — text starting with magic is not an image") {
    import spark.implicits._
    val fakeBm = "BM this text merely starts with the BMP magic bytes and is long enough to clear the 54-byte header minimum easily".getBytes("UTF-8")
    val fakeP6 = "P6 is a nice format, this text even has whitespace after the magic".getBytes("UTF-8")
    val media = Seq((1L, fakeBm, ("text", fakeBm.length.toLong)), (2L, fakeP6, ("text", fakeP6.length.toLong)))
      .toDF("id", "payload", "meta")
      .select(col("id"), col("payload"),
        struct(col("meta._1").as("format"), col("meta._2").as("n_bytes")).as("meta"))
    val out = Multimodal.decode(spark, media).collect()
    assert(out.forall(_.format === "text")) // both routed to the stub, no parse attempt
  }

  private def fnvOf(bytes: Array[Byte]): Long = {
    var cs = 1469598103934665603L
    bytes.foreach(b => cs = (cs ^ (b & 0xffL)) * 1099511628211L)
    cs
  }

  private def asMedia(rows: Seq[(Long, Array[Byte], String)]) = {
    import spark.implicits._
    rows.map { case (id, b, f) => (id, b, (f, b.length.toLong)) }
      .toDF("id", "payload", "meta")
      .select(col("id"), col("payload"),
        struct(col("meta._1").as("format"), col("meta._2").as("n_bytes")).as("meta"))
  }

  test("decode really inflates and un-filters PNG — every filter type, RGB and RGBA") {
    // A 7x5 gradient whose rows exercise real prediction deltas. The same
    // pixels encoded under each per-row filter (None/Sub/Up/Average/Paeth)
    // and both color types must reconstruct to the identical checksum.
    val (w, h) = (7, 5)
    val rgb = Array.tabulate(w * h * 3)(i => (i * 11 % 253).toByte)
    val rgba = Array.tabulate(w * h * 4)(i => (i * 13 % 251).toByte)
    val gray = Array.tabulate(w * h)(i => (i * 17 % 249).toByte)
    val rows = (0 to 4).map(f =>
      (f.toLong, Multimodal.encodePng(w, h, rgb, 3, f), "image/png")) ++ Seq(
      (10L, Multimodal.encodePng(w, h, rgba, 4, 4), "image/png"),
      (11L, Multimodal.encodePng(w, h, gray, 1, 2), "image/png"))
    val out = Multimodal.decode(spark, asMedia(rows)).collect().sortBy(_.id)
    assert(out.length === 7)
    assert(out.forall(_.format === "image/png"), "all must route to the real PNG parser")
    out.foreach(d => assert((d.width, d.height) === ((w, h))))
    // filters are an encoding detail: all five RGB variants hash identically,
    // to exactly the FNV of the raw pixel bytes
    val rgbOut = out.filter(_.id <= 4)
    assert(rgbOut.forall(_.channels === 3))
    assert(rgbOut.map(_.checksum).distinct.toSeq === Seq(fnvOf(rgb)))
    assert(out.find(_.id == 10L).get.channels === 4)
    assert(out.find(_.id == 10L).get.checksum === fnvOf(rgba))
    assert(out.find(_.id == 11L).get.channels === 1)
    assert(out.find(_.id == 11L).get.checksum === fnvOf(gray))
  }

  test("decode really parses PCM WAV — frames, channels, payload-only checksum") {
    // 2-channel 16-bit PCM, 100 frames: width = frames per channel, height
    // = 1. The checksum covers the data-chunk bytes only.
    val pcm = Array.tabulate(100 * 2 * 2)(i => (i * 31 % 255).toByte)
    val wav = Multimodal.encodeWav(2, 16, 8000, pcm)
    // an undecodable format code (3 = IEEE float) degrades to the HEADER
    // parse: true geometry from the fmt chunk, payload-bytes checksum
    val nonPcm = wav.clone(); nonPcm(20) = 3
    // text shaped like RIFF must not be believed (declared size mismatch)
    val fakeRiff = ("RIFF.WAVEfmt this text is long enough to clear the " +
      "44-byte header minimum easily, padded padded").getBytes("US-ASCII")
    val out = Multimodal.decode(spark, asMedia(Seq(
      (1L, wav, "audio/wav"), (2L, nonPcm, "audio/wav"), (3L, fakeRiff, "text"))))
      .collect().sortBy(_.id)
    val Array(ok, headerOnly, text) = out
    assert(ok.format === "audio/wav")
    assert((ok.width, ok.height, ok.channels) === ((100, 1, 2)))
    assert(ok.checksum === fnvOf(pcm))
    assert((headerOnly.width, headerOnly.height, headerOnly.channels) === ((100, 1, 2)),
      "compressed WAV keeps true header geometry")
    assert(text.format === "text")
  }

  test("G.711 mu-law/A-law WAV: expansion matches the JDK sound codec sample-for-sample") {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    import java.io.ByteArrayInputStream
    // all 256 code points, mono — every row of both expansion tables
    val codes = Array.tabulate(256)(_.toByte)
    def jdkExpand(wav: Array[Byte]): Array[Short] = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
      val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        in.getFormat.getSampleRate, 16, in.getFormat.getChannels,
        2 * in.getFormat.getChannels, in.getFormat.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(pcmFmt, in)
      val bytes = pcm.readAllBytes()
      Array.tabulate(bytes.length / 2)(i =>
        (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort)
    }
    def fnvOfShorts(s: Array[Short]): Long = {
      val b = new Array[Byte](s.length * 2)
      s.zipWithIndex.foreach { case (v, i) =>
        b(2 * i) = (v & 0xff).toByte; b(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      fnvOf(b)
    }
    for ((fmtCode, name) <- Seq(7 -> "mu-law", 6 -> "A-law")) {
      val wav = Multimodal.encodeWav(1, 8, 8000, codes, formatCode = fmtCode)
      val jdk = jdkExpand(wav)
      assert(jdk.length === 256, s"$name referee length")
      val d = Multimodal.decode(spark, asMedia(Seq((1L, wav, "audio/wav")))).collect().head
      assert((d.width, d.height, d.channels) === ((256, 1, 1)), s"$name geometry")
      assert(d.checksum === fnvOfShorts(jdk),
        s"$name expansion must match the JDK codec sample-for-sample")
    }
  }

  test("audio features: real per-channel stats over PCM and G.711 samples") {
    // stereo 16-bit: L = constant +8192 (0.25), R = alternating +/-16384
    // (mean 0, std 0.5) — exact, hand-computable stats
    val frames = 64
    val pcm = new Array[Byte](frames * 2 * 2)
    for (f <- 0 until frames) {
      val l = 8192; val r = if (f % 2 == 0) 16384 else -16384
      pcm(f * 4) = (l & 0xff).toByte; pcm(f * 4 + 1) = ((l >> 8) & 0xff).toByte
      pcm(f * 4 + 2) = (r & 0xff).toByte; pcm(f * 4 + 3) = ((r >> 8) & 0xff).toByte
    }
    val f = Multimodal.features(spark,
      asMedia(Seq((1L, Multimodal.encodeWav(2, 16, 8000, pcm), "audio/wav"))))
      .collect().head
    assert(f.decoded, "PCM WAV features must run on real samples now")
    assert((f.width, f.height, f.channels) === ((frames, 1, 2)))
    assert(math.abs(f.chanMean(0) - 0.25) < 1e-6 && math.abs(f.chanMean(1)) < 1e-6,
      f.chanMean.toSeq.toString)
    assert(math.abs(f.chanStd(0)) < 1e-6 && math.abs(f.chanStd(1) - 0.5) < 1e-6,
      f.chanStd.toSeq.toString)
    // amplitude histogram: |0.25| → bin 2, |0.5| → bin 4, half the samples each
    assert(math.abs(f.lumaHist(2) - 0.5) < 1e-6 && math.abs(f.lumaHist(4) - 0.5) < 1e-6,
      f.lumaHist.toSeq.toString)
    // G.711 goes through the same real-feature path
    val g = Multimodal.features(spark, asMedia(Seq(
      (2L, Multimodal.encodeWav(1, 8, 8000,
        Array.tabulate(128)(_.toByte), formatCode = 7), "audio/wav"))))
      .collect().head
    assert(g.decoded && g.channels === 1 && g.chanStd(0) > 0.0)
    // an empty data chunk has nothing to featurize: stub path, never
    // decoded=true with NaN stats
    val empty = Multimodal.features(spark, asMedia(Seq(
      (3L, Multimodal.encodeWav(2, 16, 8000, Array.emptyByteArray), "audio/wav"))))
      .collect().head
    assert(!empty.decoded, "zero-frame WAV must not claim decoded features")
    assert(empty.chanMean.forall(v => !v.isNaN) && empty.chanStd.forall(v => !v.isNaN))
  }

  test("MP3: frame-walk geometry, re-tag-invariant checksum, no false sniffs") {
    // synthetic MPEG-1 Layer III frames: 128 kbps, 44100 Hz, stereo →
    // frame length 417+padding; zeroed payloads are structurally valid
    def frame(padding: Int): Array[Byte] = {
      val len = 144 * 128000 / 44100 + padding
      val f = new Array[Byte](len)
      f(0) = 0xff.toByte
      f(1) = 0xfb.toByte // MPEG1, Layer III, no CRC
      f(2) = ((9 << 4) | (0 << 2) | (padding << 1)).toByte // 128kbps, 44.1k
      f(3) = 0x00 // stereo
      f
    }
    val audio = frame(0) ++ frame(1) ++ frame(0)
    val d = Multimodal.decode(spark, asMedia(Seq((1L, audio, "audio/mpeg")))).collect().head
    assert(d.format === "audio/mpeg")
    assert((d.width, d.height, d.channels) === ((3 * 1152, 1, 2)),
      "3 frames x 1152 samples, stereo")
    // an ID3v2 tag in front (re-tagging) must not change the checksum
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 100) ++ new Array[Byte](100)
    val tagged = id3 ++ audio
    val dt = Multimodal.decode(spark, asMedia(Seq((2L, tagged, "audio/mpeg")))).collect().head
    assert((dt.width, dt.channels) === ((3 * 1152, 2)))
    assert(dt.checksum === d.checksum, "ID3v2 container metadata excluded from hash")
    // ID3v2.4 with the footer flag (header flag byte bit 4): total tag is
    // 10 (header) + size + 10 (trailing footer, NOT counted in the size
    // field) — the same audio re-tagged with a footer must hash identically
    val id3Footer = "ID3".getBytes ++ Array[Byte](4, 0, 0x10, 0, 0, 0, 100) ++
      new Array[Byte](100) ++
      "3DI".getBytes ++ Array[Byte](4, 0, 0x10, 0, 0, 0, 100)
    val taggedF = id3Footer ++ audio
    val dtf = Multimodal.decode(spark, asMedia(Seq((4L, taggedF, "audio/mpeg")))).collect().head
    assert((dtf.width, dtf.channels) === ((3 * 1152, 2)))
    assert(dtf.checksum === d.checksum,
      "ID3v2.4 footer is container metadata too — checksum must not move")
    // features agree on the geometry through the header parse
    val ft = Multimodal.features(spark, asMedia(Seq((2L, tagged, "audio/mpeg")))).collect().head
    assert(!ft.decoded && (ft.width, ft.channels) === ((3 * 1152, 2)))
    // a single stray sync word in text must NOT sniff as MP3 (needs a chain)
    val noise = ("x" * 100).getBytes ++ Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0.toByte) ++
      ("y" * 500).getBytes
    val dn = Multimodal.decode(spark, asMedia(Seq((3L, noise, "text")))).collect().head
    assert(dn.format === "text", "unchained sync must stay a stub")
  }

  test("decode parses JPEG headers — true geometry, scan-only checksum, pixel decode honestly absent") {
    val scan = Array.tabulate(300)(i => (i % 200).toByte) // FF-free entropy payload
    val jpg = Multimodal.encodeJpegShell(640, 480, 3, scan)
    // the same frame re-tagged (an extra APP1/EXIF segment before SOF) must
    // hash identically — container metadata is excluded from the checksum
    val exif = Array[Byte](0xff.toByte, 0xe1.toByte, 0, 8, 'E', 'x', 'i', 'f', 0, 0)
    val tagged = jpg.take(2) ++ exif ++ jpg.drop(2)
    // text shaped like the SOI magic must fail the marker-chain walk
    val fake = (Array(0xff, 0xd8, 0xff).map(_.toByte) ++
      "not actually a jpeg, just bytes".getBytes("US-ASCII"))
    // truncated mid-SOF degrades to the stub
    val cut = jpg.take(12)
    val out = Multimodal.decode(spark, asMedia(Seq(
      (1L, jpg, "image/jpeg"), (2L, tagged, "image/jpeg"),
      (3L, fake, "text"), (4L, cut, "image/jpeg"))))
      .collect().sortBy(_.id)
    val Array(ok, retagged, text, stubbed) = out
    assert((ok.format, ok.width, ok.height, ok.channels) === (("image/jpeg", 640, 480, 3)))
    assert(ok.checksum === fnvOf(scan))
    assert(retagged.checksum === ok.checksum, "re-tagging must not change the scan hash")
    assert((retagged.width, retagged.height) === ((640, 480)))
    assert(text.format === "text")
    assert(stubbed.width >= 64 && stubbed.height >= 64) // stub-shaped
  }

  test("corrupt or unsupported payloads degrade to the stub, never fail the task") {
    // Each payload passes (or nearly passes) a sniff, then fails its parser.
    val (w, h) = (5, 3)
    val rgb = Array.tabulate(w * h * 3)(i => (i * 7 % 251).toByte)
    val bmp = Multimodal.encodeBmp24(w, h, rgb)
    // lying BMP header: declare RLE8 compression (field at offset 30)
    val rle = bmp.clone(); rle(30) = 1
    // lying BMP header: pixel offset way past the end of the buffer
    val oob = bmp.clone(); oob(10) = 0x7f.toByte; oob(11) = 0x7f.toByte
    // lying BMP header: negative width (would yield a garbage record, not a
    // crash, if the decoder skipped dimension validation)
    val negw = bmp.clone(); negw(18) = 0xfb.toByte; negw(19) = 0xff.toByte
    negw(20) = 0xff.toByte; negw(21) = 0xff.toByte
    // lying BMP header: height far beyond what the payload holds
    val tallh = bmp.clone(); tallh(22) = 0xff.toByte; tallh(23) = 0x7f.toByte
    // truncated PNG: valid signature+IHDR, IDAT cut short
    val png = Multimodal.encodePng(w, h, rgb)
    val cut = png.take(png.length - 20)
    // interlaced PNG: flip the IHDR interlace byte (offset 8+4+4+12 = 28)
    val adam7 = png.clone(); adam7(28) = 1
    val out = Multimodal.decode(spark, asMedia(Seq(
      (1L, rle, "image/bmp"), (2L, oob, "image/bmp"),
      (3L, cut, "image/png"), (4L, adam7, "image/png"),
      (5L, negw, "image/bmp"), (6L, tallh, "image/bmp"))))
      .collect().sortBy(_.id)
    assert(out.length === 6, "no record may be dropped or fail the job")
    // all four fell back to the stub: format preserved from metadata,
    // stub-shaped dimensions
    assert(out.forall(d => d.format == "image/bmp" || d.format == "image/png"))
    assert(out.forall(d => d.width >= 64 && d.height >= 64 && d.channels == 3))
    // and an intact payload in the same batch still parses for real
    val okOut = Multimodal.decode(spark, asMedia(Seq((9L, png, "image/png"))))
      .collect().head
    assert((okOut.width, okOut.height, okOut.checksum) === ((w, h, fnvOf(rgb))))
  }

  test("PNG round-trip property: random geometry x channels x filter reconstructs exact pixels") {
    // encoder and decoder are independent implementations of the PNG spec
    // (filter inverse vs reconstruction); agreeing on random content across
    // the full filter x channel grid is strong evidence both are right.
    val rnd = new scala.util.Random(20260812L)
    val cases = for {
      filter <- 0 to 4
      channels <- Seq(1, 3, 4)
    } yield {
      val w = 1 + rnd.nextInt(12)
      val h = 1 + rnd.nextInt(9)
      val px = Array.fill(w * h * channels)(rnd.nextInt(256).toByte)
      (filter.toLong * 10 + channels, w, h, channels, px)
    }
    val payloads = cases.map { case (id, w, h, c, px) =>
      (id, Multimodal.encodePng(w, h, px, c, (id / 10).toInt), "image/png")
    }
    val out = Multimodal.decode(spark, asMedia(payloads)).collect()
      .map(d => d.id -> d).toMap
    cases.foreach { case (id, w, h, c, px) =>
      val d = out(id)
      assert((d.format, d.width, d.height, d.channels) === (("image/png", w, h, c)),
        s"case $id geometry")
      assert(d.checksum === fnvOf(px), s"case $id pixel reconstruction")
    }
  }

  test("PNG extended layouts: palette/tRNS, sub-byte gray, 16-bit, gray+alpha — vs ImageIO") {
    import java.io.ByteArrayInputStream
    def imageIo(b: Array[Byte]) = javax.imageio.ImageIO.read(new ByteArrayInputStream(b))
    def decode(b: Array[Byte]) = {
      val d = Multimodal.decode(spark, asMedia(Seq((1L, b, "image/png")))).collect().head
      assert(d.format === "image/png")
      d
    }
    // --- palette 8-bit, no alpha: 4-color 4x2, expanded to RGB
    val pal = Array[Byte](
      255.toByte, 0, 0, /**/ 0, 255.toByte, 0, /**/ 0, 0, 255.toByte, /**/
      10, 20, 30)
    val idx8 = Array[Byte](0, 1, 2, 3, 3, 2, 1, 0)
    val palPng = Multimodal.encodePngRaw(4, 2, 8, 3, idx8, palette = pal)
    val d1 = decode(palPng)
    assert((d1.width, d1.height, d1.channels) === ((4, 2, 3)))
    val expectedRgb = idx8.flatMap(i => pal.slice(i * 3, i * 3 + 3))
    assert(d1.checksum === fnvOf(expectedRgb), "palette expands through PLTE")
    val img1 = imageIo(palPng)
    assert((img1.getRGB(0, 0) & 0xffffff) === 0xff0000 &&
      (img1.getRGB(3, 0) & 0xffffff) === ((10 << 16) | (20 << 8) | 30),
      "ImageIO agrees on the palette colors")
    // --- palette 4-bit packed + tRNS alpha → RGBA
    val idx4 = Array[Byte](0x01, 0x23.toByte, 0x32, 0x10) // 2 rows of 0,1,2,3 / 3,2,1,0
    val trns = Array[Byte](0, 100, 200.toByte, 255.toByte)
    val pal4Png = Multimodal.encodePngRaw(4, 2, 4, 3, idx4, palette = pal, trns = trns)
    val d2 = decode(pal4Png)
    assert((d2.width, d2.height, d2.channels) === ((4, 2, 4)))
    val expectedRgba = Array[Byte](0, 1, 2, 3, 3, 2, 1, 0).flatMap(i =>
      pal.slice(i * 3, i * 3 + 3) :+ trns(i))
    assert(d2.checksum === fnvOf(expectedRgba), "4-bit indices unpack, tRNS rides as alpha")
    val img2 = imageIo(pal4Png)
    assert(((img2.getRGB(0, 0) >>> 24) === 0) && ((img2.getRGB(3, 0) >>> 24) === 255),
      "ImageIO agrees on tRNS alpha")
    // --- 1-bit grayscale scales to 0/255
    val g1 = Multimodal.encodePngRaw(8, 2, 1, 0, Array[Byte](0xAA.toByte, 0x55))
    val d3 = decode(g1)
    assert((d3.width, d3.height, d3.channels) === ((8, 2, 1)))
    val expectedG1 = "1010101001010101".map(c => if (c == '1') 255.toByte else 0.toByte).toArray
    assert(d3.checksum === fnvOf(expectedG1))
    val img3 = imageIo(g1)
    assert((img3.getRGB(0, 0) & 0xff) === 255 && (img3.getRGB(1, 0) & 0xff) === 0)
    // --- 16-bit RGB reduces to the high byte
    val px16 = Array.tabulate(2 * 1 * 3 * 2) { i =>
      (if (i % 2 == 0) (i * 17 + 3) & 0xff else 0x7f).toByte // (hi, lo) pairs
    }
    val rgb16 = Multimodal.encodePngRaw(2, 1, 16, 2, px16)
    val d4 = decode(rgb16)
    assert((d4.width, d4.height, d4.channels) === ((2, 1, 3)))
    val expected16 = Array.tabulate(6)(i => px16(i * 2))
    assert(d4.checksum === fnvOf(expected16), "16-bit samples reduce to high byte")
    val img4 = imageIo(rgb16)
    // ImageIO converts 16→8 by /257 (vs our >>8): both equal the high byte ±1
    assert(math.abs(((img4.getRGB(0, 0) >> 16) & 0xff) - (expected16(0) & 0xff)) <= 1)
    // --- gray+alpha expands to RGBA
    val ga = Multimodal.encodePngRaw(2, 1, 8, 4, Array[Byte](100, 200.toByte, 50, 0))
    val d5 = decode(ga)
    assert((d5.width, d5.height, d5.channels) === ((2, 1, 4)))
    assert(d5.checksum === fnvOf(Array[Byte](
      100, 100, 100, 200.toByte, 50, 50, 50, 0)))
    val img5 = imageIo(ga)
    assert((img5.getRGB(0, 0) >>> 24) === 200 && (img5.getRGB(1, 0) >>> 24) === 0)
    // --- palette index out of range degrades (stub), never kills the task
    val bad = Multimodal.encodePngRaw(4, 2, 8, 3,
      Array[Byte](0, 1, 2, 9, 9, 2, 1, 0), palette = pal)
    val db = Multimodal.decode(spark, asMedia(Seq((9L, bad, "image/png")))).collect().head
    assert(db.id === 9L, "record survives a corrupt palette reference")
  }

  test("Adam7 interlaced PNG: pass gather reconstructs the same pixels as sequential") {
    import java.io.ByteArrayInputStream
    // 13x11 RGB (odd size → every pass partially filled, some pass rows
    // ragged); the interlaced and sequential encodings of the SAME pixels
    // must hash identically — interlacing is transport, not content
    val (w, h) = (13, 11)
    val px = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 251).toByte)
    val seq = Multimodal.encodePngRaw(w, h, 8, 2, px)
    val adam = Multimodal.encodePngRaw(w, h, 8, 2, px, interlace = true)
    assert(adam(28) === 1.toByte, "fixture must really be interlaced (IHDR)")
    // ImageIO referee FIRST: proves the scatter-side fixture is a valid
    // interlaced PNG of exactly `px` before blaming the decoder
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(adam))
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      assert((img.getRGB(x, y) & 0xffffff) ===
        (((px(d) & 0xff) << 16) | ((px(d + 1) & 0xff) << 8) | (px(d + 2) & 0xff)),
        s"ImageIO disagrees at ($x,$y)")
    }
    val out = Multimodal.decode(spark, asMedia(Seq(
      (1L, seq, "image/png"), (2L, adam, "image/png")))).collect()
      .map(d => d.id -> d).toMap
    assert((out(1L).width, out(1L).height, out(1L).channels) === ((w, h, 3)))
    assert(out(1L).checksum === fnvOf(px), "sequential baseline")
    assert(out(2L).checksum === out(1L).checksum,
      "interlaced must reconstruct the identical pixels")
    // interlaced + sub-byte palette (bit-packed ragged pass rows)
    val pal = Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte, 9, 9, 9)
    val wp = 9; val hp = 5
    val idx = Array.tabulate(wp * hp)(i => (i % 4).toByte)
    // pack 2-bit indices MSB-first into ceil(9*2/8)=3 bytes per row
    val rowBytes = (wp * 2 + 7) / 8
    val packed = new Array[Byte](rowBytes * hp)
    for (y <- 0 until hp; x <- 0 until wp) {
      val bit = x * 2
      val sh = 8 - 2 - (bit & 7)
      packed(y * rowBytes + (bit >> 3)) =
        (packed(y * rowBytes + (bit >> 3)) | (idx(y * wp + x) << sh)).toByte
    }
    val adamPal = Multimodal.encodePngRaw(wp, hp, 2, 3, packed, palette = pal,
      interlace = true)
    val dp = Multimodal.decode(spark, asMedia(Seq((3L, adamPal, "image/png"))))
      .collect().head
    assert((dp.width, dp.height, dp.channels) === ((wp, hp, 3)))
    val expected = idx.flatMap(i => pal.slice(i * 3, i * 3 + 3))
    assert(dp.checksum === fnvOf(expected), "interlaced 2-bit palette gathers correctly")
  }

  test("features extracts real per-channel stats and luminance histogram from pixels") {
    // 2x2 image: two pure-red, two pure-blue pixels → mean (127.5, 0, 127.5)
    val px = Array[Byte](
      255.toByte, 0, 0, /**/ 255.toByte, 0, 0,
      0, 0, 255.toByte, /**/ 0, 0, 255.toByte)
    val png = Multimodal.encodePng(2, 2, px)
    val bmp = Multimodal.encodeBmp24(2, 2, px)
    // constant gray image → std 0, hist concentrated in one bin
    val gray = Multimodal.encodePng(3, 3, Array.fill(9)(100.toByte), channels = 1)
    val out = Multimodal.features(spark, asMedia(Seq(
      (1L, png, "image/png"), (2L, bmp, "image/bmp"),
      (3L, gray, "image/png"), (4L, "just text".getBytes, "text"))))
      .collect().map(d => d.id -> d).toMap
    Seq(out(1L), out(2L)).foreach { f =>
      assert(f.decoded && f.channels === 3)
      assert(f.chanMean.map(math.round) === Array(128L, 0L, 128L)) // 127.5 each
      assert(f.chanStd(1) === 0.0 && f.chanStd(0) > 100.0)
    }
    // png and bmp routes must agree exactly — same pixels, same features
    assert(out(1L).chanMean === out(2L).chanMean)
    assert(out(1L).lumaHist === out(2L).lumaHist)
    val g = out(3L)
    assert(g.decoded && g.channels === 1 && g.chanMean === Array(100.0) &&
      g.chanStd === Array(0.0))
    assert(g.lumaHist(3) === 1.0 && g.lumaHist.sum === 1.0) // 100/32 = bin 3
    assert(!out(4L).decoded && out(4L).lumaHist.sum === 1.0) // stub shape holds
  }

  test("resize box-averages real pixels and re-encodes PNG; undecodable passes through") {
    // 4x2 checker of (200,0,0) and (0,0,200) halves → 2x1: each target
    // pixel averages a uniform 2x2 box, so values stay exact
    val left = Array[Byte](200.toByte, 0, 0)
    val right = Array[Byte](0, 0, 200.toByte)
    val row = left ++ left ++ right ++ right
    val src = Multimodal.encodePng(4, 2, row ++ row)
    val out = Multimodal.resize(spark, asMedia(Seq(
      (1L, src, "image/png"), (2L, "not an image".getBytes, "text"))), 2, 1)
      .collect().map(d => d.id -> d).toMap
    val r = out(1L)
    assert(r.decoded && (r.width, r.height, r.channels) === ((2, 1, 3)))
    // the resized payload is itself a valid PNG that decodes to the averages
    val dec = Multimodal.decode(spark, asMedia(Seq((9L, r.payload, "image/png"))))
      .collect().head
    assert((dec.width, dec.height) === ((2, 1)))
    assert(dec.checksum === fnvOf(left ++ right), "uniform boxes must average exactly")
    val pass = out(2L)
    assert(!pass.decoded && (pass.payload sameElements "not an image".getBytes))
  }

  test("features/resize report decode()'s geometry for header-only formats (JPEG, WAV)") {
    // decode() extracts true JPEG geometry from SOF even though pixels stay
    // stubbed — features() and resize() must report the SAME dimensions for
    // the same payload, not stubRecord's pseudo-geometry
    val scan = Array.tabulate(120)(i => (i % 200).toByte)
    val jpg = Multimodal.encodeJpegShell(320, 240, 3, scan)
    // compressed-codec WAV (format 85): undecodable samples, parseable header
    val pcm = Array.tabulate(50 * 2 * 2)(i => (i * 17 % 255).toByte)
    val wav = Multimodal.encodeWav(2, 16, 8000, pcm, formatCode = 85)
    val media = asMedia(Seq(
      (1L, jpg, "image/jpeg"), (2L, wav, "audio/wav"),
      (3L, "no header here".getBytes, "text")))
    val dec = Multimodal.decode(spark, media).collect().map(d => d.id -> d).toMap
    val feat = Multimodal.features(spark, media).collect().map(d => d.id -> d).toMap
    val rez = Multimodal.resize(spark, media, 8, 8).collect().map(d => d.id -> d).toMap
    Seq(1L, 2L).foreach { id =>
      val d = dec(id)
      assert(!feat(id).decoded && !rez(id).decoded)
      assert((feat(id).width, feat(id).height, feat(id).channels) ===
        ((d.width, d.height, d.channels)), s"features/decode geometry for $id")
      assert((rez(id).width, rez(id).height, rez(id).channels) ===
        ((d.width, d.height, d.channels)), s"resize/decode geometry for $id")
      // stub stats arrays track the channel count they claim
      assert(feat(id).chanMean.length === d.channels)
      assert(feat(id).chanStd.length === d.channels)
    }
    assert((dec(1L).width, dec(1L).height, dec(1L).channels) === ((320, 240, 3)))
    assert((dec(2L).width, dec(2L).height, dec(2L).channels) === ((50, 1, 2)))
    // no header at all → pseudo stub geometry, same in both APIs
    assert(feat(3L).width === dec(3L).width && feat(3L).height === dec(3L).height)
    assert((rez(3L).width, rez(3L).height, rez(3L).channels) === ((0, 0, 0)))
    // >4-channel audio in a COMPRESSED codec (format 85 = MP3-in-WAV — no
    // pure-JVM decode): features degrade to stub stats but carry the TRUE
    // channel count from the fmt chunk; std is not an aliased copy of mean
    // bytes (independent seeds per array)
    val wav6 = Multimodal.encodeWav(6, 16, 8000,
      Array.tabulate(30 * 6 * 2)(i => (i * 13 % 251).toByte), formatCode = 85)
    val f6 = Multimodal.features(spark, asMedia(Seq((7L, wav6, "audio/wav"))))
      .collect().head
    assert(!f6.decoded && f6.channels === 6)
    assert(f6.chanMean.length === 6 && f6.chanStd.length === 6)
    assert(!(f6.chanStd sameElements f6.chanMean), "std must not alias mean bytes")
    // >8 channels: per-index splitmix mixing means entry 8 must NOT alias
    // entry 0 with period 8 (the old byte-offset scheme repeated after 8)
    val wav12 = Multimodal.encodeWav(12, 16, 8000,
      Array.tabulate(30 * 12 * 2)(i => (i * 17 % 251).toByte), formatCode = 85)
    val f12 = Multimodal.features(spark, asMedia(Seq((8L, wav12, "audio/wav"))))
      .collect().head
    assert(!f12.decoded && f12.chanMean.length === 12 && f12.chanStd.length === 12)
    assert(!(0 until 4).forall(i => f12.chanMean(i) == f12.chanMean(i + 8)),
      "stub chanMean must not repeat with period 8 above 8 channels")
    assert(!(0 until 4).forall(i => f12.chanStd(i) == f12.chanStd(i + 8)),
      "stub chanStd must not repeat with period 8 above 8 channels")
  }

  test("JPEG round-trip: real baseline decode reconstructs pixels within lossy tolerance") {
    // encoder and decoder are independent T.81 implementations (FDCT +
    // Huffman encode vs Huffman decode + IDCT); agreeing on smooth content
    // within a small tolerance across gray / 4:4:4 / 4:2:0 / odd geometry
    // is strong evidence both are right. JPEG is lossy — assertions are
    // tolerance-based, never bit-exact.
    def gradient(w: Int, h: Int, ch: Int): Array[Byte] =
      Array.tabulate(w * h * ch) { i =>
        val p = i / ch; val x = p % w; val y = p / w
        (((x * 255) / math.max(1, w - 1) + (y * 200) / math.max(1, h - 1)) / 2).toByte
      }
    def maxErr(a: Array[Byte], b: Array[Byte]): Int =
      a.zip(b).map { case (p, q) => math.abs((p & 0xff) - (q & 0xff)) }.max
    val cases = Seq(
      ("gray 16x16", 16, 16, 1, false),
      ("rgb444 32x24", 32, 24, 3, false),
      ("rgb420 32x24", 32, 24, 3, true),
      ("odd 13x9 4:2:0", 13, 9, 3, true))
    cases.foreach { case (label, w, h, ch, sub) =>
      val src = gradient(w, h, ch)
      val jpg = graft.multimodal.Jpeg.encode(w, h, ch, src, quality = 95, subsample = sub)
      val (dw, dh, dch, pix) = graft.multimodal.Jpeg.decode(jpg)
      assert((dw, dh, dch) === ((w, h, ch)), s"$label geometry")
      assert(pix.length === src.length, s"$label size")
      assert(maxErr(src, pix) <= 12, s"$label max pixel error ${maxErr(src, pix)}")
    }
    // restart markers (DRI + RSTn every 2 MCUs): real camera streams carry
    // these; the decoder's restart path must reproduce the same pixels
    val (rw, rh) = (48, 32)
    val rsrc = gradient(rw, rh, 3)
    val rjpg = graft.multimodal.Jpeg.encode(rw, rh, 3, rsrc, quality = 95,
      subsample = true, restartInterval = 2)
    // the fixture must actually contain an RST0 marker (FF D0) in the scan
    assert((0 until rjpg.length - 1).exists(i =>
      (rjpg(i) & 0xff) == 0xff && (rjpg(i + 1) & 0xff) == 0xd0),
      "restart fixture must contain an RST0 marker")
    val (rdw, rdh, _, rpix) = graft.multimodal.Jpeg.decode(rjpg)
    assert((rdw, rdh) === ((rw, rh)), "restart geometry")
    assert(maxErr(rsrc, rpix) <= 12, s"restart max pixel error ${maxErr(rsrc, rpix)}")
  }

  test("decompression bombs degrade, never OOM: huge declared dims refuse to allocate") {
    // a few-hundred-byte payload declaring gigabytes of pixels must be
    // rejected BEFORE the pixel allocation (OutOfMemoryError is not a
    // NonFatal the degrade path could catch)
    val png = Multimodal.encodePng(4, 4, Array.fill(48)(7.toByte))
    val pngBomb = png.clone()
    // IHDR width/height at offsets 16/20 (big-endian): declare 40000x40000
    def putBe32(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = ((v >> 24) & 0xff).toByte; a(off + 1) = ((v >> 16) & 0xff).toByte
      a(off + 2) = ((v >> 8) & 0xff).toByte; a(off + 3) = (v & 0xff).toByte
    }
    putBe32(pngBomb, 16, 40000); putBe32(pngBomb, 20, 40000)
    val jpg = graft.multimodal.Jpeg.encode(8, 8, 3, Array.fill(192)(9.toByte))
    val jpgBomb = jpg.clone()
    val sofAt = (0 until jpgBomb.length - 1).find(i =>
      (jpgBomb(i) & 0xff) == 0xff && (jpgBomb(i + 1) & 0xff) == 0xc0).get
    // SOF height/width at sofAt+5..8: declare 40000x40000
    jpgBomb(sofAt + 5) = (40000 >> 8).toByte; jpgBomb(sofAt + 6) = (40000 & 0xff).toByte
    jpgBomb(sofAt + 7) = (40000 >> 8).toByte; jpgBomb(sofAt + 8) = (40000 & 0xff).toByte
    val out = Multimodal.decode(spark, asMedia(Seq(
      (1L, pngBomb, "image/png"), (2L, jpgBomb, "image/jpeg"))))
      .collect().sortBy(_.id)
    assert(out.length === 2, "both records survive")
    // PNG bomb → stub; JPEG bomb → header-only record (true declared
    // geometry, no pixel allocation) — either way the task lives
    assert(out(0).width < 40000)
    assert((out(1).width, out(1).height) === ((40000, 40000)))
    val f = Multimodal.features(spark, asMedia(Seq(
      (1L, pngBomb, "image/png"), (2L, jpgBomb, "image/jpeg"))))
      .collect()
    assert(f.length === 2 && f.forall(!_.decoded))
  }

  test("JPEG codec cross-validates against ImageIO (independent third implementation)") {
    // The JDK's ImageIO is an independent JPEG implementation — perfect as
    // a TEST oracle, deliberately NOT used in the engine path: its IDCT and
    // color conversion are vendor-dependent, and the engine's pixel
    // checksums must be bit-identical across heterogeneous executors, which
    // only our own deterministic codec guarantees.
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    val (w, h) = (32, 24)
    val src = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val x = p % w; val y = p / w
      (i % 3 match {
        case 0 => (x * 255) / (w - 1)
        case 1 => (y * 255) / (h - 1)
        case _ => 128
      }).toByte
    }
    // our encoder -> both decoders on the same stream. On 4:4:4 the only
    // divergence is IDCT/color rounding → tight bound; on 4:2:0 the two
    // decoders legitimately differ in chroma upsampling (ours: nearest
    // replicate; ImageIO: filtered) → looser bound.
    def crossDiff(subsample: Boolean): Int = {
      val jpg = graft.multimodal.Jpeg.encode(w, h, 3, src, quality = 95, subsample = subsample)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(jpg))
      assert(img.getWidth === w && img.getHeight === h)
      val (_, _, _, ours) = graft.multimodal.Jpeg.decode(jpg)
      var worst = 0
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val d = (y * w + x) * 3
        worst = math.max(worst, math.abs(((rgb >> 16) & 0xff) - (ours(d) & 0xff)))
        worst = math.max(worst, math.abs(((rgb >> 8) & 0xff) - (ours(d + 1) & 0xff)))
        worst = math.max(worst, math.abs((rgb & 0xff) - (ours(d + 2) & 0xff)))
      }
      worst
    }
    val d444 = crossDiff(subsample = false)
    assert(d444 <= 3, s"4:4:4 decoder-vs-decoder: max diff $d444 (IDCT rounding only)")
    val d420 = crossDiff(subsample = true)
    assert(d420 <= 12, s"4:2:0 decoder-vs-decoder: max diff $d420 (upsampling differs)")
    // ImageIO encoder -> our decoder: a FOREIGN entropy stream (different
    // Huffman/quant/sampling choices) must decode close to the source
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      bi.setRGB(x, y, ((src(d) & 0xff) << 16) | ((src(d + 1) & 0xff) << 8) | (src(d + 2) & 0xff))
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.95f)
    val bos = new ByteArrayOutputStream()
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    writer.dispose()
    val foreign = bos.toByteArray
    val (fw, fh, fch, fpix) = graft.multimodal.Jpeg.decode(foreign)
    assert((fw, fh, fch) === ((w, h, 3)), "foreign stream geometry")
    val ferr = src.zip(fpix).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }
    assert(ferr.max <= 16, s"foreign stream max pixel error ${ferr.max}")
  }

  test("progressive JPEG (SOF2): real pixel decode, cross-validated against ImageIO") {
    // Fixture from the JDK writer's standard progression script (spectral
    // selection AND successive approximation: DC first/refine, AC
    // first/refine with EOB runs) — an independent encoder driving every
    // progressive decode path. The same bytes are then decoded by BOTH
    // implementations and compared pixel-wise.
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    def writeProgressive(bi: java.awt.image.BufferedImage): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(0.95f)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new ByteArrayOutputStream()
      writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      writer.dispose()
      bos.toByteArray
    }
    def hasMarker(b: Array[Byte], m: Int): Boolean =
      (0 until b.length - 1).exists(i =>
        (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == m)

    // odd geometry → partial MCUs at both edges
    val (w, h) = (37, 23)
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y, ((x * 255 / (w - 1)) << 16) | ((y * 255 / (h - 1)) << 8) | 128)
    val prog = writeProgressive(bi)
    assert(hasMarker(prog, 0xc2), "fixture must really be progressive (SOF2)")
    assert(!hasMarker(prog, 0xc0), "fixture must not carry a baseline SOF")
    val (dw, dh, dch, ours) = graft.multimodal.Jpeg.decode(prog)
    assert((dw, dh, dch) === ((w, h, 3)), "progressive geometry")
    // same stream through ImageIO's decoder: divergence is IDCT rounding +
    // chroma-upsampling choice (the writer subsamples by default) → the
    // same bound as the sequential 4:2:0 cross-validation
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(prog))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val d = (y * w + x) * 3
      worst = math.max(worst, math.abs(((rgb >> 16) & 0xff) - (ours(d) & 0xff)))
      worst = math.max(worst, math.abs(((rgb >> 8) & 0xff) - (ours(d + 1) & 0xff)))
      worst = math.max(worst, math.abs((rgb & 0xff) - (ours(d + 2) & 0xff)))
    }
    assert(worst <= 12, s"progressive decoder-vs-decoder: max diff $worst")

    // grayscale progressive (single-component scans end-to-end)
    val gbi = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      gbi.getRaster.setSample(x, y, 0, (x * 16 + y) % 256)
    val gprog = writeProgressive(gbi)
    assert(hasMarker(gprog, 0xc2), "gray fixture must be progressive")
    val (gw, gh, gch, gpix) = graft.multimodal.Jpeg.decode(gprog)
    assert((gw, gh, gch) === ((16, 16, 1)), "gray progressive geometry")
    val gimg = javax.imageio.ImageIO.read(new ByteArrayInputStream(gprog))
    var gworst = 0
    for (y <- 0 until 16; x <- 0 until 16)
      gworst = math.max(gworst,
        math.abs(gimg.getRaster.getSample(x, y, 0) - (gpix(y * 16 + x) & 0xff)))
    assert(gworst <= 3, s"gray progressive max diff $gworst")

    // engine path: decode()/features() report REAL pixels for SOF2 now
    val d = Multimodal.decode(spark, asMedia(Seq((9L, prog, "image/jpeg")))).collect().head
    assert((d.width, d.height, d.channels) === ((w, h, 3)))
    assert(d.checksum === fnvOf(ours), "decode() must hash reconstructed SOF2 pixels")
    val f = Multimodal.features(spark, asMedia(Seq((9L, prog, "image/jpeg")))).collect().head
    assert(f.decoded, "features must run on real progressive pixels")

    // bomb guard still enforced on the progressive path: huge declared SOF2
    // dims refuse to allocate coefficient planes and degrade to the header
    val bomb = prog.clone()
    val sofAt = (0 until bomb.length - 1).find(i =>
      (bomb(i) & 0xff) == 0xff && (bomb(i + 1) & 0xff) == 0xc2).get
    bomb(sofAt + 5) = (40000 >> 8).toByte; bomb(sofAt + 6) = (40000 & 0xff).toByte
    bomb(sofAt + 7) = (40000 >> 8).toByte; bomb(sofAt + 8) = (40000 & 0xff).toByte
    val db = Multimodal.decode(spark, asMedia(Seq((10L, bomb, "image/jpeg")))).collect().head
    assert((db.width, db.height) === ((40000, 40000)), "header geometry survives the bomb")
    val fb = Multimodal.features(spark, asMedia(Seq((10L, bomb, "image/jpeg")))).collect().head
    assert(!fb.decoded, "bomb must not pixel-decode")
  }

  test("decode/features use real JPEG pixels; non-baseline degrades to the header parse") {
    val (w, h) = (24, 16)
    // constant color block: chroma subsampling is exact, features must
    // recover the color almost perfectly
    val src = Array.tabulate(w * h * 3)(i => (i % 3 match {
      case 0 => 200; case 1 => 60; case _ => 120
    }).toByte)
    val jpg = graft.multimodal.Jpeg.encode(w, h, 3, src, quality = 95, subsample = true)
    val media = asMedia(Seq((1L, jpg, "image/jpeg")))
    val d = Multimodal.decode(spark, media).collect().head
    assert((d.format, d.width, d.height, d.channels) === (("image/jpeg", w, h, 3)))
    // pixel checksum (not the scan-bytes checksum the header fallback uses):
    // must equal the checksum of the decoder's own reconstruction
    val (_, _, _, pix) = graft.multimodal.Jpeg.decode(jpg)
    assert(d.checksum === fnvOf(pix), "decode() must hash reconstructed pixels")
    val f = Multimodal.features(spark, media).collect().head
    assert(f.decoded, "features must run on real JPEG pixels now")
    assert(math.abs(f.chanMean(0) - 200) <= 3 && math.abs(f.chanMean(1) - 60) <= 3 &&
      math.abs(f.chanMean(2) - 120) <= 3, f.chanMean.toSeq.toString)
    // resize: a real binary->binary transform over the decoded pixels
    val r = Multimodal.resize(spark, media, 8, 8).collect().head
    assert(r.decoded && (r.width, r.height, r.channels) === ((8, 8, 3)))
    // CORRUPT progressive: flipping SOF0→SOF2 on a sequential stream makes
    // the single Ss=0..Se=63 scan illegal for a progressive frame (a DC
    // scan must have Se=0), so the decoder throws and the engine degrades
    // to the header parse — true geometry kept, record survives, features
    // fall back to stub-with-real-geometry. (VALID progressive streams get
    // a real pixel decode — see the dedicated SOF2 test.)
    val prog = jpg.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    val dp = Multimodal.decode(spark, asMedia(Seq((2L, prog, "image/jpeg")))).collect().head
    assert((dp.width, dp.height, dp.channels) === ((w, h, 3)), "header geometry survives")
    assert(dp.checksum !== d.checksum, "degraded record hashes scan bytes, not pixels")
    val fp = Multimodal.features(spark, asMedia(Seq((2L, prog, "image/jpeg")))).collect().head
    assert(!fp.decoded && (fp.width, fp.height) === ((w, h)))
  }

  test("fuzz: random mutations of valid payloads never drop a record or kill the task") {
    // the per-record degrade contract under adversarial bytes: seeded
    // random byte flips and truncations of every supported container,
    // decoded in one job — every record must come back as SOMETHING
    // (real decode, header parse, or stub), deterministically
    val rnd = new scala.util.Random(20260813L)
    val px = Array.tabulate(8 * 8 * 3)(i => (i * 31 % 251).toByte)
    val seeds: Seq[Array[Byte]] = Seq(
      Multimodal.encodeBmp24(8, 8, px),
      Multimodal.encodePpm(8, 8, px),
      Multimodal.encodePng(8, 8, px),
      graft.multimodal.Jpeg.encode(8, 8, 3, px, quality = 90),
      Multimodal.encodeWav(2, 16, 8000, px),
      graft.multimodal.Flac.encode(
        Array.tabulate(96)(i => (math.sin(i * 0.2) * 5000).toInt), 2, 16, 8000,
        graft.multimodal.Flac.EncodeOptions(blockSize = 32)))
    val mutated: Seq[(Long, Array[Byte], String)] = (0 until 200).map { i =>
      val base = seeds(i % seeds.length)
      val b = base.clone()
      rnd.nextInt(3) match {
        case 0 => // flip 1-4 random bytes
          (0 to rnd.nextInt(4)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          (i.toLong, b, "fuzz/flip")
        case 1 => // truncate at a random point
          (i.toLong, b.take(1 + rnd.nextInt(b.length)), "fuzz/cut")
        case _ => // splice two formats together
          val other = seeds(rnd.nextInt(seeds.length))
          (i.toLong, b.take(rnd.nextInt(b.length)) ++ other.drop(rnd.nextInt(other.length)),
            "fuzz/splice")
      }
    }
    val decoded = Multimodal.decode(spark, asMedia(mutated)).collect()
    assert(decoded.length === 200, "every fuzzed record must survive decode")
    val feats = Multimodal.features(spark, asMedia(mutated)).collect()
    assert(feats.length === 200, "every fuzzed record must survive features")
    val rez = Multimodal.resize(spark, asMedia(mutated), 4, 4).collect()
    assert(rez.length === 200, "every fuzzed record must survive resize")
    // determinism: the same bytes decode to the same record on a second run
    val again = Multimodal.decode(spark, asMedia(mutated)).collect()
    assert(decoded.sortBy(_.id).toSeq === again.sortBy(_.id).toSeq,
      "degrade decisions must be deterministic")
  }

  test("composition: image features feed the ANN stack — near-identical images pair up") {
    import org.apache.spark.sql.functions.concat
    // three color families, two near-identical variants each (one pixel
    // nudged on the dominant channel) — feature vectors of a pair must be
    // each other's cosine top-1 against the full set
    def img(r: Int, g: Int, b: Int, nudge: Boolean): Array[Byte] = {
      val px = Array.tabulate(4 * 4 * 3) { i =>
        (i % 3 match { case 0 => r; case 1 => g; case 2 => b }).toByte
      }
      if (nudge) px(0) = math.min(255, (px(0) & 0xff) + 10).toByte
      Multimodal.encodeBmp24(4, 4, px)
    }
    val media = asMedia(Seq(
      (1L, img(200, 10, 10, nudge = false), "image/bmp"),
      (2L, img(200, 10, 10, nudge = true), "image/bmp"),
      (3L, img(10, 200, 10, nudge = false), "image/bmp"),
      (4L, img(10, 200, 10, nudge = true), "image/bmp"),
      (5L, img(10, 10, 200, nudge = false), "image/bmp"),
      (6L, img(10, 10, 200, nudge = true), "image/bmp")))
    val emb = Multimodal.features(spark, media).toDF()
      .select(col("id"),
        concat(col("chanMean"), col("chanStd"), col("lumaHist")).as("embedding"))
    val top1 = graft.operators.Similarity.bruteForceTopK(emb, emb, 1, "id", "embedding")
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("id")).toMap
    assert(top1 === Map(1L -> 2L, 2L -> 1L, 3L -> 4L, 4L -> 3L, 5L -> 6L, 6L -> 5L))
  }

  test("FLAC round-trip: bit-exact across depths, stereo modes, subframe types, partitions") {
    import graft.multimodal.Flac
    // deterministic mixed signal: sine carrier + LCG noise + a constant run
    // (so auto mode exercises CONSTANT, FIXED selection, and wasted bits)
    def signal(n: Int, ch: Int, bits: Int, seed: Long): Array[Int] = {
      val amp = (1 << (bits - 2)) - 1
      var s = seed
      Array.tabulate(n * ch) { i =>
        s = s * 6364136223846793005L + 1442695040888963407L
        val noise = ((s >>> 40) % 64).toInt - 32
        if (i / ch < 32) amp / 2 // leading constant run
        else (math.sin(i * 0.05) * amp).toInt + noise
      }
    }
    def rt(samples: Array[Int], ch: Int, bits: Int,
        opts: Flac.EncodeOptions, label: String): Unit = {
      val enc = Flac.encode(samples, ch, bits, 8000, opts)
      assert(Flac.isFlac(enc), s"$label: encoder output must sniff as FLAC")
      val dec = Flac.decode(enc)
      assert(dec.channels === ch && dec.bitsPerSample === bits, label)
      assert(dec.samples.toSeq === samples.toSeq,
        s"$label: lossless round trip must be bit-exact")
    }
    // depth x partition sweep (mono) — incl. a partial last block
    rt(signal(1000, 1, 8, 1L), 1, 8, Flac.EncodeOptions(blockSize = 256), "mono8")
    rt(signal(1000, 1, 16, 2L), 1, 16,
      Flac.EncodeOptions(blockSize = 256, partitionOrder = 2), "mono16 part2")
    rt(signal(777, 1, 24, 3L), 1, 24,
      Flac.EncodeOptions(blockSize = 512, partitionOrder = 1), "mono24 partial-last")
    // every stereo decorrelation — the side channel carries the +1 bit
    for (mode <- Seq("independent", "left_side", "right_side", "mid_side"))
      rt(signal(600, 2, 16, 4L), 2, 16,
        Flac.EncodeOptions(blockSize = 128, stereo = mode), s"stereo $mode")
    // every subframe type, forced
    rt(signal(300, 1, 16, 5L), 1, 16,
      Flac.EncodeOptions(blockSize = 128, subframe = "verbatim"), "verbatim")
    rt(signal(300, 1, 16, 6L), 1, 16,
      Flac.EncodeOptions(blockSize = 128, subframe = "lpc"), "lpc")
    for (o <- 0 to 4)
      rt(signal(300, 1, 16, 7L + o), 1, 16,
        Flac.EncodeOptions(blockSize = 64, subframe = s"fixed$o"), s"fixed$o")
    // wasted bits: all samples share 3 trailing zero bits
    rt(signal(400, 1, 16, 20L).map(v => (v >> 3) << 3), 1, 16,
      Flac.EncodeOptions(blockSize = 128), "wasted-bits")
    // raw-escape partition: near-silent block with one huge spike — the
    // Rice quotient would explode, so the encoder must take the escape
    val spiky = Array.tabulate(4096)(i => if (i == 2048) 20000 else i % 2)
    rt(spiky, 1, 16,
      Flac.EncodeOptions(blockSize = 4096, subframe = "fixed0",
        detectWastedBits = false), "escape")
    // all-silence stream (constant-zero subframes, zero predictor)
    rt(new Array[Int](512), 1, 16, Flac.EncodeOptions(blockSize = 256), "silence")
  }

  test("FLAC decode: real samples, cross-container checksum parity with WAV") {
    import graft.multimodal.Flac
    // one stereo 16-bit recording through BOTH containers: the FLAC record
    // checksums DECODED samples as LE bytes, which is byte-identical to
    // the WAV data chunk — same audio, same hash, either container
    val frames = 500
    val samples = Array.tabulate(frames * 2) { i =>
      (math.sin(i * 0.03) * 12000).toInt + (if (i % 2 == 0) 100 else -100)
    }
    val flac = Flac.encode(samples, 2, 16, 8000,
      Flac.EncodeOptions(blockSize = 128, stereo = "mid_side"))
    val wav = Multimodal.encodeWav(2, 16, 8000, Flac.samplesToLeBytes(samples, 16))
    val out = Multimodal.decode(spark, asMedia(Seq(
      (1L, flac, "audio/flac"), (2L, wav, "audio/wav")))).collect().sortBy(_.id)
    val Array(f, w) = out
    assert(f.format === "audio/flac" && w.format === "audio/wav")
    assert((f.width, f.height, f.channels) === ((frames, 1, 2)))
    assert(f.checksum === w.checksum,
      "same recording must hash identically through FLAC and WAV")
    // features run on real samples and agree EXACTLY across containers
    // (both paths normalize the same integers by the same 2^15)
    val feats = Multimodal.features(spark, asMedia(Seq(
      (1L, flac, "audio/flac"), (2L, wav, "audio/wav")))).collect().sortBy(_.id)
    val Array(ff, wf) = feats
    assert(ff.decoded && wf.decoded)
    assert(ff.chanMean.toSeq === wf.chanMean.toSeq)
    assert(ff.chanStd.toSeq === wf.chanStd.toSeq)
    assert(ff.lumaHist.toSeq === wf.lumaHist.toSeq)
  }

  test("FLAC degrade: corruption, declared-size bombs, fake magic — never a drop") {
    import graft.multimodal.Flac
    val samples = Array.tabulate(600)(i => (math.sin(i * 0.04) * 9000).toInt)
    val good = Flac.encode(samples, 1, 16, 8000, Flac.EncodeOptions(blockSize = 256))
    // corrupt a byte deep in the frame region: CRC catches it, the record
    // degrades to the STREAMINFO header parse with TRUE geometry
    val corrupt = good.clone()
    corrupt(good.length - 40) = (corrupt(good.length - 40) ^ 0x55).toByte
    // declared-size bomb: patch STREAMINFO total-samples to ~2^35 — decode
    // must refuse before allocating and degrade to the header record
    val bomb = good.clone()
    // byte 21 = (bps-1 low nibble << 4) | total[35:32]: keep bps=16 valid,
    // declare 2^35 samples
    bomb(21) = 0xf8.toByte; bomb(22) = 0; bomb(23) = 0; bomb(24) = 0; bomb(25) = 0
    // text that begins with the magic must not sniff as FLAC
    val fake = ("fLaC this is not actually a flac stream, just text with " +
      "the right four leading bytes and enough length").getBytes("US-ASCII")
    val out = Multimodal.decode(spark, asMedia(Seq(
      (1L, corrupt, "audio/flac"), (2L, bomb, "audio/flac"), (3L, fake, "text"))))
      .collect().sortBy(_.id)
    assert(out.length === 3, "every record survives")
    val Array(c, bm, fk) = out
    assert(c.format === "audio/flac" && (c.width, c.channels) === ((600, 1)),
      "corrupt stream keeps STREAMINFO geometry")
    assert(c.checksum !== Multimodal.decode(spark,
      asMedia(Seq((1L, good, "audio/flac")))).collect().head.checksum,
      "header-fallback hash is over frame bytes, not decoded samples")
    assert(bm.format === "audio/flac" && bm.height === 1,
      "bomb degrades to header record, no allocation")
    assert(fk.format === "text", "structural sniff rejects magic-only text")
    // features on the corrupt stream: stub features, but geometry still
    // agrees with decode() (the two-API geometry invariant)
    val cf = Multimodal.features(spark,
      asMedia(Seq((1L, corrupt, "audio/flac")))).collect().head
    assert(!cf.decoded)
    assert((cf.width, cf.height, cf.channels) === ((c.width, c.height, c.channels)))
  }

  test("sampleEvery keeps every stride-th id") {
    val d = Multimodal.decodeStub(spark, media())
    val sampled = Multimodal.sampleEvery(d, 5).collect().map(_.id).sorted
    assert(sampled.forall(_ % 5 == 0))
    assert(sampled.length === d.collect().count(_.id % 5 == 0))
  }

  test("GIF LZW round trip: sequential, interlaced, KwKwK runs, 12-bit table freeze") {
    import graft.multimodal.Gif
    val rnd = new scala.util.Random(7)
    // small-palette random image
    val (w, h) = (23, 17)
    val pal5 = Array(
      Array[Byte](255.toByte, 0, 0), Array[Byte](0, 255.toByte, 0),
      Array[Byte](0, 0, 255.toByte), Array[Byte](17, 34, 51),
      Array[Byte](200.toByte, 100, 50))
    val rgb = Array.tabulate(w * h)(_ => pal5(rnd.nextInt(5))).flatten.toArray
    val seqGif = Gif.encodeRgb(w, h, rgb)
    val (dw, dh, dch, dpix) = Gif.decode(seqGif)
    assert((dw, dh, dch) === ((w, h, 3)))
    assert(dpix.toSeq === rgb.toSeq, "sequential round trip")
    // interlaced: identical reconstruction (row scatter is lossless)
    val (_, _, _, ipix) = Gif.decode(Gif.encodeRgb(w, h, rgb, interlaced = true))
    assert(ipix.toSeq === rgb.toSeq, "interlaced round trip")
    // constant image: back-to-back KwKwK codes (every new code referenced
    // one step before the decoder defines it)
    val flat = Array.fill(64 * 64 * 3)(42.toByte)
    assert(Gif.decode(Gif.encodeRgb(64, 64, flat))._4.toSeq === flat.toSeq)
    // 250-color noise at 128x128 pushes the dictionary past 4096: codes
    // freeze at 12 bits and both sides must stay in lockstep
    val bigPal = Array.tabulate(250)(i =>
      Array[Byte]((i * 7 % 256).toByte, (i * 13 % 256).toByte, (i * 29 % 256).toByte))
    val big = Array.tabulate(128 * 128)(_ => bigPal(rnd.nextInt(250))).flatten.toArray
    assert(Gif.decode(Gif.encodeRgb(128, 128, big))._4.toSeq === big.toSeq,
      "round trip across the table freeze")
  }

  test("GIF cross-validates against ImageIO both directions") {
    import graft.multimodal.Gif
    import java.io.ByteArrayInputStream
    val rnd = new scala.util.Random(11)
    val (w, h) = (31, 13)
    val pal = Array.tabulate(16)(i =>
      Array[Byte]((i * 16).toByte, (255 - i * 16).toByte, (i * 5 + 3).toByte))
    val rgb = Array.tabulate(w * h)(_ => pal(rnd.nextInt(16))).flatten.toArray
    // our encoder → the JDK's independent decoder (incl. the interlaced file)
    Seq(false, true).foreach { interlaced =>
      val img = javax.imageio.ImageIO.read(
        new ByteArrayInputStream(Gif.encodeRgb(w, h, rgb, interlaced)))
      assert(img.getWidth === w && img.getHeight === h)
      var p = 0
      while (p < w * h) {
        val v = img.getRGB(p % w, p / w)
        assert(((v >> 16) & 0xff) === (rgb(p * 3) & 0xff) &&
          ((v >> 8) & 0xff) === (rgb(p * 3 + 1) & 0xff) &&
          (v & 0xff) === (rgb(p * 3 + 2) & 0xff),
          s"ImageIO disagrees at pixel $p (interlaced=$interlaced)")
        p += 1
      }
    }
    // the JDK's independent encoder → our decoder
    val cm = new java.awt.image.IndexColorModel(
      4, 16, pal.map(_(0)).toArray, pal.map(_(1)).toArray, pal.map(_(2)).toArray)
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    (0 until w * h).foreach { p =>
      val c = rgb.slice(p * 3, p * 3 + 3)
      bi.setRGB(p % w, p / w,
        ((c(0) & 0xff) << 16) | ((c(1) & 0xff) << 8) | (c(2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", bos), "JDK GIF writer available")
    val (jw, jh, jch, jpix) = Gif.decode(bos.toByteArray)
    assert((jw, jh, jch) === ((w, h, 3)))
    assert(jpix.toSeq === rgb.toSeq, "our decoder reproduces the JDK encoder's pixels")
  }

  test("GIF and PNG of the same pixels produce identical features (cross-format invariant)") {
    import graft.multimodal.Gif
    val rnd = new scala.util.Random(5)
    val (w, h) = (19, 11)
    val pal = Array.tabulate(8)(i =>
      Array[Byte]((i * 31).toByte, (i * 17 + 5).toByte, (255 - i * 29).toByte))
    val rgb = Array.tabulate(w * h)(_ => pal(rnd.nextInt(8))).flatten.toArray
    val gifF = Multimodal.features(spark,
      asMedia(Seq((1L, Gif.encodeRgb(w, h, rgb), "image/gif")))).collect().head
    val pngF = Multimodal.features(spark,
      asMedia(Seq((2L, Multimodal.encodePng(w, h, rgb), "image/png")))).collect().head
    assert(gifF.decoded && pngF.decoded)
    assert((gifF.width, gifF.height, gifF.channels) ===
      ((pngF.width, pngF.height, pngF.channels)))
    assert(gifF.chanMean.toSeq === pngF.chanMean.toSeq &&
      gifF.chanStd.toSeq === pngF.chanStd.toSeq &&
      gifF.lumaHist.toSeq === pngF.lumaHist.toSeq,
      "identical pixels through different containers must featurize identically")
  }

  test("GIF transparency, Multimodal dispatch, checksum invariance, corrupt degrade") {
    import graft.multimodal.Gif
    val pal = Array[Byte](255.toByte, 0, 0, /**/ 0, 255.toByte, 0, /**/ 9, 9, 9)
    val idx = Array[Byte](0, 1, 2, 2, 1, 0)
    // transparent index 2 → RGBA with alpha 0 exactly there
    val (tw, th, tch, tpix) = Gif.decode(
      Gif.encodeIndexed(3, 2, idx, pal, transparentIdx = 2))
    assert((tw, th, tch) === ((3, 2, 4)))
    idx.zipWithIndex.foreach { case (ix, p) =>
      assert((tpix(p * 4 + 3) & 0xff) === (if (ix == 2) 0 else 255))
      assert(tpix(p * 4) === pal(ix * 3) && tpix(p * 4 + 1) === pal(ix * 3 + 1))
    }
    // ImageIO referee on the transparent pixel
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Gif.encodeIndexed(3, 2, idx, pal, transparentIdx = 2)))
    assert(((img.getRGB(2, 0) >>> 24) & 0xff) === 0, "ImageIO sees alpha 0 at idx 2")
    assert(((img.getRGB(0, 0) >>> 24) & 0xff) === 255)
    // dispatch + interlace checksum invariance through the column operator
    val seqBytes = Gif.encodeIndexed(3, 2, idx, pal)
    val intBytes = Gif.encodeIndexed(3, 2, idx, pal, interlaced = true)
    val out = Multimodal.decode(spark, asMedia(Seq(
      (1L, seqBytes, "image/gif"), (2L, intBytes, "image/gif"),
      (3L, seqBytes.dropRight(8), "image/gif")))) // truncated → degrade
      .collect().sortBy(_.id)
    assert(out(0).format === "image/gif" && out(0).channels === 3)
    assert((out(0).width, out(0).height) === ((3, 2)))
    assert(out(0).checksum === out(1).checksum,
      "interlaced vs sequential storage hashes identically")
    assert(out(2).format === "image/gif" && out(2).checksum != out(0).checksum,
      "truncated payload degrades to the stub record, task survives")
    assert(out(2).width != 3, "stub geometry, not a half-parsed frame")
  }
}
