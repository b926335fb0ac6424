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

  test("sampleEvery keeps every stride-th id") {
    val d = Multimodal.decodeStub(spark, media())
    val sampled = Multimodal.sampleEvery(d, 5).collect().map(_.id).sorted
    assert(sampled.forall(_ % 5 == 0))
    assert(sampled.length === d.collect().count(_.id % 5 == 0))
  }
}
