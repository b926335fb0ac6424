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

  test("sampleEvery keeps every stride-th id") {
    val d = Multimodal.decodeStub(spark, media())
    val sampled = Multimodal.sampleEvery(d, 5).collect().map(_.id).sorted
    assert(sampled.forall(_ % 5 == 0))
    assert(sampled.length === d.collect().count(_.id % 5 == 0))
  }
}
