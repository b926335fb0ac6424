package graft

import graft.functions.{BloomFilterAggregator, BloomFilterOps, BloomUtil}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Bloom filter contracts: zero false negatives, FP rate near the sized
  * fpp, partitioning-independent build (OR-merge is algebraic), codegen
  * probe == interpreted util, and the bloom decontamination operator's
  * bit-equality with the exact broadcast operator.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def deterministicHashes(n: Int, tag: String): Seq[Long] =
    (0 until n).map { i =>
      // stable 64-bit values with full avalanche, no RNG state
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag-$i".getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(h).getLong
    }

  test("no false negatives; false-positive rate tracks the sized fpp") {
    val members = deterministicHashes(20000, "member")
    val others = deterministicHashes(20000, "other").filterNot(members.toSet)
    val numBits = BloomUtil.optimalNumBits(members.size.toLong, 0.01)
    val numHashes = BloomUtil.optimalNumHashes(members.size.toLong, numBits)
    val bits = new Array[Long](numBits / 64)
    members.foreach(BloomUtil.put(bits, _, numHashes))
    assert(members.forall(BloomUtil.mightContain(bits, _, numHashes)),
      "bloom returned a false negative")
    val fp = others.count(BloomUtil.mightContain(bits, _, numHashes))
    val rate = fp.toDouble / others.size
    assert(rate < 0.03, s"false-positive rate $rate far above sized 1%")
  }

  test("distributed build is partitioning-independent (algebraic OR-merge)") {
    val hashes = deterministicHashes(5000, "part")
    val numBits = BloomUtil.optimalNumBits(5000, 0.01)
    val numHashes = BloomUtil.optimalNumHashes(5000, numBits)
    val agg = new BloomFilterAggregator(numBits, numHashes)
    val one = hashes.toDF("h").repartition(1).as[Long].select(agg.toColumn).head()
    val many = hashes.toDF("h").repartition(16).as[Long].select(agg.toColumn).head()
    assert(one.toSeq === many.toSeq,
      "bloom words differ across partitionings — merge is not algebraic")
  }

  test("codegen probe agrees with the interpreted util on every bit pattern") {
    val members = deterministicHashes(3000, "cg-m")
    val probesAll = deterministicHashes(3000, "cg-p") ++ members.take(500)
    val (bc, numHashes) =
      BloomFilterOps.build(members.toDF("h"), members.size.toLong, 0.01)
    val viaExpr = probesAll.toDF("h")
      .select(col("h"), BloomFilterOps.mightContain(col("h"), bc, numHashes).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probesAll.foreach { h =>
      assert(viaExpr(h) === BloomUtil.mightContain(bc.value, h, numHashes),
        s"codegen/interpreted disagree on hash $h")
    }
    members.take(500).foreach(h => assert(viaExpr(h), "member probed false"))
  }

  test("bloom decontamination report equals the exact broadcast report") {
    val docs = Tables.load(spark, sf, "documents")
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val eval = docs.filter(col("doc_id") % 20 === 0)
    val exact = Dedup.contaminationReport(train, eval, "text", "doc_id", n = 4)
    val bloom = Dedup.bloomContaminationReport(
      train, eval, "text", "doc_id", n = 4,
      expectedEvalShingles = 50000L, fpp = 0.01)
    assert(bloom.count() === exact.count())
    assert(bloom.exceptAll(exact).count() === 0)
    assert(exact.exceptAll(bloom).count() === 0)
  }

  test("undersized filter still returns the exact report (verify strikes FPs)") {
    // expectedKeys 100x too small -> saturated filter, FP-heavy prefilter;
    // the verify join must still strike every false positive.
    val docs = Tables.load(spark, sf, "documents")
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val eval = docs.filter(col("doc_id") % 20 === 0)
    val exact = Dedup.contaminationReport(train, eval, "text", "doc_id", n = 4)
    val bloom = Dedup.bloomContaminationReport(
      train, eval, "text", "doc_id", n = 4,
      expectedEvalShingles = 500L, fpp = 0.1)
    assert(bloom.exceptAll(exact).count() === 0)
    assert(exact.exceptAll(bloom).count() === 0)
  }
}
