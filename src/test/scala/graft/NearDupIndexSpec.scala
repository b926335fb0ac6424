package graft

import graft.catalog.{KuduLikeCatalog, TableDef}
import graft.operators.{Dedup, NearDupIndex}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Standing near-dup index (operators/NearDupIndex): the incremental
  * maintenance contract — after any mix of inserts-as-upserts, text
  * rewrites, and deletes folded through the changelog, the index equals a
  * from-scratch recompute, for both item kinds; probes through the
  * standing index equal the batch operators on the reconstructed corpus.
  * The exact-probe face is additionally oracle-gated by
  * d53_standing_neardup_index (d26b's oracle, reference side read from
  * the index).
  */
class NearDupIndexSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def df(rows: Seq[(Long, String)]): DataFrame =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, docSchema)

  private def phrase(seed: Long, k: Int): String =
    (0 until 12).map(i => s"tok${(seed * 3 + i * k) % 17}").mkString(" ")

  private val shingles2 = NearDupIndex.ShingleExtractor(2)
  private val bands164 = NearDupIndex.BandExtractor(numHashes = 16, bands = 4)

  /** Seed a docs table, bootstrap an index, run a churn batch (new docs,
    * rewrites, deletes) through upsert/delete, refresh the index, and
    * return (catalog, index content, recomputed-from-scratch content).
    */
  private def churn(extractor: NearDupIndex.IndexExtractor, ix: String)
      : (KuduLikeCatalog, Set[(Long, String)], Set[(Long, String)]) = {
    val cat = new KuduLikeCatalog(spark, tmpDir("graft_ndx_"))
    cat.createTable(TableDef("docs", docSchema, Seq("doc_id"), buckets = 4))
    cat.insert("docs", df((0L until 30L).map(i => (i, phrase(i, 1)))))
    val v0 = cat.currentVersion("docs")
    val ep = cat.baseEpoch("docs")
    NearDupIndex.bootstrap(cat, ix, cat.table("docs"), "text", "doc_id", extractor)
    // churn: 10 new docs, 5 rewrites, 4 deletes — across two versions so
    // the latest-change-per-key fold is exercised (doc 3 is rewritten
    // twice; only the second text may appear in the index)
    cat.upsert("docs", df((30L until 40L).map(i => (i, phrase(i, 2))) ++
      Seq(3L, 7L, 11L).map(i => (i, phrase(i + 100, 3)))))
    cat.upsert("docs", df(Seq((3L, phrase(555, 5)), (15L, phrase(888, 7)))))
    cat.delete("docs", col("doc_id").isin(1L, 8L, 21L, 35L))
    val applied = NearDupIndex.refresh(cat, ix, "docs",
      v0, cat.currentVersion("docs"), ep, "text", "doc_id", extractor)
    assert(applied > 0)
    def content(d: DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    (cat, content(cat.table(ix)),
      content(extractor.items(cat.table("docs"), "text", "doc_id")))
  }

  test("shingle index: incremental refresh equals a from-scratch recompute " +
    "after inserts, double rewrites, and deletes") {
    val (_, incremental, recomputed) = churn(shingles2, "ndx_sh")
    assert(incremental === recomputed)
    assert(incremental.nonEmpty)
  }

  test("band-signature index: incremental refresh equals a from-scratch " +
    "recompute after the same churn") {
    val (_, incremental, recomputed) = churn(bands164, "ndx_b")
    assert(incremental === recomputed)
    assert(incremental.nonEmpty)
  }

  test("probeJaccard through the standing index is row-identical to the " +
    "batch cross-corpus operator on the reconstructed corpus") {
    val (cat, _, _) = churn(shingles2, "ndx_p")
    val newDocs = df((1000L until 1015L).map(i => (i, phrase(i % 13, 1))))
    def rows(d: DataFrame) = d
      .select("a", "b", "inter", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val viaIndex = rows(NearDupIndex.probeJaccard(
      cat, "ndx_p", newDocs, "text", "doc_id", dfMax = 50, tau = 0.05))
    val direct = rows(Dedup.ngramJaccardPairsCrossAtScale(
      newDocs, cat.table("docs"), "text", "doc_id", dfMax = 50, n = 2, tau = 0.05))
    assert(viaIndex === direct)
    assert(viaIndex.nonEmpty, "fixture must produce at least one near-dup pair")
  }

  test("probeLsh through the standing band index equals the recomputed " +
    "cross-corpus band join") {
    val (cat, _, _) = churn(bands164, "ndx_l")
    val newDocs = df((2000L until 2010L).map(i => (i, phrase(i % 11, 2))))
    def pairs(d: DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaIndex = pairs(NearDupIndex.probeLsh(
      cat, "ndx_l", newDocs, "text", "doc_id"))
    val a = bands164.items(newDocs, "text", "doc_id")
      .select(col("doc_id").as("a"), col("item"))
    val b = bands164.items(cat.table("docs"), "text", "doc_id")
      .select(col("doc_id").as("b"), col("item"))
    val direct = pairs(a.join(b, Seq("item")).select("a", "b").distinct())
    assert(viaIndex === direct)
    assert(viaIndex.nonEmpty, "planted identical phrases must collide")
  }

  test("staleness guards: a base-append insert or a compact forces " +
    "re-bootstrap instead of silently serving a stale index") {
    val (cat, _, _) = churn(shingles2, "ndx_g")
    val v = cat.currentVersion("docs")
    val ep = cat.baseEpoch("docs")
    // base-append path (insert on a compacted table bumps the epoch)
    cat.compact("docs")
    intercept[IllegalArgumentException](
      NearDupIndex.refresh(cat, "ndx_g", "docs", v, v, ep, "text", "doc_id",
        shingles2))
  }

  test("parameter record: refreshing or probing with a mismatched " +
    "extractor fails loudly instead of returning wrong candidates") {
    val (cat, _, _) = churn(shingles2, "ndx_m")
    val v = cat.currentVersion("docs")
    val ep = cat.baseEpoch("docs")
    // wrong shingle width against an n=2 index
    val e1 = intercept[IllegalArgumentException](NearDupIndex.refresh(
      cat, "ndx_m", "docs", v, v, ep, "text", "doc_id",
      NearDupIndex.ShingleExtractor(3)))
    assert(e1.getMessage.contains("mismatch"))
    // wrong index KIND for the probe
    val e2 = intercept[IllegalArgumentException](NearDupIndex.probeLsh(
      cat, "ndx_m", df(Seq((1L, "a b c"))), "text", "doc_id"))
    assert(e2.getMessage.contains("probeLsh needs a minhash-band index"))
  }
}
