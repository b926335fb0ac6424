package graft

import graft.catalog.{KuduLikeCatalog, TableDef}
import graft.operators.{EmbeddingIndex, NearDupIndex, Similarity}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Standing embedding index (operators/EmbeddingIndex, round-15 verdict
  * item 3): the incremental maintenance contract — after churn folded
  * through the changelog, the index equals re-encoding the reconstructed
  * corpus under the FROZEN bootstrap model; a probe of the bootstrapped
  * index is bit-identical to the batch [[Similarity.ivfPqTopK]]; and with
  * the probe set widened to everything, the IVFADC plumbing collapses to
  * the exact brute-force answer (the d54 oracle's configuration).
  */
class EmbeddingIndexSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val dim = 16
  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType, containsNull = false))))

  private def vec(i: Long, salt: Int = 0): Seq[Float] =
    (0 until dim).map(j =>
      (((i * 31 + j * 17 + salt * 7) % 101) - 50) / 50.0f)

  private def df(ids: Seq[Long], salt: Int = 0): DataFrame =
    spark.createDataFrame(
      ids.map(i => Row(i, vec(i, salt))).asJava, embSchema)

  private def seeded(): KuduLikeCatalog = {
    val cat = new KuduLikeCatalog(spark, tmpDir("graft_emx_"))
    cat.createTable(TableDef("emb", embSchema, Seq("vec_id"), buckets = 4))
    cat.insert("emb", df(0L until 60L))
    cat
  }

  private def rowsOf(d: DataFrame): Seq[(Long, Int, Long, Double)] =
    d.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2)).toSeq

  test("probe of a bootstrapped index is bit-identical to the batch " +
    "ivfPqTopK on the same corpus (same frozen training recipe)") {
    val cat = seeded()
    val corpus = cat.table("emb")
    EmbeddingIndex.bootstrap(cat, "emx", corpus, "vec_id", "embedding",
      cells = 4, m = 4, ksub = 8)
    val queries = df(1000L until 1008L)
    val viaIndex = rowsOf(EmbeddingIndex.probe(cat, "emx", queries, corpus,
      k = 3, nprobe = 2, rerank = 16))
    val batch = rowsOf(Similarity.ivfPqTopK(queries, corpus, k = 3,
      cells = 4, nprobe = 2, m = 4, ksub = 8, rerank = 16))
    assert(viaIndex === batch)
    assert(viaIndex.nonEmpty)
  }

  test("incremental refresh equals re-encoding the reconstructed corpus " +
    "under the FROZEN bootstrap model after inserts, rewrites, and deletes") {
    val cat = seeded()
    // bootstrap on a 2/3 subset, then churn the rest in via the changelog
    val cat2 = new KuduLikeCatalog(spark, tmpDir("graft_emx2_"))
    cat2.createTable(TableDef("emb", embSchema, Seq("vec_id"), buckets = 4))
    cat2.insert("emb", df((0L until 60L).filter(_ % 3 != 0)))
    val v0 = cat2.currentVersion("emb")
    val ep = cat2.baseEpoch("emb")
    EmbeddingIndex.bootstrap(cat2, "emx", cat2.table("emb"),
      "vec_id", "embedding", cells = 4, m = 4, ksub = 8)
    cat2.upsert("emb", df((0L until 60L).filter(_ % 3 == 0))) // inserts
    cat2.upsert("emb", df(Seq(4L, 10L), salt = 9)) // rewrites (new vectors)
    cat2.delete("emb", col("vec_id").isin(7L, 22L, 40L)) // deletes
    val applied = EmbeddingIndex.refresh(cat2, "emx", "emb",
      v0, cat2.currentVersion("emb"), ep, "vec_id", "embedding")
    assert(applied > 0)
    def content(d: DataFrame): Set[(Long, Int, Seq[Int])] = d.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    val model = EmbeddingIndex.loadModel(cat2, "emx")
    val recomputed = content(EmbeddingIndex.encode(
      cat2.table("emb"), "vec_id", "embedding", model))
    assert(content(cat2.table("emx")) === recomputed)
    assert(recomputed.nonEmpty)
    // the rewritten vectors must carry their NEW codes
    assert(content(cat2.table("emx")).find(_._1 == 4L) ===
      content(EmbeddingIndex.encode(df(Seq(4L), salt = 9),
        "vec_id", "embedding", model)).headOption)
  }

  test("probing every cell with an exhaustive rerank collapses to the " +
    "exact brute-force top-k (the d54 oracle configuration)") {
    val cat = seeded()
    val corpus = cat.table("emb")
    EmbeddingIndex.bootstrap(cat, "emx", corpus, "vec_id", "embedding",
      cells = 4, m = 4, ksub = 8)
    val queries = df(1000L until 1006L)
    val viaIndex = rowsOf(EmbeddingIndex.probe(cat, "emx", queries, corpus,
      k = 3, nprobe = 4, rerank = Int.MaxValue))
    val brute = rowsOf(Similarity.bruteForceTopK(queries,
      queries.unionByName(corpus), k = 3)
      .filter(col("id") < 1000L)) // brute's corpus includes queries; drop them
    // compare (qid, rank, id) and cos to 1e-9 (brute computes cosine on
    // RAW embeddings; the index path on normalized — same value, possibly
    // different final ulps)
    assert(viaIndex.map(t => (t._1, t._2, t._3)) ===
      brute.map(t => (t._1, t._2, t._3)))
    viaIndex.zip(brute).foreach { case (a, b) =>
      assert(math.abs(a._4 - b._4) < 1e-9) }
  }

  test("staleness guards and parameter records fail loudly: compact " +
    "forces re-bootstrap; kind mismatches are rejected both ways") {
    val cat = seeded()
    EmbeddingIndex.bootstrap(cat, "emx", cat.table("emb"),
      "vec_id", "embedding", cells = 4, m = 4, ksub = 8)
    val v = cat.currentVersion("emb")
    val ep = cat.baseEpoch("emb")
    cat.compact("emb")
    intercept[IllegalArgumentException](EmbeddingIndex.refresh(
      cat, "emx", "emb", v, v, ep, "vec_id", "embedding"))
    // an embedding index is not a near-dup index and vice versa
    val e = intercept[IllegalArgumentException](NearDupIndex.probeLsh(
      cat, "emx",
      spark.createDataFrame(Seq(Row(1L, "a b")).asJava, StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))),
      "text", "doc_id"))
    assert(e.getMessage.contains("probeLsh needs a minhash-band index"))
    val docsCat = new KuduLikeCatalog(spark, tmpDir("graft_emx3_"))
    docsCat.createTable(TableDef("docs", StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))),
      Seq("doc_id"), buckets = 2))
    docsCat.insert("docs", spark.createDataFrame(
      Seq(Row(1L, "a b c"), Row(2L, "b c d")).asJava, StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))))
    NearDupIndex.bootstrap(docsCat, "ndx", docsCat.table("docs"),
      "text", "doc_id", NearDupIndex.ShingleExtractor(2))
    val e2 = intercept[IllegalArgumentException](
      EmbeddingIndex.loadModel(docsCat, "ndx"))
    assert(e2.getMessage.contains("not an embedding index"))
  }

  test("drift probe: occupancy L1 separates a planted distribution shift " +
    "from same-distribution churn (round-16 item 2)") {
    val cat = seeded()
    EmbeddingIndex.bootstrap(cat, "emx", cat.table("emb"),
      "vec_id", "embedding", cells = 4, m = 4, ksub = 8)
    assert(EmbeddingIndex.driftL1e6(cat, "emx") === 0L,
      "freshly bootstrapped: current occupancy IS the bootstrap occupancy")
    // same-distribution churn: replace a third of the corpus with vectors
    // drawn from the SAME generator — occupancy barely moves
    val v0 = cat.currentVersion("emb")
    val ep = cat.baseEpoch("emb")
    cat.upsert("emb", df((0L until 60L).filter(_ % 3 == 0)))
    EmbeddingIndex.refresh(cat, "emx", "emb", v0,
      cat.currentVersion("emb"), ep, "vec_id", "embedding")
    val calm = EmbeddingIndex.driftL1e6(cat, "emx")
    // planted SHIFT: rewrite the whole corpus as one tight off-manifold
    // cluster — the frozen cells now see most of the mass in one region
    val shifted = spark.createDataFrame(
      (0L until 60L).map(i => Row(i,
        (0 until dim).map(j => 0.9f + ((i + j) % 7) / 100.0f))).asJava,
      embSchema)
    val v1 = cat.currentVersion("emb")
    cat.upsert("emb", shifted)
    EmbeddingIndex.refresh(cat, "emx", "emb", v1,
      cat.currentVersion("emb"), ep, "vec_id", "embedding")
    val drifted = EmbeddingIndex.driftL1e6(cat, "emx")
    assert(drifted > calm,
      s"planted shift must raise the drift metric (calm=$calm drifted=$drifted)")
    assert(drifted >= 200000L,
      s"a full-corpus regeneration re-routes >= 10% of mass, got $drifted")
  }

  test("rebootstrap: atomic generation swap — probes see old or new, " +
    "never a mix; the new index equals a fresh bootstrap bit-for-bit") {
    val cat = seeded()
    val corpus = cat.table("emb")
    EmbeddingIndex.bootstrap(cat, "emx", corpus, "vec_id", "embedding",
      cells = 4, m = 4, ksub = 8)
    val queries = df(1000L until 1006L)
    val before = rowsOf(EmbeddingIndex.probe(cat, "emx", queries, corpus,
      k = 3, nprobe = 2, rerank = 16))
    // drift the corpus, then answer the fired probe with a refit
    val v0 = cat.currentVersion("emb")
    val ep = cat.baseEpoch("emb")
    cat.upsert("emb", df(0L until 60L, salt = 23))
    EmbeddingIndex.refresh(cat, "emx", "emb", v0,
      cat.currentVersion("emb"), ep, "vec_id", "embedding")
    val gen = EmbeddingIndex.rebootstrap(cat, "emx", cat.table("emb"),
      "vec_id", "embedding", cells = 4, m = 4, ksub = 8)
    assert(gen === "emx__g1")
    assert(EmbeddingIndex.resolve(cat, "emx") === "emx__g1")
    // the swapped-in index answers exactly like an index bootstrapped
    // fresh on the current corpus (same deterministic training recipe)
    val freshCat = new KuduLikeCatalog(spark, tmpDir("graft_emx4_"))
    freshCat.createTable(TableDef("emb", embSchema, Seq("vec_id"), buckets = 4))
    freshCat.insert("emb", df(0L until 60L, salt = 23))
    EmbeddingIndex.bootstrap(freshCat, "fmx", freshCat.table("emb"),
      "vec_id", "embedding", cells = 4, m = 4, ksub = 8)
    val viaSwap = rowsOf(EmbeddingIndex.probe(cat, "emx", queries,
      cat.table("emb"), k = 3, nprobe = 2, rerank = 16))
    val viaFresh = rowsOf(EmbeddingIndex.probe(freshCat, "fmx", queries,
      freshCat.table("emb"), k = 3, nprobe = 2, rerank = 16))
    assert(viaSwap === viaFresh)
    assert(viaSwap !== before, "the refit re-routed a drifted corpus")
    // and the refit resets the drift reference: new generation, zero drift
    assert(EmbeddingIndex.driftL1e6(cat, "emx") === 0L)
    // NO MIX: the superseded generation's tables all survive the flip (an
    // in-flight probe that resolved pre-flip reads a complete old index —
    // probe resolves ONCE and builds every frame against physical names),
    // until vacuum reclaims exactly that generation
    assert(cat.exists("emx") && cat.exists("emx__model") &&
      cat.exists("emx__meta") && cat.exists("emx__stats"))
    val dropped = EmbeddingIndex.vacuumOldGenerations(cat, "emx")
    assert(dropped === Seq("emx"))
    assert(!cat.exists("emx") && !cat.exists("emx__model") &&
      !cat.exists("emx__meta") && !cat.exists("emx__stats"))
    assert(cat.exists("emx__g1") && cat.exists("emx__ptr"))
    // probes through the logical name keep answering after the vacuum
    assert(rowsOf(EmbeddingIndex.probe(cat, "emx", queries,
      cat.table("emb"), k = 3, nprobe = 2, rerank = 16)) === viaSwap)
  }
}
