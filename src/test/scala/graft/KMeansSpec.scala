package graft

import graft.operators.{Dedup, KMeans}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means (operators/KMeans.scala) and SemDeDup semantic
  * dedup: convergence, bit-determinism under repartitioning, empty-cell
  * handling, cluster quality on separated data, and equivalence of the
  * literal-centroid and seeds-DataFrame assignment paths. The per-iteration
  * math is additionally oracle-gated cross-engine by d42_kmeans_iter.
  */
class KMeansSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("fit: inertia is non-increasing as iterations grow") {
    val m1 = KMeans.fit(emb, "embedding", "vec_id", k = 4, maxIter = 1)
    val m5 = KMeans.fit(emb, "embedding", "vec_id", k = 4, maxIter = 5)
    assert(m5.inertia <= m1.inertia + 1e-9,
      s"inertia grew: 1 iter ${m1.inertia} -> 5 iters ${m5.inertia}")
    assert(m1.iters === 1 && m5.iters <= 5)
  }

  test("fit: exact mode is bit-deterministic across partitionings") {
    val a = KMeans.fit(emb.repartition(3), "embedding", "vec_id", k = 4, maxIter = 4)
    val b = KMeans.fit(emb.repartition(13), "embedding", "vec_id", k = 4, maxIter = 4)
    assert(a.centroids.map(_.toSeq).toSeq === b.centroids.map(_.toSeq).toSeq,
      "decimal-summed centroids must not depend on partitioning")
    assert(a.inertia === b.inertia)
  }

  test("fit: converges (shift under tol stops early) and assign covers [0,k)") {
    val m = KMeans.fit(emb, "embedding", "vec_id", k = 4, maxIter = 50, tol = 1e-4)
    assert(m.iters < 50, s"did not converge in 50 iters (final shift ${m.shift})")
    val cells = KMeans.assign(emb, "embedding", m.centroids.map(_.toSeq).toSeq)
      .select("cell").distinct().collect().map(_.getInt(0)).sorted
    assert(cells.forall(c => c >= 0 && c < 4))
    assert(cells.length === 4, s"degenerate clustering: cells ${cells.toSeq}")
  }

  test("fit refuses k greater than the training-set row count (loud, not clamped)") {
    import spark.implicits._
    val pts = Seq((1L, Seq(0f, 0f)), (2L, Seq(1f, 1f))).toDF("id", "e")
    val ex = intercept[IllegalArgumentException] {
      KMeans.fit(pts, "e", "id", k = 5, maxIter = 1)
    }
    assert(ex.getMessage.contains("got 2"),
      s"error must surface the actual row count: ${ex.getMessage}")
  }

  test("fit: k exceeding distinct points keeps orphan seeds (empty cells)") {
    import spark.implicits._
    // two distinct values, k=3: at least one cell is a duplicate seed that
    // can never win a first-minimum argmin — it must stay an empty cell
    // with its (finite) seed centroid, never a NaN from a 0-count mean
    val pts = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0f, 0f)),
      (3L, Seq(10f, 10f)), (4L, Seq(10f, 10f)))
      .toDF("id", "e")
    val m = KMeans.fit(pts, "e", "id", k = 3, maxIter = 3)
    assert(m.centroids.length === 3)
    assert(m.centroids.forall(_.forall(v => !v.isNaN && !v.isInfinite)),
      s"empty cell produced a non-finite centroid: ${m.centroids.map(_.toSeq).toSeq}")
    val cells = KMeans.assign(pts, "e", m.centroids.map(_.toSeq).toSeq)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(1L) === cells(2L) && cells(3L) === cells(4L),
      "identical points must share a cell")
    assert(cells(1L) !== cells(3L), "separated values must get distinct cells")
  }

  test("fit: clusters separated synthetic data perfectly") {
    import spark.implicits._
    // two tight blobs far apart, 20 points each, deterministic offsets
    val pts = (0 until 40).map { i =>
      val base = if (i < 20) 0f else 100f
      (i.toLong, Seq(base + (i % 5) * 0.1f, base - (i % 3) * 0.1f))
    }.toDF("id", "e")
    val m = KMeans.fit(pts, "e", "id", k = 2, maxIter = 10)
    val asg = KMeans.assign(pts, "e", m.centroids.map(_.toSeq).toSeq)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1))
    val lo = asg.filter(_._1 < 20).map(_._2).toSet
    val hi = asg.filter(_._1 >= 20).map(_._2).toSet
    assert(lo.size === 1 && hi.size === 1 && lo != hi,
      s"blobs not separated: lo=$lo hi=$hi")
  }

  test("assignBySeeds equals literal-centroid assign for the same centroids") {
    import spark.implicits._
    val seedRows = emb.filter(col("vec_id") < 8)
      .orderBy("vec_id").collect()
      .map(r => r.getSeq[Float](1).toSeq)
    val viaLit = KMeans.assign(emb, "embedding", seedRows.toSeq)
      .select("vec_id", "cell")
    val seedsDf = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("centroid"))
    val viaSeeds = KMeans.assignBySeeds(emb, "vec_id", "embedding", seedsDf)
      .select("vec_id", "cell")
    assert(viaLit.exceptAll(viaSeeds).count() === 0)
    assert(viaSeeds.exceptAll(viaLit).count() === 0)
  }

  test("semanticDedup: drops are cluster-local, keep-lowest-id, and both " +
    "entry points agree") {
    val seedsDf = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("centroid"))
    val viaSeeds = Dedup.semanticDedupSeeds(emb, "vec_id", "embedding", seedsDf, 0.35)
    val seedRows = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toSeq).toSeq
    val viaLit = Dedup.semanticDedup(emb, "vec_id", "embedding", seedRows, 0.35)
    assert(viaSeeds.exceptAll(viaLit).count() === 0)
    assert(viaLit.exceptAll(viaSeeds).count() === 0)

    val rows = viaSeeds.collect()
    assert(rows.length === emb.count(), "every input row must appear once")
    // the lowest id of every cell can never be dropped
    val byCell = rows.groupBy(_.getInt(1))
    byCell.foreach { case (c, rs) =>
      val lowest = rs.map(_.getLong(0)).min
      val flag = rs.find(_.getLong(0) == lowest).get.getBoolean(2)
      assert(!flag, s"cell $c dropped its lowest id $lowest")
    }
  }

  test("fit: exact=false (raw-double throughput mode) lands within noise " +
    "of the exact centroids; withInertia=false skips the pass") {
    val a = KMeans.fit(emb, "embedding", "vec_id", k = 4, maxIter = 4)
    val b = KMeans.fit(emb, "embedding", "vec_id", k = 4, maxIter = 4,
      exact = false)
    a.centroids.zip(b.centroids).foreach { case (ca, cb) =>
      ca.zip(cb).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-4,
          s"double-sum centroid drifted past noise: $x vs $y")
      }
    }
    val m = KMeans.fit(emb, "embedding", "vec_id", k = 4, maxIter = 1,
      withInertia = false)
    assert(m.inertia.isNaN, "withInertia=false must not compute inertia")
    assert(m.centroids.length === 4)
  }

  test("ivfTopK with the graft full-corpus trainer keeps the recall gate") {
    import graft.operators.Similarity
    val queries = emb.filter(col("vec_id") < 20)
    val ivf = Similarity.ivfTopK(queries, emb, k = 5, cells = 8, nprobe = 3,
      trainer = "graft")
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
    val exactSet = exact.select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = ivf.select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).count(exactSet)
    val recall = hits.toDouble / exactSet.size
    assert(recall >= 0.3, s"graft-trained IVF recall $recall too low")
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(queries, emb, k = 5, trainer = "bogus")
    }
  }

  test("fit: training beats the un-trained seed quantizer (inertia drops)") {
    // the 1-iteration model's inertia is measured AGAINST its moved
    // centroids; re-measuring the raw seed centroids as a quantizer must be
    // strictly worse on this data — i.e. the Lloyd step actually improves
    // the codebook, which is the whole claim of fit() over seed-picking.
    // the exact seed set fit() starts from (md5 top-k, RNG-free)
    val seeds = emb
      .select(col("embedding"),
        md5(concat(lit("km:"), col("vec_id").cast("string"))).as("h"))
      .orderBy("h").limit(4)
      .collect().map(_.getSeq[Float](0).toSeq).toSeq
    val seedInertia = emb
      .select(org.apache.spark.sql.functions.array_min(
        KMeans.distances(col("embedding"), seeds)).cast("decimal(28,8)").as("d"))
      .agg(sum(col("d"))).collect()(0).getDecimal(0).doubleValue()
    val m = KMeans.fit(emb, "embedding", "vec_id", k = 4, maxIter = 5)
    assert(m.inertia < seedInertia,
      s"trained inertia ${m.inertia} not below seed-quantizer $seedInertia")
  }
}
