package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.8 "similarity search").
  *
  * [[bruteForceTopK]] is the exact baseline (quadratic — fine for a query
  * batch against a corpus when the query side is small/broadcastable).
  * [[lshTopK]] is the scale path: random-hyperplane (sign) LSH buckets both
  * sides so only same-bucket pairs are scored — candidate generation is a
  * hash-partitioned equi-join, never a cross join. Recall < 1.0 by design;
  * probe multiple bucket permutations to trade cost for recall.
  */
object Similarity {

  /** Exact top-k by cosine for each query row against the corpus.
    * Output: (qid, rank, id, cos). The query side should be small — Spark
    * broadcasts it under AQE; at 100 TB the corpus side only streams.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(embCol).as("q_emb"))
    val c = graft.Tables.parallel(
      corpus.select(col(idCol).as("id"), col(embCol).as("c_emb")))
    val pairs = q.crossJoin(c)
      .filter(col("qid") =!= col("id"))
      .withColumn("cos", VectorFunctions.cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "id", "cos")
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer + cell-restricted
    * scoring — the other standard scale path besides LSH. Centroids are
    * trained once (MLlib KMeans, fixed seed, sampled corpus); each corpus
    * vector is assigned to its nearest cell, queries probe their `nprobe`
    * nearest cells, and only same-cell pairs are scored. Assignment joins
    * broadcast the tiny centroid table; candidate scoring is an equi-join on
    * the cell id. Recall rises with `nprobe` (= 1 - mass outside probed
    * cells).
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      cells: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", embCol: String = "embedding",
      trainer: String = "ml"): DataFrame = {
    val spark = corpus.sparkSession
    val centroidRows: Seq[(Int, Array[Float])] = trainer match {
      case "ml" =>
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        // Fit the coarse quantizer on a bounded SAMPLE, never the full
        // corpus: KMeans is maxIter full passes over its input, and 16
        // centroids need ~1e5 vectors, not 100 TB. Deterministic seed; the
        // exact fraction only shifts centroid positions, not the operator
        // contract (recall is gated by the nprobe probe set, ScaleOpsSpec).
        val maxFit = 100000L
        val n = corpus.count()
        val sampled =
          if (n <= maxFit) corpus
          else corpus.sample(withReplacement = false, maxFit.toDouble / n, seed = 42L)
        val train = sampled.select(array_to_vector(
          transform(col(embCol), x => x.cast("double"))).as("features"))
        val model = new KMeans().setK(cells).setSeed(42L).setMaxIter(10).fit(train)
        model.clusterCenters.zipWithIndex
          .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }.toIndexedSeq
      case "graft" =>
        // full-corpus distributed Lloyd (operators/KMeans.scala): one
        // map-side-combined aggregate per iteration, bit-deterministic
        // decimal sums — the trainer for pipelines that need reproducible
        // cell boundaries (a re-run must route every vector identically or
        // incremental index maintenance diverges)
        val m = graft.operators.KMeans.fit(
          corpus, embCol, idCol, k = cells, maxIter = 10)
        m.centroids.zipWithIndex.map { case (c, i) => (i, c) }.toIndexedSeq
      case other =>
        throw new IllegalArgumentException(
          s"ivfTopK trainer must be 'ml' or 'graft', got '$other'")
    }
    val centroids = spark.createDataFrame(centroidRows).toDF("cell", "centroid")

    def assign(df: DataFrame, id: String, emb: String, keep: Int): DataFrame = {
      val scoredCells = df.join(broadcast(centroids))
        .withColumn("d", VectorFunctions.cosine(col(emb), col("centroid")))
      val w = Window.partitionBy(col(id)).orderBy(col("d").desc, col("cell").asc)
      scoredCells.withColumn("r", row_number().over(w))
        .filter(col("r") <= keep)
        .select(col(id), col(emb), col("cell"))
    }

    val q = assign(queries.select(col(idCol).as("qid"), col(embCol).as("q_emb")), "qid", "q_emb", nprobe)
    val c = assign(corpus.select(col(idCol).as("id"), col(embCol).as("c_emb")), "id", "c_emb", 1)
    val scored = q.join(c, Seq("cell"))
      .filter(col("qid") =!= col("id"))
      .select("qid", "id", "q_emb", "c_emb").distinct()
      .withColumn("cos", VectorFunctions.cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "id", "cos")
  }

  /** Sign-LSH bucket for one hash table: bits of sign(dot(emb, plane_i)),
    * planes indexed globally from `planeOffset`. Hyperplane components are
    * deterministic pseudo-random values derived from (plane, dim) — no
    * driver-side randomness, reproducible across runs and executors.
    */
  def signBucket(emb: org.apache.spark.sql.Column, planes: Int, planeOffset: Int = 0): org.apache.spark.sql.Column =
    (0 until planes).map { p =>
      val g = planeOffset + p
      // plane component for (plane g, dim i): cos(i * (g+1) * 2.399963) —
      // irrational multiplier gives a sign-balanced pseudo-random direction
      val proj = aggregate(
        zip_with(emb, sequence(lit(1), size(emb)), (x, i) =>
          x.cast("double") * cos(i.cast("double") * lit((g + 1) * 2.39996322972865332))),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** ANN top-k with multi-table sign-LSH: `tables` independent bucketings
    * are exploded on both sides and candidates are the union of same-bucket
    * pairs (recall = 1-(1-p)^tables per pair). Candidate generation is a
    * hash-partitioned equi-join on (table, bucket); only deduped candidate
    * pairs are re-joined to the embeddings and scored — corpus never
    * cross-joins.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 4, tables: Int = 4,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(embCol).as("q_emb"))
    val c = corpus.select(col(idCol).as("id"), col(embCol).as("c_emb"))
    def buckets(df: DataFrame, id: String, emb: String) = df.select(
      col(id),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), signBucket(col(emb), planes, t * planes).as("b"))): _*)).as("tb"))
      .select(col(id), col("tb.t").as("t"), col("tb.b").as("b"))
    val candidates = buckets(q, "qid", "q_emb")
      .join(buckets(c, "id", "c_emb"), Seq("t", "b"))
      .filter(col("qid") =!= col("id"))
      .select("qid", "id").distinct()
    val scored = candidates.join(q, "qid").join(c, "id")
      .withColumn("cos", VectorFunctions.cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "id", "cos")
  }

  /** Product-quantization ANN (Jégou et al., TPAMI 2011) — the
    * memory-bandwidth scale path: the corpus is scanned as m-byte PQ codes
    * (16-32× smaller than the float payload) against a per-query lookup
    * table, and only the `rerank` best ADC candidates per query touch real
    * embeddings for exact scoring. Where [[ivfTopK]] cuts WHICH rows are
    * scored, PQ cuts the BYTES PER ROW — at 100 TB they compose (encode
    * per IVF cell = IVFADC); this operator is the pure-PQ form so each
    * path is gated separately.
    *
    * Shape: both sides are L2-normalized (cosine ≡ dot thereafter), the
    * codebooks are trained by deterministic driver-side Lloyd iterations
    * on a BOUNDED sample (≤ maxFit vectors collected — the same sampled-
    * fit contract as ivfTopK's KMeans; at d=64 floats that is ≤ 2.5 MB),
    * corpus codes and query LUTs are computed distributed, ADC scoring is
    * a narrow scan (m lookups/row, dimension-independent), and the exact
    * re-rank joins only the Q×rerank shortlist back to the embeddings.
    * Returned `cos` is the EXACT cosine of surviving candidates, so
    * results are comparable (and tie-broken identically) to
    * [[bruteForceTopK]]; recall is gated in PqSpec.
    */
  /** IVFADC (Jégou et al. §IV): IVF cuts WHICH rows are scored (queries
    * probe their `nprobe` nearest KMeans cells), PQ cuts the BYTES PER ROW
    * (in-cell candidates are scored as m-byte codes against the query's
    * LUT), and the exact re-rank keeps returned scores exact. This is the
    * composition the pure forms ([[ivfTopK]], [[pqTopK]]) exist to gate
    * separately: at 100 TB the ADC scan reads |corpus|·nprobe/cells · m
    * bytes — both reduction factors multiply.
    *
    * Plumbing: cell assignment is the IVF broadcast-centroid join; PQ
    * codes are computed once per corpus row; the per-cell candidate join
    * is the same (cell) equi-join as IVF, but carrying CODES instead of
    * embeddings — the float payload only moves for the Q×rerank shortlist.
    */
  def ivfPqTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      cells: Int = 16, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 16, rerank: Int = 64,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    pqTopKImpl(queries, corpus, k, m, ksub, rerank, idCol, embCol,
      ivf = Some((cells, nprobe)))

  def pqTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, rerank: Int = 64,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    pqTopKImpl(queries, corpus, k, m, ksub, rerank, idCol, embCol, ivf = None)

  private def pqTopKImpl(
      queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int, ksub: Int, rerank: Int,
      idCol: String, embCol: String,
      ivf: Option[(Int, Int)]): DataFrame = {
    import graft.functions.{PqAdcExpr, PqEncodeExpr, PqLutExpr, PqUtil}
    import org.apache.spark.sql.graftbridge.ColumnBridge

    def normalized(df: DataFrame, id: String, emb: String): DataFrame = {
      val nrm = sqrt(aggregate(col(emb), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
      df.select(col(id), transform(col(emb),
        x => (x.cast("double") / nrm).cast("float")).as(emb))
    }

    val c = graft.Tables.parallel(
      normalized(corpus.select(col(idCol).as("id"), col(embCol).as("c_emb")), "id", "c_emb"))
    val q = normalized(
      queries.select(col(idCol).as("qid"), col(embCol).as("q_emb")), "qid", "q_emb")

    // --- codebook training: bounded sample, deterministic Lloyd ---
    val maxFit = 10000L
    val n = c.count()
    val sampleDf =
      if (n <= maxFit) c
      else c.sample(withReplacement = false, maxFit.toDouble / n, seed = 42L)
    // ordered by id so the collected sample (and therefore Lloyd's
    // deterministic init) is identical under any partitioning
    val sample = sampleDf.select("id", "c_emb").orderBy("id").collect()
      .map(_.getSeq[Float](1).toArray)
    require(sample.nonEmpty, "pqTopK: empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"pqTopK: dim $dim not divisible by m=$m")
    val sub = dim / m
    val codebooks: Array[Array[Array[Float]]] = Array.tabulate(m) { s =>
      lloyd(sample.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub)),
        ksub, iters = 10)
    }

    // --- distributed encode / LUT / ADC scan / exact re-rank ---
    val coded = c.select(col("id"), col("c_emb"), ColumnBridge.column(
      PqEncodeExpr(ColumnBridge.expression(col("c_emb")), codebooks)).as("codes"))
    val luts = q.select(col("qid"), col("q_emb"), ColumnBridge.column(
      PqLutExpr(ColumnBridge.expression(col("q_emb")), codebooks)).as("lut"))
    // candidate pairing: full coded scan (pure PQ), or the IVF (cell)
    // equi-join — coarse centroids trained on the SAME driver sample, so
    // IVFADC costs no extra corpus pass
    val pairs = ivf match {
      case None => luts.select("qid", "lut").crossJoin(coded.select("id", "codes"))
      case Some((cells, nprobe)) =>
        val spark = corpus.sparkSession
        val coarse = lloyd(sample, cells, iters = 10)
        val centroids = broadcast(spark.createDataFrame(
          coarse.zipWithIndex.map { case (cent, i) => (i, cent) }
            .toIndexedSeq).toDF("cell", "centroid"))
        def assign(df: DataFrame, emb: String, keep: Int, keyCol: String): DataFrame = {
          val scored = df.join(centroids)
            .withColumn("d", VectorFunctions.cosine(col(emb), col("centroid")))
          val w = Window.partitionBy(col(keyCol)).orderBy(col("d").desc, col("cell").asc)
          scored.withColumn("cr", row_number().over(w))
            .filter(col("cr") <= keep)
            .drop("d", "cr", "centroid")
        }
        assign(luts, "q_emb", nprobe, "qid").select("qid", "lut", "cell")
          .join(assign(coded, "c_emb", 1, "id").select("id", "codes", "cell"), Seq("cell"))
    }
    val adc = pairs
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"), ColumnBridge.column(PqAdcExpr(
        ColumnBridge.expression(col("lut")),
        ColumnBridge.expression(col("codes")))).as("adc"))
    val wAdc = Window.partitionBy("qid").orderBy(col("adc").desc, col("id").asc)
    val shortlist = adc.withColumn("r", row_number().over(wAdc))
      .filter(col("r") <= rerank)
      .select("qid", "id")
    val exact = shortlist.join(q, "qid").join(c, "id")
      .withColumn("cos", VectorFunctions.cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id").asc)
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "id", "cos")
  }

  /** Deterministic driver-side Lloyd iterations: init = evenly spaced
    * sample points (no RNG state), empty cells keep their centroid. Both
    * PQ subspace codebooks and IVFADC coarse centroids train through this
    * one loop over the bounded collected sample.
    */
  private[operators] def lloyd(vecs: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    require(vecs.nonEmpty, "lloyd: empty training set")
    val dim = vecs.head.length
    val kk = math.min(k, vecs.length)
    var cents = Array.tabulate(kk)(j => vecs(j * vecs.length / kk).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      vecs.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < cents.length) {
          var d = 0.0; var i = 0
          while (i < dim) { val df0 = v(i) - cents(j)(i); d += df0 * df0; i += 1 }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, j) =>
        if (counts(j) == 0) old
        else Array.tabulate(dim)(i => (sums(j)(i) / counts(j)).toFloat)
      }
      it += 1
    }
    cents
  }
}
