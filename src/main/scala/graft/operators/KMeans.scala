package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an `array<float>` embedding column —
  * the full-corpus trainer behind coarse quantizers (IVF cells) and
  * semantic dedup (SemDeDup-style cluster-then-prune).
  *
  * Spark ML's KMeans serves [[Similarity.ivfTopK]] on a bounded sample;
  * this trainer exists for the cases where the ASSIGNMENT must cover every
  * row anyway (semantic dedup reads every doc's cluster) so the marginal
  * cost of training on the full corpus is one aggregate per iteration, and
  * for pipelines that need bit-reproducible centroids across reruns and
  * repartitionings (the repo-wide determinism contract, SURVEY.md §2
  * legend).
  *
  * Scale shape per iteration (the 100-TB argument):
  *  - assignment is a per-row codegen'd HOF fold over a centroid ARRAY
  *    LITERAL — no join, no shuffle, no broadcast table; code size is
  *    constant in k (one `transform` loop), work is O(k·dim) per row;
  *  - the update is ONE `groupBy(cell)` aggregate producing k rows of
  *    (count, dim component sums) — map-side combined, so the shuffle
  *    carries k·(dim+1) values per input partition, never rows;
  *  - the driver holds only the k×dim centroid matrix between iterations
  *    (the same driver-resident state every distributed k-means keeps).
  *
  * Determinism: with `exact = true` (default) component sums run on
  * DECIMAL(28,8)-cast inputs — decimal addition is associative, so the
  * centroids are bit-identical regardless of partitioning or partial-agg
  * order, and therefore so is every downstream assignment. `exact = false`
  * sums raw doubles (faster, last-bit partition-order sensitive) for
  * throughput-first training where reproducibility is not contractual.
  * Init is RNG-free: the k seed rows with the smallest `md5("km:" || id)`
  * (a TakeOrdered top-k, not a global sort). Empty cells keep their
  * previous centroid, mirroring the driver-side `lloyd` in Similarity.
  *
  * Reference analog: the reference has no ML surface — this extends the
  * engine along the training-data-pipeline axis (SURVEY.md §2.8), same
  * rationale as MinHash/IVF/PQ.
  */
object KMeans {

  /** Fitted model: `centroids(j)` is cell j's center; `iters` actually run;
    * `shift` the final max centroid movement (L2); `inertia` the final sum
    * of squared distances to the assigned centroid.
    */
  final case class Model(
      centroids: Array[Array[Float]], iters: Int, shift: Double, inertia: Double)

  /** Squared L2 distance between an embedding column and one centroid
    * column, as the explicit left-to-right double fold every vector op in
    * this repo uses (VectorFunctions): bit-stable given operand order.
    */
  def l2sq(emb: Column, cent: Column): Column =
    aggregate(
      zip_with(emb, cent, (x, c) => {
        val d = x.cast("double") - c.cast("double")
        d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Distances to every centroid, as `array<double>` in cell order. The
    * centroid matrix rides as ONE array-of-array literal; `transform` loops
    * it at runtime, so generated code size is constant in k.
    */
  def distances(emb: Column, cents: Seq[Seq[Float]]): Column =
    transform(typedLit(cents), c => l2sq(emb, c))

  /** Hard assignment: index of the nearest centroid, first-minimum
    * tie-break (lowest cell id) via `array_position` of `array_min`.
    */
  def cell(emb: Column, cents: Seq[Seq[Float]]): Column = {
    val d = distances(emb, cents)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** Adds `cellCol` = nearest-centroid id. Pure per-row expression work. */
  def assign(df: DataFrame, embCol: String, cents: Seq[Seq[Float]],
      cellCol: String = "cell"): DataFrame =
    df.withColumn(cellCol, cell(col(embCol), cents))

  /** Assignment against a centroid TABLE `seeds(cell, centroid)` instead of
    * a literal matrix — the collect-free form for pipelines whose centroids
    * are themselves a DataFrame (e.g. seed rows picked by a query). The
    * seed side is broadcast (k·dim — always tiny); the nearest cell is the
    * row_number-1 pick over (distance, cell), the ivfTopK assign shape.
    *
    * Cost note: the per-row argmin over the k-expanded join needs ONE hash
    * shuffle on `idCol` (the window's partitioning); [[assign]]'s literal
    * fold is shuffle-free — prefer it whenever the centroids are already
    * driver-resident (a fitted [[Model]]), and this form only when they
    * must stay a DataFrame.
    */
  def assignBySeeds(df: DataFrame, idCol: String, embCol: String,
      seeds: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("__d"), col("cell"))
    df.join(broadcast(seeds))
      .withColumn("__d", l2sq(col(embCol), col("centroid")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__d", "__rn", "centroid")
  }

  /** Trains k centroids with Lloyd iterations until the max centroid
    * movement drops under `tol` or `maxIter` is reached. One full pass per
    * iteration; callers looping many iterations over a re-read-expensive
    * source should cache `df` themselves (this operator never forces
    * persistence — at 100 TB that choice belongs to the pipeline).
    *
    * Driver-side collects are bounded by construction: k seed rows at init,
    * k aggregate rows per iteration, one scalar for the final inertia —
    * metadata-scale regardless of corpus size (documented in ContractSpec's
    * collect lint).
    */
  def fit(df: DataFrame, embCol: String, idCol: String, k: Int,
      maxIter: Int = 10, tol: Double = 1e-6, exact: Boolean = true,
      withInertia: Boolean = true): Model = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")

    val seedRows = df
      .select(col(idCol), col(embCol),
        md5(concat(lit("km:"), col(idCol).cast("string"))).as("__h"))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .select(col(embCol))
      .collect()
    // Loud, not clamped: a caller that sized downstream structures for k
    // cells (an IVF cell table, a SemDeDup centroid matrix) would silently
    // cover a smaller id range if fit returned fewer centroids than asked.
    require(seedRows.length == k,
      s"kmeans: need >= $k training rows for k = $k, got ${seedRows.length}")
    var cents: Array[Array[Float]] =
      seedRows.map(_.getSeq[Float](0).toArray)
    val dim = cents.head.length
    val sumType = if (exact) "decimal(28,8)" else "double"

    var it = 0
    var shift = Double.MaxValue
    while (it < maxIter && shift > tol) {
      val sums = (0 until dim).map(i =>
        sum(element_at(col(embCol), i + 1).cast(sumType)).as(s"s$i"))
      val rows = df
        .groupBy(cell(col(embCol), cents.map(_.toSeq).toSeq).as("__cell"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
      val next = cents.map(_.clone())
      rows.foreach { r =>
        val j = r.getInt(0)
        val n = r.getLong(1)
        if (n > 0) {
          var i = 0
          while (i < dim) {
            val s =
              if (exact) r.getDecimal(2 + i).doubleValue()
              else r.getDouble(2 + i)
            next(j)(i) = (s / n).toFloat
            i += 1
          }
        }
      }
      shift = cents.zip(next).map { case (a, b) =>
        math.sqrt(a.zip(b).map { case (x, y) =>
          val d = x.toDouble - y.toDouble; d * d
        }.sum)
      }.max
      cents = next
      it += 1
    }

    // exact mode rounds each row's (deterministic) distance to DECIMAL
    // before the cross-partition sum, so the reported inertia is as
    // partition-order-free as the centroids it describes; withInertia=false
    // skips the extra pass for callers that only need the centroids (e.g.
    // d42's single-iteration gate)
    val dCol = array_min(distances(col(embCol), cents.map(_.toSeq).toSeq))
    val inertia =
      if (!withInertia) Double.NaN
      else if (exact)
        df.select(dCol.cast("decimal(28,8)").as("d")).agg(sum(col("d")))
          .collect()(0).getDecimal(0).doubleValue()
      else
        df.select(dCol.as("d")).agg(sum(col("d"))).collect()(0).getDouble(0)
    Model(cents, it, shift, inertia)
  }
}
