package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier — the fastText / FineWeb-Edu stage
  * of a curation pipeline: a linear model over hashed bigram features,
  * trained by distributed logistic regression, scoring every doc with a
  * single margin that a threshold turns into keep/drop. Completes the
  * published-recipe filter set next to the rule-based (Gopher, d40),
  * LM-based (CCNet, d41) and importance-based (DSIR, d47) stages.
  *
  * Feature space: the d47/DSIR hashed-bigram buckets — bucket id =
  * md5-hex-prefix of the bigram mod `buckets`, the repo's engine-portable
  * hash, so a frozen model's scoring face is reproducible in any engine.
  * A doc's feature vector is its MEAN bag of buckets (count_b / n_grams,
  * the fastText averaging), so the margin is length-normalized by
  * construction and one threshold serves short and long docs alike.
  *
  * Two faces, like every learned operator here:
  *  - [[train]] — the learning loop, spec-gated (logistic loss needs
  *    exp/log, which are libm-divergent cross-engine, so training can
  *    never sit under a cell-exact oracle; QualityClassifierSpec gates it
  *    on planted separable corpora instead);
  *  - [[score]] — inference with FROZEN fixed-point integer weights (the
  *    ship-the-model pattern): pure BIGINT arithmetic, cell-exact in any
  *    engine, declared as d51 under the driver's DuckDB hash.
  *
  * Scale shape: the learned state is ONE `buckets`-sized vector no matter
  * the corpus size. Training materializes the (doc, bucket) count frame
  * once (≤ `buckets` entries per doc) and per epoch runs two bounded
  * shuffles — margins (doc-keyed) and gradients (bucket-keyed, map-side
  * combined to ≤ `buckets` rows) — with the weight vector broadcast as a
  * literal-sized table; the driver only ever collects `buckets` rows per
  * epoch. Inference is zero-join: weights ride the plan as an array
  * literal, one narrow explode + one doc-keyed agg.
  */
object QualityClassifier {

  /** A trained model: dense per-bucket weights + bias, with the fixed-point
    * quantization that freezes it for the exact-arithmetic scoring face.
    */
  final case class Model(weights: Array[Double], bias: Double, buckets: Int) {
    /** Per-bucket weights in 1e4 fixed point (round-half-up). */
    def weights1e4: Seq[Long] = weights.map(w => math.round(w * 1e4)).toSeq
    def bias1e4: Long = math.round(bias * 1e4)
  }

  /** Exploded hashed-bigram instances: one row per bigram occurrence,
    * (idCol, b) with b in [0, buckets). Exactly the d47 bucket pipeline.
    */
  private def instances(docs: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .select(col(idCol), explode(TextFunctions.wordShinglesOf(toks, 2)).as("g"))
      .select(col(idCol),
        (expr("CAST(conv(substring(md5(g), 1, 4), 16, 10) AS INT)")
          % buckets).as("b"))
  }

  /** Train logistic regression with full-batch gradient descent.
    *
    * `label` must evaluate to 0/1 (cast to double). Docs with no bigram
    * have no features and are excluded, mirroring [[score]] and d47.
    * Full-batch GD (not SGD) because each epoch is then two deterministic
    * map-side-combined shuffles with no per-partition sequencing — the
    * distributed-friendly form; `epochs` × that is the whole cost. The
    * double-precision sums make training run-to-run stable but not
    * bit-pinned across partitionings (documented — the planted-margin spec
    * gates are partitioning-robust; the frozen SCORING face is exact).
    */
  def train(docs: DataFrame, textCol: String, idCol: String, label: Column,
      buckets: Int = 64, epochs: Int = 40, lr: Double = 4.0,
      l2: Double = 1e-4): Model = {
    require(buckets >= 2, s"need >= 2 hash buckets, got $buckets")
    require(epochs >= 1 && lr > 0 && l2 >= 0)
    val spark = docs.sparkSession
    import spark.implicits._

    val inst = instances(docs.withColumn("__y", label.cast("double")),
      textCol, idCol, buckets)
    val labeled = docs.select(col(idCol), label.cast("double").as("__y"))
    // (id, y, b, x) with x = count_b / n_grams; one bounded frame, reused
    // every epoch — persisted because 2·epochs jobs re-read it.
    val feat = inst.groupBy(col(idCol), col("b")).agg(count(lit(1)).as("cnt"))
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))))
      .withColumn("x", col("cnt").cast("double") / col("n"))
      .join(labeled, idCol)
      .select(col(idCol).as("id"), col("__y").as("y"), col("b"), col("x"))
      .persist()
    val nDocs = feat.select("id").distinct().count().toDouble
    require(nDocs > 0, "no documents with at least one bigram to train on")

    var w = new Array[Double](buckets)
    var bias = 0.0
    for (_ <- 1 to epochs) {
      val wDf = broadcast(w.toSeq.zipWithIndex
        .map { case (wi, i) => (i, wi) }.toDF("b", "w"))
      val resid = feat.join(wDf, "b")
        .groupBy("id", "y")
        .agg(sum(col("x") * col("w")).as("dot"))
        .withColumn("p", expr(s"1.0 / (1.0 + exp(-(dot + $bias)))"))
        .select(col("id"), (col("p") - col("y")).as("r"))
      val grads = feat.join(resid, "id")
        .groupBy("b").agg(sum(col("r") * col("x")).as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val biasGrad = resid.agg(sum("r")).head().getDouble(0) / nDocs
      w = Array.tabulate(buckets)(b =>
        w(b) - lr * (grads.getOrElse(b, 0.0) / nDocs + l2 * w(b)))
      bias -= lr * biasGrad
    }
    feat.unpersist()
    Model(w, bias, buckets)
  }

  /** Score every doc against FROZEN 1e4 fixed-point weights — the
    * cell-exact inference face (d51). Output per doc with >= 1 bigram:
    * (idCol, n_grams INT, margin_sum_1e4 BIGINT, margin_1e4 BIGINT,
    * pass BOOLEAN) where margin_sum_1e4 = Σ w_1e4(bucket(g)) over the
    * doc's gram instances, margin_1e4 = floor(margin_sum_1e4 / n_grams)
    * (FLOOR division spelled out because weights can be negative and
    * engines disagree on truncating vs flooring integer division), and
    * pass ⇔ margin_sum_1e4 + bias·n_grams >= 0 — the thresholding done as
    * an integer cross-multiply so no division error can flip a verdict.
    */
  def score(docs: DataFrame, textCol: String, idCol: String,
      weights1e4: Seq[Long], bias1e4: Long = 0L,
      buckets: Int = 64): DataFrame = {
    require(weights1e4.length == buckets,
      s"got ${weights1e4.length} weights for $buckets buckets")
    val wArr = array(weights1e4.map(lit): _*)
    instances(docs, textCol, idCol, buckets)
      .select(col(idCol), element_at(wArr, col("b") + 1).as("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_grams"),
        sum("w").as("margin_sum_1e4"))
      .withColumn("margin_1e4", expr(
        """CASE WHEN margin_sum_1e4 >= 0 THEN margin_sum_1e4 div n_grams
          |ELSE -((-margin_sum_1e4 + n_grams - 1) div n_grams) END"""
          .stripMargin))
      .withColumn("pass",
        col("margin_sum_1e4") + lit(bias1e4) * col("n_grams") >= 0L)
  }
}
