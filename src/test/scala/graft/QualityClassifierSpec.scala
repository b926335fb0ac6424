package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** Trainable quality classifier (operators/QualityClassifier): the training
  * loop is gated here on planted separable corpora (logistic training uses
  * exp, so it can never sit under a cell-exact cross-engine oracle); the
  * frozen-weights scoring face is additionally oracle-gated by
  * d51_quality_score.
  */
class QualityClassifierSpec extends SparkSpec {

  // Planted separable corpus: "good" docs draw bigrams from an educational
  // vocabulary, "bad" docs from a spam vocabulary — disjoint token sets, so
  // their hashed-bigram buckets are (almost surely) separable at 64 buckets.
  private def planted(n: Int) = {
    import spark.implicits._
    val goodVocab = Seq("theorem", "proof", "lemma", "integral", "matrix",
      "vector", "tensor", "algebra")
    val badVocab = Seq("casino", "jackpot", "winner", "click", "free",
      "bonus", "spins", "claim")
    def doc(vocab: Seq[String], seed: Int): String =
      (0 until 12).map(i => vocab((seed * 7 + i * 3) % vocab.size)).mkString(" ")
    val rows = (0 until n).map { i =>
      if (i % 2 == 0) (i.toLong, doc(goodVocab, i), 1)
      else (i.toLong, doc(badVocab, i), 0)
    }
    rows.toDF("doc_id", "text", "label")
  }

  test("training separates a planted good/spam corpus; the frozen " +
    "fixed-point model classifies every doc correctly") {
    val docs = planted(80)
    val m = QualityClassifier.train(docs, "text", "doc_id",
      col("label") === 1, buckets = 64, epochs = 40)
    val verdicts = QualityClassifier
      .score(docs, "text", "doc_id", m.weights1e4, m.bias1e4)
      .join(docs.select("doc_id", "label"), "doc_id")
      .select("label", "pass").collect()
    assert(verdicts.nonEmpty)
    verdicts.foreach { r =>
      assert(r.getBoolean(1) === (r.getInt(0) == 1),
        s"frozen model must classify the separable corpus perfectly: $r")
    }
  }

  test("the trained model generalizes to held-out docs from the same " +
    "vocabularies") {
    import spark.implicits._
    val m = QualityClassifier.train(planted(80), "text", "doc_id",
      col("label") === 1, buckets = 64, epochs = 40)
    val held = Seq(
      (1000L, "theorem proof integral matrix lemma algebra tensor vector", 1),
      (1001L, "casino jackpot free spins click bonus winner claim", 0))
      .toDF("doc_id", "text", "label")
    val got = QualityClassifier.score(held, "text", "doc_id",
      m.weights1e4, m.bias1e4)
      .select("doc_id", "pass").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1000L -> true, 1001L -> false))
  }

  test("frozen-weights scoring is exact-integer and partitioning-invariant; " +
    "floor division holds for negative margins") {
    import spark.implicits._
    // weights: bucket of every bigram determined by md5; pin one doc whose
    // margin is negative and not divisible by n_grams to pin FLOOR (not
    // truncate-toward-zero) semantics.
    val w = Seq.tabulate(64)(b => if (b % 2 == 0) -7L else 3L)
    val docs = planted(40).drop("label")
    def run(parts: Int) = QualityClassifier
      .score(docs.repartition(parts), "text", "doc_id", w)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(run(1) === run(13), "integer scoring must not depend on partitioning")
    run(1).foreach { case (_, n, sw, mean) =>
      assert(mean === Math.floorDiv(sw, n.toLong),
        s"margin_1e4 must be FLOOR(sum/n): sum=$sw n=$n got=$mean")
    }
  }

  test("docs without a bigram are excluded from scoring, like d47") {
    import spark.implicits._
    val docs = Seq((1L, "single"), (2L, "two tokens")).toDF("doc_id", "text")
    val ids = QualityClassifier.score(docs, "text", "doc_id",
      Seq.fill(64)(1L)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L))
  }
}
