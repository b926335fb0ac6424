package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus TF-IDF scoring (SURVEY.md §2.8 text-analysis family): per-document
  * term scores against corpus-wide document frequencies, and top-k
  * characteristic terms per document.
  *
  * The idf factor is the RATIONAL (N+1)/(df+1) rather than its logarithm —
  * a recognized idf variant (log merely dampens): division of exact integer
  * counts is bit-deterministic across engines while `ln` can differ in the
  * last ulp between libm implementations — the same determinism discipline
  * as the engine's decimal money math. Note the variants agree on ordering
  * only among terms with EQUAL tf (monotonicity is per-factor); across
  * different tf the log's damping can reorder, so this is a deliberate
  * scoring choice, not a disguised log-idf (ScaleOpsSpec pins down exactly
  * the per-tf-class agreement).
  *
  * Scale shape: tf is a (doc, term) partial-aggregating groupBy (map-side
  * combine absorbs within-doc repetition before the shuffle); df aggregates
  * the DISTINCT per-doc terms, so a term shuffles one row per containing
  * document, not per occurrence; N rides in as a broadcast single row. The
  * tf⋈df equi-join is term-keyed — stop words make it the skewed spot at
  * 100 TB, which AQE skew-split handles (or salt via SkewJoin for a pinned
  * plan); everything downstream is per-doc windows over ≤ |vocab ∩ doc|
  * rows.
  */
object TfIdf {

  /** (idCol, term, tf, df, score) for every (document, term) pair.
    *
    * df derives FROM the tf frame (tf already has one row per (doc, term),
    * so counting rows per term IS the document frequency) — the corpus is
    * scanned once, not once per aggregate, and no extra distinct pass runs.
    */
  def scores(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = graft.Tables.parallel(docs)
      .select(col(idCol),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") *
          ((col("n") + 1).cast("double") / (col("df") + 1).cast("double")))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"))
  }

  /** Top-k characteristic terms per document, deterministic tie-break on the
    * term itself.
    */
  def topTerms(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    scores(docs, textCol, idCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
