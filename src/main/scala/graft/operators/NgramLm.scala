package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{TextFunctions => TF}

/** Corpus-trained bigram language-model scoring — the perplexity-style
  * quality filter of CCNet/Gopher-class pipelines (Wenzek et al. 2020,
  * arXiv:1911.00359), reduced to counts the engine can gate exactly: a
  * document's predictability is the mean add-one-smoothed conditional
  * probability of its bigram instances,
  *
  *   score(d) = mean over (w1,w2) ∈ d of  (c(w1 w2) + 1) / (c(w1·) + V)
  *
  * where c(·) are corpus-wide counts and V the corpus vocabulary size.
  * Low scores mark gibberish/boilerplate-shuffled text exactly like high
  * perplexity does (score is a monotone transform of per-bigram
  * probability), but stays in integer-ratio arithmetic — no `log`/`exp`,
  * whose libm implementations differ across engines and would break the
  * cell-exact oracle contract.
  *
  * Scale shape: training is ONE map-side-combined groupBy over exploded
  * bigram instances (counts tables are vocabulary-sized, V and V²-bounded —
  * millions of rows at web scale, not corpus-sized); scoring re-joins the
  * instance stream to the two counts tables on (bigram) and (head word) —
  * equi-joins that AQE broadcasts when the vocabulary fits (it does at
  * every tested SF) and hash-joins otherwise. Nothing is ever collected.
  *
  * Determinism: each per-instance probability is two exact BIGINT sums
  * under an IEEE double division — bit-identical across engines — then
  * rounded to DECIMAL(38,8); the per-doc mean sums those decimals (exact,
  * order-free) before one final double division. Same discipline as the
  * SURVEY §2 legend's decimal-cast-inputs rule for float aggregates.
  */
object NgramLm {

  /** Per-document bigram predictability: (idCol, n_bigrams, predictability).
    * Documents with fewer than 2 tokens have no bigram instances and are
    * absent from the output (nothing to score — callers keep them by a
    * left join, the same convention as d9's pair queries).
    */
  def bigramPredictability(
      docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol), TF.tokens(col(textCol)).as("toks"))
    // one instance row per bigram occurrence; the head word is the bigram's
    // first token (tokens are space-split, so the first space is the cut)
    val inst = toks
      .select(col(idCol), explode(TF.wordShinglesOf(col("toks"), 2)).as("bg"))
      .select(col(idCol), split(col("bg"), " ").getItem(0).as("head"), col("bg"))

    val cBg = inst.groupBy("bg").agg(count(lit(1)).as("c_bg"))
    val cHead = inst.groupBy("head").agg(count(lit(1)).as("c_head"))
    val vocab = toks.select(explode(col("toks")).as("w"))
      .agg(countDistinct(col("w")).as("v"))

    val p = ((col("c_bg") + 1).cast("double") /
      (col("c_head") + col("v")).cast("double")).cast(DecimalType(38, 8))

    inst
      .join(cBg, "bg")
      .join(cHead, "head")
      .crossJoin(broadcast(vocab))
      .select(col(idCol), p.as("p"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        (sum(col("p")).cast("double") / count(lit(1)).cast("double"))
          .cast(DecimalType(38, 8)).as("predictability"))
  }

  /** DuckDB SQL computing [[bigramPredictability]] over table `tbl` —
    * identical count, smoothing, rounding, and mean structure.
    */
  def oracleBigramPredictabilitySql(
      tbl: String, idCol: String, textCol: String): String =
    s"""WITH tk AS (SELECT $idCol, string_split($textCol, ' ') AS s FROM $tbl),
       |inst AS (SELECT $idCol, split_part(bg, ' ', 1) AS head, bg FROM (
       |  SELECT $idCol, unnest(list_transform(range(1, len(s)),
       |    i -> s[i] || ' ' || s[i+1])) AS bg FROM tk)),
       |cbg AS (SELECT bg, count(*) AS c_bg FROM inst GROUP BY 1),
       |chead AS (SELECT head, count(*) AS c_head FROM inst GROUP BY 1),
       |v AS (SELECT count(DISTINCT w) AS v
       |      FROM (SELECT unnest(s) AS w FROM tk)),
       |term AS (SELECT $idCol,
       |    CAST(CAST(cbg.c_bg + 1 AS DOUBLE)
       |         / CAST(chead.c_head + v.v AS DOUBLE) AS DECIMAL(38,8)) AS p
       |  FROM inst JOIN cbg USING (bg) JOIN chead USING (head) CROSS JOIN v)
       |SELECT $idCol, count(*) AS n_bigrams,
       |  CAST(CAST(sum(p) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |       AS DECIMAL(38,8)) AS predictability
       |FROM term GROUP BY 1""".stripMargin
}
