package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * probability), but needs no `log`/`exp` — and in fact no floating point
  * AT ALL: the score is emitted in fixed 1e-8 units (`pred_e8`, the d37
  * nano-unit discipline) computed with pure BIGINT arithmetic,
  *
  *   p_e8     = (2·1e8·(c_bg+1) + den) div (2·den)   [round-half-up],
  *              den = c_head + V
  *   pred_e8  = sum(p_e8) div n_bigrams              [floor]
  *
  * so both engines agree bit-for-bit by construction. (The first cut
  * rounded an IEEE division to DECIMAL(38,8); at sf1, ~1e-4 of documents
  * landed within the two engines' double→decimal tie-handling disagreement
  * window — integer arithmetic removes the class, not the instance.)
  * Overflow headroom: the multiply bounds c_bg < ~4.6e10 (2^63 / 2e8) —
  * a single bigram occurring 46 billion times; corpora past that reduce
  * counts first.
  *
  * Scale shape: training is ONE map-side-combined groupBy over exploded
  * bigram instances (counts tables are vocabulary-sized, V and V²-bounded —
  * millions of rows at web scale, not corpus-sized); scoring re-joins the
  * instance stream to the two counts tables on (bigram) and (head word) —
  * equi-joins that AQE broadcasts when the vocabulary fits (it does at
  * every tested SF) and hash-joins otherwise. Nothing is ever collected.
  */
object NgramLm {

  /** Per-document bigram predictability: (idCol, n_bigrams, pred_e8).
    * `pred_e8` is the mean smoothed conditional probability in 1e-8 units
    * (e.g. 3377139 ≡ 0.03377139). Documents with fewer than 2 tokens have
    * no bigram instances and are absent from the output (nothing to
    * score — callers keep them by a left join, the same convention as
    * d9's pair queries).
    */
  def bigramPredictability(
      docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol), TF.tokens(col(textCol)).as("toks"))
    // one instance row per bigram occurrence; the head word is the bigram's
    // first token (tokens are space-split, so the first space is the cut)
    val inst = toks
      .select(col(idCol), explode(TF.wordShinglesOf(col("toks"), 2)).as("bg"))
      .select(col(idCol), split(col("bg"), " ").getItem(0).as("head"), col("bg"))

    // NOT staged (round-17, measured): cBg has three consumers (cHead, the
    // vocabulary fold, the scoring join), but AQE's runtime exchange reuse
    // already deduplicates the identical corpus-sized explode+shuffle
    // across them — persisting the frame instead DOUBLED d41/d29/d44 solo
    // times (cache materialization + columnar round-trip + the cached
    // plan's fixed partitioning beat nothing; the recompute it "saved"
    // never ran). Leave the sharing to stage-level reuse.
    val cBg = inst.groupBy("bg").agg(count(lit(1)).as("c_bg"))
    // head counts FOLD OUT of the bigram counts (every instance has exactly
    // one head, so c(w1·) = Σ over bigrams starting with w1 of c(bg)) —
    // aggregating the VOCABULARY-sized cBg instead of re-shuffling the
    // corpus-sized instance stream a second time (round-15: one of d44's
    // three instance-stream shuffles removed; values provably identical)
    val cHead = cBg
      .select(split(col("bg"), " ").getItem(0).as("head"), col("c_bg"))
      .groupBy("head").agg(sum(col("c_bg")).as("c_head"))
    // The vocabulary FOLDS OUT of the bigram-counts table, like cHead: in a
    // >=2-token document every token is adjacent to another, so it appears
    // as some bigram's head or tail — distinct(heads ∪ tails of cBg) covers
    // all of them with a VOCABULARY²-bounded input instead of exploding and
    // distinct-shuffling every corpus token occurrence. Only 1-token
    // documents contribute a word no bigram carries; a narrow filtered scan
    // adds exactly those (round-16; values provably identical).
    val vocab = cBg
      .select(explode(array(
        split(col("bg"), " ").getItem(0),
        split(col("bg"), " ").getItem(1))).as("w"))
      .union(toks.filter(size(col("toks")) === 1)
        .select(explode(col("toks")).as("w")))
      .agg(countDistinct(col("w")).as("v"))

    inst
      .join(cBg, "bg")
      .join(cHead, "head")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        expr("(200000000L * (c_bg + 1) + (c_head + v)) DIV (2 * (c_head + v))")
          .as("p_e8"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        expr("sum(p_e8) DIV count(1)").as("pred_e8"))
  }

  /** DuckDB SQL computing [[bigramPredictability]] over table `tbl` —
    * identical counts, smoothing, and integer round/floor structure.
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
       |    (200000000 * (cbg.c_bg + 1) + (chead.c_head + v.v))
       |      // (2 * (chead.c_head + v.v)) AS p_e8
       |  FROM inst JOIN cbg USING (bg) JOIN chead USING (head) CROSS JOIN v)
       |SELECT $idCol, count(*) AS n_bigrams,
       |  CAST(sum(p_e8) // count(*) AS BIGINT) AS pred_e8
       |FROM term GROUP BY 1""".stripMargin
}
