package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every source document by how much its hashed n-gram profile looks like a
  * TARGET corpus (the published recipe's target is Wikipedia/books; here any
  * predicate over the corpus, e.g. `lang = 'en'`, selects the target slice).
  *
  * Published shape, exact-arithmetic adaptation: DSIR hashes each document's
  * word unigrams+bigrams into a small fixed bucket space, fits two bag-of-
  * buckets multinomials (target p, source q), and weights a doc by its
  * log-likelihood ratio sum_g log(p_b(g) / q_b(g)). Floating-point logs are
  * engine-divergent (JVM and DuckDB libm do not round ln identically), so —
  * the d41/d37 nano-unit discipline — this operator emits the MEAN PER-GRAM
  * PROBABILITY RATIO in exact 1e-4 units instead: per bucket,
  * r_b = floor(1e4 * (tcnt_b+1)(S+B) / ((scnt_b+1)(T+B))) (add-one smoothed,
  * pure BIGINT), per doc weight = floor(mean of r_b over its gram
  * instances). Monotone agreement with the LLR on the buckets that dominate
  * a doc is not claimed — this is a documented linear-domain variant with
  * the same inputs, same smoothing, and a deterministic cross-engine
  * contract (the property the log form cannot have).
  *
  * Scale shape (the reason DSIR uses hashed buckets at all): the learned
  * state is ONE `buckets`-row table regardless of corpus size. Pass 1 is a
  * map-side-combined groupBy on the bucket id (B rows out); the ratio table
  * is a broadcast literal-sized join in pass 2; the per-doc agg shuffles
  * doc-keyed pairs. Nothing is ever vocabulary- or corpus-sized except the
  * gram explode itself, which is narrow. BIGINT bounds: the numerator is
  * <= (T+1)(S+B)·1e4 — safe through ~10^9 gram instances; a 100-TB corpus
  * crosses that, so the numerator widens to DECIMAL(38,0) there (same
  * floor-division semantics; the BIGINT path keeps the oracle gate exact).
  *
  * Bucket id = md5-hex prefix mod `buckets` — the repo's standard
  * engine-portable hash (d19/d23), so a DuckDB oracle reproduces the exact
  * bucketing.
  */
object Dsir {

  /** Per-doc importance weight toward `isTarget` docs, in exact 1e-4 units.
    * Output: (idCol, n_grams INT, weight_1e4 BIGINT), one row per doc with
    * at least one bigram (sub-bigram docs have no profile to score).
    */
  def importanceWeights(docs: DataFrame, textCol: String, idCol: String,
      isTarget: Column, buckets: Int = 64): DataFrame = {
    require(buckets >= 2, s"need >= 2 hash buckets, got $buckets")
    // `inst` feeds BOTH the bucket-count pass and the per-doc scoring pass,
    // so its explode+md5 lineage executes twice — DELIBERATE: at 100 TB,
    // recomputing a narrow projection is cheaper than materializing a
    // corpus×grams frame (cache would spill it to disk and read it back);
    // do not "fix" this with a .cache()/.persist().
    val toks = TextFunctions.tokens(col(textCol))
    val inst = docs
      .select(col(idCol), isTarget.as("is_t"),
        explode(TextFunctions.wordShinglesOf(toks, 2)).as("g"))
      .select(col(idCol), col("is_t"),
        (expr("CAST(conv(substring(md5(g), 1, 4), 16, 10) AS INT)")
          % buckets).as("b"))

    val counts = inst.groupBy("b").agg(
      count(lit(1)).as("scnt"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("tcnt"))
    val totals = counts.agg(
      sum("scnt").as("s_tot"), sum("tcnt").as("t_tot"))
    val ratios = counts.crossJoin(broadcast(totals))
      .withColumn("rb", expr(
        s"(tcnt + 1L) * (s_tot + $buckets) * 10000L" +
          s" div ((scnt + 1L) * (t_tot + $buckets))"))
      .select("b", "rb")

    inst.join(broadcast(ratios), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_grams"), sum("rb").as("sr"))
      .withColumn("weight_1e4", expr("sr div n_grams"))
      .drop("sr")
  }
}
