package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** String-similarity (edit-distance) join via filter-and-verify — the
  * scalable alternative to a quadratic `levenshtein` cross join (pattern per
  * the string-similarity-join literature, PAPERS.md: ICDE 2022).
  *
  * Candidate filter: positional q-gram count. Strings with edit distance
  * ≤ k and lengths la, lb share at least `max(la,lb) - q + 1 - k·q` q-grams
  * (each edit destroys at most q grams), and |la - lb| ≤ k. Both conditions
  * are relational: explode q-grams, equi-join on the gram (bucket-local,
  * hash-partitioned — the quadratic term is bounded by per-gram bucket
  * occupancy), count shared grams per pair, filter by the bound. The
  * pair-count via join over-counts duplicate grams (cnt_a·cnt_b ≥ multiset
  * min), which only ADMITS more candidates — completeness is preserved and
  * the final `levenshtein ≤ k` verification removes false positives.
  *
  * Completeness requires the bound be positive for the shortest inputs:
  * min string length must satisfy `len - q + 1 - k·q >= 1`. The operator
  * asserts nothing at runtime; callers pick (q, k) for their length domain
  * (verified against the quadratic definition in ScaleOpsSpec).
  */
object StringSimilarity {

  def fuzzyJoin(
      df: DataFrame, textCol: String, idCol: String,
      q: Int = 2, maxDist: Int = 1): DataFrame = {
    val base = graft.Tables.parallel(df)
      .select(col(idCol).as("id"), col(textCol).as("s"))
      .withColumn("len", length(col("s")))
    val grams = base.select(col("id"), col("len"),
      explode(TextFunctions.charShingles(col("s"), q)).as("g"))
    val shared = grams.select(col("id").as("a"), col("len").as("la"), col("g"))
      .join(grams.select(col("id").as("b"), col("len").as("lb"), col("g")), Seq("g"))
      .filter(col("a") < col("b") && abs(col("la") - col("lb")) <= maxDist)
      .groupBy("a", "b", "la", "lb").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= greatest(col("la"), col("lb")) - (q - 1) - maxDist * q)
    shared
      .join(base.select(col("id").as("a"), col("s").as("sa")), Seq("a"))
      .join(base.select(col("id").as("b"), col("s").as("sb")), Seq("b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= maxDist)
      .select("a", "b", "dist")
  }
}
