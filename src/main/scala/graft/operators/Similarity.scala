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
    val c = corpus.select(col(idCol).as("id"), col(embCol).as("c_emb"))
    val pairs = q.crossJoin(c)
      .filter(col("qid") =!= col("id"))
      .withColumn("cos", VectorFunctions.cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "id", "cos")
  }

  /** Sign-LSH bucketing: bucket = bits of sign(dot(emb, hyperplane_i)).
    * Hyperplanes are deterministic pseudo-random vectors derived from the
    * element index via a hash — no driver-side randomness, reproducible
    * across runs and executors.
    */
  def signBucket(emb: org.apache.spark.sql.Column, planes: Int): org.apache.spark.sql.Column =
    (0 until planes).map { p =>
      // pseudo-random plane component for (plane p, dim i): cos(i * (p+1) * 2.399963)
      val proj = aggregate(
        zip_with(emb, sequence(lit(1), size(emb)), (x, i) =>
          x.cast("double") * cos(i.cast("double") * lit((p + 1) * 2.39996322972865332))),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** ANN top-k: score only same-bucket (query, corpus) pairs. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, planes: Int = 6,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(embCol).as("q_emb"))
      .withColumn("bucket", signBucket(col("q_emb"), planes))
    val c = corpus.select(col(idCol).as("id"), col(embCol).as("c_emb"))
      .withColumn("bucket", signBucket(col("c_emb"), planes))
    val pairs = q.join(c, Seq("bucket"))
      .filter(col("qid") =!= col("id"))
      .withColumn("cos", VectorFunctions.cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "id", "cos")
  }
}
