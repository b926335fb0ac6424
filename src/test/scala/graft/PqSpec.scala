package graft

import graft.functions.PqUtil
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Product-quantization contracts: kernel math (encode/LUT/ADC identity),
  * determinism, and recall against the exact brute-force ranking.
  */
class PqSpec extends SparkSpec {

  test("ADC via LUT equals the naive reconstruction dot product") {
    // 2 subspaces of 2 dims, hand-sized codebooks
    val codebooks: Array[Array[Array[Float]]] = Array(
      Array(Array(0f, 0f), Array(1f, 0f), Array(0f, 1f)),
      Array(Array(1f, 1f), Array(-1f, 0f)))
    val v = Array(0.9f, 0.1f, -0.8f, 0.05f)
    val q = Array(0.5f, -0.5f, 0.25f, 1.0f)
    val codes = PqUtil.encode(v, codebooks)
    // v's first subvector (.9,.1) is nearest (1,0); second (-.8,.05) nearest (-1,0)
    assert(codes.toSeq === Seq(1, 1))
    val lut = PqUtil.lut(q, codebooks)
    val adc = codes.zipWithIndex.map { case (c, s) => lut(s)(c).toDouble }.sum
    // reconstruction dot: dot(q, concat(centroids[codes]))
    val recon = Array(1f, 0f, -1f, 0f)
    val expect = q.zip(recon).map { case (a, b) => a.toDouble * b }.sum
    assert(math.abs(adc - expect) < 1e-6)
  }

  test("pq recall against brute force on the embeddings fixture") {
    val emb = Tables.load(spark, sf, "embeddings")
    val k = 5
    val exact = Similarity.bruteForceTopK(emb, emb, k)
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val pq = Similarity.pqTopK(emb, emb, k, m = 16, ksub = 32, rerank = 25)
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(pq.keySet === exact.keySet, "every query must return results")
    val recall = exact.map { case (qid, ids) =>
      (pq(qid) & ids).size.toDouble / ids.size
    }.sum / exact.size
    assert(recall >= 0.7, s"PQ recall@$k too low: $recall")
    // every returned cos must be the EXACT cosine (re-rank contract):
    // spot-check that pq's scores for shared pairs match brute force
    val exactScores = Similarity.bruteForceTopK(emb, emb, k)
      .select(col("qid"), col("id"), round(col("cos"), 6).as("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Similarity.pqTopK(emb, emb, k, m = 16, ksub = 32, rerank = 25)
      .select(col("qid"), col("id"), round(col("cos"), 6).as("cos")).collect()
      .foreach { r =>
        exactScores.get((r.getLong(0), r.getLong(1))).foreach { e =>
          assert(math.abs(e - r.getDouble(2)) < 1e-5,
            s"re-ranked cos differs from exact for (${r.getLong(0)},${r.getLong(1)})")
        }
      }
  }

  test("pq is deterministic across runs and partitionings") {
    val emb = Tables.load(spark, sf, "embeddings")
    val a = Similarity.pqTopK(emb.repartition(1), emb.repartition(1), 3, rerank = 10)
      .orderBy("qid", "rank").collect().map(_.toString).toSeq
    val b = Similarity.pqTopK(emb.repartition(7), emb.repartition(3), 3, rerank = 10)
      .orderBy("qid", "rank").collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("IVFADC: cell-restricted ADC scan, recall holds, exact scores returned") {
    val emb = Tables.load(spark, sf, "embeddings")
    val k = 5
    val exact = Similarity.bruteForceTopK(emb, emb, k)
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // generous probes on the noise-structured fixture: IVF loses whatever
    // mass is outside the probed cells, PQ reorders within - gate the
    // COMPOSITION at a level both reductions can clear together
    val ivfadc = Similarity.ivfPqTopK(emb, emb, k,
      cells = 8, nprobe = 4, m = 16, ksub = 32, rerank = 25)
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recall = exact.map { case (qid, ids) =>
      (ivfadc.getOrElse(qid, Set.empty) & ids).size.toDouble / ids.size
    }.sum / exact.size
    assert(recall >= 0.5, s"IVFADC recall@$k too low: $recall")
    // determinism across partitionings (the shared lloyd + ordered sample)
    val again = Similarity.ivfPqTopK(emb.repartition(5), emb.repartition(3), k,
      cells = 8, nprobe = 4, m = 16, ksub = 32, rerank = 25)
      .select("qid", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(again === ivfadc)
  }
}
