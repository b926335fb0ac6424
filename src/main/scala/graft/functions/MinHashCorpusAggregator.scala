package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.10): merges per-document MinHash signatures into
  * a group-level signature by elementwise minimum.
  *
  * Because `min` is commutative/associative, the merge is order-independent
  * and combines map-side — the aggregation state per group is just k hashes
  * regardless of group size, so a corpus-level signature over 100 TB costs
  * one partial-aggregate pass. The resulting signature estimates the Jaccard
  * similarity between whole corpora (fraction of matching components), the
  * same way per-doc signatures estimate doc similarity.
  */
class MinHashCorpusAggregator(k: Int)
    extends Aggregator[Seq[String], Array[String], Seq[String]] {

  private val Top = "￿" // sorts after every md5 hex digest

  override def zero: Array[String] = Array.fill(k)(Top)

  override def reduce(buf: Array[String], sig: Seq[String]): Array[String] = {
    // a short signature would leave sentinel components in the buffer, and
    // sentinel==sentinel slots would count as matches in estimateJaccard —
    // signatures are fixed-k by construction, so reject anything else loudly
    require(sig.length == k, s"signature has ${sig.length} components, expected $k")
    var i = 0
    while (i < k) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[String]): Seq[String] = buf.toSeq

  override def bufferEncoder: Encoder[Array[String]] =
    Encoders.javaSerialization[Array[String]]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object MinHashCorpusAggregator {
  /** Estimated Jaccard similarity between two corpus signatures. */
  def estimateJaccard(a: Seq[String], b: Seq[String]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / math.max(a.length, 1)
}
