package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Typed UDAF (SURVEY.md §2.10): Misra–Gries heavy-hitters sketch — the
  * bounded-memory companion to exact token frequency (`d6_token_freq`).
  *
  * State is AT MOST k (token, count) pairs regardless of stream length —
  * the property that matters at 100 TB, where an exact token frequency over
  * a web-scale vocabulary shuffles billions of distinct keys. The classic
  * guarantee: every item with true frequency > n/(k+1) is IN the sketch,
  * and each reported count undercounts the truth by at most n/(k+1)
  * (n = total items seen). The sketch is MERGEABLE (Agarwal et al., "
  * Mergeable Summaries", PODS 2012): merge = pointwise sum, then compress
  * back to k entries by subtracting the (k+1)-th largest count — the same
  * error bound survives, so partial sketches combine map-side exactly like
  * any algebraic aggregate.
  *
  * The sketch CONTENT (beyond the guaranteed hitters) can vary with
  * partitioning — the guarantee, not bit-equality, is the contract, so it
  * is gated by a ScalaTest property (like the ≤5% approx-distinct gate),
  * not a DuckDB oracle.
  */
class HeavyHittersAggregator(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
  require(k >= 1)

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(
      buf: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
    buf.get(item) match {
      case Some(c) => buf(item) = c + 1
      case None if buf.size < k => buf(item) = 1L
      case None => // Misra–Gries step: decrement everyone, drop zeros
        val dead = mutable.ArrayBuffer[String]()
        buf.foreach { case (t, c) => if (c == 1) dead += t else buf(t) = c - 1 }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(
      a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (t, c) => a(t) = a.getOrElse(t, 0L) + c }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from all; ≤ k survive
      val cut = a.values.toSeq.sorted(Ordering[Long].reverse)(k)
      val dead = mutable.ArrayBuffer[String]()
      a.foreach { case (t, c) => if (c - cut <= 0) dead += t else a(t) = c - cut }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(buf: mutable.Map[String, Long]): Map[String, Long] = buf.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.javaSerialization[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
