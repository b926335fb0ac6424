package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Distributed Bloom filter over 64-bit key hashes — the set-membership
  * prefilter that replaces an exact broadcast set when the reference side
  * outgrows broadcastability (SURVEY.md §2.8: decontamination at scale).
  *
  * Shape: keys are hashed ONCE in the plan with Spark's codegen `xxhash64`;
  * the filter is built distributed by a mergeable typed [[Aggregator]]
  * (buffer = bit words, merge = bitwise OR — commutative/associative, so the
  * result is identical under any partitioning), and probed by a codegen
  * [[BloomMightContain]] expression whose bit array ships via a Spark
  * `Broadcast` (a torrent handle in the serialized plan, not a literal —
  * a 100M-key / 1% filter is ~120 MB and must not ride the task closure).
  *
  * Double hashing (Kirsch–Mitzenmacher 2006): position_i = h1 + i*h2, with
  * h1 = xxhash64(key) and h2 a finalizer-mixed rotation of h1 — k probes
  * from one hash computation, the standard construction Spark's own runtime
  * row-level bloom uses. Sizing is the textbook optimum: m = -n ln p /
  * (ln 2)^2 bits, k = (m/n) ln 2 probes.
  *
  * The reference has no sketch surface (2016 storage handler); this mirrors
  * its design DISCIPLINE instead — HiveKuduBridgeUtils.java:134-196 pushes
  * every type through one narrow seam, and here every membership probe goes
  * through one hash seam so build and probe can never disagree.
  */
object BloomUtil {

  /** Optimal bit count for n expected keys at false-positive rate p,
    * rounded up to a whole number of 64-bit words (min one word).
    */
  def optimalNumBits(expectedKeys: Long, fpp: Double): Int = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1, s"bad bloom sizing ($expectedKeys, $fpp)")
    val m = math.ceil(-expectedKeys * math.log(fpp) / (math.log(2) * math.log(2)))
    val words = math.max(1L, math.ceil(m / 64.0).toLong)
    require(words <= Int.MaxValue / 64, s"bloom too large: $m bits")
    (words * 64).toInt
  }

  /** Optimal probe count for the m/n ratio (≥1). */
  def optimalNumHashes(expectedKeys: Long, numBits: Int): Int =
    math.max(1, math.round(numBits.toDouble / expectedKeys * math.log(2)).toInt)

  /** Second hash for Kirsch–Mitzenmacher double hashing: an odd multiplier
    * (golden-ratio constant) + rotation decorrelates it from h1 while
    * staying a pure function of the one xxhash64 value computed in-plan.
    */
  @inline def h2(h1: Long): Long =
    java.lang.Long.rotateLeft(h1 * 0x9E3779B97F4A7C15L, 32)

  @inline def pos(h1: Long, hh2: Long, i: Int, numBits: Int): Int =
    (((h1 + i.toLong * hh2) & Long.MaxValue) % numBits).toInt

  def put(bits: Array[Long], hash: Long, numHashes: Int): Unit = {
    val numBits = bits.length * 64
    val hh2 = h2(hash)
    var i = 0
    while (i < numHashes) {
      val p = pos(hash, hh2, i, numBits)
      bits(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  def mightContain(bits: Array[Long], hash: Long, numHashes: Int): Boolean = {
    val numBits = bits.length * 64
    val hh2 = h2(hash)
    var i = 0
    while (i < numHashes) {
      val p = pos(hash, hh2, i, numBits)
      if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Mergeable typed UDAF building a Bloom filter from a column of xxhash64
  * values. Buffer and result are the raw bit words; merge is bitwise OR, so
  * partial aggregation (map-side combine) applies and the result is
  * partitioning-independent — the same algebraic-aggregate contract as
  * sum(). Memory per task = numBits/8 bytes, constant in row count.
  */
class BloomFilterAggregator(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits % 64 == 0 && numBits > 0, s"numBits must be a positive multiple of 64: $numBits")
  require(numHashes >= 1, s"numHashes must be >= 1: $numHashes")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], hash: Long): Array[Long] = {
    BloomUtil.put(buf, hash, numHashes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Codegen membership probe: TRUE if the hash MIGHT be in the filter (no
  * false negatives; false positives at the sized rate). The bit array rides
  * a `Broadcast` — the generated class resolves `.value()` once per
  * instance in init, then probes are branchy bit math with no allocation,
  * fully inside whole-stage codegen.
  */
case class BloomMightContain(
    child: Expression,
    bitsBc: Broadcast[Array[Long]],
    numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT hash input, got ${child.dataType.simpleString}")

  @transient private lazy val bitsLocal: Array[Long] = bitsBc.value

  override def nullSafeEval(h: Any): Any =
    BloomUtil.mightContain(bitsLocal, h.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcName = classOf[Broadcast[Array[Long]]].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bitsBc, bcName)
    val bits = ctx.addMutableState(
      "long[]", "bloomBits", v => s"$v = (long[]) (($bcName) $bcRef).value();")
    nullSafeCodeGen(ctx, ev, h => {
      val nb = ctx.freshName("numBits"); val hh2 = ctx.freshName("h2")
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      s"""
         |final int $nb = $bits.length * 64;
         |final long $hh2 = java.lang.Long.rotateLeft($h * 0x9E3779B97F4A7C15L, 32);
         |${ev.value} = true;
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  final int $p = (int) ((($h + (long) $i * $hh2) & Long.MAX_VALUE) % $nb);
         |  if (($bits[$p >>> 6] & (1L << ($p & 63))) == 0L) { ${ev.value} = false; break; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFilterOps {

  /** Build a Bloom filter from a single LONG (xxhash64) column of `hashes`,
    * sized for `expectedKeys` at `fpp`. One distributed aggregation with
    * map-side partials; the finished words are pulled to the driver (m/8
    * bytes — the one intentionally driver-sized object, exactly like
    * Spark's own runtime bloom subquery result) for re-broadcast.
    */
  def build(
      hashes: org.apache.spark.sql.DataFrame,
      expectedKeys: Long,
      fpp: Double): (Broadcast[Array[Long]], Int) = {
    val numBits = BloomUtil.optimalNumBits(expectedKeys, fpp)
    val numHashes = BloomUtil.optimalNumHashes(expectedKeys, numBits)
    val agg = new BloomFilterAggregator(numBits, numHashes)
    import hashes.sparkSession.implicits._
    val words = hashes.as[Long].select(agg.toColumn).head()
    (hashes.sparkSession.sparkContext.broadcast(words), numHashes)
  }

  /** Column probe over a LONG hash column. */
  def mightContain(hashCol: Column, bitsBc: Broadcast[Array[Long]], numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(hashCol), bitsBc, numHashes))
  }
}
