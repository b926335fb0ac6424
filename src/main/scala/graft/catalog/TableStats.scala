package graft.catalog

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Persisted per-column statistics for one table (`_stats.json`).
  *
  * Advisory planner input, never a correctness input: every record carries
  * the [[fingerprint]] of the table state it was computed from, and readers
  * ([[KuduLikeCatalog.statsOf]]) return nothing when the live state has
  * moved on — a stale NDV can only cost plan quality, never results, and a
  * crashed ANALYZE leaves either the old file or the new one, both
  * self-describing. The reference had no optimizer of its own to feed
  * (planning delegated wholesale to hive-exec, pom.xml:28-31); this is the
  * COMPUTE STATS companion a Kudu table gets from Impala, re-expressed for
  * Catalyst CBO via the DSv2 `SupportsReportStatistics.columnStats` seam.
  *
  * min/max are kept only for types whose ordering CBO can turn into range
  * selectivity (integrals, floating, decimal, date, timestamp, boolean)
  * and are stored as the CATALYST-INTERNAL scalar rendered to a string
  * (date → epoch days, timestamp → epoch micros), so the connector can
  * hand them back without timezone or formatting round-trips.
  */
/** Equi-height histogram for one column (Spark's catalyst shape: height =
  * non-null rows per bin by construction; each bin [lo, hi] carries its own
  * NDV). Endpoints are stored as DOUBLES of the catalyst-internal value
  * (date → epoch days, timestamp → epoch micros) — exactly what both the
  * DSv2 `colstats.Histogram` interface and catalyst's `HistogramBin` hold,
  * so the connector hands them back without conversion.
  */
final case class ColHistogram(height: Double, bins: Seq[(Double, Double, Long)])

final case class ColStats(
    ndv: Long,
    nullCount: Long,
    min: Option[String],
    max: Option[String],
    avgLen: Option[Long],
    maxLen: Option[Long],
    histogram: Option[ColHistogram] = None) {

  /** Decode the stored min/max string back to the catalyst-internal value
    * Spark's `ColumnStat` expects for `dt` (None for unsupported types).
    */
  def internalMin(dt: DataType): Option[Any] = min.flatMap(ColStats.decode(_, dt))
  def internalMax(dt: DataType): Option[Any] = max.flatMap(ColStats.decode(_, dt))
}

object ColStats {
  /** Types that get min/max: those CBO range-estimates over. */
  def rangeComparable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | DateType | TimestampType | TimestampNTZType |
        BooleanType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Encode an EXTERNAL row value (as collected from an aggregate) to the
    * stored string: convert to catalyst-internal first so dates/timestamps
    * land as their integer encodings.
    */
  def encode(v: Any, dt: DataType): Option[String] = Option(v).map { x =>
    CatalystTypeConverters.createToCatalystConverter(dt)(x).toString
  }

  private def decode(s: String, dt: DataType): Option[Any] = dt match {
    case ByteType => Some(s.toByte)
    case ShortType => Some(s.toShort)
    case IntegerType | DateType => Some(s.toInt)
    case LongType | TimestampType | TimestampNTZType => Some(s.toLong)
    case FloatType => Some(s.toFloat)
    case DoubleType => Some(s.toDouble)
    case BooleanType => Some(s.toBoolean)
    case d: DecimalType =>
      Some(org.apache.spark.sql.types.Decimal(BigDecimal(s), d.precision, d.scale))
    case _ => None
  }
}

final case class TableStats(
    fingerprint: String,
    numRows: Long,
    analyzedAtVersion: Int,
    cols: Map[String, ColStats]) {

  def toJson: String = {
    val colsJ = JObject(cols.toList.sortBy(_._1).map { case (n, c) =>
      n -> JObject(List(
        "ndv" -> JLong(c.ndv),
        "nullCount" -> JLong(c.nullCount)) ++
        c.min.map(v => "min" -> (JString(v): JValue)).toList ++
        c.max.map(v => "max" -> (JString(v): JValue)).toList ++
        c.avgLen.map(v => "avgLen" -> (JLong(v): JValue)).toList ++
        c.maxLen.map(v => "maxLen" -> (JLong(v): JValue)).toList ++
        c.histogram.map(h => "histogram" -> (JObject(
          "height" -> JDouble(h.height),
          "bins" -> JArray(h.bins.toList.map { case (lo, hi, ndv) =>
            JArray(List(JDouble(lo), JDouble(hi), JLong(ndv)))
          })): JValue)).toList)
    })
    JsonMethods.compact(JsonMethods.render(JObject(
      "fingerprint" -> JString(fingerprint),
      "numRows" -> JLong(numRows),
      "analyzedAtVersion" -> JInt(analyzedAtVersion),
      "cols" -> colsJ)))
  }
}

object TableStats {
  def fromJson(s: String): TableStats = {
    val j = JsonMethods.parse(s)
    def long(v: JValue): Long = v match {
      case JLong(x) => x
      case JInt(x) => x.toLong
      case other => throw new CatalogException(s"bad stats number: $other")
    }
    def optStr(o: JValue): Option[String] =
      o match { case JString(x) => Some(x); case _ => None }
    def optLong(o: JValue): Option[Long] =
      o match { case JNothing => None; case x => Some(long(x)) }
    val JString(fp) = j \ "fingerprint"
    val cols = (j \ "cols") match {
      case JObject(fields) => fields.map { case (n, c) =>
        def dbl(v: JValue): Double = v match {
          case JDouble(x) => x
          case JLong(x) => x.toDouble
          case JInt(x) => x.toDouble
          case other => throw new CatalogException(s"bad stats number: $other")
        }
        val hist = (c \ "histogram") match {
          case JObject(_) =>
            val bins = (c \ "histogram" \ "bins") match {
              case JArray(bs) => bs.map {
                case JArray(List(lo, hi, ndv)) => (dbl(lo), dbl(hi), long(ndv))
                case other => throw new CatalogException(s"bad histogram bin: $other")
              }
              case _ => Nil
            }
            Some(ColHistogram(dbl(c \ "histogram" \ "height"), bins))
          case _ => None
        }
        n -> ColStats(
          ndv = long(c \ "ndv"),
          nullCount = long(c \ "nullCount"),
          min = optStr(c \ "min"),
          max = optStr(c \ "max"),
          avgLen = optLong(c \ "avgLen"),
          maxLen = optLong(c \ "maxLen"),
          histogram = hist)
      }.toMap
      case _ => Map.empty[String, ColStats]
    }
    TableStats(fp, long(j \ "numRows"), long(j \ "analyzedAtVersion").toInt, cols)
  }
}
