package graft.store

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Per-file column bounds recorded in the manifest, the Iceberg
  * manifest-stats analog (reference: the Iceberg v2 tables written by
  * flink_json_to_iceberg.py:68-69 carry these in every manifest entry).
  *
  * Invariant when a column appears in [[FileEntry.stats]]: `nullCount`
  * is exact, and `min`/`max` are exact bounds over the file's non-null
  * values (both null iff the file has no non-null value for the
  * column). Columns with unreliable or unsupported footer stats are
  * simply OMITTED — absence always means "cannot prune", never "no
  * rows", so skipping stays conservative.
  *
  * Scale rationale: at 100 TB a `WHERE ts > X` scan must not open
  * every file's footer to discover that 99% of them cannot match.
  * Bounds in the manifest let the driver drop files at PLANNING time —
  * the same trick as Iceberg's `lower_bounds`/`upper_bounds` — on top
  * of (orthogonal to) key-bucket pruning and parquet row-group skipping.
  */
case class ColStats(min: String, max: String, nullCount: Long)

object FileStats {

  /** Types with a total order we can serialize losslessly as strings.
    * Timestamps/dates/decimals are deliberately out (testdata carries
    * them as long/string after ingest); omission only costs pruning.
    */
  private def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | FloatType | DoubleType | StringType |
        BooleanType => true
    case _ => false
  }

  /** Read one just-written file's footer and aggregate row-group
    * statistics per supported top-level column. Runs driver-side at
    * commit time over only the files the commit produced (bounded by
    * affected buckets), exactly where Iceberg collects its manifest
    * metrics. Any anomaly → empty map (stats are an optimization,
    * never a correctness dependency).
    */
  def collect(conf: Configuration, absPath: String,
      schema: StructType): Map[String, ColStats] = {
    val byName = schema.fields.filter(f => supported(f.dataType))
      .map(f => f.name -> f.dataType).toMap
    if (byName.isEmpty) return Map.empty
    try {
      val in = HadoopInputFile.fromPath(new HadoopPath(absPath), conf)
      val reader = ParquetFileReader.open(in)
      try {
        val chunks = reader.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(c => c.getPath.toArray.length == 1 &&
            byName.contains(c.getPath.toDotString))
          .groupBy(_.getPath.toDotString)
        chunks.flatMap { case (name, cols) =>
          val dt = byName(name)
          // every row group must carry trustworthy stats, else omit
          val ok = cols.forall { c =>
            val s = c.getStatistics
            s != null && !s.isEmpty && s.isNumNullsSet &&
              (s.hasNonNullValue || s.getNumNulls == c.getValueCount)
          }
          if (!ok) None
          else {
            val nulls = cols.map(_.getStatistics.getNumNulls).sum
            val nonNull = cols.filter(_.getStatistics.hasNonNullValue)
            if (nonNull.isEmpty) Some(name -> ColStats(null, null, nulls))
            else {
              val mins = nonNull.map(c =>
                render(c.getStatistics.genericGetMin.asInstanceOf[AnyRef]))
              val maxs = nonNull.map(c =>
                render(c.getStatistics.genericGetMax.asInstanceOf[AnyRef]))
              for {
                mn <- mins.reduceOption((a: String, b: String) =>
                  if (boundLt(dt, a, b)) a else b)
                mx <- maxs.reduceOption((a: String, b: String) =>
                  if (boundLt(dt, a, b)) b else a)
              } yield name -> ColStats(mn, mx, nulls)
            }
          }
        }.toMap
      } finally reader.close()
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  private def render(v: AnyRef): String = v match {
    case b: Binary => b.toStringUsingUTF8
    case other => other.toString
  }

  /** Strict order between two RENDERED bounds of the same column. */
  private def boundLt(dt: DataType, a: String, b: String): Boolean = dt match {
    case IntegerType | LongType => a.toLong < b.toLong
    case FloatType | DoubleType => a.toDouble < b.toDouble
    case StringType => utf8Cmp(a, b) < 0
    case BooleanType => !a.toBoolean && b.toBoolean
    case _ => false
  }

  /** Conservative skip test: true unless the file's stats PROVE no row
    * can satisfy `filter`. Unknown filter shapes, missing columns, and
    * parse surprises all return true.
    */
  def mightMatch(stats: Map[String, ColStats], schema: StructType,
      filter: Filter): Boolean = {
    def dtOf(a: String): Option[DataType] =
      schema.fields.find(_.name == a).map(_.dataType).filter(supported)
    def withStats(a: String)(f: (DataType, ColStats) => Boolean): Boolean =
      (dtOf(a), stats.get(a)) match {
        case (Some(dt), Some(cs)) => f(dt, cs)
        case _ => true
      }
    // bounds over non-null values exist?
    def hasValues(cs: ColStats): Boolean = cs.min != null && cs.max != null

    def eqMatch(a: String, v: Any): Boolean = withStats(a) { (dt, cs) =>
      if (v == null) false // SQL equality with null matches nothing
      else hasValues(cs) && cmp(dt, cs.min, v).exists(_ <= 0) &&
        cmp(dt, cs.max, v).exists(_ >= 0)
    }

    filter match {
      case EqualTo(a, v) => eqMatch(a, v)
      case EqualNullSafe(a, null) => mightMatch(stats, schema, IsNull(a))
      case EqualNullSafe(a, v) => eqMatch(a, v)
      case In(a, vs) =>
        // null list members never equality-match; empty/all-null → no row
        Option(vs).map(_.filter(_ != null)).exists(_.exists(eqMatch(a, _)))
      case GreaterThan(a, v) => withStats(a) { (dt, cs) =>
        hasValues(cs) && cmp(dt, cs.max, v).forall(_ > 0) }
      case GreaterThanOrEqual(a, v) => withStats(a) { (dt, cs) =>
        hasValues(cs) && cmp(dt, cs.max, v).forall(_ >= 0) }
      case LessThan(a, v) => withStats(a) { (dt, cs) =>
        hasValues(cs) && cmp(dt, cs.min, v).forall(_ < 0) }
      case LessThanOrEqual(a, v) => withStats(a) { (dt, cs) =>
        hasValues(cs) && cmp(dt, cs.min, v).forall(_ <= 0) }
      case IsNull(a) => stats.get(a).forall(_.nullCount > 0)
      case IsNotNull(a) => stats.get(a).forall(hasValues)
      case StringStartsWith(a, prefix) => withStats(a) { (dt, cs) =>
        // rows with prefix p live in [p, p+∞): skip iff max < p or
        // min is already past every p-prefixed string
        dt != StringType || (hasValues(cs) &&
          utf8Cmp(cs.max, prefix) >= 0 &&
          (cs.min.length < prefix.length || utf8Cmp(
            cs.min.substring(0, prefix.length), prefix) <= 0))
      }
      case And(l, r) =>
        mightMatch(stats, schema, l) && mightMatch(stats, schema, r)
      case Or(l, r) =>
        mightMatch(stats, schema, l) || mightMatch(stats, schema, r)
      case Not(IsNull(a)) => mightMatch(stats, schema, IsNotNull(a))
      case Not(IsNotNull(a)) => mightMatch(stats, schema, IsNull(a))
      case _ => true
    }
  }

  /** Compare a stored bound against a filter value under the column
    * type's order; None when the value cannot be interpreted (→ no
    * pruning). Strings compare as unsigned UTF-8 bytes — the order
    * parquet used to compute the bounds.
    */
  private def cmp(dt: DataType, bound: String, v: Any): Option[Int] =
    try {
      dt match {
        case IntegerType | LongType => v match {
          case n: Number => Some(java.lang.Long.compare(bound.toLong, n.longValue()))
          case _ => None
        }
        case FloatType | DoubleType => v match {
          case n: Number => Some(java.lang.Double.compare(bound.toDouble, n.doubleValue()))
          case _ => None
        }
        case StringType => v match {
          case s: String => Some(utf8Cmp(bound, s))
          case u => Some(utf8Cmp(bound, u.toString))
        }
        case BooleanType => v match {
          case b: java.lang.Boolean =>
            Some(java.lang.Boolean.compare(bound.toBoolean, b))
          case _ => None
        }
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Unsigned lexicographic UTF-8 byte order (parquet's UTF8 sort order). */
  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }
}
