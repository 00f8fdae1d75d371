package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Partition-field model for the snapshot log. A field is serialized as a
  * plain string in `Snapshot.partitionCols` — `"col"` for an identity
  * transform, `"bucket(N,col)"` for a hash-bucket transform — so the log
  * format is unchanged for identity-partitioned tables and older
  * snapshots parse as identity fields.
  *
  * Bucketing is what makes storage-partitioned joins possible on
  * HIGH-CARDINALITY keys (user_id, order key): identity partitioning one
  * value per directory is a non-starter at millions of keys, while
  * `bucket(64, user_id)` gives 64 co-locatable groups regardless of key
  * count — Iceberg's standard layout for the 100 TB fact-fact join.
  *
  * The bucket id is `pmod(hash(col), n)` with Spark's own Murmur3
  * (seed 42): the WRITE path computes it with the built-in `hash`
  * function (codegen'd, no UDF), and [[BucketFunction.bucketId]] mirrors
  * the same per-type semantics for the DSv2 FunctionCatalog surface, so
  * the planner-visible transform and the on-disk layout can never drift.
  */
private[graft] object PartitionFields {

  sealed trait Field {
    /** The data column the transform reads. */
    def source: String
    /** Serialized form; also the manifest-stats key for the field. */
    def name: String
    /** Hive-layout directory key (sans the `__gp_` prefix) — kept free of
      * `(),` so `partitionBy` column names never hit path escaping. */
    def dirKey: String
  }

  final case class Identity(source: String) extends Field {
    def name: String = source
    def dirKey: String = source
  }

  final case class Bucket(n: Int, source: String) extends Field {
    def name: String = s"bucket($n,$source)"
    def dirKey: String = s"b${n}_$source"
  }

  /** Iceberg's truncate transform: strings → the first `w` characters,
    * ints/longs → the value floored to a multiple of `w` (`v - pmod(v,
    * w)`). Groups a high-cardinality ORDERED domain into contiguous
    * ranges — a LAYOUT transform: each file holds one truncated group,
    * so the source column's footer min/max are tight and predicates on
    * it prune files (bucket's hash destroys order and prunes nothing).
    *
    * ALSO storage-partitioned-join eligible, via a width-baked function
    * name: Spark's generic-transform translation keeps a `truncate(w,
    * col)` width literal as an expression LEAF, and a leaf that is not an
    * attribute can never satisfy a ClusteredDistribution (only bucket's
    * literal is special-cased out of the children) — so the key-grouped
    * scan reports the transform as `truncate_w(col)` instead, resolved
    * through the catalog's FunctionCatalog to a single-argument function
    * whose width lives in its name and canonicalName. The translated
    * TransformExpression then has one attribute child and co-partitioned
    * truncate tables sort-merge join with zero shuffles, exactly like
    * bucket (rows with equal source values share a truncated prefix). */
  final case class Truncate(w: Int, source: String) extends Field {
    def name: String = s"truncate($w,$source)"
    def dirKey: String = s"t${w}_$source"
  }

  /** Iceberg's time transforms — the fact-table layout the reference's
    * day-partitioned events table IS, expressed as a transform instead of
    * a materialized `day` column: `hours(ts)` keys a partition per hour
    * since epoch, `days(ts)` per calendar day (UTC), `months(ts)` per
    * month since epoch, `years(ts)` per year since 1970. Each file then
    * holds one time slice, so ts footer stats are tight and range
    * predicates prune files; SPJ works through the FunctionCatalog
    * `hours`/`days`/`months`/`years` functions (one attribute child,
    * like bucket). */
  final case class TimeUnit(unit: String, source: String) extends Field {
    def name: String = s"$unit($source)"
    def dirKey: String = s"${unit.take(1)}_$source"
  }

  private val BucketRe = """bucket\((\d+)\s*,\s*([^)]+)\)""".r
  private val TruncateRe = """truncate\((\d+)\s*,\s*([^)]+)\)""".r
  private val TimeRe = """(hours|days|months|years)\(([^)]+)\)""".r

  def parse(s: String): Field = s match {
    case BucketRe(n, c) => Bucket(n.toInt, c.trim)
    case TruncateRe(w, c) => Truncate(w.toInt, c.trim)
    case TimeRe(u, c) => TimeUnit(u, c.trim)
    case c => Identity(c)
  }

  /** Source types bucket/truncate accept (must stay in sync with
    * [[BucketFunction.bucketId]] / [[TruncateFunction]]'s per-type
    * mirrors). */
  def bucketableType(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType => true
    case _ => false
  }

  /** Source types the time transforms accept. */
  def timeSourceType(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }
}

/** DSv2 `FunctionCatalog` surface of the graft bucket transform. Spark's
  * `V2ScanPartitioningAndOrdering` resolves a scan-reported `bucket(n,
  * col)` transform through the table's catalog; without a resolvable
  * function the KeyGroupedPartitioning is discarded and the SPJ silently
  * degrades to a shuffle. The bound function also lets Spark EVALUATE the
  * transform (`produceResult`) when it shuffles one join side to match
  * the other's bucketing. `canonicalName` encodes the input type — two
  * sides are SPJ-compatible iff they hash the same way.
  */
private[graft] object BucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col) -> int: Murmur3(seed 42) hash bucket, pmod(hash(col), n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket takes (numBuckets, col), got ${inputType.simpleString}")
    val dt = inputType(1).dataType
    require(PartitionFields.bucketableType(dt),
      s"bucket source type not supported: ${dt.simpleString} (int/bigint/string)")
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = s"graft.bucket(${dt.simpleString})"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val v: Any =
          if (input.isNullAt(1)) null
          else dt match {
            case IntegerType => input.getInt(1)
            case LongType => input.getLong(1)
            case StringType => input.getUTF8String(1)
            case _ => throw new IllegalStateException(s"unreachable: $dt")
          }
        Integer.valueOf(BucketFunction.bucketId(v, input.getInt(0)))
      }
    }
  }

  /** Bucket id with exactly `pmod(hash(col), n)` semantics — Spark's
    * Murmur3 HashExpression per type at seed 42, floorMod'd positive. A
    * null input hashes to the seed itself, matching `hash(NULL)`. */
  def bucketId(value: Any, n: Int): Int = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32
    val h = value match {
      case null => 42
      case i: java.lang.Integer => Murmur3_x86_32.hashInt(i.intValue(), 42)
      case l: java.lang.Long => Murmur3_x86_32.hashLong(l.longValue(), 42)
      case s: org.apache.spark.unsafe.types.UTF8String =>
        Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
      case other => throw new UnsupportedOperationException(
        s"bucket source type not supported: ${other.getClass.getSimpleName}")
    }
    Math.floorMod(h, n)
  }
}

/** DSv2 FunctionCatalog surface of the truncate transform (same role as
  * [[BucketFunction]]: resolution makes the scan-reported transform
  * SPJ-checkable, and `produceResult` mirrors the write layout —
  * strings → first-`w`-chars prefix via `substring`, ints/longs →
  * `v - pmod(v, w)` floor multiple, both exactly what the staging
  * expression computes). */
private[graft] object TruncateFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}

  override def name(): String = "truncate"
  override def description(): String =
    "truncate(w, col): width-w prefix (string) / floor-to-multiple (int, bigint)"

  /** The truncation kernel both function surfaces and the write layout
    * share: width-`w` prefix for strings, floor-to-multiple for ints. */
  private[table] def truncate(dt: DataType, w: Int, input: InternalRow,
      at: Int): Any = {
    // w=0 would surface as a raw ArithmeticException (floorMod by zero)
    // mid-query, negative w as silent values matching no write layout
    require(w > 0, s"truncate width must be positive, got $w")
    if (input.isNullAt(at)) null
    else dt match {
      case IntegerType =>
        val v = input.getInt(at); v - Math.floorMod(v, w)
      case LongType =>
        val v = input.getLong(at); v - Math.floorMod(v, w.toLong)
      case StringType =>
        // substring semantics, like the staging expression
        input.getUTF8String(at).substringSQL(1, w)
      case _ => throw new IllegalStateException(s"unreachable: $dt")
    }
  }

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"truncate takes (width, col), got ${inputType.simpleString}")
    val dt = inputType(1).dataType
    require(PartitionFields.bucketableType(dt),
      s"truncate source type not supported: ${dt.simpleString} (int/bigint/string)")
    new ScalarFunction[Any] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
      override def resultType(): DataType = dt
      override def name(): String = "truncate"
      override def canonicalName(): String = s"graft.truncate(${dt.simpleString})"
      override def produceResult(input: InternalRow): Any =
        TruncateFunction.truncate(dt, input.getInt(0), input, 1)
    }
  }
}

/** DSv2 FunctionCatalog surface of the `days`/`months`/`years` time
  * transforms (same role as [[BucketFunction]]): resolution makes the
  * scan-reported transform SPJ-checkable — one attribute child, so a
  * clustered distribution over the source column is satisfiable — and
  * `produceResult` mirrors the write layout in UTC (the engine pins
  * sessions to UTC; see Tables/Bench builders). `days` returns the
  * calendar date (epoch days), `months` months-since-1970, `years`
  * years-since-1970 — Iceberg's value spaces. */
private[graft] final class TimeUnitFunction(unit: String)
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}

  override def name(): String = unit
  override def description(): String =
    s"$unit(col): UTC ${unit.dropRight(1)} ordinal of a timestamp/date"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"$unit takes (col), got ${inputType.simpleString}")
    val dt = inputType(0).dataType
    require(PartitionFields.timeSourceType(dt),
      s"$unit source must be timestamp/date, got ${dt.simpleString}")
    require(unit != "hours" || dt != DateType,
      "hours of a DATE is degenerate — use days(col) instead")
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(dt)
      override def resultType(): DataType =
        if (unit == "days") DateType else IntegerType
      override def name(): String = unit
      override def canonicalName(): String = s"graft.$unit(${dt.simpleString})"
      override def produceResult(input: InternalRow): Integer = {
        if (input.isNullAt(0)) return null
        if (unit == "hours")
          return Integer.valueOf(
            Math.floorDiv(input.getLong(0), 3_600_000_000L).toInt)
        val epochDay: Long = dt match {
          case DateType => input.getInt(0).toLong
          case _ => Math.floorDiv(input.getLong(0), 86_400_000_000L) // micros/day
        }
        unit match {
          case "days" => Integer.valueOf(epochDay.toInt)
          case "months" =>
            val d = java.time.LocalDate.ofEpochDay(epochDay)
            Integer.valueOf((d.getYear - 1970) * 12 + d.getMonthValue - 1)
          case "years" =>
            Integer.valueOf(java.time.LocalDate.ofEpochDay(epochDay).getYear - 1970)
        }
      }
    }
  }
}

/** The WIDTH-BAKED truncate function surface, `truncate_<w>(col)` — the
  * SPJ-eligible spelling of the truncate transform (see
  * [[PartitionFields.Truncate]]): one attribute argument, width in the
  * name, so Spark's generic-transform translation yields a
  * TransformExpression whose only leaf is the column and key-grouped
  * co-partitioning can satisfy a clustered distribution. `canonicalName`
  * carries width AND input type: two scans are SPJ-compatible iff they
  * truncate the same way. */
private[graft] final class WidthTruncateFunction(w: Int)
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}

  override def name(): String = s"truncate_$w"
  override def description(): String =
    s"truncate_$w(col): width-$w prefix (string) / floor-to-multiple (int, bigint)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"truncate_$w takes (col), got ${inputType.simpleString}")
    val dt = inputType(0).dataType
    require(PartitionFields.bucketableType(dt),
      s"truncate source type not supported: ${dt.simpleString} (int/bigint/string)")
    new ScalarFunction[Any] {
      override def inputTypes(): Array[DataType] = Array(dt)
      override def resultType(): DataType = dt
      override def name(): String = s"truncate_$w"
      override def canonicalName(): String =
        s"graft.truncate_$w(${dt.simpleString})"
      override def produceResult(input: InternalRow): Any =
        TruncateFunction.truncate(dt, w, input, 0)
    }
  }
}
