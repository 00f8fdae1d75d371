package graft.table

import org.apache.spark.sql.sources._

/** Metadata-only file skipping from manifest min/max stats (the Iceberg
  * manifest-stats technique, reference
  * `aws-community-builders-presentation.md:183-197`): given the source
  * filters Spark pushed into a scan, drop every data file whose recorded
  * [min, max] range provably cannot satisfy them.
  *
  * Strictly conservative: a file is skipped only when a filter is
  * IMPOSSIBLE over its stats range; missing stats (old snapshots,
  * all-null files, unsupported types) keep the file. The surviving files
  * still evaluate the full predicate row-by-row (parquet row-group
  * pushdown + post-scan filter), so pruning can never change results.
  */
object StatsPruning {

  def prune(files: Seq[SnapshotTable.DataFile],
      filters: Seq[Filter]): Seq[SnapshotTable.DataFile] =
    files.filter(f => filters.forall(satisfiable(f, _)))

  /** Minimal catalyst→source translation for the comparison shapes the
    * pruner understands (Spark's own translateFilter is protected[sql]).
    * Unsupported shapes translate to None and therefore never prune.
    * Attribute leaves may be RESOLVED (pushed scan filters) or UNRESOLVED
    * (a bare `Column` built with `col(...)` that never went through the
    * analyzer — the `replaceWhere` predicate path); both carry the column
    * name, which is all stats lookup needs. */
  def fromCatalyst(e: org.apache.spark.sql.catalyst.expressions.Expression): Option[Filter] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    def lit(v: Any): Any = v match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case other => other
    }
    object Attr {
      def unapply(x: ce.Expression): Option[String] = x match {
        case a: ce.AttributeReference => Some(a.name)
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => Some(u.name)
        case _ => None
      }
    }
    e match {
      case ce.IsNull(Attr(a)) => Some(IsNull(a))
      case ce.EqualTo(Attr(a), ce.Literal(v, _)) => Some(EqualTo(a, lit(v)))
      case ce.EqualTo(ce.Literal(v, _), Attr(a)) => Some(EqualTo(a, lit(v)))
      case ce.GreaterThan(Attr(a), ce.Literal(v, _)) => Some(GreaterThan(a, lit(v)))
      case ce.GreaterThan(ce.Literal(v, _), Attr(a)) => Some(LessThan(a, lit(v)))
      case ce.GreaterThanOrEqual(Attr(a), ce.Literal(v, _)) => Some(GreaterThanOrEqual(a, lit(v)))
      case ce.GreaterThanOrEqual(ce.Literal(v, _), Attr(a)) => Some(LessThanOrEqual(a, lit(v)))
      case ce.LessThan(Attr(a), ce.Literal(v, _)) => Some(LessThan(a, lit(v)))
      case ce.LessThan(ce.Literal(v, _), Attr(a)) => Some(GreaterThan(a, lit(v)))
      case ce.LessThanOrEqual(Attr(a), ce.Literal(v, _)) => Some(LessThanOrEqual(a, lit(v)))
      case ce.LessThanOrEqual(ce.Literal(v, _), Attr(a)) => Some(GreaterThanOrEqual(a, lit(v)))
      case ce.In(Attr(a), vs) if vs.forall(_.isInstanceOf[ce.Literal]) =>
        Some(In(a, vs.map(l => lit(l.asInstanceOf[ce.Literal].value)).toArray))
      case ce.And(l, r) =>
        (fromCatalyst(l), fromCatalyst(r)) match {
          case (Some(a), Some(b)) => Some(And(a, b))
          case (Some(a), None) => Some(a) // conjunct alone is still a valid pruner
          case (None, Some(b)) => Some(b)
          case _ => None
        }
      case ce.Or(l, r) =>
        for { a <- fromCatalyst(l); b <- fromCatalyst(r) } yield Or(a, b)
      case _ => None
    }
  }

  /** Derive bucket-partition pruning filters implied by `filters`: for a
    * table bucketed `bucket(n, c)`, an equality / IN / IS NULL constraint
    * on `c` pins matching rows to a COMPUTABLE set of bucket ids (the
    * write layout's own `pmod(hash(v), n)`), and every bucketed file
    * carries its bucket id as a min==max manifest stat under the
    * transform's name — so a key-scoped replaceWhere or scan prunes to
    * O(touched buckets) files even though the hash destroys value order
    * and plain min/max ranges prune nothing. Conservative: any filter
    * shape that doesn't pin the bucket set derives nothing (no pruning),
    * and the derived filter is ANDed alongside the originals, so rows
    * are never lost — only provably-bucket-mismatched files skipped. */
  def bucketDerived(pcols: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      filters: Seq[Filter]): Seq[Filter] =
    pcols.map(PartitionFields.parse).collect {
      case b @ PartitionFields.Bucket(n, c) =>
        val dt = schema.fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType)
        // coerce a filter literal to the COLUMN's type before hashing:
        // Murmur3 hashes int and long differently, so an Integer literal
        // against a bigint column must hash as long (the write layout
        // hashes the column value)
        def bid(v: Any): Option[Int] = {
          val coerced: Option[Any] = (dt, v) match {
            case (Some(org.apache.spark.sql.types.LongType), x: Number) =>
              Some(java.lang.Long.valueOf(x.longValue()))
            case (Some(org.apache.spark.sql.types.IntegerType), x: Number) =>
              Some(java.lang.Integer.valueOf(x.intValue()))
            case (Some(org.apache.spark.sql.types.StringType), x) =>
              Some(org.apache.spark.unsafe.types.UTF8String.fromString(x.toString))
            case _ => None
          }
          coerced.map(BucketFunction.bucketId(_, n))
        }
        // bucket ids a filter confines column c to; None = unconstrained
        def ids(f: Filter): Option[Set[Int]] = f match {
          case EqualTo(`c`, v) => bid(v).map(Set(_))
          case In(`c`, vs) =>
            val bs = vs.toSeq.map(bid)
            if (bs.forall(_.isDefined)) Some(bs.flatten.toSet) else None
          case IsNull(`c`) => Some(Set(BucketFunction.bucketId(null, n)))
          case And(l, r) =>
            (ids(l) ++ ids(r)).reduceOption(_ intersect _)
          case Or(l, r) => for { a <- ids(l); b <- ids(r) } yield a union b
          case _ => None
        }
        val constrained = filters.flatMap(ids)
        constrained.reduceOption(_ intersect _).map(set =>
          In(b.name, set.toArray.map(Integer.valueOf(_): Any)))
    }.flatten
  private def satisfiable(file: SnapshotTable.DataFile, filter: Filter): Boolean =
    filter match {
      case EqualTo(c, v) => inRange(file, c, v, v)
      case GreaterThan(c, v) => maxAbove(file, c, v, strict = true)
      case GreaterThanOrEqual(c, v) => maxAbove(file, c, v, strict = false)
      case LessThan(c, v) => minBelow(file, c, v, strict = true)
      case LessThanOrEqual(c, v) => minBelow(file, c, v, strict = false)
      case In(c, vs) => vs.exists(v => inRange(file, c, v, v))
      case And(l, r) => satisfiable(file, l) && satisfiable(file, r)
      case Or(l, r) => satisfiable(file, l) || satisfiable(file, r)
      case _ => true // IsNull, StringContains, Not, … — never prune on these
    }

  // value could fall within [min, max]?
  private def inRange(f: SnapshotTable.DataFile, col: String,
      lo: Any, hi: Any): Boolean =
    stats(f, col) match {
      case None => true
      case Some((mn, mx)) =>
        (cmp(f, col, hi, mn), cmp(f, col, lo, mx)) match {
          case (Some(a), Some(b)) => a >= 0 && b <= 0 // hi >= min && lo <= max
          case _ => true
        }
    }

  private def maxAbove(f: SnapshotTable.DataFile, col: String, v: Any,
      strict: Boolean): Boolean =
    stats(f, col).flatMap { case (_, mx) => cmp(f, col, v, mx) } match {
      case Some(c) => if (strict) c < 0 else c <= 0 // v < max (or <=)
      case None => true
    }

  private def minBelow(f: SnapshotTable.DataFile, col: String, v: Any,
      strict: Boolean): Boolean =
    stats(f, col).flatMap { case (mn, _) => cmp(f, col, v, mn) } match {
      case Some(c) => if (strict) c > 0 else c >= 0 // v > min (or >=)
      case None => true
    }

  private def stats(f: SnapshotTable.DataFile, col: String): Option[(String, String)] =
    f.stats.get(col).map(cs => (cs.min, cs.max))

  /** Compare a filter value against a recorded stat bound under the
    * column's tagged type; None when not comparable (→ never prune). */
  private def cmp(f: SnapshotTable.DataFile, col: String,
      value: Any, bound: String): Option[Int] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    f.stats.get(col).flatMap { cs =>
      try {
        cs.typ match {
          case "long" =>
            val v = value match {
              case n: Number => n.longValue()
              case _ => return None
            }
            Some(java.lang.Long.compare(v, bound.toLong))
          case "double" =>
            val v = value match {
              case n: Number => n.doubleValue()
              case _ => return None
            }
            Some(java.lang.Double.compare(v, bound.toDouble))
          case "string" =>
            // UTF8String comparison = byte-wise over UTF-8 = code-point
            // order: matches both Spark's string ordering and the parquet
            // footer stats' unsigned-lexicographic min/max, where Java
            // String.compareTo (UTF-16 code units) disagrees for
            // supplementary characters and could wrongly prune
            val s = value match {
              case s: String => s
              case u: org.apache.spark.unsafe.types.UTF8String => u.toString
              case _ => return None
            }
            Some(org.apache.spark.unsafe.types.UTF8String.fromString(s)
              .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(bound)))
          case "ts" =>
            // bounds are micros-since-epoch (parquet TIMESTAMP_MICROS)
            val v = value match {
              case n: Number => n.longValue() // catalyst timestamp literal
              case t: java.sql.Timestamp => DateTimeUtils.fromJavaTimestamp(t)
              case i: java.time.Instant => DateTimeUtils.instantToMicros(i)
              case l: java.time.LocalDateTime => DateTimeUtils.localDateTimeToMicros(l)
              case _ => return None
            }
            Some(java.lang.Long.compare(v, bound.toLong))
          case "date" =>
            // bounds are epoch days (parquet DATE)
            val v: Long = value match {
              case n: Number => n.longValue() // catalyst date literal (days)
              case d: java.sql.Date => DateTimeUtils.fromJavaDate(d).toLong
              case d: java.time.LocalDate => d.toEpochDay
              case _ => return None
            }
            Some(java.lang.Long.compare(v, bound.toLong))
          case _ => None
        }
      } catch { case _: NumberFormatException => None }
    }
  }
}
