package graft.sources.reftable

import scala.util.control.NonFatal

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hive-style directory partitioning for reftable snapshots.
  *
  * A 100 TB table is almost never a flat directory of parquet files — it is
  * laid out as nested `col=value` directories. The reference's CDAP Table
  * hid layout behind the dataset framework; here the source owns the
  * listing, so it must understand the layout or a partitioned snapshot is
  * unreadable. Contract (mirrors Spark's own partitioned file sources):
  *
  *  - `partitionColumns` declares the directory nesting order; the named
  *    fields must exist in the declared schema and are decoded from the
  *    path, never from file content;
  *  - values are `%xx`-unescaped (Spark's escapePathName inverse), with
  *    `__HIVE_DEFAULT_PARTITION__` decoding to SQL NULL;
  *  - pushed filters whose references are all partition columns prune the
  *    file listing on the driver — at refresh time for streams, plan time
  *    for batch — so a generation of a date-partitioned table with a date
  *    filter lists and emits only the matching directories.
  *
  * Pruning logic is a possible-outcome algebra rather than naive
  * three-valued logic: for each file the evaluator computes which SQL
  * outcomes (TRUE / FALSE / NULL) the predicate can take over that file's
  * rows, and the file is kept iff TRUE is possible. This is exact for
  * partition-constant leaves, stays safe for anything it cannot decide
  * (Unknown = all outcomes possible), and — unlike "keep unless definitely
  * false" — correctly prunes NULL-partition files under negation.
  */
object RefTablePartitioning {

  /** Hive's sentinel directory name for a null partition value. */
  val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Inverse of Spark's ExternalCatalogUtils.escapePathName: `%xx` hex
    * escapes back to characters. Malformed escapes pass through verbatim.
    */
  def unescape(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Types a partition column may declare (directory names parse cleanly). */
  def supportedType(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | DoubleType | FloatType | BooleanType | DateType => true
    case TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Directory rendering of a timestamp ("yyyy-MM-dd HH:mm:ss[.f…]",
    * `%xx`-unescaped) → epoch micros. TIMESTAMP (instant) interprets the
    * wall-clock in the JVM default zone — the session timezone unless the
    * deployment overrides `spark.sql.session.timeZone`, which is also the
    * zone Spark rendered the directory name in at write time; NTZ is
    * zone-free by definition.
    */
  private def timestampMicros(raw: String, ntz: Boolean): Long = {
    val ldt = java.time.LocalDateTime.parse(raw.trim.replace(' ', 'T'))
    val i =
      if (ntz) ldt.toInstant(java.time.ZoneOffset.UTC)
      else ldt.atZone(java.time.ZoneId.systemDefault()).toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Directory value → Catalyst internal value for the readers. */
  def catalystValue(raw: String, dt: DataType): Any =
    if (raw == HiveDefaultPartition) null
    else dt match {
      case StringType  => UTF8String.fromString(raw)
      case IntegerType => java.lang.Integer.valueOf(raw.trim.toInt)
      case LongType    => java.lang.Long.valueOf(raw.trim.toLong)
      case DoubleType  => java.lang.Double.valueOf(raw.trim.toDouble)
      case FloatType   => java.lang.Float.valueOf(raw.trim.toFloat)
      case BooleanType => java.lang.Boolean.valueOf(raw.trim.toBoolean)
      case DateType    => java.lang.Integer.valueOf(java.time.LocalDate.parse(raw.trim).toEpochDay.toInt)
      case TimestampType    => java.lang.Long.valueOf(timestampMicros(raw, ntz = false))
      case TimestampNTZType => java.lang.Long.valueOf(timestampMicros(raw, ntz = true))
      case d: DecimalType => Decimal(new java.math.BigDecimal(raw.trim), d.precision, d.scale)
      case other => throw new IllegalArgumentException(s"reftable: unsupported partition type $other")
    }

  // ---- possible-outcome algebra ------------------------------------------

  /** Which SQL outcomes the predicate can take over this file's rows.
    * Shared with [[RefTableStats]], whose range-valued leaves compose
    * through the same connectives (the combinators are monotone: a leaf
    * returning a superset of the truly possible outcomes can only ever
    * KEEP extra files, never prune a matching one).
    */
  private[reftable] final case class Tri(t: Boolean, f: Boolean, n: Boolean)
  private[reftable] val True = Tri(t = true, f = false, n = false)
  private[reftable] val False = Tri(t = false, f = true, n = false)
  private[reftable] val Null = Tri(t = false, f = false, n = true)
  private[reftable] val Unknown = Tri(t = true, f = true, n = true)

  private[reftable] def not(a: Tri): Tri = Tri(a.f, a.t, a.n)
  private[reftable] def and(a: Tri, b: Tri): Tri = Tri(
    a.t && b.t,
    a.f || b.f,
    (a.n && (b.t || b.n)) || (b.n && (a.t || a.n)))
  private[reftable] def or(a: Tri, b: Tri): Tri = Tri(
    a.t || b.t,
    a.f && b.f,
    (a.n && (b.f || b.n)) || (b.n && (a.f || a.n)))

  /** Files surviving partition pruning under the pushed filters. Only
    * filters whose references are all partition columns participate; the
    * rest are untouched residuals for Spark.
    */
  def prune(files: Seq[SnapshotFile], opts: RefTableOptions, filters: Seq[Filter]): Seq[SnapshotFile] = {
    def prunable(ref: String): Boolean =
      opts.isPartitionCol(ref) || opts.transformFor(ref).isDefined
    val usable = filters.filter(f => f.references.nonEmpty && f.references.forall(prunable))
    if ((opts.partitionColumns.isEmpty && opts.hiddenTransforms.isEmpty) || usable.isEmpty) files
    else files.filter(sf => usable.forall(fl => eval(fl, sf.partitionValues, opts).t))
  }

  private[reftable] def eval(f: Filter, vals: Map[String, String], opts: RefTableOptions): Tri = f match {
    case EqualTo(a, v)            => cmp(a, v, vals, opts)(_ == 0)
    case GreaterThan(a, v)        => cmp(a, v, vals, opts)(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(a, v, vals, opts)(_ >= 0)
    case LessThan(a, v)           => cmp(a, v, vals, opts)(_ < 0)
    case LessThanOrEqual(a, v)    => cmp(a, v, vals, opts)(_ <= 0)
    case EqualNullSafe(a, v) =>
      vals.get(a) match {
        case None => Unknown
        case Some(HiveDefaultPartition) => if (v == null) True else False
        case Some(_) if v == null => False
        case Some(_) => cmp(a, v, vals, opts)(_ == 0)
      }
    case In(a, vs) =>
      // SQL IN: disjunction of equalities; null elements contribute NULL
      vs.foldLeft(False)((acc, v) => or(acc, cmp(a, v, vals, opts)(_ == 0)))
    case IsNull(a) =>
      nullDirKey(a, opts).flatMap(vals.get)
        .map(r => if (r == HiveDefaultPartition) True else False).getOrElse(Unknown)
    case IsNotNull(a) =>
      nullDirKey(a, opts).flatMap(vals.get)
        .map(r => if (r == HiveDefaultPartition) False else True).getOrElse(Unknown)
    case And(l, r) => and(eval(l, vals, opts), eval(r, vals, opts))
    case Or(l, r)  => or(eval(l, vals, opts), eval(r, vals, opts))
    case Not(c)    => not(eval(c, vals, opts))
    case StringStartsWith(a, v) => strPred(a, vals)(_.startsWith(v))
    case StringEndsWith(a, v)   => strPred(a, vals)(_.endsWith(v))
    case StringContains(a, v)   => strPred(a, vals)(_.contains(v))
    case AlwaysTrue()  => True
    case AlwaysFalse() => False
    case _ => Unknown
  }

  private def strPred(a: String, vals: Map[String, String])(p: String => Boolean): Tri =
    vals.get(a) match {
      case None => Unknown
      case Some(HiveDefaultPartition) => Null
      case Some(raw) => if (p(raw)) True else False
    }

  /** Directory key carrying null information for field `a`: the field
    * itself for identity partition columns, the transform dir for
    * null-preserving transforms (days/truncate map NULL source values to
    * the Hive default directory), None for bucket (NULL hashes into an
    * ordinary bucket — undecidable).
    */
  private def nullDirKey(a: String, opts: RefTableOptions): Option[String] =
    if (opts.isPartitionCol(a)) Some(a)
    else opts.transformFor(a) match {
      case Some(t: RefTableTransforms.Bucket) => None
      case Some(t) => Some(t.dirName)
      case None => Some(a) // not partition-related: vals.get misses -> Unknown
    }

  private def cmp(a: String, v: Any, vals: Map[String, String], opts: RefTableOptions)(
      p: Int => Boolean): Tri = {
    if (v == null) return Null
    opts.transformFor(a) match {
      case Some(t) =>
        return vals.get(t.dirName) match {
          case None => Unknown
          case Some(HiveDefaultPartition) => Null
          case Some(raw) =>
            try t.outcomes(raw, v, p) catch { case NonFatal(_) => Unknown }
        }
      case None => ()
    }
    vals.get(a) match {
      case None => Unknown
      case Some(HiveDefaultPartition) => Null
      case Some(raw) =>
        opts.schema.fields.find(_.name == a).map(_.dataType) match {
          case None => Unknown
          case Some(dt) =>
            try compareRaw(raw, v, dt).map(c => if (p(c)) True else False).getOrElse(Unknown)
            catch { case NonFatal(_) => Unknown }
        }
    }
  }

  /** Typed comparison of a directory value against a filter literal. */
  private def compareRaw(raw: String, v: Any, dt: DataType): Option[Int] = dt match {
    case IntegerType | LongType => v match {
      case n: Number => Some(java.lang.Long.compare(raw.trim.toLong, n.longValue()))
      case _ => None
    }
    case DoubleType | FloatType => v match {
      case n: Number => Some(java.lang.Double.compare(raw.trim.toDouble, n.doubleValue()))
      case _ => None
    }
    case BooleanType => v match {
      case b: java.lang.Boolean => Some(java.lang.Boolean.compare(raw.trim.toBoolean, b))
      case _ => None
    }
    case StringType => v match {
      case s: String => Some(raw.compareTo(s))
      case u: UTF8String => Some(raw.compareTo(u.toString))
      case _ => None
    }
    case DateType =>
      val fileDay = java.time.LocalDate.parse(raw.trim).toEpochDay
      v match {
        case d: java.sql.Date => Some(java.lang.Long.compare(fileDay, d.toLocalDate.toEpochDay))
        case d: java.time.LocalDate => Some(java.lang.Long.compare(fileDay, d.toEpochDay))
        case _ => None
      }
    case _: DecimalType =>
      val fileDec = new java.math.BigDecimal(raw.trim)
      v match {
        case d: java.math.BigDecimal => Some(fileDec.compareTo(d))
        case d: BigDecimal => Some(fileDec.compareTo(d.bigDecimal))
        case d: Decimal => Some(fileDec.compareTo(d.toJavaBigDecimal))
        case _ => None
      }
    case TimestampType =>
      val fileMicros = timestampMicros(raw, ntz = false)
      v match {
        case t: java.sql.Timestamp =>
          val i = t.toInstant
          Some(java.lang.Long.compare(fileMicros, i.getEpochSecond * 1000000L + i.getNano / 1000L))
        case i: java.time.Instant =>
          Some(java.lang.Long.compare(fileMicros, i.getEpochSecond * 1000000L + i.getNano / 1000L))
        case _ => None
      }
    case TimestampNTZType =>
      val fileMicros = timestampMicros(raw, ntz = true)
      v match {
        case ldt: java.time.LocalDateTime =>
          val i = ldt.toInstant(java.time.ZoneOffset.UTC)
          Some(java.lang.Long.compare(fileMicros, i.getEpochSecond * 1000000L + i.getNano / 1000L))
        case _ => None
      }
    case _ => None
  }
}
