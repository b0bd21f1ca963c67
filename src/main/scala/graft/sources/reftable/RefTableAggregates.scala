package graft.sources.reftable

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types._

/** Aggregate pushdown: COUNT / MIN / MAX answered from parquet footer
  * statistics, never touching a data page — the metadata-only fast path
  * that makes `SELECT count(*), min(k), max(k)` on a 100 TB snapshot a
  * footer sweep instead of a table scan.
  *
  * Shape: one input partition per snapshot file; each reader opens only
  * the footer and emits ONE partial row (per-file count / min / max).
  * `supportCompletePushDown` stays false, so Spark's final aggregation
  * combines the partials (sum of counts, min of mins, …) — at 100k files
  * that is 100k footer reads fanned out across the cluster and a
  * few-kilobyte shuffle.
  *
  * Pushed only when exact-from-metadata is guaranteed: no filters (our
  * residual-filter contract means Spark blocks aggregate pushdown itself
  * whenever a filter exists), no grouping, and only count / count(col) /
  * min / max over numeric, boolean or date columns (string/binary stats
  * can be truncated by writers; decimals and timestamps carry
  * representation subtleties — those fall back to the normal scan).
  */
object RefTableAggregates {

  sealed trait AggSpec
  case object CountStarSpec extends AggSpec { override def toString = "COUNT(*)" }
  final case class CountSpec(col: String) extends AggSpec { override def toString = s"COUNT($col)" }
  final case class MinSpec(col: String, dt: DataType) extends AggSpec { override def toString = s"MIN($col)" }
  final case class MaxSpec(col: String, dt: DataType) extends AggSpec { override def toString = s"MAX($col)" }

  /** Types whose parquet footer min/max are exact and losslessly convert
    * to the declared Spark type.
    */
  private def statsExact(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | FloatType | DoubleType | BooleanType |
         DateType | ShortType | ByteType => true
    case _ => false
  }

  private def simpleCol(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames().length == 1 => Some(nr.fieldNames()(0))
      case _ => None
    }

  /** Storage column for an output field, if footer stats can serve it
    * (gen and partition columns have no storage chunks — not served).
    */
  private def statsColumn(opts: RefTableOptions, field: String): Option[(String, DataType)] =
    opts.schema.fields.find(_.name == field)
      .filter(_ => !opts.genColumn.contains(field) && !opts.isPartitionCol(field))
      .map(f => (opts.storageColumn(field), f.dataType))

  /** Validate a candidate aggregation; Some(specs) iff every aggregate is
    * answerable exactly from footer statistics.
    */
  def accept(opts: RefTableOptions, agg: Aggregation): Option[Seq[AggSpec]] = {
    if (agg.groupByExpressions().nonEmpty) return None
    val specs = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(CountStarSpec)
      case c: Count if !c.isDistinct =>
        simpleCol(c.column).flatMap(statsColumn(opts, _)).map { case (col, _) => CountSpec(col) }
      case m: Min =>
        simpleCol(m.column).flatMap(statsColumn(opts, _))
          .collect { case (col, dt) if statsExact(dt) => MinSpec(col, dt) }
      case m: Max =>
        simpleCol(m.column).flatMap(statsColumn(opts, _))
          .collect { case (col, dt) if statsExact(dt) => MaxSpec(col, dt) }
      case _ => None
    }
    if (specs.exists(_.isEmpty)) None else Some(specs.flatten)
  }

  /** Output schema of the partial rows, positionally matching the pushed
    * aggregate list (Spark maps by position; min/max carry the declared
    * field type, counts are longs).
    */
  def schemaOf(specs: Seq[AggSpec]): StructType = StructType(specs.map {
    case CountStarSpec   => StructField("count(*)", LongType, nullable = false)
    case CountSpec(c)    => StructField(s"count($c)", LongType, nullable = false)
    case MinSpec(c, dt)  => StructField(s"min($c)", dt, nullable = true)
    case MaxSpec(c, dt)  => StructField(s"max($c)", dt, nullable = true)
  })
}

class RefTableAggScan(opts: RefTableOptions, specs: Seq[RefTableAggregates.AggSpec])
    extends Scan {
  override def readSchema(): StructType = RefTableAggregates.schemaOf(specs)
  override def description(): String =
    s"reftable(${opts.path}) PushedAggregates: [${specs.mkString(", ")}] (footer statistics only)"
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val gen = if (opts.refreshMs <= 0) 0L else System.currentTimeMillis() / opts.refreshMs
      // one partition per FILE (never byte ranges): a footer describes the
      // whole file, and each file must be counted exactly once. The
      // version-aware pruned listing (no filters can be pushed here)
      // keeps time-travel reads honest.
      SnapshotFiles.pruned(opts, Nil)
        .map(f => RefTableInputPartition(f.path, 0L, f.length, f.length, gen, f.partitionValues)
          : InputPartition)
        .toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new RefTableAggReaderFactory(opts, specs)
  }
}

class RefTableAggReaderFactory(opts: RefTableOptions, specs: Seq[RefTableAggregates.AggSpec])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RefTableAggFooterReader(opts, specs, partition.asInstanceOf[RefTableInputPartition])
}

/** Reads ONLY the footer of its file and emits one partial-aggregate row. */
class RefTableAggFooterReader(
    opts: RefTableOptions, specs: Seq[RefTableAggregates.AggSpec],
    partition: RefTableInputPartition)
    extends PartitionReader[InternalRow] {
  import RefTableAggregates._

  private var emitted = false

  private lazy val row: InternalRow = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(partition.path), new Configuration()))
    try {
      val footerSchema = reader.getFooter.getFileMetaData.getSchema
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      // schema evolution: a column this (older) file predates is all-null
      // by definition — count contributes 0, min/max contribute nothing
      def absent(col: String): Boolean =
        opts.allowMissingColumns && !footerSchema.containsField(col)
      // partition evolution: a column since REMOVED from the partition
      // spec exists in this (older) file only as ITS directory value —
      // exact and constant, so the aggregate is served from the pv itself
      // (min = max = the value; count is every row, or 0 for the null dir)
      def pvRaw(storageCol: String): Option[String] =
        opts.schema.fields.find(f => opts.storageColumn(f.name) == storageCol)
          .filter(f => RefTableColumnarReader.pvConst(opts, partition.partitionValues, f))
          .map(f => partition.partitionValues(f.name))
      def chunk(block: org.apache.parquet.hadoop.metadata.BlockMetaData, col: String) =
        block.getColumns.asScala.find(_.getPath.toDotString == col).getOrElse(
          throw new IllegalStateException(s"reftable: column $col missing from ${partition.path}"))
      def stats(col: String) = blocks.map { b =>
        val s = chunk(b, col).getStatistics
        if (s == null) throw new IllegalStateException(
          s"reftable: no footer statistics for $col in ${partition.path}; " +
            "rewrite the file with statistics or avoid metadata-only aggregates")
        (b.getRowCount, s)
      }
      // per-chunk min or max; None ONLY for a provably empty / all-null
      // chunk. A chunk whose min/max statistics simply weren't written
      // (stats disabled, or suppressed by parquet-mr's corrupt-statistics
      // check for legacy float writers) is indistinguishable from data —
      // silently skipping it would return a wrong answer, so it throws.
      def minMax(c: String, pickMin: Boolean): Option[Any] = {
        if (absent(c)) return None
        val parts = stats(c).flatMap { case (rows, s) =>
          if (s.hasNonNullValue) Some(if (pickMin) s.genericGetMin() else s.genericGetMax())
          else if (rows == 0L || (s.isNumNullsSet && s.getNumNulls == rows)) None
          else throw new IllegalStateException(
            s"reftable: min/max statistics missing for $c in ${partition.path}; " +
              "rewrite the file with statistics or avoid metadata-only aggregates")
        }
        if (parts.isEmpty) None
        else Some(parts.reduce((a, b) =>
          if ((a.asInstanceOf[Comparable[Any]].compareTo(b) <= 0) == pickMin) a else b))
      }
      // footer stats come back at the FILE's physical width (Integer for
      // INT32 even when the column was widened to BIGINT, Float for
      // pre-widening FLOAT files); coerce to the DECLARED type for the
      // partial row — all the accepted widenings are lossless
      def narrow(v: Any, dt: DataType): Any = dt match {
        case ShortType   => v.asInstanceOf[Number].shortValue()
        case ByteType    => v.asInstanceOf[Number].byteValue()
        case IntegerType => v.asInstanceOf[Number].intValue()
        case LongType    => v.asInstanceOf[Number].longValue()
        case DoubleType  => v match {
          case f: java.lang.Float => f.toDouble // exact float->double
          case n: Number => n.doubleValue()
        }
        case FloatType   => v.asInstanceOf[Number].floatValue()
        case _ => v
      }
      val out = new GenericInternalRow(specs.length)
      specs.zipWithIndex.foreach { case (spec, i) =>
        spec match {
          case CountStarSpec =>
            out.update(i, blocks.map(_.getRowCount).sum)
          case CountSpec(c) =>
            out.update(i, pvRaw(c) match {
              case Some(raw) =>
                if (raw == RefTablePartitioning.HiveDefaultPartition) 0L
                else blocks.map(_.getRowCount).sum
              case None =>
                if (absent(c)) 0L else stats(c).map { case (rows, s) =>
                  if (!s.isNumNullsSet) throw new IllegalStateException(
                    s"reftable: null counts unset for $c in ${partition.path}")
                  rows - s.getNumNulls
                }.sum
            })
          case MinSpec(c, dt) => out.update(i, pvRaw(c)
            .filter(_ => blocks.exists(_.getRowCount > 0L)) // 0-row file: no min
            .map(RefTablePartitioning.catalystValue(_, dt))
            .getOrElse(minMax(c, pickMin = true).map(narrow(_, dt)).orNull))
          case MaxSpec(c, dt) => out.update(i, pvRaw(c)
            .filter(_ => blocks.exists(_.getRowCount > 0L))
            .map(RefTablePartitioning.catalystValue(_, dt))
            .getOrElse(minMax(c, pickMin = false).map(narrow(_, dt)).orNull))
        }
      }
      out
    } finally reader.close()
  }

  override def next(): Boolean = if (emitted) false else { emitted = true; true }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}
