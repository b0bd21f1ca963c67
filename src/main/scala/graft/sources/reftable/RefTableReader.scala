package graft.sources.reftable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.{TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.{MessageType, Type}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One snapshot file = one input partition. At cluster scale the natural
  * refinement is row-group splits sized by maxPartitionBytes; file granularity
  * keeps the snapshot-pinning contract simple and is already parallel across
  * the snapshot's files.
  */
final case class RefTableInputPartition(path: String, length: Long, gen: Long)
    extends InputPartition

/** Serializable factory — only (options, required schema) ship to executors;
  * readers are constructed executor-side (the reference relied on lazy
  * per-executor transformer init for the same reason,
  * TableStreamingSource.java:113-115).
  */
class RefTableReaderFactory(opts: RefTableOptions, required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RefTablePartitionReader(opts, required, pushed, partition.asInstanceOf[RefTableInputPartition])
}

/** Executor-side decoder: schema-directed projection from the storage row
  * format to typed InternalRows — the analogue of the reference's
  * RowRecordTransformer (byte[] columns → typed record,
  * TableStreamingSource.java:101-118), including the row-key-as-column
  * projection (rowField → keyColumn) and the generation column.
  *
  * Reads only the requested storage columns (requested parquet schema is the
  * footer schema filtered to the needed fields, so file logical-type
  * annotations are preserved).
  */
class RefTablePartitionReader(
    opts: RefTableOptions,
    required: StructType,
    pushed: Array[Filter],
    partition: RefTableInputPartition)
    extends PartitionReader[InternalRow] {

  private val conf = new Configuration()
  private val inputFile = HadoopInputFile.fromPath(new Path(partition.path), conf)

  // storage column needed for each output field (None → synthesized gen col)
  private val fieldSources: Array[Option[String]] = required.fields.map { f =>
    if (opts.genColumn.contains(f.name)) None else Some(opts.storageColumn(f.name))
  }

  private val fileSchema: MessageType = {
    val r = ParquetFileReader.open(inputFile)
    try r.getFooter.getFileMetaData.getSchema
    finally r.close()
  }

  // columns referenced only by pushed filters must still be read (Spark may
  // prune them from the output projection once a filter is fully pushed)
  private val filterCols: Seq[String] = pushed.toSeq.flatMap(_.references)
    .flatMap(n => if (opts.genColumn.contains(n)) None else Some(opts.storageColumn(n)))

  private val requestedSchema: MessageType = {
    val wanted = (fieldSources.flatten ++ filterCols).distinct
    val missing = wanted.filterNot(fileSchema.containsField)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Columns ${missing.mkString(", ")} not found in ${partition.path} " +
          s"(file has: ${fileSchema.getFields.toArray.map(_.asInstanceOf[Type].getName).mkString(", ")})")
    new MessageType(fileSchema.getName, wanted.map(n => fileSchema.getType(Seq(n): _*)): _*)
  }

  private val reader: ParquetReader[Group] = {
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, requestedSchema.toString)
    val b = ParquetReader.builder(new GroupReadSupport(), new Path(partition.path)).withConf(conf)
    val preds = pushed.flatMap(f => RefTableFilters.translate(opts, f))
    val withF = if (preds.isEmpty) b
      else b.withFilter(FilterCompat.get(preds.reduce(FilterApi.and)))
    withF.build()
  }

  /** nanos-per-micro divisor for INT64 timestamp columns, per file annotation. */
  private def tsDivisor(col: String): Long = {
    fileSchema.getType(Seq(col): _*).getLogicalTypeAnnotation match {
      case t: TimestampLogicalTypeAnnotation => t.getUnit match {
        case TimeUnit.NANOS  => 1000L
        case TimeUnit.MICROS => 1L
        case TimeUnit.MILLIS => -1L // multiply instead
      }
      case _ => 1L
    }
  }
  private val tsDivisors: Map[String, Long] =
    required.fields.iterator.zip(fieldSources.iterator).collect {
      case (f, Some(srcCol)) if f.dataType == TimestampType => srcCol -> tsDivisor(srcCol)
    }.toMap

  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      fieldSources(i) match {
        case None => row.update(i, partition.gen)
        case Some(srcCol) =>
          if (current.getFieldRepetitionCount(srcCol) == 0) row.setNullAt(i)
          else row.update(i, decode(srcCol, required.fields(i).dataType))
      }
      i += 1
    }
    row
  }

  private def decode(col: String, dt: DataType): Any = dt match {
    case IntegerType => current.getInteger(col, 0)
    case LongType    => current.getLong(col, 0)
    case DoubleType  => current.getDouble(col, 0)
    case FloatType   => current.getFloat(col, 0)
    case BooleanType => current.getBoolean(col, 0)
    case StringType  => UTF8String.fromBytes(current.getBinary(col, 0).getBytes)
    case BinaryType  => current.getBinary(col, 0).getBytes
    case TimestampType =>
      val v = current.getLong(col, 0)
      tsDivisors(col) match {
        case -1L => v * 1000L // millis -> micros
        case d   => v / d
      }
    case other =>
      throw new UnsupportedOperationException(s"reftable: unsupported type $other for column $col")
  }

  override def close(): Unit = reader.close()
}
