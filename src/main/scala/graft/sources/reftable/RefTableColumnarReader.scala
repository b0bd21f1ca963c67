package graft.sources.reftable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapred.FileSplit
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetInputFormat}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation.{TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.{MessageType, Type}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray, ColumnarBatch, ColumnarMap}
import org.apache.spark.unsafe.types.UTF8String

/** Columnar scan path: decodes parquet through Spark's
  * VectorizedParquetRecordReader (the same batched decoder the built-in
  * parquet source uses — dictionary-aware, null-vector based, ~10× the
  * example-Group row decode) and republishes the batch under the source's
  * output projection:
  *
  *  - storage columns are requested once each and shared when both `rowField`
  *    and the raw key column appear in the schema;
  *  - the generation column rides the reader's partition-value mechanism
  *    (a ConstantColumnVector, zero per-row cost);
  *  - TIMESTAMP(NANOS) columns — unsupported by the vectorized decoder as
  *    timestamps — are requested as LongType (legacy nanosAsLong contract)
  *    and wrapped in a floorDiv(·,1000) view, keeping the batch columnar.
  *
  * Row-group + page-level skipping comes from the pushed FilterPredicates;
  * exact filtering is Spark's job — the scan builder returns every filter as
  * a residual (see RefTableScanBuilder.pushFilters).
  */
object RefTableColumnarReader {
  /** Types the vectorized decoder handles for this source's flat schemas. */
  def supports(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DoubleType | FloatType | BooleanType |
         StringType | BinaryType | TimestampType | DateType | ShortType | ByteType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Per-executor footer-metadata cache: byte-range splits of the same file
    * (and re-reads across generations) share one footer parse instead of
    * one metadata round-trip per split. Keyed on (path, fileLength) — the
    * length comes from the generation's pinned listing, so a file swapped
    * in place under a stable name (the delete+rename pattern) stops hitting
    * the old entry the moment its size changes; same-length swaps of
    * *parquet* files are vanishingly rare (footer offsets/stats differ).
    * The cache is cleared if it ever grows past a bound so long-lived
    * executors don't accumulate entries.
    */
  private val footerCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.parquet.hadoop.metadata.FileMetaData]()

  private[reftable] def fileMetaOf(
      path: Path, fileLength: Long, conf: Configuration): org.apache.parquet.hadoop.metadata.FileMetaData = {
    if (footerCache.size > 4096) footerCache.clear()
    footerCache.computeIfAbsent(s"$path#$fileLength", { _ =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
      try r.getFooter.getFileMetaData
      finally r.close()
    })
  }

  /** Forward schema evolution, shared by both read paths: a declared
    * column absent from this (older) file reads as a null constant when
    * allowMissingColumns is set.
    */
  private[reftable] def missingFromFile(
      opts: RefTableOptions, fileSchema: MessageType, f: StructField): Boolean =
    !opts.genColumn.contains(f.name) && !opts.isPartitionCol(f.name) &&
      opts.allowMissingColumns && !fileSchema.containsField(opts.storageColumn(f.name))

  /** Pushed filters usable against THIS file, shared by both read paths:
    * parquet rejects predicates over columns it doesn't have, so filters
    * referencing a column this file lacks are withheld here — the residual
    * above the scan evaluates them over the null-filled rows with SQL
    * semantics.
    */
  private[reftable] def pushableForFile(
      opts: RefTableOptions, fileSchema: MessageType, pushed: Array[Filter]): Array[Filter] =
    pushed.filter(_.references.forall(n => opts.genColumn.contains(n) ||
      opts.isPartitionCol(n) || fileSchema.containsField(opts.storageColumn(n))))

  /** Per-file datetime rebase modes, mirroring the decision Spark's built-in
    * parquet path makes in DataSourceUtils: LEGACY (hybrid
    * Julian–Gregorian rebasing, using the writer timezone recorded in
    * `org.apache.spark.timeZone`) when the writer marker
    * `org.apache.spark.legacyDateTime` / `org.apache.spark.legacyINT96`
    * is present, OR when the recorded writer version predates the marker
    * itself — Spark ≤2.x always wrote the legacy calendar but the
    * markers only exist since 3.0 (3.1 for INT96, which 3.0 still wrote
    * legacy). Everything else — modern Spark and non-Spark writers on the
    * proleptic Gregorian calendar — reads as written (CORRECTED).
    * Returns (datetimeMode, datetimeTz, int96Mode, int96Tz).
    */
  private[graft] def rebaseSpec(
      meta: org.apache.parquet.hadoop.metadata.FileMetaData): (String, String, String, String) = {
    val kv = meta.getKeyValueMetaData
    val tz = Option(kv.get("org.apache.spark.timeZone")).getOrElse("UTC")
    // writer version as (major, minor), if the file was written by Spark
    val version: Option[(Int, Int)] =
      Option(kv.get("org.apache.spark.version")).flatMap { v =>
        v.split("\\.").take(2) match {
          case Array(ma, mi) => scala.util.Try((ma.toInt, mi.toInt)).toOption
          case _ => None
        }
      }
    val dt =
      if (kv.containsKey("org.apache.spark.legacyDateTime") ||
        version.exists(_._1 < 3)) "LEGACY"
      else "CORRECTED"
    val i96 =
      if (kv.containsKey("org.apache.spark.legacyINT96") ||
        version.exists(v => v._1 < 3 || (v._1 == 3 && v._2 == 0))) "LEGACY"
      else "CORRECTED"
    (dt, tz, i96, tz)
  }
}

class RefTableColumnarReader(
    opts: RefTableOptions,
    required: StructType,
    pushed: Array[Filter],
    partition: RefTableInputPartition,
    limit: Option[Int] = None)
    extends PartitionReader[ColumnarBatch] {

  // pushed LIMIT: rows still wanted from this partition
  private var remaining: Int = limit.getOrElse(Int.MaxValue)

  private val conf = new Configuration()
  private val hadoopPath = new Path(partition.path)

  private val fileMeta = RefTableColumnarReader.fileMetaOf(hadoopPath, partition.fileLength, conf)
  private val fileSchema: MessageType = fileMeta.getSchema

  private def isNanos(col: String): Boolean =
    fileSchema.containsField(col) &&
      (fileSchema.getType(Seq(col): _*).getLogicalTypeAnnotation match {
        case t: TimestampLogicalTypeAnnotation => t.getUnit == TimeUnit.NANOS
        case _ => false
      })

  private def missingFromFile(f: StructField): Boolean =
    RefTableColumnarReader.missingFromFile(opts, fileSchema, f)

  // output field i -> storage column (None = constant column: the
  // synthesized generation column, a directory partition value, or a
  // null-filled evolved column this file predates)
  private val fieldSources: Array[Option[String]] = required.fields.map { f =>
    if (opts.genColumn.contains(f.name) || opts.isPartitionCol(f.name) || missingFromFile(f)) None
    else Some(opts.storageColumn(f.name))
  }

  // constant fields ride the vectorized reader's partition-column mechanism:
  // one ConstantColumnVector each, zero per-row decode cost
  private val constFields: Array[StructField] =
    required.fields.filter(f =>
      opts.genColumn.contains(f.name) || opts.isPartitionCol(f.name) || missingFromFile(f))
  private val constIndex: Map[String, Int] = constFields.map(_.name).zipWithIndex.toMap

  {
    val missing = fieldSources.flatten.distinct.filterNot(fileSchema.containsField)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Columns ${missing.mkString(", ")} not found in ${partition.path} " +
          s"(file has: ${fileSchema.getFields.toArray.map(_.asInstanceOf[Type].getName).mkString(", ")}); " +
          "set allowMissingColumns=true to null-fill evolved columns")
  }

  // distinct storage columns, each requested once; nanos timestamps as longs
  private val storageCols: Array[String] = fieldSources.flatten.distinct
  private val requestedSpark: StructType = StructType(storageCols.map { c =>
    val outType = required.fields(fieldSources.indexOf(Some(c))).dataType
    val readType = if (outType == TimestampType && isNanos(c)) LongType else outType
    StructField(c, readType, nullable = true)
  })

  private val reader: VectorizedParquetRecordReader = {
    // the conf keys Spark's parquet read path expects (set by
    // ParquetFileFormat on the built-in path; we are our own file format)
    conf.set(ParquetInputFormat.READ_SUPPORT_CLASS,
      "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
    conf.set("org.apache.spark.sql.parquet.row.requested_schema", requestedSpark.json)
    conf.setBoolean("spark.sql.parquet.binaryAsString", false)
    conf.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
    conf.setBoolean("spark.sql.caseSensitive", false)
    conf.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
    conf.setBoolean("spark.sql.legacy.parquet.nanosAsLong", true)
    val preds = RefTableColumnarReader.pushableForFile(opts, fileSchema, pushed)
      .flatMap(f => RefTableFilters.translate(opts, f))
    if (preds.nonEmpty) ParquetInputFormat.setFilterPredicate(conf, preds.reduce(FilterApi.and))
    val (dtMode, dtTz, i96Mode, i96Tz) = RefTableColumnarReader.rebaseSpec(fileMeta)
    val r = new VectorizedParquetRecordReader(
      null, dtMode, dtTz, i96Mode, i96Tz, /* offHeap */ false, /* capacity */ 4096)
    val split = new FileSplit(hadoopPath, partition.start, partition.length, Array.empty[String])
    r.initialize(split, new TaskAttemptContextImpl(conf, new TaskAttemptID()))
    if (constFields.isEmpty) r.initBatch(new StructType(), InternalRow.empty)
    else {
      val row = new GenericInternalRow(constFields.length)
      constFields.zipWithIndex.foreach { case (f, i) =>
        val v: Any =
          if (opts.genColumn.contains(f.name)) java.lang.Long.valueOf(partition.gen)
          else if (opts.isPartitionCol(f.name))
            RefTablePartitioning.catalystValue(partition.partitionValues(f.name), f.dataType)
          else null // evolved column this file predates
        row.update(i, v)
      }
      r.initBatch(StructType(constFields.toIndexedSeq), row)
    }
    r.enableReturningBatches()
    r
  }

  // republish the inner batch's vectors under the output projection; the
  // vectors are stable across batches (only numRows changes)
  private var out: ColumnarBatch = _

  private def project(inner: ColumnarBatch): ColumnarBatch = {
    if (out == null) {
      val vectors: Array[ColumnVector] = fieldSources.zipWithIndex.map {
        case (None, i) => // constant (gen / partition-value) vector
          inner.column(storageCols.length + constIndex(required.fields(i).name))
        case (Some(c), i) =>
          val v = inner.column(storageCols.indexOf(c))
          if (required.fields(i).dataType == TimestampType && isNanos(c))
            new NanosToMicrosVector(v)
          else v
      }
      out = new ColumnarBatch(vectors)
    }
    val n = math.min(inner.numRows(), remaining)
    remaining -= n
    out.setNumRows(n)
    out
  }

  override def next(): Boolean = remaining > 0 && reader.nextBatch()
  override def get(): ColumnarBatch = project(reader.resultBatch())
  override def close(): Unit = reader.close()
}

/** A TimestampType view over an INT64(NANOS) column decoded as longs:
  * floorDiv by 1000 on read (floor, not truncate — pre-epoch values).
  */
private[reftable] class NanosToMicrosVector(child: ColumnVector)
    extends ColumnVector(TimestampType) {
  override def getLong(rowId: Int): Long = Math.floorDiv(child.getLong(rowId), 1000L)
  override def hasNull: Boolean = child.hasNull
  override def numNulls(): Int = child.numNulls()
  override def isNullAt(rowId: Int): Boolean = child.isNullAt(rowId)
  override def getBoolean(rowId: Int): Boolean = child.getBoolean(rowId)
  override def getByte(rowId: Int): Byte = child.getByte(rowId)
  override def getShort(rowId: Int): Short = child.getShort(rowId)
  override def getInt(rowId: Int): Int = child.getInt(rowId)
  override def getFloat(rowId: Int): Float = child.getFloat(rowId)
  override def getDouble(rowId: Int): Double = child.getDouble(rowId)
  override def getArray(rowId: Int): ColumnarArray = child.getArray(rowId)
  override def getMap(ordinal: Int): ColumnarMap = child.getMap(ordinal)
  override def getDecimal(rowId: Int, precision: Int, scale: Int): Decimal =
    child.getDecimal(rowId, precision, scale)
  override def getUTF8String(rowId: Int): UTF8String = child.getUTF8String(rowId)
  override def getBinary(rowId: Int): Array[Byte] = child.getBinary(rowId)
  override def getChild(ordinal: Int): ColumnVector = child.getChild(ordinal)
  override def close(): Unit = () // the child belongs to the inner reader
}
