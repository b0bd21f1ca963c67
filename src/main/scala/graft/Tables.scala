package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference engine reads one keyed table per source instance
  * (reference: src/main/scala/io/cdap/plugin/table/streaming/TableInputDStream.scala:59
  * — `sec.fromDataset(name).rdd`); here every table is a parquet directory and
  * the scan is Spark's vectorized `FileSourceScanExec`, so predicate pushdown /
  * column pruning are handled by Catalyst. At 100 TB these would be partitioned
  * table paths; nothing in this API assumes single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Event-time columns whose on-disk encoding has drifted across driver
    * testdata regenerations: parquet TIMESTAMP(NANOS) (reads as LongType
    * under spark.sql.legacy.parquet.nanosAsLong) through round 8, then
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (reads as TIMESTAMP_NTZ) from
    * round 9. Both are normalized to TimestampType micros here — the
    * NTZ→LTZ cast under the pinned UTC session keeps the stored micros
    * value identical — so every downstream consumer (windows, watermarks,
    * unix_micros, session_window) sees ONE type regardless of which
    * generation of testdata is on disk. Integral `div` for the nanos case —
    * a double division would lose precision above 2^53 ns.
    */
  private val driftTsCols = Set("ts", "o_orderdate", "l_shipdate")

  /** Enable reading parquet TIMESTAMP(NANOS) columns as LongType nanos.
    * Safe no-op if the legacy flag ever disappears.
    */
  def enableNanosAsLong(spark: SparkSession): Unit =
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }

  /** THE drift matrix — the single place mapping an on-disk event-time
    * encoding (as seen by Spark's reader) to the engine-wide normalization
    * to TimestampType micros. Returns a SQL expression over `name`:
    *   - LongType (TIMESTAMP(NANOS) under nanosAsLong): integral `div`
    *     nanos→micros — double division would lose precision above 2^53 ns;
    *   - TIMESTAMP_NTZ (MICROS, isAdjustedToUTC=false): cast — under the
    *     pinned UTC session the stored micros value is unchanged;
    *   - TimestampType already: identity.
    * Both the batch loader ([[load]]) and the file-stream schema builder
    * (StreamingOps.tsEncoding) go through here, so a future encoding drift
    * is fixed in exactly one place.
    */
  def tsNormalizeSql(name: String, readType: org.apache.spark.sql.types.DataType): String =
    readType match {
      case LongType                                        => s"timestamp_micros($name div 1000)"
      case org.apache.spark.sql.types.TimestampNTZType     => s"cast($name as timestamp)"
      case _                                               => name
    }

  /** Inferred-schema cache per table path: the testdata parquets are
    * immutable within a JVM run (the driver regenerates them only between
    * rounds), but every `load` re-inferred the schema with a footer read —
    * and the SQL-catalog entries call [[registerAll]] (10 loads) each, so
    * one bench run paid hundreds of redundant inferences. Metadata only;
    * the data path is untouched.
    */
  private val schemaCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, org.apache.spark.sql.types.StructType](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, org.apache.spark.sql.types.StructType]): Boolean =
        size() > 64 // LRU bound, same as the ingest logCache: a long-lived
          // service accretes one entry per table path otherwise
    })

  /** The raw on-disk schema of a testdata table, cache-served (see
    * [[schemaCache]]) — used by the file-stream schema builders, which
    * need the PRE-normalization encoding of the drift columns.
    */
  def rawSchema(spark: SparkSession, dir: String, name: String): org.apache.spark.sql.types.StructType = {
    enableNanosAsLong(spark)
    val p = path(dir, name)
    val cached = schemaCache.get(p)
    if (cached != null) cached
    else {
      val s = spark.read.parquet(p).schema
      schemaCache.put(p, s)
      s
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    enableNanosAsLong(spark)
    val p = path(dir, name)
    val raw = spark.read.schema(rawSchema(spark, dir, name)).parquet(p)
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      if (driftTsCols.contains(f.name)) {
        val sql = tsNormalizeSql(f.name, f.dataType)
        if (sql == f.name) df else df.withColumn(f.name, expr(sql))
      } else df
    }
  }

  /** Register every table as a temp view named after the table, so catalog
    * queries can freely mix the DataFrame API and `spark.sql`. Idempotent.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }

  /** Idempotent dataset DDL — the analogue of the reference's
    * exists-check → create with concurrent-create tolerance
    * (TableStreamingSource.java:81-87): ensure a parquet table directory
    * exists with the given schema, creating an empty one if missing and
    * tolerating a concurrent creator winning the race.
    */
  def ensureTable(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) {
      try spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("ignore").parquet(path)
      catch {
        // a concurrent creator won the race - same outcome, not an error
        case _: org.apache.spark.sql.AnalysisException if fs.exists(p) => ()
      }
    }
  }
}
