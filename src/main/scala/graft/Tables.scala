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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val raw = spark.read.parquet(path(dir, name))
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      if (driftTsCols.contains(f.name)) f.dataType match {
        case LongType =>
          df.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn(f.name, col(f.name).cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
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
