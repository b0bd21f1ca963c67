package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.{Instant, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the timestamp-encoding drift handling: the driver has regenerated
  * /root/testdata once already (parquet TIMESTAMP(NANOS) through round 8 →
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) from round 9) and may do so
  * again. This spec fabricates an `events` table in all three encodings the
  * drift matrix knows about — as Spark's reader sees them:
  *
  *   - LongType nanos (what TIMESTAMP(NANOS) reads as under
  *     spark.sql.legacy.parquet.nanosAsLong — Spark cannot WRITE nanos, so
  *     the fixture writes the equivalent plain-INT64 nanos column);
  *   - TIMESTAMP_NTZ micros (MICROS, isAdjustedToUTC=false);
  *   - TIMESTAMP_LTZ micros (MICROS, adjusted to UTC).
  *
  * and asserts that BOTH normalization paths — the batch loader
  * (Tables.load) and the schema'd read + SQL-expression path used by the
  * file-stream queries (StreamingOps.tsEncoding, which delegates to the same
  * Tables.tsNormalizeSql matrix) — produce identical TimestampType micros.
  */
class TsEncodingDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // micros-precision instants, deliberately including a sub-second part
  private val instants: Seq[Instant] = Seq(
    Instant.parse("2024-01-01T00:00:00.123456Z"),
    Instant.parse("2024-06-15T07:30:59.000001Z"),
    Instant.parse("2025-12-31T23:59:59.999999Z"))

  private def mkDir(): String = {
    val d = Files.createTempDirectory("drift").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val nanosDir, ntzDir, ltzDir = mkDir()

  private def writeAll(): Unit = {
    // 1) nanos-as-long generation
    instants.zipWithIndex
      .map { case (i, id) => (id.toLong, i.getEpochSecond * 1000000000L + i.getNano) }
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    // 2) NTZ-micros generation (UTC wall-clock of the same instants)
    instants.zipWithIndex
      .map { case (i, id) => (id.toLong, LocalDateTime.ofInstant(i, ZoneOffset.UTC)) }
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    // 3) LTZ-micros (a hypothetical future generation that needs no rewrite)
    instants.zipWithIndex
      .map { case (i, id) => (id.toLong, Timestamp.from(i)) }
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$ltzDir/events.parquet")
  }
  writeAll()

  private val allDirs = Seq("nanos" -> nanosDir, "ntz" -> ntzDir, "ltz" -> ltzDir)

  test("fixtures really are three distinct read-time encodings") {
    val types = allDirs.map { case (_, d) =>
      spark.read.parquet(s"$d/events.parquet").schema("ts").dataType
    }
    assert(types == Seq(LongType, TimestampNTZType, TimestampType))
  }

  test("batch path: Tables.load normalizes every encoding to identical TimestampType micros") {
    val loaded = allDirs.map { case (label, d) =>
      val df = Tables.load(spark, d, "events")
      assert(df.schema("ts").dataType == TimestampType, s"encoding $label")
      label -> df.orderBy("event_id").select("ts").as[Timestamp].collect().toSeq
    }
    val expected = instants.map(Timestamp.from)
    loaded.foreach { case (label, got) =>
      assert(got == expected, s"encoding $label")
    }
  }

  test("streaming path: schema'd read + tsNormalizeSql matches the batch path") {
    // replicate StreamingOps.tsEncoding: footer-detect the read type, build
    // an explicit schema (as readStream requires), normalize via the shared
    // SQL matrix.
    val expected = instants.map(Timestamp.from)
    allDirs.foreach { case (label, d) =>
      Tables.enableNanosAsLong(spark)
      val readType = spark.read.parquet(s"$d/events.parquet").schema("ts").dataType
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", readType)))
      val got = spark.read.schema(schema).parquet(s"$d/events.parquet")
        .selectExpr("event_id", s"${Tables.tsNormalizeSql("ts", readType)} as ts")
        .orderBy("event_id").select("ts").as[Timestamp].collect().toSeq
      assert(got == expected, s"encoding $label")
    }
  }

  test("normalization SQL is identity for already-normalized TimestampType") {
    assert(Tables.tsNormalizeSql("ts", TimestampType) == "ts")
    assert(Tables.tsNormalizeSql("ts", LongType) == "timestamp_micros(ts div 1000)")
    assert(Tables.tsNormalizeSql("ts", TimestampNTZType) == "cast(ts as timestamp)")
  }
}
