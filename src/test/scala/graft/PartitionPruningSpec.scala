package graft

import graft.sources.reftable.{RefTableOptions, RefTablePartitioning, SnapshotFile}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._
import scala.util.Random

/** Property test for the listing-pruning algebra: for EVERY randomly
  * generated filter tree over partition columns, the set of files the
  * pruner keeps must EQUAL the set of files whose (constant) partition
  * values satisfy the predicate under Spark's own SQL semantics — Spark
  * evaluating the equivalent Column over a one-row-per-file DataFrame is
  * the ground truth. Equality (not just superset) holds because every
  * generated leaf is evaluable; a false prune here would be a silent
  * wrong answer in production, which is why this gets randomized trees
  * rather than examples.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val colors: Seq[Option[String]] = Seq(Some("red"), Some("blue"), Some("x y"), None)
  private val buckets: Seq[Int] = Seq(1, 2, 7)

  // one synthetic file per (color, bucket) combination; partition values in
  // raw listing form (null = the Hive sentinel)
  private val files: Seq[SnapshotFile] =
    for { (c, i) <- colors.zipWithIndex; (b, j) <- buckets.zipWithIndex } yield
      SnapshotFile(s"f${i}_$j", 1L, Map(
        "color" -> c.getOrElse(RefTablePartitioning.HiveDefaultPartition),
        "bucket" -> b.toString))

  private val opts = RefTableOptions.from(new CaseInsensitiveStringMap(Map(
    "path" -> "/nonexistent", "schema" -> "id BIGINT, color STRING, bucket INT",
    "partitionColumns" -> "color,bucket").asJava))

  // paired (v1 Filter, equivalent Column) built from the same grammar node
  private def leaf(rnd: Random): (Filter, Column) = rnd.nextInt(9) match {
    case 0 =>
      val v = pick(rnd, "red", "blue", "x y", "green")
      (EqualTo("color", v), col("color") === v)
    case 1 =>
      val v = pick(rnd, "red", "blue", "x y", "green")
      (Not(EqualTo("color", v)), not(col("color") === v))
    case 2 =>
      val v = pick(rnd, 0, 1, 2, 7, 9)
      (GreaterThan("bucket", v), col("bucket") > v)
    case 3 =>
      val v = pick(rnd, 0, 1, 2, 7, 9)
      (LessThanOrEqual("bucket", v), col("bucket") <= v)
    case 4 =>
      val v = pick(rnd, 1, 2, 9)
      (EqualTo("bucket", v), col("bucket") === v)
    case 5 =>
      val vs = Seq("red", "x y", "green").filter(_ => rnd.nextBoolean())
      if (vs.isEmpty) (In("color", Array[Any]("green")), col("color").isin("green"))
      else (In("color", vs.toArray[Any]), col("color").isin(vs: _*))
    case 6 => (IsNull("color"), col("color").isNull)
    case 7 => (IsNotNull("color"), col("color").isNotNull)
    case 8 =>
      val p = pick(rnd, "r", "b", "x ")
      (StringStartsWith("color", p), col("color").startsWith(p))
  }

  private def pick[T](rnd: Random, xs: T*): T = xs(rnd.nextInt(xs.size))

  private def tree(rnd: Random, depth: Int): (Filter, Column) =
    if (depth <= 0) leaf(rnd)
    else rnd.nextInt(8) match {
      case 0 | 1 | 2 => leaf(rnd)
      case 3 | 4 =>
        val (lf, lc) = tree(rnd, depth - 1); val (rf, rc) = tree(rnd, depth - 1)
        (And(lf, rf), lc && rc)
      case 5 | 6 =>
        val (lf, lc) = tree(rnd, depth - 1); val (rf, rc) = tree(rnd, depth - 1)
        (Or(lf, rf), lc || rc)
      case 7 =>
        val (f, c) = tree(rnd, depth - 1)
        (Not(f), not(c))
    }

  test("pruning equals Spark's SQL semantics for every generated filter tree") {
    import spark.implicits._
    val truth = colors.zipWithIndex.flatMap { case (c, i) =>
      buckets.zipWithIndex.map { case (b, j) => (s"f${i}_$j", c.orNull, b) }
    }.toDF("path", "color", "bucket").cache()
    val rnd = new Random(20260812)
    try (1 to 80).foreach { _ =>
      val (filter, column) = tree(rnd, 3)
      val kept = RefTablePartitioning.prune(files, opts, Seq(filter)).map(_.path).toSet
      val expected = truth.filter(column).select("path").collect().map(_.getString(0)).toSet
      assert(kept == expected,
        s"filter $filter: pruner kept $kept but Spark semantics say $expected")
    } finally truth.unpersist()
  }

  test("filters over non-partition columns never prune") {
    assert(RefTablePartitioning.prune(files, opts, Seq(EqualTo("id", 5L))).size == files.size)
    // mixed references (partition + data column) are not pruning-usable either
    assert(RefTablePartitioning.prune(files, opts,
      Seq(Or(EqualTo("color", "red"), EqualTo("id", 5L)))).size == files.size)
  }
}
