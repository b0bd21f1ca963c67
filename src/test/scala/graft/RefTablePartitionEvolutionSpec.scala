package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition evolution (the Iceberg flagship): `ALTER TABLE ... SET
  * TBLPROPERTIES('option.partitionColumns'='...')` changes the layout of
  * FUTURE writes only — existing files keep the column in their data pages
  * (or in THEIR directory values, for a column since removed), and every
  * read path decides constant-vs-data per file from the file's own
  * recorded partition values. At 100 TB this is the difference between a
  * metadata-only spec change and rewriting the whole table.
  */
class RefTablePartitionEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshCatalog(): (String, String) = {
    val wh = Files.createTempDirectory("graft_pevo_wh").toString
    val cat = "graftpevo_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.reftable.RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    (cat, wh)
  }

  test("ADD partitioning: old flat files and new Hive files read as one table") {
    val (cat, _) = freshCatalog()
    val t = s"$cat.db.addp"
    spark.sql(s"CREATE TABLE $t (id BIGINT, grp STRING, v BIGINT) USING reftable")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'a', 30)")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('option.partitionColumns'='grp')")
    spark.sql(s"INSERT INTO $t VALUES (4, 'a', 40), (5, 'c', 50)")

    val all = spark.table(t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(all == Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L),
      (4L, "a", 40L), (5L, "c", 50L)))

    // a filter on the evolved partition column is exact across BOTH eras:
    // residual-evaluated over old files (data pages), pruned+constant on new
    val aOnly = spark.table(t).filter(col("grp") === "a").orderBy("id").collect()
      .map(_.getLong(0)).toSeq
    assert(aOnly == Seq(1L, 3L, 4L))

    // mutation across the boundary: one DELETE hits rows in both eras
    spark.sql(s"DELETE FROM $t WHERE grp = 'a' AND id >= 3")
    val left = spark.table(t).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(left == Seq(1L, 2L, 5L))
    // the evolved column survives the COW rewrite with its values intact
    val grps = spark.table(t).orderBy("id").collect().map(_.getString(1)).toSeq
    assert(grps == Seq("a", "b", "c"))
  }

  test("REMOVE partitioning: directory values keep serving the column; aggregates stay metadata-only") {
    val (cat, _) = freshCatalog()
    val t = s"$cat.db.remp"
    spark.sql(s"CREATE TABLE $t (id BIGINT, bucket INT, v BIGINT) USING reftable " +
      "OPTIONS (partitionColumns 'bucket')")
    spark.sql(s"INSERT INTO $t VALUES (1, 7, 10), (2, 9, 20)")
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES('option.partitionColumns')")
    spark.sql(s"INSERT INTO $t VALUES (3, 5, 30), (4, 11, 40)")

    val all = spark.table(t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(all == Seq((1L, 7, 10L), (2L, 9, 20L), (3L, 5, 30L), (4L, 11, 40L)))
    assert(spark.table(t).filter(col("bucket") > 6).collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 4L))

    // metadata-only MIN/MAX/COUNT over the evolved-away column: old files
    // serve it from their OWN directory value (exact), new from footers
    val agg = spark.table(t).agg(count(col("bucket")).as("n"),
      min("bucket").as("mn"), max("bucket").as("mx"))
    val row = agg.collect().head
    assert((row.getLong(0), row.getInt(1), row.getInt(2)) == (4L, 5, 11))
    val planStr = agg.queryExecution.executedPlan.toString()
    assert(planStr.contains("PushedAggregates"),
      s"expected the footer-statistics scan, got:\n$planStr")

    // UPDATE across the boundary must not retype or drop the column
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE bucket IN (7, 5)")
    val after = spark.table(t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(after == Seq((1L, 7, 11L), (2L, 9, 20L), (3L, 5, 31L), (4L, 11, 40L)))
  }

  test("CHANGE the partition column: three eras coexist; per-file pruning still fires") {
    val (cat, _) = freshCatalog()
    val t = s"$cat.db.chgp"
    spark.sql(s"CREATE TABLE $t (id BIGINT, region STRING, day STRING) USING reftable " +
      "OPTIONS (partitionColumns 'region')")
    spark.sql(s"INSERT INTO $t VALUES (1, 'eu', 'd1'), (2, 'us', 'd1')")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('option.partitionColumns'='day')")
    spark.sql(s"INSERT INTO $t VALUES (3, 'eu', 'd2'), (4, 'us', 'd3')")

    assert(spark.table(t).filter(col("region") === "eu").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(spark.table(t).filter(col("day") === "d1").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(spark.table(t).filter(col("day") === "d3" && col("region") === "us")
      .collect().map(_.getLong(0)).toSet == Set(4L))
    // count(*) stays exact across the mixed layout
    assert(spark.table(t).count() == 4L)
  }

  test("groupByPartition refuses a mixed layout loudly; compact migrates it") {
    val (cat, wh) = freshCatalog()
    val t = s"$cat.db.grpb"
    spark.sql(s"CREATE TABLE $t (id BIGINT, grp STRING) USING reftable")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('option.partitionColumns'='grp')")
    spark.sql(s"INSERT INTO $t VALUES (3, 'a')")

    val root = s"$wh/db/grpb"
    def grouped() = spark.read.format("reftable").option("path", root)
      .option("schema", "id BIGINT, grp STRING")
      .option("partitionColumns", "grp").option("groupByPartition", "true").load()
    val e = intercept[Exception] { grouped().collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("different partition spec")), e.toString)

    // compact rewrites every file under the CURRENT spec — grouped scans work
    graft.sources.reftable.VersionedTable.compact(
      spark, root, partitionColumns = Seq("grp"))
    assert(grouped().collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("streaming reads a mixed-layout table: both eras arrive with exact values") {
    import org.apache.spark.sql.streaming.Trigger
    val (cat, wh) = freshCatalog()
    val t = s"$cat.db.strm"
    spark.sql(s"CREATE TABLE $t (id BIGINT, grp STRING) USING reftable")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('option.partitionColumns'='grp')")
    spark.sql(s"INSERT INTO $t VALUES (3, 'a'), (4, 'c')")
    val root = s"$wh/db/strm"
    val q = spark.readStream.format("reftable").option("path", root)
      .option("schema", "id BIGINT, grp STRING")
      .option("partitionColumns", "grp")
      .load().writeStream.format("memory").queryName("pevo_strm")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("pevo_strm").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c")), got.toString)
  }

  test("dynamic partition overwrite refuses a mixed layout (old-era rows would survive)") {
    val (cat, wh) = freshCatalog()
    val t = s"$cat.db.dyno"
    spark.sql(s"CREATE TABLE $t (id BIGINT, grp STRING) USING reftable")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('option.partitionColumns'='grp')")
    spark.sql(s"INSERT INTO $t VALUES (3, 'a')")
    val root = s"$wh/db/dyno"
    import spark.implicits._
    val e = intercept[Exception] {
      graft.sources.reftable.RefTableMutations.overwritePartitions(
        spark, root, Seq((9L, "a")).toDF("id", "grp"), Seq("grp"),
        Map("grp" -> org.apache.spark.sql.types.StringType))
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("different partition spec")), e.toString)
    // compact migrates; the overwrite then replaces exactly partition 'a'
    graft.sources.reftable.VersionedTable.compact(spark, root, partitionColumns = Seq("grp"))
    graft.sources.reftable.RefTableMutations.overwritePartitions(
      spark, root, Seq((9L, "a")).toDF("id", "grp"), Seq("grp"),
      Map("grp" -> org.apache.spark.sql.types.StringType))
    val got = spark.table(t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "b"), (9L, "a")), got.toString)
  }

  test("evolution validates like CREATE: a non-field partition column is refused") {
    val (cat, _) = freshCatalog()
    val t = s"$cat.db.badp"
    spark.sql(s"CREATE TABLE $t (id BIGINT, grp STRING) USING reftable")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES('option.partitionColumns'='nope')")
    }
    assert(e.getMessage.contains("must be a field"), e.getMessage)
  }
}
