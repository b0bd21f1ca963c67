package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.reftable.{RefTableMaintenance, RefTableMutations, SnapshotFiles, VersionedTable}

/** One-off A/B: incremental vs full recluster cost on a hot-churned
  * clustered lineitem table at sf0.1 scale (not part of the catalog).
  */
object ReclusterBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity").cast("double").as("q"))
    def build(root: String): Unit = {
      VersionedTable.publishClustered(li, root, Seq("l_orderkey"), numFiles = 32)
      // hot churn: 6 appends piled into the lowest ~3% of the key range
      val maxK = li.agg(max("l_orderkey")).head().getLong(0)
      (1 to 6).foreach { i =>
        li.filter(col("l_orderkey") <= maxK / 32).coalesce(1)
          .write.format("reftable").option("path", root)
          .option("schema", "l_orderkey BIGINT, l_partkey BIGINT, q DOUBLE")
          .mode("append").save()
      }
    }
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val r1 = java.nio.file.Files.createTempDirectory("rcl_part").toString + "/t"
    build(r1)
    val n1 = SnapshotFiles.list(r1).size
    val (v1, tPart) = time(RefTableMutations.reclusterPartial(spark, r1,
      Seq("l_orderkey"), zorder = false))
    println(s"PARTIAL: files_before=$n1 ok=${v1.isDefined} " +
      f"wall=$tPart%.2f s files_after=${SnapshotFiles.list(r1).size}")
    val r2 = java.nio.file.Files.createTempDirectory("rcl_full").toString + "/t"
    build(r2)
    val (_, tFull) = time {
      val d = RefTableMaintenance.maintain(spark, r2, maxReadAmp = 0.0) // force full? no — use direct
      d
    }
    println(f"FULL: wall=$tFull%.2f s  ratio=${tFull / tPart}%.2f")
    spark.stop()
  }
}
