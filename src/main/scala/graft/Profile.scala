package graft

import graft.functions.GraftFunctions._
import graft.functions.HashFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc micro-profiling of the dedup kernels at a given SF (not part of the
  * driver contract; kept for regression hunting). Note: force evaluation with
  * explode/agg over the produced values — a bare count() lets Catalyst prune
  * the expressions entirely and measures only the scan.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name ($n rows)")
    }
    val docs = Tables.load(spark, dir, "documents")
    docs.count()
    time("tokens explode")(docs.select(explode(tokens(col("text")))).count())
    time("shingleHashes explode")(docs.select(explode(shingleHashes(tokens(col("text")), 3))).count())
    time("minhashSig posexplode")(
      docs.select(posexplode(minhashSig(tokens(col("text")), 3, 128))).count())
    time("minhashBands posexplode")(
      docs.select(posexplode(minhashBands(tokens(col("text")), 3, 64))).count())
    time("simhash agg")(docs.select(simhash60(tokens(col("text"))).as("sh")).agg(sum("sh")).count())

    // embedding-scan path A/B: the same reftable array<float> scan on the
    // vectorized (nested-column decode) vs row (Group reader) path —
    // toggled via -Dgraft.reftable.vectorized.arrays; pass "emb" as arg 2
    if (args.length > 1 && args(1) == "emb") {
      import graft.sources.reftable.VersionedTable
      val root = java.nio.file.Files.createTempDirectory("graft_prof_emb").toString + "/t"
      VersionedTable.publish(spark.read.parquet(Tables.path(dir, "embeddings")), root)
      def scan() = spark.read.format("reftable").option("path", root)
        .option("schema", "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT").load()
      scan().count() // warm footer caches
      for (i <- 1 to 3) {
        time(s"emb scan sum(e0) #$i")(
          scan().agg(sum(element_at(col("embedding"), 1).cast("double"))).count())
        time(s"emb scan sum(size) #$i")(scan().agg(sum(size(col("embedding")))).count())
      }
      println("plan: " + (if (scan().select("embedding").queryExecution.executedPlan
        .toString.contains("ColumnarToRow")) "COLUMNAR" else "ROW"))
    }
    spark.stop()
  }
}
