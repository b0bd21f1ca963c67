package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Harness-only: dump `.explain("formatted")` of the named catalog entries
  * to one file per query — the before/after plan evidence for optimization
  * rounds (`plans/rNN/<query>_{before,after}.txt`). Usage:
  *
  *   PlanDump <sfDir> <outDir> <suffix> q213_tokenize_pack,q219_shard_write
  *
  * writes `<outDir>/q213_tokenize_pack_<suffix>.txt` etc. The plan is the
  * ANALYZED-then-executed formatted plan of the entry's returned DataFrame
  * (collected first so AQE finals and runtime-built literals are real);
  * entries whose meat is driver-side composition still show the final
  * read-back plan, which is what the scan/join/exchange claims are about.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, namesCsv) = args
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = Catalog.byName(name).fn(spark, sfDir)
      df.collect()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
        s"# $name ($suffix) — explain(formatted), executed at $sfDir\n\n" + formatted)
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
