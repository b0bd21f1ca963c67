package graft
import org.apache.spark.sql.SparkSession

/** Targeted A/B runner: runs only the named queries, N times each, prints
  * one JSON line {"name":[[secs,rows],...]}. Harness-only; never shipped.
  *
  * Rows ride along because a failing entry is FAST — an early round's A/B
  * silently compared successful runs against runs that threw at
  * `format("reftable")` resolution (a classes dir missing the
  * DataSourceRegister service file, which `sbt compile` alone does not
  * copy) and read the failure as a 2× regression. A timing whose run
  * errored prints rows=-1 and must be discarded, never compared.
  */
object BenchAB {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val runs = args(1).toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q08_join_agg_revenue")(spark, sfDir).count()
    catch { case _: Throwable => () }
    def r3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val out = names.map { n =>
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val rows = try SparkEntry.queries(n)(spark, sfDir).count()
          catch { case e: Throwable =>
            System.err.println(s"[benchab] $n failed: ${e.getMessage}"); -1L }
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      "\"" + n + "\":[" + ts.map { case (t, r) => s"[${r3(t)},$r]" }.mkString(",") + "]"
    }.mkString("{", ",", "}")
    println("ABLINE " + out)
    spark.stop()
  }
}
