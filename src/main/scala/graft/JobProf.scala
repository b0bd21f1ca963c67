package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Harness-only job-level profiler (never part of the driver contract).
  *
  * Runs the named catalog entries (cold then warm) with a listener recording
  * every Spark job's submit→end wall time plus its call site / description,
  * then prints the WARM run's job timeline: per-job seconds, inter-job driver
  * gaps, and the total. The gaps are where non-job driver work (planning,
  * listing, commit protocol, sleeps) hides — exactly the component a stage
  * view cannot show.
  *
  * Usage: JobProf <sfDir> <name>[,<name>...]
  */
object JobProf {
  private case class J(id: Int, t0: Long, var t1: Long, desc: String)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (record) {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(e.jobId, J(e.jobId, System.nanoTime(), -1L, desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.t1 = System.nanoTime()
      }
    })
    try SparkEntry.queries("q08_join_agg_revenue")(spark, sfDir).count()
    catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val tc0 = System.nanoTime()
      fn(spark, sfDir).count() // cold
      val cold = (System.nanoTime() - tc0) / 1e9
      jobs.clear(); record = true
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count() // warm, recorded
      val t1 = System.nanoTime()
      record = false
      Thread.sleep(200) // let stragglers' JobEnd land
      val js = jobs.values().toArray(Array.empty[J]).sortBy(_.t0)
      println(f"== $name warm=${(t1 - t0) / 1e9}%.2fs cold=$cold%.2fs rows=$rows jobs=${js.length}")
      var cursor = t0
      js.foreach { j =>
        val gap = (j.t0 - cursor) / 1e9
        if (gap > 0.03) println(f"   --- driver gap ${gap}%6.3fs")
        val end = if (j.t1 > 0) j.t1 else j.t0
        println(f"   job ${j.id}%4d ${(end - j.t0) / 1e9}%7.3fs  ${j.desc.take(110)}")
        cursor = math.max(cursor, end)
      }
      val tailGap = (t1 - cursor) / 1e9
      if (tailGap > 0.03) println(f"   --- driver gap ${tailGap}%6.3fs (tail)")
    }
    spark.stop()
  }
}
