package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local larger-scale spot check (BASELINE.md round-12): synthesizes an
  * sf1-equivalent dataset from sf0.1 (10× rows, keys shifted per copy so
  * joins stay consistent and key-local batches stay key-local) and times a
  * named subset of catalog entries once at any sf dir, so per-query scaling
  * exponents t(10×)/t(1×) can be recorded. A constant that hides at sf0.1
  * (a driver-side loop, an accidental O(n²)) shows up here as an exponent
  * far from 1.
  *
  * Content realism under replication:
  *  - `documents.text` is salted with a per-copy token every 7 words, so
  *    every shingle window of a copy differs from the original — a 10×
  *    corpus of REAL documents is not 10 near-identical copies, and
  *    leaving the text verbatim would quadratically inflate every
  *    near-dup candidate set instead of scaling it linearly;
  *  - `embeddings.embedding` dimensions are rotated per copy (cosine-
  *    preserving within a copy, decorrelated across copies) for the same
  *    reason on the ANN operators;
  *  - dimension tables (region, nation) keep their natural size.
  *
  * Usage:
  *   runMain graft.ScaleCheck gen /root/testdata/sf0.1 /tmp/graft_sfx1 [copies]
  *   runMain graft.ScaleCheck run <sfDir> q136,q152,...   (prefix match)
  */
object ScaleCheck {
  private val Off = 10_000_000_000L

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toList match {
      case "gen" :: src :: out :: rest =>
        val only = rest.collectFirst { case s if s.startsWith("only=") =>
          s.stripPrefix("only=").split(',').map(_.trim).filter(_.nonEmpty).toSet }
        // a typo'd table name would silently copy the "targeted" table at
        // base scale and the spot check would measure flat scaling of 1×
        // inputs — the same silent-wrong-measurement class BenchAB's
        // rows=-1 guard exists for
        val replicable = Set("customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
        only.foreach { o =>
          val unknown = o.diff(replicable)
          require(unknown.isEmpty,
            s"ScaleCheck gen only=: unknown table(s) ${unknown.mkString(", ")}; " +
              s"replicable tables are ${replicable.toSeq.sorted.mkString(", ")}")
        }
        gen(spark, src, out,
          rest.filterNot(_.startsWith("only=")).headOption.map(_.toInt).getOrElse(10), only)
      case "run" :: dir :: names :: Nil =>
        run(spark, dir, names.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      case other =>
        System.err.println(s"ScaleCheck: unknown args $other"); sys.exit(2)
    }
    spark.stop()
  }

  /** `only`: replicate just these tables at `copies`×, copying the rest at
    * base scale — the 100× spot check targets a handful of entries whose
    * inputs are documents/embeddings, and writing 100× of every fact table
    * would dominate the check's wall for tables no targeted entry reads.
    */
  private def gen(spark: SparkSession, src: String, out: String, copies: Int,
      only: Option[Set[String]] = None): Unit = {
    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    // streaming entries symlink `events.parquet`/`documents.parquet` as
    // single FILES (the driver testdata shape) — keep those one-file
    val singleFile = Set("events", "documents")
    def write(t: String, df: DataFrame): Unit = {
      if (singleFile(t)) {
        val tmp = s"$out/._tmp_$t"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val tmpDir = new java.io.File(tmp)
        val part = tmpDir.listFiles().find(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        val dst = new java.io.File(s"$out/$t.parquet")
        if (dst.exists()) { def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }; rm(dst) }
        java.nio.file.Files.move(part.toPath, dst.toPath)
        tmpDir.listFiles().foreach(_.delete()); tmpDir.delete()
      } else df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scalecheck] wrote $t")
    }
    def shifted(df: DataFrame, keyCols: Seq[String], i: Int): DataFrame =
      keyCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(Off * i)))
    def replicate(t: String, keyCols: Seq[String],
        mutate: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      if (only.exists(!_.contains(t))) { write(t, read(t)); return }
      val base = read(t)
      val all = (0 until copies).map(i =>
        shifted(mutate(base, i), keyCols, i).select(base.columns.map(col).toIndexedSeq: _*))
        .reduce(_ unionAll _)
      write(t, all.repartition(32))
    }

    write("region", read("region"))
    write("nation", read("nation"))
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"), (df, i) =>
      if (i == 0) df
      else df
        .withColumn("text", expr(
          // salt every 3rd word: every k<=3 shingle window of a copy hits a
          // copy-unique token, so cross-copy Jaccard AND containment both
          // collapse — a 10x corpus of real documents is 10x distinct
          // documents, not 10 mutual near-dup/containment partners
          s"array_join(transform(split(text, ' '), (w, j) -> " +
            s"CASE WHEN j % 3 = 2 THEN concat(w, ' zqs$i') ELSE w END), ' ')"))
        .withColumn("n_chars", length(col("text")).cast("long")))
    replicate("embeddings", Seq("vec_id"), (df, i) =>
      if (i == 0) df
      // rotate by i mod d (element_at is 1-based) — valid for ANY copy
      // count, unlike a slice by i which breaks past the dimension
      else df.withColumn("embedding", expr(
        s"transform(sequence(0, size(embedding) - 1), " +
          s"j -> element_at(embedding, ((j + $i) % size(embedding)) + 1))")))
    println(s"[scalecheck] generated ${copies}x of $src at $out")
  }

  private def run(spark: SparkSession, dir: String, prefixes: Seq[String]): Unit = {
    // same warmup + drain accounting as Bench
    try SparkEntry.queries("q08_join_agg_revenue")(spark, dir).count()
    catch { case _: Throwable => () }
    def r3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val out = prefixes.flatMap { p =>
      SparkEntry.queries.keys.find(k => k == p || k.startsWith(p + "_")) match {
        case None => System.err.println(s"[scalecheck] no entry matches '$p'"); None
        case Some(name) =>
          BenchProbe.takeDrainSeconds()
          val t0 = System.nanoTime()
          val n = try SparkEntry.queries(name)(spark, dir).count()
            catch { case e: Throwable =>
              System.err.println(s"[scalecheck] $name failed: ${e.getMessage}"); -1L }
          val wall = (System.nanoTime() - t0) / 1e9
          val drain = BenchProbe.takeDrainSeconds()
          Some(s""""$name":{"wall":${r3(wall)},"drain":${r3(drain)},"rows":$n}""")
      }
    }
    println(s"""{"sf_dir":"$dir","entries":{${out.mkString(",")}}}""")
  }
}
