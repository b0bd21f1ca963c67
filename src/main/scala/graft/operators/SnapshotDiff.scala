package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-level change capture between two states of a keyed table.
  *
  * The reference's entire model is "re-emit the full snapshot every
  * refresh" (TableInputDStream.scala:51-54) and it leaves change detection
  * to the consumer; this operator closes that gap: given two snapshots it
  * produces the inserts / deletes / updates by key — the classic
  * compare-based CDC shape.
  *
  * Scale: one shuffle of each side on the key columns into a sort-merge
  * full-outer join, then a narrow null-safe column comparison — the minimal
  * plan for diffing 100 TB snapshots without any storage-level changelog.
  * AQE handles skewed keys; no driver-side state, no collect.
  */
object SnapshotDiff {

  /** Changes that turn `before` into `after`, joined by `keyCols`.
    *
    * Output: the key columns, every value column (after-image; before-image
    * for deletes), and `change_type` ∈ insert | delete | update. Unchanged
    * keys (all value columns null-safely equal) are dropped. Both inputs
    * must share the same schema; keys are matched null-safely.
    */
  def diff(before: DataFrame, after: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshot diff needs at least one key column")
    require(before.columns.toSeq == after.columns.toSeq,
      s"snapshot diff requires identical schemas, got ${before.columns.toSeq} vs ${after.columns.toSeq}")
    val valCols = before.columns.toSeq.filterNot(keyCols.contains)

    // marker names must not collide with any aliased value column (a value
    // column literally named "present" would alias to __b_present too)
    def freshMarker(prefix: String): String =
      Iterator.from(0).map(i => s"${prefix}present$i")
        .find(n => !valCols.exists(c => s"__b_$c" == n || s"__a_$c" == n)).get
    val bPresent = freshMarker("__b_")
    val aPresent = freshMarker("__a_")

    val b = before.select(
      keyCols.map(c => col(c).as(s"__bk_$c")) ++
        valCols.map(c => col(c).as(s"__b_$c")) :+ lit(1).as(bPresent): _*)
    val a = after.select(
      keyCols.map(c => col(c).as(s"__ak_$c")) ++
        valCols.map(c => col(c).as(s"__a_$c")) :+ lit(1).as(aPresent): _*)

    val joinCond = keyCols.map(c => col(s"__bk_$c") <=> col(s"__ak_$c")).reduce(_ && _)
    val unchanged =
      if (valCols.isEmpty) lit(true)
      else valCols.map(c => col(s"__b_$c") <=> col(s"__a_$c")).reduce(_ && _)

    b.join(a, joinCond, "full_outer")
      .withColumn("change_type",
        when(col(bPresent).isNull, lit("insert"))
          .when(col(aPresent).isNull, lit("delete"))
          .when(unchanged, lit("unchanged"))
          .otherwise(lit("update")))
      .filter(col("change_type") =!= "unchanged")
      .select(
        keyCols.map(c => coalesce(col(s"__bk_$c"), col(s"__ak_$c")).as(c)) ++
          valCols.map(c =>
            when(col("change_type") === "delete", col(s"__b_$c"))
              .otherwise(col(s"__a_$c")).as(c)) :+
          col("change_type"): _*)
  }

  /** As [[diff]], but emitting BOTH row images: the key columns (equal on
    * both sides by construction), then `<c>_before` / `<c>_after` for every
    * value column (null image for inserts/deletes respectively), then
    * `change_type`. This is the shape downstream incremental computation
    * needs — [[IncrementalAgg.maintain]] must subtract an update's old
    * contribution and add its new one, including when the update moves the
    * row between groups, which the single-image [[diff]] cannot express.
    */
  def diffImages(before: DataFrame, after: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshot diff needs at least one key column")
    require(before.columns.toSeq == after.columns.toSeq,
      s"snapshot diff requires identical schemas, got ${before.columns.toSeq} vs ${after.columns.toSeq}")
    val valCols = before.columns.toSeq.filterNot(keyCols.contains)

    // same marker-collision discipline as diff()
    def freshMarker(prefix: String): String =
      Iterator.from(0).map(i => s"${prefix}present$i")
        .find(n => !valCols.exists(c => s"__b_$c" == n || s"__a_$c" == n)).get
    val bPresent = freshMarker("__b_")
    val aPresent = freshMarker("__a_")

    val b = before.select(
      keyCols.map(c => col(c).as(s"__bk_$c")) ++
        valCols.map(c => col(c).as(s"__b_$c")) :+ lit(1).as(bPresent): _*)
    val a = after.select(
      keyCols.map(c => col(c).as(s"__ak_$c")) ++
        valCols.map(c => col(c).as(s"__a_$c")) :+ lit(1).as(aPresent): _*)

    val joinCond = keyCols.map(c => col(s"__bk_$c") <=> col(s"__ak_$c")).reduce(_ && _)
    val unchanged =
      if (valCols.isEmpty) lit(true)
      else valCols.map(c => col(s"__b_$c") <=> col(s"__a_$c")).reduce(_ && _)

    b.join(a, joinCond, "full_outer")
      .withColumn("change_type",
        when(col(bPresent).isNull, lit("insert"))
          .when(col(aPresent).isNull, lit("delete"))
          .when(unchanged, lit("unchanged"))
          .otherwise(lit("update")))
      .filter(col("change_type") =!= "unchanged")
      .select(
        keyCols.map(c => coalesce(col(s"__bk_$c"), col(s"__ak_$c")).as(c)) ++
          valCols.flatMap(c => Seq(
            col(s"__b_$c").as(s"${c}_before"), col(s"__a_$c").as(s"${c}_after"))) :+
          col("change_type"): _*)
  }

  /** Turns a snapshot-per-generation stream (e.g. the reftable source in a
    * foreachBatch sink) into a changefeed: each call diffs the arriving
    * snapshot against the previous one and returns the changes (the first
    * snapshot is all inserts). Generations are materialized via
    * localCheckpoint so the previous one can be released eagerly.
    *
    * Sized for lookup-scale tables — the reference's documented use case.
    * For truly huge snapshots, keep the diff (a single key-shuffle join)
    * but source the `before` side from storage instead of executor memory.
    */
  final class ChangeFeed(keyCols: Seq[String], bothImages: Boolean = false) {
    private var prev: Option[DataFrame] = None
    private var prevDiff: Option[DataFrame] = None

    /** The changes in `cur` relative to the previous call's snapshot.
      * The returned DataFrame is checkpointed and stays valid only until
      * the NEXT call — consume it within the current micro-batch (the
      * natural foreachBatch usage), because the following call releases
      * its blocks along with the retired snapshot.
      *
      * With `bothImages=true` every batch has the [[diffImages]] shape
      * (`<c>_before`/`<c>_after` per value column) — the input
      * [[IncrementalAgg.maintain]] needs; the first (all-insert) batch
      * carries typed-null before-images.
      */
    def next(cur: DataFrame): DataFrame = synchronized {
      val snap = cur.localCheckpoint(true)
      // key columns first in EVERY batch — the first (all-insert) batch
      // must use the same column order diff() produces, or positional
      // sinks break between batch 1 and batch 2
      val valCols = snap.columns.toSeq.filterNot(keyCols.contains)
      val out = prev match {
        case None =>
          val vals =
            if (bothImages) valCols.flatMap(c => Seq(
              lit(null).cast(snap.schema(c).dataType).as(s"${c}_before"),
              col(c).as(s"${c}_after")))
            else valCols.map(col)
          snap.select(keyCols.map(col) ++ vals: _*)
            .withColumn("change_type", lit("insert"))
        case Some(p) =>
          val raw = if (bothImages) diffImages(p, snap, keyCols) else diff(p, snap, keyCols)
          val d = raw.localCheckpoint(true)
          release(p)
          prevDiff.foreach(release) // the diff handed out last batch
          prevDiff = Some(d)
          d
      }
      prev = Some(snap)
      out
    }

    /** Release the final snapshot and diff when the feed is done — without
      * this the last generation's two checkpointed block sets stay pinned
      * until the object is GC'd.
      */
    def close(): Unit = synchronized {
      prev.foreach(release)
      prevDiff.foreach(release)
      prev = None
      prevDiff = None
    }

    /** Free a retired generation's checkpointed blocks. localCheckpoint
      * persists at the RDD level, which DataFrame.unpersist (CacheManager)
      * does not touch — unpersist the LogicalRDD's RDD directly. A miss is
      * logged, never swallowed silently: if the plan shape changes across
      * Spark versions the feed would otherwise re-grow the leak this
      * exists to prevent, with nothing to diagnose it by.
      */
    private def release(df: DataFrame): Unit = {
      val rdd = try df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      } catch { case scala.util.control.NonFatal(_) => None }
      rdd match {
        case Some(r) =>
          // tolerate a stopped context racing the release (query shutdown)
          try { r.unpersist(false); () }
          catch { case scala.util.control.NonFatal(_) => () }
        case None =>
          org.slf4j.LoggerFactory.getLogger(classOf[ChangeFeed]).warn(
            "ChangeFeed could not locate the checkpointed RDD of a retired " +
              "generation; its blocks will only be freed by the ContextCleaner")
      }
    }
  }
}
