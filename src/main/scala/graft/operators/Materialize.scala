package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Compute-once materialization with a CLUSTER-SAFE storage policy.
  *
  * The engine materializes an intermediate when several operator subtrees
  * reference it (LSH kernels, merge sources, Lloyd codebooks) so the kernel
  * runs once instead of once per reference. The storage primitive differs by
  * deployment:
  *
  *  - `local[*]` (the bench/verify harness): `localCheckpoint` — blocks live
  *    in the one executor that is the driver's JVM, lineage truncation is
  *    free plan-size relief, and "executor loss" cannot happen without the
  *    whole application dying anyway.
  *  - a real cluster: `persist(MEMORY_AND_DISK)` with lineage RETAINED —
  *    `localCheckpoint` truncates lineage, so losing an executor after
  *    truncation fails the whole job; a lineage-backed persist recomputes
  *    the lost partitions instead. That is the documented
  *    recompute-on-loss policy: no replicated copies (no `_2` levels — the
  *    doubled memory/network at 100 TB buys only a faster recovery of an
  *    O(changes)-sized intermediate), no reliable-checkpoint directory to
  *    administer; a lost block re-runs its slice of the original plan.
  *
  * Values are identical either way; only the recovery story (and the plan
  * leaf: `LogicalRDD` vs `InMemoryRelation`) differs. Both serve every
  * reference from the materialized blocks, which is the point.
  */
/** Driver-thread overlap for INDEPENDENT Spark action groups (guide §2.6:
  * actions are only sequential because the driver calls them sequentially —
  * the scheduler happily runs several jobs at once, and the second group's
  * tasks back-fill executors the first leaves idle). Use only for groups
  * with disjoint write targets whose inputs are already materialized or
  * independent. The returned thunk joins and rethrows, so failures
  * propagate exactly as in the sequential shape.
  */
object Overlap {
  def apply[T](desc: String)(body: => T): () => T = {
    val task = new java.util.concurrent.FutureTask[T](() => body)
    val th = new Thread(task, s"graft-overlap-$desc")
    th.setDaemon(true)
    th.start()
    () => try task.get() catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }
  }
}

object Materialize {

  /** Materialize `df` once for multi-reference consumption. `eager` runs the
    * kernel now (worth it only when the value is BOTH expensive and
    * referenced ≥ 2 times — an eager materialization is its own job);
    * lazy lets the first consuming action populate the blocks.
    */
  def once(df: DataFrame, eager: Boolean = false): DataFrame =
    onceVia(df, eager, df.sparkSession.sparkContext.isLocal)

  /** Policy core, mode-injectable for the spec. */
  private[graft] def onceVia(df: DataFrame, eager: Boolean, localMode: Boolean): DataFrame =
    if (localMode) df.localCheckpoint(eager)
    else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      if (eager) { p.count(); () }
      p
    }
}
