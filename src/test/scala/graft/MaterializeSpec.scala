package graft

import graft.operators.Materialize
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-safe materialization policy (round 21): local mode keeps the
  * localCheckpoint primitive (lineage truncation is free there — executor
  * loss cannot happen without the application dying), a cluster gets a
  * lineage-backed persist so a lost executor RECOMPUTES the materialized
  * intermediate instead of failing the commit/query. Values are identical
  * either way; both serve repeated references from materialized blocks.
  */
class MaterializeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("local mode: localCheckpoint — lineage truncated to a materialized leaf") {
    val df = Materialize.onceVia(
      (1 to 10).toDF("x").groupBy(($"x" % 3).as("k")).count(), eager = true, localMode = true)
    // truncated lineage plans as a scan of the checkpointed RDD, not the aggregate
    val leaf = df.queryExecution.optimizedPlan.collectLeaves().head.getClass.getSimpleName
    assert(leaf == "LogicalRDD", s"expected LogicalRDD leaf, got $leaf")
    assert(df.as[(Int, Long)].collect().toMap == Map(1 -> 4, 2 -> 3, 0 -> 3))
  }

  test("cluster mode: lineage-backed persist — recompute on loss stays possible") {
    val df = Materialize.onceVia(
      (1 to 10).toDF("x").groupBy(($"x" % 3).as("k")).count(), eager = true, localMode = false)
    // persisted for compute-once ...
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK, s"got ${df.storageLevel}")
    // ... with the ORIGINAL plan retained (no LogicalRDD truncation), so a
    // lost block re-runs its slice of the aggregate instead of failing
    val plan = df.queryExecution.optimizedPlan.toString()
    assert(plan.contains("Aggregate") || df.queryExecution.analyzed.toString().contains("Aggregate"),
      s"lineage lost:\n$plan")
    assert(df.as[(Int, Long)].collect().toMap == Map(1 -> 4, 2 -> 3, 0 -> 3))
    df.unpersist()
    ()
  }

  test("values identical across the two policies") {
    val mk = () => (1 to 100).toDF("x").selectExpr("x", "x * x as sq")
    val a = Materialize.onceVia(mk(), eager = false, localMode = true).collect().map(_.toSeq)
    val b = Materialize.onceVia(mk(), eager = false, localMode = false).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
