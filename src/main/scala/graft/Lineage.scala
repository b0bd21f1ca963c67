package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.util.QueryExecutionListener

/** Dataset-lineage registration — the analogue of the reference's
  * `registerLineage(name)` call (TableStreamingSource.java:88), expressed the
  * Spark-native way: a QueryExecutionListener that records every source
  * relation each successful query read. Governance systems subscribe to the
  * same hook; nothing custom is needed in the engine itself.
  */
object Lineage {
  private val reads = mutable.LinkedHashSet.empty[String]

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      // v2 relations are rewritten to ScanRelation during optimization, so
      // scan both plans (analyzed catches v1 file relations pre-pruning,
      // optimized catches DSv2 sources like reftable)
      val sources = (qe.analyzed.collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case other => Seq(other.toString.take(120))
        }
        case v2: DataSourceV2Relation => Seq(v2.table.name())
      } ++ qe.optimizedPlan.collect {
        case v2: DataSourceV2ScanRelation => Seq(v2.relation.table.name())
      }).flatten
      reads.synchronized { reads ++= sources }
    }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }

  /** Install the listener (idempotent enough for one session). */
  def register(spark: SparkSession): Unit = spark.listenerManager.register(listener)

  /** Distinct sources read since registration, in first-read order. */
  def sourcesRead: Seq[String] = reads.synchronized { reads.toSeq }

  def reset(): Unit = reads.synchronized { reads.clear() }
}
