package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark implementation plus (when SQL-expressible) an
  * exactly-equivalent DuckDB oracle query. Column names and row order must
  * match between the two — the driver sorts columns by name and hashes values
  * (see the builder contract in SparkEntry).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Catalog {
  lazy val all: Seq[QueryDef] =
    queries.Relational.defs ++
      queries.SqlExt.defs ++
      queries.OperatorsExt.defs ++
      queries.TableRead.defs ++
      queries.TableMutations.defs ++
      queries.TableCatalogSql.defs ++
      queries.TextOps.defs ++
      queries.DedupOps.defs ++
      queries.SimilarityOps.defs ++
      queries.MultimodalOps.defs ++
      queries.CurationOps.defs ++
      queries.StreamingOps.defs

  lazy val byName: Map[String, QueryDef] = all.map(d => d.name -> d).toMap
}
