package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a [[QueryDef]] in
  * [[Catalog]]; SQL-expressible ones carry an exactly-equivalent DuckDB oracle
  * (column names and row order matched on both sides — the driver sorts
  * columns by name and hashes values).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The multi-way broadcast join + aggregation (SURVEY.md §2c Q8).
    */
  def entry(spark: SparkSession): DataFrame =
    Catalog.byName("q08_join_agg_revenue").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Catalog.all.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
