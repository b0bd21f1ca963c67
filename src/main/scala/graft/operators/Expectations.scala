package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level data-quality expectations — the AUDIT half of
  * write-audit-publish (Delta Live Tables' `expect`, Great-Expectations'
  * core shape). Each rule is a SQL predicate that every row should
  * satisfy; the census is ONE narrow aggregation pass over the data
  * (map-side partial sums, no shuffle beyond the final single-row
  * reduce), so auditing a staging table costs one scan regardless of how
  * many rules are declared. A NULL predicate outcome counts as a
  * violation — an expectation that cannot be evaluated for a row has not
  * been met by it.
  */
object Expectations {

  /** One row per rule: (rule, violations, total). */
  def check(df: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "Expectations.check needs at least one rule")
    val aggs = count(lit(1)).as("__total") +:
      rules.map { case (name, pred) =>
        sum(when(coalesce(expr(pred), lit(false)), 0L).otherwise(1L)).as(name)
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val melted = rules.map { case (name, _) =>
      wide.select(lit(name).as("rule"), col(name).as("violations"), col("__total").as("total"))
    }
    melted.reduce(_ unionAll _)
  }

  /** The gate: true iff every rule holds for every row. */
  def pass(df: DataFrame, rules: Seq[(String, String)]): Boolean =
    check(df, rules).agg(sum("violations")).first().getLong(0) == 0L

  /** Drop violating rows (the DLT `expect_or_drop` shape): rows where any
    * rule is FALSE or NULL are removed in one filter pass.
    */
  def dropViolations(df: DataFrame, rules: Seq[(String, String)]): DataFrame =
    rules.foldLeft(df) { case (d, (_, pred)) =>
      d.filter(coalesce(expr(pred), lit(false)))
    }
}
