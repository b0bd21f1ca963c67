package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of per-group SUM/COUNT aggregates from a
  * key-level change set — the materialized-view pattern for refreshable
  * snapshots.
  *
  * The reference's model re-emits the full snapshot every refresh
  * (TableInputDStream.scala:51-54), so any aggregate over it is recomputed
  * from scratch each generation. When only a fraction of rows changed,
  * that is O(table) work for an O(changes) question. This operator applies
  * a change set (inserts/deletes/updates with both row images, e.g. from
  * [[SnapshotDiff.diffImages]] or [[VersionedTable.changes]]) to the
  * previous aggregate state: deletes subtract the old contribution,
  * inserts add the new one, updates do both — which also handles a row
  * MOVING between groups. Cost: one aggregation over the change rows plus
  * one outer join against the (group-sized) previous state — at 100 TB
  * with 1% churn, ~1% of the recompute's shuffle.
  *
  * State shape (the classic view-maintenance subtlety): per measure `c`
  * the state carries `sum_c` AND `nn_c`, its non-null contribution count.
  * SQL `sum` over zero non-null rows is NULL, and after deletions drain a
  * group's last non-null value the running sum alone cannot distinguish
  * "sums to 0" from "no values left" — `nn_c` can. `cnt` is `count(*)`;
  * groups whose cnt reaches 0 are dropped. Exact for integral/decimal
  * measures; floating-point measures drift by normal non-associativity
  * (same caveat as any distributed re-aggregation order change).
  */
object IncrementalAgg {

  /** The canonical aggregate state of `df`: groupCols, then per measure
    * `sum_<c>` and `nn_<c>`, then `cnt`. Use this to seed maintenance and
    * as the recompute baseline in tests.
    */
  def aggregate(df: DataFrame, groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty && sumCols.nonEmpty, "need group and measure columns")
    val aggs = sumCols.flatMap(c => Seq(
      sum(col(c)).as(s"sum_$c"), count(col(c)).as(s"nn_$c"))) :+ count(lit(1)).as("cnt")
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** `prevAgg` (shape of [[aggregate]]) advanced by `changes`.
    *
    * `changes` must carry `change_type` ∈ insert|delete|update and, for
    * every group/measure column `c`, either `<c>_before`/`<c>_after`
    * image pairs or a plain `<c>` (a column the change capture knows is
    * identical on both sides, e.g. the table key).
    */
  def maintain(
      prevAgg: DataFrame, changes: DataFrame,
      groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty && sumCols.nonEmpty, "need group and measure columns")
    val cs = changes.columns.toSet
    require(cs.contains("change_type"), "changes must carry change_type")
    def img(c: String, side: String): Column =
      if (cs.contains(s"${c}_$side")) col(s"${c}_$side")
      else if (cs.contains(c)) col(c)
      else throw new IllegalArgumentException(
        s"changes carry neither '${c}_$side' nor '$c'")
    val needed = (groupCols ++ sumCols).distinct

    // signed contributions: the old image leaves its group, the new image
    // enters its (possibly different) group
    val minus = changes.filter(col("change_type").isin("delete", "update"))
      .select(needed.map(c => img(c, "before").as(c)) :+ lit(-1L).as("__sign"): _*)
    val plus = changes.filter(col("change_type").isin("insert", "update"))
      .select(needed.map(c => img(c, "after").as(c)) :+ lit(1L).as("__sign"): _*)
    val deltaAggs = sumCols.flatMap(c => Seq(
      sum(col(c) * col("__sign")).as(s"sum_$c"),
      sum(when(col(c).isNotNull, col("__sign")).otherwise(0L)).as(s"nn_$c"))) :+
      sum(col("__sign")).as("cnt")
    val delta = minus.unionAll(plus)
      .groupBy(groupCols.map(col): _*).agg(deltaAggs.head, deltaAggs.tail: _*)

    // null-safe outer merge with the previous state (group values may be
    // null); presence markers distinguish "absent side" from null groups
    val p = prevAgg.select(
      groupCols.map(c => col(c).as(s"__pg_$c")) ++
        sumCols.flatMap(c => Seq(col(s"sum_$c").as(s"__p_sum_$c"), col(s"nn_$c").as(s"__p_nn_$c"))) :+
        col("cnt").as("__p_cnt"): _*)
    val d = delta.select(
      groupCols.map(c => col(c).as(s"__dg_$c")) ++
        sumCols.flatMap(c => Seq(col(s"sum_$c").as(s"__d_sum_$c"), col(s"nn_$c").as(s"__d_nn_$c"))) :+
        col("cnt").as("__d_cnt"): _*)
    val cond = groupCols.map(c => col(s"__pg_$c") <=> col(s"__dg_$c")).reduce(_ && _)

    p.join(d, cond, "full_outer")
      .select(
        groupCols.map(c => coalesce(col(s"__pg_$c"), col(s"__dg_$c")).as(c)) ++
          sumCols.flatMap { c =>
            val nn = coalesce(col(s"__p_nn_$c"), lit(0L)) + coalesce(col(s"__d_nn_$c"), lit(0L))
            // sum is NULL iff no non-null contributions remain — the
            // running value can only be trusted while nn > 0
            Seq(
              when(nn === 0L, lit(null))
                .otherwise(coalesce(col(s"__p_sum_$c"), lit(0L)) +
                  coalesce(col(s"__d_sum_$c"), lit(0L))).as(s"sum_$c"),
              nn.as(s"nn_$c"))
          } :+
          (coalesce(col("__p_cnt"), lit(0L)) + coalesce(col("__d_cnt"), lit(0L))).as("cnt"): _*)
      .filter(col("cnt") > 0L)
  }
}
