package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for wide joins: salt the skewed (big) side and replicate
  * the small side across the salt domain so one hot key fans out over
  * `saltFactor` reducers instead of a single straggler task. AQE's skew-join
  * handling covers sort-merge joins automatically; explicit salting remains
  * the tool for aggregations and for engines/paths AQE does not rewrite.
  *
  * Result is exactly equal to `big.join(small, keys)` (inner) — asserted by
  * the spec.
  */
object Skew {

  /** Inner equi-join with a salted big side. `small` is replicated
    * saltFactor times (it must be the dimension side).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltFactor: Int = 8): DataFrame = {
    val salted = big.withColumn("__salt", (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial -> final) aggregation with salting: counts/sums per
    * key computed as salted partials then re-aggregated, so a hot key's rows
    * spread over saltFactor partitions in the wide stage. (Spark's hash
    * aggregate already does map-side partials; explicit salting additionally
    * splits the *reduce* side of a hot key.)
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, saltFactor: Int = 8): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * saltFactor).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(key)
      .agg(sum("__n").as("n"), sum("__s").as("sum_value"))
}
