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

  /** [[saltedJoin]] with the salt applied ONLY to detected hot keys — the
    * production form of partial salting. Blanket salting replicates the
    * whole dimension side `saltFactor`× even though only a handful of keys
    * are skewed; here a [[Frequency]] Misra-Gries pass over the big side
    * finds keys that can exceed `hotShare` of its rows (shuffle-free up to
    * the tiny candidate set), those keys fan out over the salt domain, and
    * every other key joins exactly as before — the dimension blowup is
    * |hot keys| × saltFactor rows, not |dim| × saltFactor.
    *
    * Result equals the plain inner equi-join (spec-asserted). The extra
    * cost is one narrow scan of the big side; at 100 TB that is the trade
    * for removing stragglers without AQE (and for paths AQE does not
    * rewrite, e.g. broadcast-ineligible shuffled hash joins).
    */
  def autoSaltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8, hotShare: Double = 0.001): DataFrame = {
    require(hotShare > 0 && hotShare < 1, "hotShare must be in (0, 1)")
    // capacity 1/hotShare guarantees every key above that share survives
    // the per-partition summaries (count > N/capacity retention)
    val capacity = math.max(64, math.ceil(1.0 / hotShare).toInt)
    val hot = Frequency.heavyHitters(big, key, k = capacity, capacity = capacity)
      .select(col("item"))
    // string-cast membership: heavyHitters canonicalizes items to string,
    // so compare in the same space; broadcast — the hot set is tiny
    val isHotBig = big.col(key).cast("string")
    val hotFlag = "__is_hot"
    val bigF = big.join(broadcast(hot.withColumnRenamed("item", "__hot_item")),
      isHotBig === col("__hot_item"), "left")
      .withColumn(hotFlag, col("__hot_item").isNotNull).drop("__hot_item")
    val smallF = small.join(broadcast(hot.withColumnRenamed("item", "__hot_item")),
      small.col(key).cast("string") === col("__hot_item"), "left")
      .withColumn(hotFlag, col("__hot_item").isNotNull).drop("__hot_item")
    // hot rows: big side salts randomly, small side replicates; cold rows
    // ride salt 0 on both sides unduplicated
    val salted = bigF.withColumn("__salt",
      when(col(hotFlag), (rand(seed = 42) * saltFactor).cast("int")).otherwise(lit(0)))
      .drop(hotFlag)
    val replicated = smallF.withColumn("__salt",
      explode(when(col(hotFlag), sequence(lit(0), lit(saltFactor - 1)))
        .otherwise(sequence(lit(0), lit(0)))))
      .drop(hotFlag)
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
