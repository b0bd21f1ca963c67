package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Mergeable Misra-Gries sketch as a typed [[org.apache.spark.sql.expressions.Aggregator]]
  * — one summary usable in BATCH and STRUCTURED STREAMING aggregations
  * alike: partial aggregation runs map-side, so the shuffle (or the
  * streaming state update) carries at most `capacity` entries per
  * partition per trigger, independent of the distinct count. Merge follows
  * the mergeable-summaries construction (Agarwal et al., TODS 2013):
  * pointwise sum, then subtract the (size − capacity)-th smallest count
  * and drop non-positives — the union sketch keeps the ε = 1/capacity
  * frequency guarantee, so survivors remain a superset of every item with
  * global count > N/capacity. Deterministic output (sorted keys).
  */
class MisraGriesAggregator(capacity: Int)
    extends org.apache.spark.sql.expressions.Aggregator[String, Map[String, Long], Array[String]] {
  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] = {
    val c = m.getOrElse(x, 0L)
    if (c > 0L) m.updated(x, c + 1L)
    else if (m.size < capacity) m.updated(x, 1L)
    else m.collect { case (k, v) if v > 1L => k -> (v - 1L) } // decrement-all (x's vote included)
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
    if (sum.size <= capacity) sum
    else {
      val delta = sum.values.toArray.sorted.apply(sum.size - capacity - 1)
      sum.collect { case (k, v) if v > delta => k -> (v - delta) }
    }
  }

  override def finish(m: Map[String, Long]): Array[String] = m.keys.toArray.sorted

  override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Heavy hitters (exact top-k by frequency) with bounded shuffle.
  *
  * The naive `groupBy(item).count().orderBy(desc).limit(k)` shuffles one
  * partial row per distinct item per map partition — on a 100 TB token
  * stream the distinct count IS the problem (billions of rare items all
  * cross the wire to be counted once and discarded). This operator makes
  * the shuffle independent of the distinct count:
  *
  *  1. candidate pass: each partition runs a Misra–Gries summary (capacity
  *     `m`; Misra & Gries 1982, the Space-Saving family) and emits only its
  *     ≤ m surviving items. Any item with global count > N/m must survive
  *     in at least one partition (if it dipped below every local n_p/m
  *     threshold, summing gives count ≤ N/m), so the union of survivors —
  *     at most partitions × m rows — contains every true heavy hitter.
  *  2. verify pass: exact counts for the candidates only — the corpus is
  *     re-scanned narrowly, non-candidates dropped by a broadcast semi-join
  *     before any exchange, and the partial aggregation shuffles at most
  *     candidates × partitions small rows. Final top-k by exact count with
  *     a deterministic tie-break.
  *
  * EXACTNESS: identical to the naive top-k whenever the true k-th count
  * exceeds N/m (pick m ≥ a few thousand for corpora where the head is
  * Zipfian; the spec asserts equality against the naive plan). When the
  * condition fails the result is still the exact counts of a
  * superset-of-heavy-hitters candidate set — the standard two-pass
  * contract. Two scans of the input: at 100 TB that is the trade — two
  * narrow scans beat one distinct-cardinality shuffle.
  */
object Frequency {

  /** Per-partition Misra–Gries survivors: ≤ m items whose local count
    * could exceed n_p/m. Decrement-all is O(m) amortized per eviction.
    */
  private def misraGries(iter: Iterator[String], m: Int): Iterator[String] = {
    val counts = new java.util.HashMap[String, Long](m * 2)
    while (iter.hasNext) {
      val x = iter.next()
      val c = counts.get(x) // 0L when absent (unboxed long map semantics)
      if (c != 0L) counts.put(x, c + 1L)
      else if (counts.size < m) counts.put(x, 1L)
      else {
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    counts.keySet().iterator().asScala
  }

  /** Per-group exact top-`k`: [[heavyHitters]] stratified by `groupCol`
    * (top tokens per language, top URLs per domain, …). One Misra-Gries
    * summary per group per partition — candidate state is
    * groups × capacity per partition, so size `capacity` to the group
    * fan-out (the guarantee is per group: exact whenever the group's k-th
    * count exceeds that group's row count / capacity). The verify pass
    * counts candidate (group, item) pairs only, and the final per-group
    * top-k runs through a rank window Spark executes as WindowGroupLimit
    * (partial top-k before the exchange). Group and item are both
    * canonicalized to strings; null groups and null items are ignored.
    */
  def heavyHittersByGroup(
      df: DataFrame, groupCol: String, itemCol: String, k: Int,
      capacity: Int = 8192): DataFrame = {
    require(k > 0, "k must be positive")
    require(capacity >= k, "capacity must be at least k")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs: Dataset[(String, String)] = df.select(
      col(groupCol).cast("string").as("g"), col(itemCol).cast("string").as("item"))
      .filter(col("g").isNotNull && col("item").isNotNull)
      .as[(String, String)]
    val candidates = pairs.mapPartitions { it =>
      val perGroup = new java.util.HashMap[String, java.util.HashMap[String, Long]]()
      it.foreach { case (g, x) =>
        var counts = perGroup.get(g)
        if (counts == null) { counts = new java.util.HashMap[String, Long](); perGroup.put(g, counts) }
        val c = counts.get(x)
        if (c != 0L) counts.put(x, c + 1L)
        else if (counts.size < capacity) counts.put(x, 1L)
        else {
          val e = counts.entrySet().iterator()
          while (e.hasNext) {
            val en = e.next()
            if (en.getValue == 1L) e.remove() else en.setValue(en.getValue - 1L)
          }
        }
      }
      perGroup.entrySet().iterator().asScala.flatMap(e =>
        e.getValue.keySet().iterator().asScala.map(e.getKey -> _))
    }.toDF("g", "item").distinct()
    val counted = pairs.toDF("g", "item")
      .join(broadcast(candidates), Seq("g", "item"), "left_semi")
      .groupBy("g", "item")
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(desc("cnt"), asc("item"))
    counted.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Exact top-`k` most frequent values of `itemCol` (nulls ignored),
    * ties broken by item ascending. Output: (item, cnt), descending.
    */
  def heavyHitters(df: DataFrame, itemCol: String, k: Int, capacity: Int = 8192): DataFrame = {
    require(k > 0, "k must be positive")
    require(capacity >= k, "capacity must be at least k")
    val spark = df.sparkSession
    import spark.implicits._
    val items: Dataset[String] = df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull).as[String]
    // pass 1: per-partition survivors, deduplicated. distinct() shuffles
    // at most partitions × capacity rows — this is the point.
    val candidates = items.mapPartitions(misraGries(_, capacity)).toDF("item").distinct()
    // pass 2: exact counts of candidates only. The broadcast semi-join
    // runs below the aggregation, so rare items never reach an exchange.
    val counted = items.toDF("item")
      .join(broadcast(candidates), "item", "left_semi")
      .groupBy("item")
      .agg(count(lit(1)).as("cnt"))
    counted.orderBy(desc("cnt"), asc("item")).limit(k)
  }
}
