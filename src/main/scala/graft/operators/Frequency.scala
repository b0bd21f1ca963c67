package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

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
