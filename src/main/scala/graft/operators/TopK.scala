package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A scored candidate row flowing into the top-k aggregation. */
case class Scored(query_id: Long, neighbor_id: Long, sim: Double)

/** Bounded top-k aggregator: keeps at most k (sim, id) pairs per group,
  * ordered by (sim desc, id asc) — the SURVEY §7.3 "top-k similarity
  * aggregate". Compared to ranking with a window function, the per-partition
  * buffers are capped at k entries, so the shuffle carries k rows per
  * (partition, query) instead of the full query×corpus score matrix — the
  * difference between O(k) and O(|corpus|) exchange per query at 100 TB.
  *
  * The buffer is a sorted Seq capped at k (insertion is O(k); k is small by
  * construction). Ordering matches the window implementation exactly: sims
  * are pre-rounded (r6) upstream, ties broken by neighbor id.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[(Double, Long)], Seq[(Long, Double)]] {

  private def insert(buf: Seq[(Double, Long)], sim: Double, id: Long): Seq[(Double, Long)] = {
    if (buf.size >= k) {
      val (wSim, wId) = buf.last // worst entry (lowest sim, then highest id)
      if (sim < wSim || (sim == wSim && id > wId)) return buf
    }
    val merged = (buf :+ (sim, id)).sortBy { case (s, i) => (-s, i) }
    if (merged.size > k) merged.take(k) else merged
  }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], row: Scored): Seq[(Double, Long)] =
    insert(buf, row.sim, row.neighbor_id)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val merged = (a ++ b).sortBy { case (s, i) => (-s, i) }
    if (merged.size > k) merged.take(k) else merged
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Long, Double)] =
    buf.map { case (s, i) => (i, s) }

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
}

object TopK {
  /** Top-k per query over pre-scored rows (query_id, neighbor_id, sim) using
    * the bounded-heap aggregator; output matches the window-rank shape
    * (query_id, rk, neighbor_id, sim).
    */
  def perQuery(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = new TopKAggregator(k).toColumn.name("topk")
    scored.as[Scored]
      .groupByKey(_.query_id)
      .agg(agg)
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")).as(Seq("p", "nb")))
      .select(
        col("query_id"),
        (col("p") + 1).cast("int").as("rk"),
        col("nb._1").as("neighbor_id"),
        col("nb._2").as("sim"))
  }
}
