package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization for compressed approximate nearest-neighbor
  * search — the third leg of the ANN compression family next to PQ
  * ([[Pq]], 32× at 8 codes) and the uncompressed paths ([[Similarity]]).
  * SQ8 is the production default when 4× is enough: one byte per
  * dimension, a trivially vectorizable decode, and far better ADC
  * fidelity than PQ at the same scan cost.
  *
  * A d-dim float vector becomes d bytes against per-dimension [lo, hi]
  * ranges: code_i = floor((x_i − lo_i) / (hi_i − lo_i) · 255 + 0.5),
  * clamped to [0, 255]. 64 float32 (256 B) → 64 B, which is what lets a
  * 100 TB embedding corpus hold its scan set in executor memory while
  * full vectors stay on disk for the exact re-rank.
  *
  * Division of labor, all Spark-shaped:
  *  - training is ONE partially-aggregated pass (posexplode → per-dim
  *    min/max: each task pre-combines to ≤ d rows, so the shuffle is
  *    O(d · partitions), never O(n · d)); only d (lo, hi) pairs reach
  *    the driver;
  *  - encoding is one narrow map over the corpus, codes packed into a
  *    single BINARY cell (the parquet-friendly at-rest shape, like
  *    [[graft.functions.PackVector]]);
  *  - search reconstructs x̂_i = lo_i + code_i · (hi_i − lo_i)/255 and
  *    scores approximate cosine per candidate, takes top-(k·refine) by
  *    ADC, then the true cosine ranks the final k — standard re-ranking
  *    keeps precision exact.
  *
  * Malformed rows (null / wrong-dimension / null-element vectors) encode to null and
  * drop out of ADC candidacy on the BARE [[encode]]/[[adcTopK]] path —
  * one bad row must not kill a 100 TB corpus-wide scan. The PERSISTED
  * layouts deliberately invert that policy: [[IvfIndex.buildSq]] and
  * [[IvfIndex.updateFromChangesSq]] `raise_error` on unencodable vectors
  * at build/maintenance time, because a silently-null codes row in a
  * stored index would answer [[IvfIndex.topK]] but vanish from
  * [[IvfIndex.sqTopK]]'s ADC scan — an asymmetry that surfaces only as
  * missing neighbors, far worse than a loud build failure.
  */
object Sq {

  /** Per-dimension quantization ranges; tiny by construction (d pairs). */
  final case class SqParams(lo: Array[Double], hi: Array[Double]) extends Serializable {
    def dim: Int = lo.length
  }

  /** Per-dimension [min, max] over the corpus in one partially-aggregated
    * pass. Rows whose length differs from the corpus's dominant dimension
    * are excluded (they also encode to null). Only d pairs reach the
    * driver.
    */
  def train(corpus: DataFrame, vecCol: String): SqParams = {
    // dominant dimension first (one cheap aggregate: length → count), so a
    // stray truncated embedding can't poison dimension ranges
    val d = corpus.select(size(col(vecCol).cast("array<double>")).as("d"))
      .filter(col("d") > 0)
      .groupBy("d").count()
      .orderBy(col("count").desc, col("d").desc)
      .head(1).headOption
      .getOrElse(throw new IllegalArgumentException(
        "SQ training corpus is empty (no non-empty vectors)"))
      .getInt(0)
    // d came from a non-empty group, so the per-dimension aggregate below
    // always has rows — no second emptiness check needed
    val rows = corpus
      .select(col(vecCol).cast("array<double>").as("v"))
      .filter(size(col("v")) === d)
      .select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("lo"), max("x").as("hi"))
      .collect()
    val lo = new Array[Double](d)
    val hi = new Array[Double](d)
    rows.foreach { r =>
      val p = r.getInt(0)
      lo(p) = r.getDouble(1)
      hi(p) = r.getDouble(2)
    }
    SqParams(lo, hi)
  }

  /** The quantizer as a CODEGEN'D Catalyst expression
    * ([[graft.functions.SqEncode]] — floor(t · 255 + 0.5) clamped, pinned
    * HALF_UP semantics so an engine replay reproduces codes exactly): the
    * encode pass is the one corpus-wide scan of an index build, and this
    * keeps it inside whole-stage codegen instead of breaking the stage at
    * a ScalaUDF. Null, dimension-mismatched, or null-element vectors yield
    * NULL codes.
    */
  def codes(v: Column, params: SqParams): Column =
    graft.functions.VectorFunctions.sqEncode(v, params.lo, params.hi)

  /** One narrow encoding pass: (idCol, codes BINARY — one byte per dim). */
  def encode(corpus: DataFrame, params: SqParams, idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol), codes(col(vecCol).cast("array<double>"), params).as("codes"))

  /** Approximate cosine of the exact query against the RECONSTRUCTED
    * candidate (asymmetric distance computation).
    */
  private[operators] def adcUdf(bp: org.apache.spark.broadcast.Broadcast[SqParams]) =
    udf { (q: Seq[Double], codes: Array[Byte]) =>
      val p = bp.value
      var dot = 0.0
      var nq = 0.0
      var nx = 0.0
      var i = 0
      while (i < p.dim) {
        val x = p.lo(i) + (codes(i) & 0xff) * (p.hi(i) - p.lo(i)) / 255.0
        dot += q(i) * x
        nq += q(i) * q(i)
        nx += x * x
        i += 1
      }
      if (nq == 0.0 || nx == 0.0) 0.0 else dot / (math.sqrt(nq) * math.sqrt(nx))
    }

  /** Approximate top-k by SQ8 ADC with exact re-ranking. Queries:
    * (query_id, qv). Candidates = top-(k·refine) per query by
    * reconstructed cosine over the byte codes (the only corpus-wide scan
    * — codes, not vectors), then [[Similarity.rerank]] computes the true
    * cosine for just those. Same output shape as cosineTopK:
    * (query_id, rk, neighbor_id, sim).
    */
  def adcTopK(
      corpus: DataFrame, queries: DataFrame, params: SqParams,
      idCol: String, vecCol: String, k: Int = 10, refine: Int = 4): DataFrame = {
    val bp = corpus.sparkSession.sparkContext.broadcast(params)
    val enc = encode(corpus, params, idCol, vecCol).filter(col("codes").isNotNull)
    // malformed QUERY vectors drop like malformed corpus rows do (the ADC
    // kernel indexes q(i) for i < dim — an unguarded null/short vector
    // would fail the whole corpus scan, not one row)
    val q = queries.select(col("query_id"), col("qv").cast("array<double>").as("qv"))
      .filter(col("qv").isNotNull && size(col("qv")) === params.dim)
    val wAdc = Window.partitionBy("query_id").orderBy(col("ad").desc, col(idCol))
    val cands = enc.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("ad", adcUdf(bp)(col("qv"), col("codes")))
      .withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= k.toLong * refine)
      .select(col("query_id"), col("qv"), col(idCol))
    Similarity.rerank(cands, corpus, idCol, vecCol, k)
  }
}
