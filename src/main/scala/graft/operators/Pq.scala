package graft.operators

import graft.functions.GraftFunctions._
import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for compressed approximate nearest-neighbor
  * search — the memory-scale path of the ANN family ([[Similarity]] has
  * the compute-scale paths: brute force, IVF probing, SRP-LSH).
  *
  * A d-dim float vector becomes `m` small codes (one per d/m-dim
  * subspace, each quantized against its own `ksub`-centroid
  * sub-codebook): 64 floats → 8 codes ≈ 32× less memory, which is what
  * lets a 100 TB embedding corpus live in executor memory as codes while
  * the full vectors stay on disk for the final re-rank.
  *
  * Division of labor, all Spark-shaped:
  *  - codebooks train DRIVER-side on a small deterministic sample
  *    (industry practice — PQ codebooks need thousands of vectors, not
  *    the corpus) and broadcast;
  *  - encoding is one narrow map over the corpus;
  *  - search is asymmetric distance computation (ADC): per query one
  *    m×ksub lookup table, per candidate `m` table lookups instead of a
  *    d-term dot product; top-(k·refine) by ADC then an exact cosine
  *    re-rank of just those candidates (standard re-ranking keeps
  *    precision exact).
  *
  * Vectors are L2-normalized before quantization, so squared L2 on
  * quantized vectors orders like cosine (‖q−x‖² = 2−2·cos on the unit
  * sphere) and the ADC ranking matches the exact ranking it approximates.
  */
object Pq {

  /** Sub-codebooks: `cents(j)(c)` is centroid c of subspace j. */
  final case class Codebooks(m: Int, dsub: Int, cents: Array[Array[Array[Double]]])
      extends Serializable

  private def normalize(v: Array[Double]): Array[Double] = {
    var n2 = 0.0
    var i = 0
    while (i < v.length) { n2 += v(i) * v(i); i += 1 }
    val n = math.sqrt(n2)
    if (n == 0.0) v else v.map(_ / n)
  }

  private def sub(v: Array[Double], j: Int, dsub: Int): Array[Double] =
    java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub)

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Train sub-codebooks on a deterministic sample (the `sampleSize`
    * lowest-id vectors): per subspace, Lloyd iterations with L2 over the
    * normalized slices, initialized from the first `ksub` distinct
    * slices. Only the sample ever reaches the driver.
    */
  def train(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ksub: Int = 16, sampleSize: Int = 2048, iterations: Int = 10): Codebooks = {
    val raw = corpus.orderBy(col(idCol)).limit(sampleSize)
      .select(col(vecCol).cast("array<double>")).collect()
      .flatMap(r => Option(r.getSeq[Double](0)).map(_.toArray))
      .filter(_.nonEmpty)
    require(raw.nonEmpty, "PQ training sample is empty")
    // train only on vectors of the sample's dominant dimension: a stray
    // truncated embedding would otherwise poison codebooks with
    // zero-padded slices (or crash the slicer) — the same malformed rows
    // encode() deliberately drops
    // deterministic tie-break (count, then larger dim) — groupBy returns a
    // hash map whose iteration order must not decide which half of a
    // mixed-dimension corpus silently drops out
    val d = raw.groupBy(_.length).maxBy { case (len, vs) => (vs.length, len) }._1
    val sample = raw.filter(_.length == d).map(normalize)
    require(d % m == 0, s"vector dim $d must be divisible by m=$m")
    val dsub = d / m
    val cents = Array.tabulate(m) { j =>
      val slices = sample.map(sub(_, j, dsub))
      // content-distinct init (Array equality is by reference — distinct on
      // the raw arrays would keep duplicates and let strict-< assignment
      // starve the copies into a collapsed codebook)
      var cb = slices.map(_.toSeq).distinct.take(ksub).map(_.toArray)
      for (_ <- 1 to iterations) {
        val sums = Array.fill(cb.length)(new Array[Double](dsub))
        val counts = new Array[Long](cb.length)
        slices.foreach { s =>
          var best = 0
          var bd = Double.MaxValue
          var c = 0
          while (c < cb.length) {
            val dist = l2sq(s, cb(c))
            if (dist < bd) { bd = dist; best = c }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < dsub) { sums(best)(i) += s(i); i += 1 }
        }
        cb = cb.indices.toArray.collect {
          case c if counts(c) > 0 => sums(c).map(_ / counts(c))
        }
      }
      cb
    }
    Codebooks(m, dsub, cents)
  }

  /** One narrow encoding pass: (id, codes). Null, empty, or
    * wrong-dimension vectors encode to null and drop out of ADC
    * candidacy — a single malformed row must not kill a 100 TB job, and
    * zero-padding/truncating it would produce silently wrong codes.
    */
  def encode(corpus: DataFrame, cb: Codebooks, idCol: String, vecCol: String): DataFrame =
    encodeWith(corpus, corpus.sparkSession.sparkContext.broadcast(cb), idCol, vecCol)

  /** The encoding UDF over a broadcast codebook — exposed separately so
    * composers (IVF-PQ) can add the codes column inside an existing
    * narrow projection instead of paying a self-join.
    */
  private def codesUdf(bc: org.apache.spark.broadcast.Broadcast[Codebooks]) =
    udf { (v: Seq[Double]) =>
      val b = bc.value
      if (v == null || v.length != b.m * b.dsub) null
      else {
        val x = normalize(v.toArray)
        Array.tabulate(b.m) { j =>
          val s = sub(x, j, b.dsub)
          var best = 0
          var bd = Double.MaxValue
          var c = 0
          while (c < b.cents(j).length) {
            val d = l2sq(s, b.cents(j)(c))
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          best
        }
      }
    }

  private def encodeWith(
      corpus: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[Codebooks],
      idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol), codesUdf(bc)(col(vecCol).cast("array<double>")).as("codes"))

  /** Approximate top-k by ADC with exact re-ranking: candidates =
    * top-(k·refine) per query by quantized distance (m table lookups per
    * candidate), then the true cosine ranks the final k. Same output
    * shape as [[Similarity.cosineTopK]]: (query_id, rk, neighbor_id, sim).
    */
  /** Per-query lookup table: tab(j)(c) = ||q_j - cent_{j,c}||^2; a null
    * or wrong-dimension query yields a null table and drops out, like
    * malformed corpus rows do in encode. Shared by [[topK]] and
    * [[ivfPqTopK]].
    */
  private def tablesUdf(bc: org.apache.spark.broadcast.Broadcast[Codebooks]) =
    udf { (q: Seq[Double]) =>
      val b = bc.value
      if (q == null || q.length != b.m * b.dsub) null
      else {
        val x = normalize(q.toArray)
        Array.tabulate(b.m)(j => b.cents(j).map(c => l2sq(sub(x, j, b.dsub), c)))
      }
    }

  /** ADC score: m table lookups per (codes, query-table) pair. */
  private val adcUdf = udf { (codes: Seq[Int], tab: Seq[Seq[Double]]) =>
    var s = 0.0
    var j = 0
    while (j < codes.length) { s += tab(j)(codes(j)); j += 1 }
    s
  }

  def topK(
      corpus: DataFrame, queries: DataFrame, cb: Codebooks,
      idCol: String, vecCol: String, k: Int = 10, refine: Int = 4): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(cb)
    val tables = tablesUdf(bc)
    val adc = adcUdf
    val enc = encodeWith(corpus, bc, idCol, vecCol).filter(col("codes").isNotNull)
    val qt = queries.select(col("query_id"), col("qv"),
      tables(col("qv").cast("array<double>")).as("qtab"))
      .filter(col("qtab").isNotNull)
    val wAdc = Window.partitionBy("query_id").orderBy(col("ad").asc, col(idCol))
    val cands = enc.crossJoin(broadcast(qt))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("ad", adc(col("codes"), col("qtab")))
      .withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= k * refine)
      .select(col("query_id"), col("qv"), col(idCol))
    Similarity.rerank(cands, corpus, idCol, vecCol, k)
  }

  /** IVF-PQ — the canonical billion-scale ANN architecture, composed from
    * the pieces above: coarse IVF cells prune the candidate set (a probe
    * reads ~nProbe/|cells| of the corpus), PQ codes score the survivors
    * by ADC (m table lookups per pair, codes-only — the full vectors are
    * touched ONLY for the final exact re-rank of top-(k·refine)).
    * centroids: (cid, cv) from [[Similarity.trainKMeans]]; cb from
    * [[train]].
    */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame, centroids: DataFrame, cb: Codebooks,
      idCol: String, vecCol: String, k: Int = 10, nProbe: Int = 4, refine: Int = 4): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(cb)
    val tables = tablesUdf(bc)
    val adc = adcUdf
    // ONE narrow pass over the corpus: cell assignment and code, both
    // computed from broadcast state in the same projection — never a
    // self-join (which would re-scan the corpus and shuffle both sides)
    val enc = Similarity.assignCells(corpus, centroids, idCol, vecCol)
      .withColumn("codes", codesUdf(bc)(col(vecCol).cast("array<double>")))
      .filter(col("codes").isNotNull)
      .select(col(idCol), col("cell"), col("codes"))
    val probes = Similarity.probeCells(queries, centroids, nProbe)
      .withColumn("qtab", tables(col("qv").cast("array<double>")))
      .filter(col("qtab").isNotNull)
    val wAdc = Window.partitionBy("query_id").orderBy(col("ad").asc, col(idCol))
    val cands = enc.join(broadcast(probes), Seq("cell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("ad", adc(col("codes"), col("qtab")))
      .withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= k * refine)
      .select(col("query_id"), col("qv"), col(idCol))
    Similarity.rerank(cands, corpus, idCol, vecCol, k)
  }
}
