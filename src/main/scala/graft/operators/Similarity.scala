package graft.operators

import graft.functions.GraftFunctions._
import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>/array<double>).
  *
  * Query vectors are always the broadcast side; the corpus is never shuffled
  * or collected. Similarities are computed by the codegen'd
  * [[graft.functions.CosineSimilarity]] expression in double precision and
  * rounded to 6 dp before ranking for reproducible ordering.
  */
object Similarity {

  /** All (query, candidate) cosine scores — queries broadcast. */
  private def scoreAll(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus.join(broadcast(queries), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        r6(cosineSim(col("qv"), col(vecCol))).as("sim"))

  /** Exact brute-force top-k neighbors for each query vector via the bounded
    * top-k heap aggregator ([[TopKAggregator]]): the shuffle carries at most
    * k candidates per (map partition, query) instead of the full score
    * matrix. queries: (query_id, qv). Returns (query_id, rk, neighbor_id, sim).
    */
  def cosineTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10): DataFrame =
    TopK.perQuery(scoreAll(corpus, queries, idCol, vecCol), k)

  /** The window-rank formulation of [[cosineTopK]] — shuffles every score;
    * kept as the equivalence baseline for the aggregator (see OperatorsSpec).
    */
  def cosineTopKWindow(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scoreAll(corpus, queries, idCol, vecCol)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("sim"))
  }

  /** All-pairs cosine near-duplicate join above a threshold. */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val spark = corpus.sparkSession
    val a = corpus.repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).as("a_id"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("b_id"), col(vecCol).as("vb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("sim", r6(cosineSim(col("va"), col("vb"))))
      .filter(col("sim") >= threshold)
      .select("a_id", "b_id", "sim")
  }

  /** Deterministic spherical k-means codebook for [[ivfTopK]]: Lloyd
    * iterations expressed as DataFrame ops. Init = the k lowest-id vectors;
    * assignment = max cosine (ties to lower cid); update = elementwise mean.
    * Each iteration is one broadcast nested-loop assignment plus one narrow
    * explode/aggregate — no corpus shuffle beyond the (cid, pos) aggregation,
    * so it scales to corpora that never fit on the driver. Clusters that lose
    * all members drop out (k may shrink).
    */
  def trainKMeans(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int = 3): DataFrame = {
    var cent = corpus.filter(col(idCol) < k)
      .select(col(idCol).cast("long").as("cid"), col(vecCol).cast("array<double>").as("cv"))
    for (_ <- 1 to iterations) {
      val w = Window.partitionBy(idCol).orderBy(col("csim").desc, col("cid"))
      val assigned = corpus.crossJoin(broadcast(cent))
        .withColumn("csim", r6(cosineSim(col(vecCol), col("cv"))))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("cid"), col(vecCol))
      cent = assigned
        .select(col("cid"), posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))), s => s("m")).as("cv"))
    }
    cent
  }

  /** Signed-random-projection (SRP) LSH for cosine ANN: signature bit i is
    * the sign of the dot product with a deterministic pseudo-random
    * hyperplane (components derived from the portable hash, so signatures
    * are engine-reproducible). Vectors are bucketed by signature bands;
    * candidates = bucket collisions, exactly re-ranked. Recall rises with
    * nTables; the bucket join is the only wide exchange.
    *
    * Tuning note: per-bit collision probability is 1 - θ/π. The defaults
    * (4 bits x 16 tables) target corpora where neighbors sit at cos ≈ 0.4
    * (θ ≈ 66°, per-table collision ≈ 0.63^4): ~94% recall. Corpora with
    * tight clusters (cos ≥ 0.8 neighbors) can afford 8-12 bits per table
    * for much sharper pruning.
    */
  def srpTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10,
      bitsPerTable: Int = 4, nTables: Int = 16): DataFrame = {
    import graft.functions.GraftHash
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    // deterministic hyperplanes: component (t, b, d) ~ U(-0.5, 0.5)
    val planes: Array[Array[Array[Double]]] = Array.tabulate(nTables, bitsPerTable, dim) {
      (t, b, d) => GraftHash.hash60(s"srp:$t:$b:$d").toDouble / (1L << 60).toDouble - 0.5
    }
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(planes)
    val sigUdf = udf { (v: Seq[Float]) =>
      val p = bc.value
      (0 until p.length).map { t =>
        var sig = 0
        var b = 0
        while (b < p(t).length) {
          var dot = 0.0
          var d = 0
          while (d < p(t)(b).length && d < v.length) { dot += p(t)(b)(d) * v(d); d += 1 }
          if (dot > 0) sig |= (1 << b)
          b += 1
        }
        t.toLong * 65536L + sig
      }
    }
    val cBuckets = corpus.select(col(idCol), explode(sigUdf(col(vecCol))).as("bucket"))
    val qBuckets = queries.select(col("query_id"), col("qv"), explode(sigUdf(col("qv"))).as("bucket"))
    val cands = cBuckets.join(broadcast(qBuckets), Seq("bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col("qv"), col(idCol)).dropDuplicates("query_id", idCol)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col(idCol))
    cands.join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .withColumn("sim", r6(cosineSim(col("qv"), col(vecCol))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col(idCol).as("neighbor_id"), col("sim"))
  }

  /** Mean best-centroid similarity — the k-means objective, for tests. */
  def assignmentObjective(corpus: DataFrame, centroids: DataFrame, vecCol: String): Double = {
    val w = Window.partitionBy("__rid").orderBy(col("csim").desc)
    corpus.withColumn("__rid", monotonically_increasing_id())
      .crossJoin(broadcast(centroids))
      .withColumn("csim", cosineSim(col(vecCol), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .agg(avg("csim")).first().getDouble(0)
  }

  /** IVF-style approximate top-k: assign the corpus to the nearest centroid,
    * probe the nProbe closest cells per query, exact re-rank inside them.
    * centroids: (cid, cv). At 100 TB probing reads ~nProbe/|centroids| of
    * the corpus instead of all of it.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, nProbe: Int = 4): DataFrame = {
    val wAssign = Window.partitionBy(idCol).orderBy(col("csim").desc, col("cid"))
    val assign = corpus.crossJoin(broadcast(centroids))
      .withColumn("csim", r6(cosineSim(col(vecCol), col("cv"))))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col(idCol), col("cid").as("cell"), col(vecCol))
    val wProbe = Window.partitionBy("query_id").orderBy(col("psim").desc, col("cid"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("psim", r6(cosineSim(col("qv"), col("cv"))))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid").as("cell"))
    val wRank = Window.partitionBy("query_id").orderBy(col("sim").desc, col(idCol))
    assign.join(broadcast(probes), Seq("cell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("sim", r6(cosineSim(col("qv"), col(vecCol))))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col(idCol).as("neighbor_id"), col("sim"))
  }
}
