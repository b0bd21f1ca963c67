package graft.operators

import graft.functions.GraftFunctions._
import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Pre-FILTERED exact top-k: neighbors restricted to the query's metadata
    * group (lang, license, shard, tenant …) — the filtered-ANN shape RAG
    * serving needs. queries: (query_id, qv, qg). The group predicate
    * composes INTO the broadcast join, so non-matching candidates are
    * discarded at the probe instead of post-ranked — at 100 TB that is one
    * corpus scan with a fused predicate versus over-fetching k' >> k
    * neighbors and hoping enough survive a post-filter.
    */
  def cosineTopKFiltered(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      groupCol: String, k: Int = 10): DataFrame = {
    val scored = corpus.join(broadcast(queries),
        col(groupCol) === col("qg") && col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        r6(cosineSim(col("qv"), col(vecCol))).as("sim"))
    TopK.perQuery(scored, k)
  }

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

  /** All-pairs cosine near-duplicate join above a threshold.
    *
    * O(n²) nested-loop work — NEVER run this at scale. It exists as the
    * recall oracle for [[nearDupPairsLsh]] (OperatorsSpec) and for thresholds
    * below ~0.8, where no sublinear method can prune (a weak-threshold dense
    * similarity join has Ω(n²) output in the worst case).
    */
  def nearDupPairsExact(
      corpus: DataFrame, idCol: String, vecCol: String, threshold: Double,
      maxRows: Long = 100000): DataFrame = {
    val spark = corpus.sparkSession
    // explicit wedge guard: this baseline is quadratic BY CONSTRUCTION, so
    // refuse to start on a corpus where that shape would run for hours —
    // a larger-SF bench must fail fast with a pointer to the scale path,
    // not silently occupy the cluster
    val n = corpus.count()
    require(n <= maxRows,
      s"nearDupPairsExact is the quarantined O(n^2) recall baseline: corpus has " +
        s"$n rows > cap $maxRows. Use nearDupPairsLsh at scale " +
        s"(or raise maxRows deliberately for an offline recall study).")
    val a = corpus.repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).as("a_id"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("b_id"), col(vecCol).as("vb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("sim", r6(cosineSim(col("va"), col("vb"))))
      .filter(col("sim") >= threshold)
      .select("a_id", "b_id", "sim")
  }

  /** Scale-safe cosine near-duplicate join: SRP-LSH bucketing → bucket
    * equi-join → exact re-rank → threshold. The only wide exchanges are the
    * bucket self-join and the candidate dedup; no nested-loop join anywhere.
    *
    * Recall is probabilistic but sharp at near-dup thresholds: per-bit
    * collision p = 1 − θ/π, so a true pair at cos ≥ 0.95 (θ ≤ 18°, p ≥ 0.90)
    * survives ≥ 1 of the 24 12-bit tables with probability
    * 1 − (1 − 0.9^12)^24 ≈ 0.9996, and genuine near-copies (cos ≥ 0.99) are
    * found with probability 1 − 10⁻¹³. Precision is exact (candidates are
    * re-ranked with the real cosine). Thresholds ≪ 0.8 cannot be LSH-pruned —
    * use [[nearDupPairsExact]] and accept the quadratic cost.
    */
  def nearDupPairsLsh(
      corpus: DataFrame, idCol: String, vecCol: String, threshold: Double,
      bitsPerTable: Int = 12, nTables: Int = 24, dim: Option[Int] = None,
      bucketCap: Int = 1000): DataFrame = {
    val sig = srpSignatureUdf(corpus, vecCol, bitsPerTable, nTables, dim)
    // one SRP-signature pass: the hot-bucket census and both self-join
    // sides read the materialized (id, bucket) index instead of each
    // re-running the signature kernel over the corpus
    val buckets = Dedup.oncePerQuery(corpus
      .select(col(idCol).as("id"), explode(sig(col(vecCol).cast("array<double>"))).as("bk")))
    // hot-bucket-bounded self-join: embedding corpora cluster — a dense
    // region can drop thousands of vectors into one SRP bucket
    val cands = Dedup.boundedSelfPairs(buckets, bucketCap)
    val va = corpus.select(col(idCol).as("a_id"), col(vecCol).as("va"))
    val vb = corpus.select(col(idCol).as("b_id"), col(vecCol).as("vb"))
    cands.join(va, Seq("a_id")).join(vb, Seq("b_id"))
      .withColumn("sim", r6(cosineSim(col("va"), col("vb"))))
      .filter(col("sim") >= threshold)
      .select("a_id", "b_id", "sim")
  }

  /** CROSS-SET embedding near-dup — the SEMANTIC admission gate: every
    * (batch_id, corpus_id, sim) with r6 cosine ≥ `threshold`, candidates
    * from an SRP bucket equi-join between the NEW BATCH and the corpus.
    * Strictly cross-set (the embedding sibling of [[Dedup.nearDupAgainst]]):
    * the corpus is never self-joined, so per-wave work scales with the
    * batch side — the corpus contributes its signature index and the full
    * vectors of matched candidates only. Hot buckets block-split on either
    * side ([[Dedup.boundedCrossPairs]]), so a dense embedding region
    * bounds per-task fanout instead of wedging a join key. Compose with
    * `VersionedTable.changes` to admit a version delta against a pinned
    * corpus read, exactly like the MinHash admission pipeline (q208).
    */
  def nearDupAgainstEmbed(
      corpus: DataFrame, batch: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bitsPerTable: Int = 12, nTables: Int = 24,
      dim: Option[Int] = None, bucketCap: Int = 1000): DataFrame = {
    val sig = srpSignatureUdf(corpus, vecCol, bitsPerTable, nTables, dim)
    // one signature pass per side (census + cross-join side share it)
    def bucketsOf(df: DataFrame, as: String) = Dedup.oncePerQuery(df
      .select(col(idCol).as(as), explode(sig(col(vecCol).cast("array<double>"))).as("bk"))
      .select(col(as), col("bk")))
    val cand = Dedup.boundedCrossPairs(
      bucketsOf(batch, "batch_id"), "batch_id",
      bucketsOf(corpus, "corpus_id"), "corpus_id", bucketCap)
    cand
      .join(batch.select(col(idCol).as("batch_id"), col(vecCol).as("__vb")), Seq("batch_id"))
      .join(corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__vc")), Seq("corpus_id"))
      .withColumn("sim", r6(cosineSim(col("__vb"), col("__vc"))))
      .filter(col("sim") >= threshold)
      .select("batch_id", "corpus_id", "sim")
  }

  /** Embedding-level corpus dedup end-to-end: SRP-LSH near-dup pairs →
    * connected components over the pair graph → minimum-id survivor per
    * cluster. Returns the SURVIVING rows of `corpus`. The embedding
    * sibling of [[Dedup.dedupCorpus]], transitive-closure-correct (A≈B,
    * B≈C dedups all three even when A~C alone misses the threshold).
    * Scale shape: bucket equi-join for candidates (never all-pairs),
    * pointer-jumping components (O(log diameter) rounds), two semi-joins.
    */
  def semanticDedup(
      corpus: DataFrame, idCol: String, vecCol: String, threshold: Double,
      dim: Option[Int] = None): DataFrame = {
    val pairs = nearDupPairsLsh(corpus, idCol, vecCol, threshold, dim = dim)
    val comp = Dedup.connectedComponents(
      corpus.select(col(idCol).as("id")),
      pairs.select(col("a_id").as("u"), col("b_id").as("v")))
    val survivors = comp.filter(col("id") === col("cluster_id")).select("id")
    corpus.join(survivors.withColumnRenamed("id", idCol), Seq(idCol), "left_semi")
  }

  /** CLUSTER-SCOPED semantic dedup — the SemDeDup shape (Abbas et al.
    * 2023): partition the corpus into embedding clusters, enumerate
    * near-dup pairs ONLY within each cluster (never across — that is the
    * scale trade the paper documents: candidate work is Σ|cell|², bounded
    * by the cluster granularity, instead of n²), then keep the minimum-id
    * survivor per connected component. Returns the SURVIVING rows.
    *
    * The cluster codebook here is the `kSeeds` lowest-id vectors — a
    * deterministic, cross-engine-replayable stand-in for trained
    * centroids; production pipelines pass [[trainKMeans]]'s codebook
    * through the same [[assignCells]] machinery and only the bucketing
    * quality changes, never the verify/survivor semantics. `kSeeds` MUST
    * scale with the corpus or the per-cell quadratic comes back: candidate
    * work is Σ|cell|² ≈ n²/k, so a FIXED k at growing n is O(n²) in
    * disguise. The default (`kSeeds = 0`) therefore sizes itself —
    * `k = max(16, n / targetCellSize)`, one count aggregate — and an
    * explicit `kSeeds` is for replayable oracles pinned at a known n.
    * The LSH-bucketed sibling is [[semanticDedup]].
    */
  def clusterDedup(
      corpus: DataFrame, idCol: String, vecCol: String, threshold: Double,
      kSeeds: Int = 0, targetCellSize: Int = 1024): DataFrame = {
    require(kSeeds >= 0, "clusterDedup: kSeeds must be positive (or 0 = auto-size)")
    require(targetCellSize > 0, "clusterDedup: targetCellSize must be positive")
    val k =
      if (kSeeds > 0) kSeeds
      else math.min(Int.MaxValue.toLong,
        math.max(16L, corpus.count() / targetCellSize)).toInt
    val seeds = corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long").as("cid"),
        col(vecCol).cast("array<double>").as("cv"))
    clusterDedupWith(corpus, idCol, vecCol, threshold, seeds)
  }

  /** [[clusterDedup]] over a CALLER-SUPPLIED codebook — the production
    * SemDeDup path: pass [[trainKMeansPortable]]'s (or [[trainKMeans]]'s)
    * centroids and the verify/survivor semantics are identical to the
    * seeded form; only the bucketing quality changes. `hierarchical` picks
    * the assignment path: `Some(true)` routes through
    * [[assignCellsHierarchical]] (O(√k) cosines per row instead of O(k)),
    * `Some(false)` pins the flat argmax (for oracles replaying the flat
    * form at a known k), and the DEFAULT `None` auto-selects — flat up to
    * [[HierarchicalKThreshold]] centroids, hierarchical past it. The auto
    * default exists because k is corpus-scaled in production (k ≈ n/64):
    * a flat default there is O(n·k) = O(n²/64) cosines — the same
    * default-parameter scale trap as a fixed seed count — while the
    * measured 10× record has hierarchical 1.8× faster at corpus-scaled k
    * with a deterministic, oracle-replayable two-level argmax.
    */
  def clusterDedupWith(
      corpus: DataFrame, idCol: String, vecCol: String, threshold: Double,
      centroids: DataFrame, hierarchical: Option[Boolean] = None): DataFrame = {
    // materialize the CODEBOOK first: it usually carries an expensive
    // lineage (a full k-means training, or a corpus-wide TakeOrdered for
    // seeds), and below it is evaluated more than once — the auto
    // decision's count, then the assignment path's own collects. Without
    // the checkpoint the count() alone re-runs the whole training
    // (review-wave finding: the default production path paid training
    // twice); after it, every re-read is k rows.
    val cb = Materialize.once(centroids, eager = true)
    val useHier = hierarchical.getOrElse(cb.count() > HierarchicalKThreshold)
    // materialize the assignment ONCE (a narrow O(n·√k..k) pass) and join
    // both pair sides off it — halves the assignment work, and the
    // truncated lineage sidesteps Spark's Union constraint-rewrite
    // tripping on a self-joined union plan (key-not-found on the union
    // child's attrs)
    val assigned = (
      if (useHier) assignCellsHierarchical(corpus, cb, idCol, vecCol)
      else assignCells(corpus, cb, idCol, vecCol)).transform(Materialize.once(_, eager = true))
    def side(prefix: String) = assigned.select(
      col(idCol).as(s"${prefix}_id"), col("cell"), col(vecCol).as(s"__v$prefix"))
    val pairs = side("a").join(side("b"), Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", r6(cosineSim(col("__va"), col("__vb"))))
      .filter(col("sim") >= threshold)
      .select("a_id", "b_id")
    val comp = Dedup.connectedComponents(
      corpus.select(col(idCol).as("id")),
      pairs.select(col("a_id").as("u"), col("b_id").as("v")))
    corpus.join(
      comp.filter(col("id") === col("cluster_id")).select(col("id").as(idCol)),
      Seq(idCol), "left_semi")
  }

  /** Past this many centroids the flat O(k)-cosines-per-row assignment is
    * the dominant cost at corpus-scaled k, and the auto defaults of
    * [[clusterDedupWith]] and [[trainKMeansPortable]] switch to the
    * two-level O(√k) assignment. 256 keeps every small pinned-k oracle on
    * the flat path (bit-replayable in one argmax) while any corpus big
    * enough to train a 256+-cell codebook gets the scale-safe form without
    * the caller reading a comment.
    */
  val HierarchicalKThreshold = 256

  /** The per-row argmax over a codebook ([[bestCentroidVia]]), as a single
    * narrow projection: the centroids (inherently small — a codebook is k
    * vectors by design) are folded into a literal array of (cid, cv)
    * structs ordered by cid, and `aggregate()` keeps the best (sim, cid)
    * as it scans. Strict `>` over the cid-ordered array gives the lowest
    * cid on ties — the same rule as a `row_number() OVER (ORDER BY sim
    * DESC, cid)` argmax, with NO Exchange: the corpus-wide window shuffle
    * the naive formulation pays is gone, and the pipeline stays narrow
    * until the probe join. Returns a struct column with fields `cid` and
    * `sim`.
    *
    * Codebooks whose k·dim exceeds this leave the literal-fold plan for the
    * [[graft.functions.NearestCentroid]] reference-object expression: the
    * fold's plan/codegen size grows O(k·dim) (fine for real codebooks, k in
    * the hundreds; pathological past tens of thousands), the expression's
    * stays O(1) — same narrow no-Exchange shape, bit-identical results.
    */
  private val LiteralCodebookMaxElems = 1 << 16

  private def bestCentroid(centroids: DataFrame, vecCol: String): Column =
    bestCentroidVia(centroids, vecCol, literal = None)

  private[graft] def bestCentroidVia(
      centroids: DataFrame, vecCol: String, literal: Option[Boolean]): Column = {
    val rows = centroids
      .select(col("cid").cast("long"), col("cv").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(rows.nonEmpty, "bestCentroid: empty codebook")
    val dim = math.max(rows.head._2.length, 1)
    val useLiteral = literal.getOrElse(rows.length.toLong * dim <= LiteralCodebookMaxElems)
    if (!useLiteral)
      return graft.functions.VectorFunctions.nearestCentroid(
        col(vecCol), rows.toSeq.map { case (cid, cv) => (cid, cv.toArray) })
    val folded = argmaxFoldRaw(rows.toSeq, col(vecCol))
    // a null or zero-norm vector yields null cosines, which never beat the
    // init sentinel — mirror the window-argmax formulation (nulls rank
    // last): assign the lowest cid with a null similarity, instead of
    // leaking a phantom cell -1 into the index/codebook
    when(folded("cid") === -1L,
      struct(lit(rows.head._1).as("cid"), lit(null).cast("double").as("sim")))
      .otherwise(folded)
  }

  /** Nearest-centroid cell per corpus row — one narrow pass, no shuffle. */
  def assignCells(corpus: DataFrame, centroids: DataFrame, idCol: String, vecCol: String,
      carry: Seq[String] = Nil): DataFrame =
    corpus.select(col(idCol) +: bestCentroid(centroids, vecCol)("cid").as("cell") +:
      col(vecCol) +: carry.map(col): _*)

  /** Test hook: [[assignCells]] with the codebook path forced, for the
    * literal-vs-reference equivalence spec.
    */
  private[graft] def assignCellsVia(
      corpus: DataFrame, centroids: DataFrame, idCol: String, vecCol: String,
      literal: Boolean): DataFrame =
    corpus.select(col(idCol),
      bestCentroidVia(centroids, vecCol, Some(literal))("cid").as("cell"), col(vecCol))

  /** The literal argmax fold over in-memory (cid, cv) rows — shared by the
    * flat and hierarchical assignment paths. Raw folded struct: sentinel
    * cid -1 when every cosine is null (null/zero-norm input vector).
    */
  private def argmaxFoldRaw(rows: Seq[(Long, Seq[Double])], vec: Column): Column = {
    val sorted = rows.sortBy(_._1)
    val cents = array(sorted.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), typedlit(cv).as("cv"))
    }: _*)
    aggregate(
      cents,
      struct(lit(-1L).as("cid"), lit(-2.0).as("sim")),
      (acc, c) => {
        val s = r6(cosineSim(vec, c("cv")))
        when(s > acc("sim"), struct(c("cid").as("cid"), s.as("sim"))).otherwise(acc)
      })
  }

  /** TWO-LEVEL (hierarchical) cell assignment — the corpus-scaled-k scale
    * path. Flat [[assignCells]] costs O(k) cosines per row; with SemDeDup's
    * k ≈ n/cellSize that is O(n²/cellSize) total — the assignment becomes
    * the quadratic the cell-scoping removed from the pair join. Here the
    * codebook itself is clustered into g = ⌈√k⌉ SUPER-centroids (one
    * portable Lloyd iteration over the k centroids — bounded work, the
    * codebook is driver-sized by design), each row picks its super (g
    * cosines) and then argmaxes only that super's children (k/g expected):
    * O(√k) per row, O(n·√k) total. Deterministic and oracle-replayable —
    * both levels are the same r6-cosine lowest-id-tie argmax — but
    * APPROXIMATE vs the flat argmax: a row whose true nearest centroid
    * hides under a different super lands in a neighboring cell, which
    * SemDeDup tolerates (bucketing quality, never survivor semantics).
    * Supers that win no children in the final mapping are excluded from
    * the row-level argmax (their cells would be empty by construction).
    * Null/zero-norm vectors take the lowest super's lowest child, not the
    * global lowest cid. The expression stays a narrow projection — two
    * stacked projects, no Exchange; plan size remains O(k·dim) literals
    * (the runtime, not the plan, is what √k shrinks).
    */
  def assignCellsHierarchical(
      corpus: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // materialize the codebook ONCE: the incoming DataFrame usually carries
    // an expensive training lineage (k-means over the corpus), and the
    // super-codebook construction below collects against it several times —
    // without the checkpoint each collect re-runs the whole training
    // (measured 2× the entry wall at 10×); after it, every re-read is k rows
    val cb = centroids
      .select(col("cid").cast("long").as("cid"), col("cv").cast("array<double>").as("cv"))
      .transform(Materialize.once(_, eager = true))
    val centRows = cb.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    require(centRows.nonEmpty, "assignCellsHierarchical: empty codebook")
    val g = math.ceil(math.sqrt(centRows.size.toDouble)).toInt
    // the SUPER codebook always trains flat: the input is k centroid rows
    // (driver-bounded), a flat pass is O(k·√k), and the oracle replay of
    // every hierarchical entry pins the super construction to the flat
    // one-iteration Lloyd form (auto-selecting here would also recurse)
    val supers = trainKMeansPortable(cb, "cid", "cv", g, iterations = 1,
      hierarchicalAssign = Some(false))
    val cmap = assignCells(
      cb.select(col("cid").as("__ccid"), col("cv").as("__cv")),
      supers, "__ccid", "__cv")
      .select(col("__ccid"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val children: Map[Long, Seq[(Long, Seq[Double])]] =
      centRows.groupBy(c => cmap(c._1)).view.mapValues(_.sortBy(_._1)).toMap
    val superRows = supers
      .select(col("cid").cast("long"), col("cv").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .filter(s => children.contains(s._1)).sortBy(_._1).toSeq
    // one reference-object expression (the hierarchical sibling of
    // NearestCentroid): O(1) plan size at any k, a compiled g + k/g
    // kernel per row, still a single narrow projection — a literal
    // CASE-of-folds here measured 4× SLOWER than flat (the branch forest
    // defeats whole-stage codegen)
    val groups = superRows.map { case (sid, sv) =>
      ((sid, sv.toArray), children(sid).map { case (cid, cv) => (cid, cv.toArray) })
    }
    val pick = graft.functions.VectorFunctions.hierarchicalNearestCentroid(col(vecCol), groups)
    corpus.select(col(idCol), pick("cid").as("cell"), col(vecCol))
  }

  /** Deterministic spherical k-means codebook for [[ivfTopK]]: Lloyd
    * iterations expressed as DataFrame ops. Init = the k lowest-id vectors;
    * assignment = max cosine (ties to lower cid) via the shuffle-free
    * [[bestCentroid]] projection; update = elementwise mean. Each iteration
    * is one narrow assignment pass plus one (cid, pos) aggregation — the
    * corpus itself is never shuffled, so this scales to corpora that never
    * fit on the driver (only the k centroids ever reach it, once per
    * iteration). Clusters that lose all members drop out (k may shrink).
    */
  def trainKMeans(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int = 3): DataFrame =
    trainKMeansVia(corpus, idCol, vecCol, k, iterations, avg("x"))

  /** The shared Lloyd loop — both trainers differ ONLY in the per-component
    * mean expression over the exploded (cid, pos, x) rows, so the loop
    * shape (lowest-id init for sparse/offset id spaces, narrow assignment,
    * (cid, pos) aggregation, sorted reassembly) cannot silently diverge
    * between them.
    *
    * `hierarchicalAssign` routes each iteration's assignment through
    * [[assignCellsHierarchical]]: at corpus-scaled k the TRAINING
    * assignment is the same O(n·k) quadratic the two-level argmax removed
    * from the final assignment — the round-18 100× spot check measured the
    * flat-trained q216 at a second-decade exponent of 0.90 with the Lloyd
    * passes dominating. Hierarchical training changes the learned
    * centroids (deterministically — both levels are the r6 lowest-id-tie
    * argmax, oracle-replayable), so entries whose oracles replay flat
    * training pin `Some(false)`.
    */
  private def trainKMeansVia(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int, componentMean: Column,
      hierarchicalAssign: Boolean = false): DataFrame = {
    // the k lowest ids — explicit, so sparse/offset id spaces still yield k
    // centroids (filter(id < k) only worked for dense 0-based ids)
    var cent = corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long").as("cid"), col(vecCol).cast("array<double>").as("cv"))
    for (_ <- 1 to iterations) {
      val assigned = (
        if (hierarchicalAssign) assignCellsHierarchical(corpus, cent, idCol, vecCol)
        else assignCells(corpus, cent, idCol, vecCol))
        .select(col("cell").as("cid"), col(vecCol))
      cent = assigned
        .select(col("cid"), posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(componentMean.as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))), s => s("m")).as("cv"))
        // persist the k-row codebook on first use (lazy checkpoint): the
        // assignment paths collect the codebook at plan-BUILD time
        // (bestCentroidVia), and a caller that references the returned
        // codebook more than once (assign + publish + oracle replay) was
        // re-executing the final iteration's full corpus aggregation per
        // reference. Lazy: the first collect computes and persists, later
        // references read k rows; a single-reference caller pays nothing.
        .transform(Materialize.once(_, eager = false))
    }
    cent
  }

  /** CROSS-ENGINE-PORTABLE k-means: [[trainKMeans]] with the centroid
    * update made bit-reproducible, so a DuckDB oracle can replay training
    * exactly and dedup-over-a-trained-codebook becomes hash-verifiable.
    * Assignment is already portable (the r6-rounded cosine argmax of
    * [[assignCells]], ties to the lower cid); the non-portable piece is
    * the mean — float summation is order-sensitive, and Spark's combine
    * order is not DuckDB's. Here each component quantizes to an integer
    * (`round(x · 2^20)` as BIGINT — exact, associative, order-free sums),
    * and the centroid component is `sum / (count · 2^20)` evaluated in
    * exactly two correctly-rounded double ops, identical in any IEEE-754
    * engine. The ~1e-6 quantization is far below any clustering-relevant
    * signal; same narrow scale shape as [[trainKMeans]] (the corpus never
    * shuffles; only k centroids reach the driver per iteration).
    */
  def trainKMeansPortable(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int = 2,
      hierarchicalAssign: Option[Boolean] = None): DataFrame =
    trainKMeansVia(corpus, idCol, vecCol, k, iterations,
      sum(round(col("x") * lit(1048576.0), 0).cast("long")).cast("double") /
        (count(lit(1)).cast("double") * lit(1048576.0)),
      hierarchicalAssign.getOrElse(k > HierarchicalKThreshold))

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
  /** Signature UDF for SRP-LSH: per table, one bit per deterministic
    * pseudo-random hyperplane (components derived from the portable hash, so
    * signatures are engine-reproducible); bucket key = table*2^16 + sig.
    * Apply to an `array<double>` column. `dim` defaults to one driver-side
    * probe of the corpus — pass it explicitly on hot paths.
    */
  private def srpSignatureUdf(
      corpus: DataFrame, vecCol: String,
      bitsPerTable: Int, nTables: Int, dim: Option[Int]) = {
    import graft.functions.GraftHash
    val d0 = dim.getOrElse(corpus.select(size(col(vecCol))).first().getInt(0))
    // deterministic hyperplanes: component (t, b, d) ~ U(-0.5, 0.5)
    val planes: Array[Array[Array[Double]]] = Array.tabulate(nTables, bitsPerTable, d0) {
      (t, b, d) => GraftHash.hash60(s"srp:$t:$b:$d").toDouble / (1L << 60).toDouble - 0.5
    }
    val bc = corpus.sparkSession.sparkContext.broadcast(planes)
    udf { (v: Seq[Double]) =>
      val p = bc.value
      // copy to a primitive array first: the deserialized Seq's apply is far
      // from O(1)-cheap, and this loop indexes each element nTables×bits
      // times (measured 100× slowdown without the copy)
      val a = v.toArray
      (0 until p.length).map { t =>
        var sig = 0
        var b = 0
        while (b < p(t).length) {
          val plane = p(t)(b)
          val n = math.min(plane.length, a.length)
          var dot = 0.0
          var d = 0
          while (d < n) { dot += plane(d) * a(d); d += 1 }
          if (dot > 0) sig |= (1 << b)
          b += 1
        }
        t.toLong * 65536L + sig
      }
    }
  }

  def srpTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10,
      bitsPerTable: Int = 4, nTables: Int = 16, dim: Option[Int] = None): DataFrame = {
    val sigUdf = srpSignatureUdf(corpus, vecCol, bitsPerTable, nTables, dim)
    val cBuckets = corpus.select(col(idCol),
      explode(sigUdf(col(vecCol).cast("array<double>"))).as("bucket"))
    val qBuckets = queries.select(col("query_id"), col("qv"),
      explode(sigUdf(col("qv").cast("array<double>"))).as("bucket"))
    val cands = cBuckets.join(broadcast(qBuckets), Seq("bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col("qv"), col(idCol)).dropDuplicates("query_id", idCol)
    rerank(cands, corpus, idCol, vecCol, k)
  }

  /** Shared exact re-rank for ANN candidate sets: join the true vectors,
    * exact cosine, top-k per query (ties to the lower id). `cands` must
    * carry (query_id, qv, idCol). Kept in one place so the tie-break and
    * rounding rules can never diverge between ANN variants.
    */
  private[operators] def rerank(
      cands: DataFrame, corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col(idCol))
    cands.join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .withColumn("sim", r6(cosineSim(col("qv"), col(vecCol))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col(idCol).as("neighbor_id"), col("sim"))
  }

  /** Mean best-centroid similarity — the k-means objective, for tests. */
  def assignmentObjective(corpus: DataFrame, centroids: DataFrame, vecCol: String): Double =
    corpus.select(bestCentroid(centroids, vecCol)("sim").as("s"))
      .agg(avg("s")).first().getDouble(0)

  /** IVF-style approximate top-k: assign the corpus to the nearest centroid,
    * probe the nProbe closest cells per query, exact re-rank inside them.
    * centroids: (cid, cv). At 100 TB probing reads ~nProbe/|centroids| of
    * the corpus instead of all of it, and the assignment pass is a narrow
    * projection ([[assignCells]]) — no Exchange before the probe join.
    */
  /** The `nProbe` nearest cells per query: (query_id, qv, cell). Shared
    * by [[ivfTopK]] and [[Pq.ivfPqTopK]].
    */
  private[operators] def probeCells(
      queries: DataFrame, centroids: DataFrame, nProbe: Int): DataFrame = {
    val wProbe = Window.partitionBy("query_id").orderBy(col("psim").desc, col("cid"))
    queries.crossJoin(broadcast(centroids))
      .withColumn("psim", r6(cosineSim(col("qv"), col("cv"))))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid").as("cell"))
  }

  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, nProbe: Int = 4): DataFrame = {
    val assign = assignCells(corpus, centroids, idCol, vecCol)
    val probes = probeCells(queries, centroids, nProbe)
    val wRank = Window.partitionBy("query_id").orderBy(col("sim").desc, col(idCol))
    assign.join(broadcast(probes), Seq("cell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("sim", r6(cosineSim(col("qv"), col(vecCol))))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col(idCol).as("neighbor_id"), col("sim"))
  }
}
