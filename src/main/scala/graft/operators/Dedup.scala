package graft.operators

import graft.functions.GraftFunctions._
import graft.functions.HashFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators over a document DataFrame — the user-facing API
  * the catalog queries (q13/q17/q18/q19/q42/q43/q57) delegate to.
  *
  * All text operators tokenize with `[a-z0-9]+` over the lowercased text and
  * hash with the portable md5-derived 60-bit hash, so results are engine-
  * reproducible (the DuckDB oracles in graft.queries.DedupOps are the spec).
  *
  * Scale stance: signatures/fingerprints are single-pass narrow map work;
  * the only wide exchanges are band-bucket joins (LSH) and hash-key joins
  * restricted to candidates.
  */
object Dedup {

  /** Exact content dedup: one row per distinct value of `contentCol` with the
    * minimum id as the survivor and the duplicate count. One hash-partitioned
    * aggregation on the content hash.
    */
  def exactByContent(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol).cast("binary")).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct hashed k-shingle sets per document: (id, hs array<long>). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    df.select(col(idCol), shingleHashes(tokens(col(textCol)), k).as("hs"))

  /** MinHash-LSH near-duplicate pairs, exact-Jaccard-verified.
    * Returns (a_id, b_id, j) with a_id < b_id and j >= threshold.
    *
    * numBands bands of 2 signature rows: P(candidate | J) = 1-(1-J^2)^numBands
    * — at the default 64 bands, recall at J>=0.7 is 1-2e-19, so the output
    * equals the exact-Jaccard similarity join at a fraction of the pairs.
    */
  def minHashLsh(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, k: Int = 3, numBands: Int = 64): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, k)
    val bands = df
      .select(col(idCol), posexplode(minhashBands(tokens(col(textCol)), k, numBands)).as(Seq("p", "bk")))
      .select(col(idCol), col("bk"))
    val a = bands.select(col(idCol).as("a_id"), col("bk"))
    val b = bands.select(col(idCol).as("b_id"), col("bk"))
    val candPairs = a.join(b, Seq("bk")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").dropDuplicates("a_id", "b_id")
    val cands = candPairs
      .join(sets.select(col(idCol).as("a_id"), col("hs").as("ha")), Seq("a_id"))
      .join(sets.select(col(idCol).as("b_id"), col("hs").as("hb")), Seq("b_id"))
    val inter = size(array_intersect(col("ha"), col("hb"))).cast("double")
    val j = inter / (size(col("ha")) + size(col("hb")) - inter)
    cands.withColumn("j", r4(j)).filter(j >= threshold).select("a_id", "b_id", "j")
  }

  /** Incremental admission: near-duplicate pairs BETWEEN a candidate
    * `batch` and an existing `corpus` — "dedup today's crawl against the
    * lake". Same LSH band equi-join + exact shingle-Jaccard verification
    * as [[minHashLsh]], but strictly cross-set: the corpus is never
    * self-joined, so the candidate and verify work scales with the BATCH
    * side (the corpus contributes its band index and the shingle sets of
    * matched candidates only). Returns (batch_id, corpus_id, j).
    * Compose with [[graft.sources.reftable.VersionedTable.changes]] to
    * admit only a version delta instead of re-deduplicating the table.
    */
  def nearDupAgainst(
      corpus: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, k: Int = 3, numBands: Int = 64): DataFrame = {
    def bandsOf(df: DataFrame, as: String) = df
      .select(col(idCol).as(as),
        posexplode(minhashBands(tokens(col(textCol)), k, numBands)).as(Seq("p", "bk")))
      .select(col(as), col("bk"))
    val cand = bandsOf(batch, "batch_id")
      .join(bandsOf(corpus, "corpus_id"), Seq("bk"))
      .select("batch_id", "corpus_id").dropDuplicates("batch_id", "corpus_id")
    val withSets = cand
      .join(shingleSets(batch, idCol, textCol, k)
        .select(col(idCol).as("batch_id"), col("hs").as("hb")), Seq("batch_id"))
      .join(shingleSets(corpus, idCol, textCol, k)
        .select(col(idCol).as("corpus_id"), col("hs").as("hc")), Seq("corpus_id"))
    val inter = size(array_intersect(col("hb"), col("hc"))).cast("double")
    val j = inter / (size(col("hb")) + size(col("hc")) - inter)
    withSets.withColumn("j", r4(j)).filter(j >= threshold)
      .select("batch_id", "corpus_id", "j")
  }

  /** Exact n-gram Jaccard similarity join on hashed shingles (no pruning —
    * the correctness baseline for [[minHashLsh]]; pair count grows with
    * shingle collision rates, prefer LSH at scale).
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, k: Int = 3): DataFrame = {
    val sh = df.select(col(idCol), explode(shingleHashes(tokens(col(textCol)), k)).as("h"))
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("n"))
    val a = sh.select(col(idCol).as("a_id"), col("h"))
    val b = sh.select(col(idCol).as("b_id"), col("h"))
    val inter = a.join(b, Seq("h")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
    val withSizes = inter
      .join(sizes.select(col(idCol).as("a_id"), col("n").as("na")), Seq("a_id"))
      .join(sizes.select(col(idCol).as("b_id"), col("n").as("nb")), Seq("b_id"))
    val j = col("i").cast("double") / (col("na") + col("nb") - col("i"))
    withSizes.withColumn("j", r4(j)).filter(j >= threshold).select("a_id", "b_id", "j")
  }

  /** Exact n-gram CONTAINMENT join on hashed shingles: c_ab = |A∩B|/|A|,
    * c_ba = |A∩B|/|B| — the asymmetric near-dup signal (a short document
    * quoted inside a long one has high containment but low Jaccard, so a
    * Jaccard-only gate misses it; containment gates are standard in
    * published corpus-dedup recipes). Candidates come from the same
    * shared-shingle equi-join as [[ngramJaccardPairs]]: pairs sharing zero
    * shingles are never materialized, and the only wide exchange is
    * bounded by shingle-bucket fan-out (cap stop-shingles upstream at
    * open-web scale). Keeps unordered pairs where either direction clears
    * `threshold`.
    */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.9, k: Int = 3): DataFrame = {
    val sh = df.select(col(idCol), explode(shingleHashes(tokens(col(textCol)), k)).as("h"))
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("n"))
    val a = sh.select(col(idCol).as("a_id"), col("h"))
    val b = sh.select(col(idCol).as("b_id"), col("h"))
    val inter = a.join(b, Seq("h")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
    val withSizes = inter
      .join(sizes.select(col(idCol).as("a_id"), col("n").as("na")), Seq("a_id"))
      .join(sizes.select(col(idCol).as("b_id"), col("n").as("nb")), Seq("b_id"))
    val cab = col("i").cast("double") / col("na")
    val cba = col("i").cast("double") / col("nb")
    withSizes.filter(greatest(cab, cba) >= threshold)
      .select(col("a_id"), col("b_id"), r4(cab).as("c_ab"), r4(cba).as("c_ba"))
  }

  /** Full corpus dedup: remove exact duplicates (keep the minimum id per
    * content hash) and then near-duplicates via MinHash-LSH (greedy: of each
    * near-dup pair, the higher id is dropped). Returns the surviving rows of
    * `df`. One LSH pass + two hash joins — no all-pairs work.
    */
  def dedupCorpus(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, k: Int = 3, numBands: Int = 64): DataFrame = {
    val exactSurvivors = df.groupBy(md5(col(textCol).cast("binary")).as("__h"))
      .agg(min(idCol).as(idCol))
      .select(idCol)
    val kept = df.join(exactSurvivors, Seq(idCol), "left_semi")
    val nearDupLosers = minHashLsh(kept, idCol, textCol, threshold, k, numBands)
      .select(col("b_id").as(idCol)).distinct()
    kept.join(nearDupLosers, Seq(idCol), "left_anti")
  }

  /** Near-duplicate clustering: connected components over the MinHash-LSH
    * pair graph, labels = minimum reachable id. Each round combines
    * pointer-jumping (label ← label of current label, which halves chain
    * depth, so convergence is O(log diameter) — deep chains cost rounds,
    * not a rewrite) with neighbor-min propagation; each round is two joins
    * + one aggregate, with localCheckpoint to cut the growing lineage.
    * Near-dup clusters are shallow, so 2–4 rounds in practice. Returns
    * (id, cluster_id) for every document (singletons cluster with
    * themselves) — the transitive-closure-correct form of [[dedupCorpus]]'s
    * greedy pair removal.
    */
  def clusterNearDups(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, k: Int = 3, numBands: Int = 64,
      maxIterations: Int = 20): DataFrame = {
    val pairs = minHashLsh(df, idCol, textCol, threshold, k, numBands)
    connectedComponents(
      df.select(col(idCol).as("id")),
      pairs.select(col("a_id").as("u"), col("b_id").as("v")),
      maxIterations)
      .select(col("id").as(idCol), col("cluster_id"))
  }

  /** Quality-aware corpus dedup: cluster near-duplicates
    * ([[clusterNearDups]]) and keep exactly one document per cluster — the
    * one maximizing `qualityCol` (ties broken by minimum id), instead of
    * [[dedupCorpus]]'s blind min-id survivor. The selection is one
    * WindowGroupLimit top-1 per cluster (partial limits before the
    * exchange, no full-partition materialization). Returns the surviving
    * (id, cluster_id) rows.
    */
  def dedupKeepBest(
      df: DataFrame, idCol: String, textCol: String, qualityCol: String,
      threshold: Double = 0.7, k: Int = 3, numBands: Int = 64): DataFrame = {
    val clusters = clusterNearDups(df, idCol, textCol, threshold, k, numBands)
    val scored = clusters.join(df.select(col(idCol), col(qualityCol)), Seq(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col(qualityCol).desc, col(idCol).asc)
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol), col("cluster_id"))
  }

  /** Benchmark-contamination check: for each corpus document, how many of
    * its distinct word n-grams appear in ANY benchmark document — the
    * standard train/test overlap scan for a training corpus (8-grams by
    * default, the usual contamination window). One narrow fused
    * shingle+hash pass per side, then a single equi-join on the 60-bit
    * gram hash: the benchmark side (small by nature) broadcasts, so the
    * corpus — the 100 TB side — is never shuffled. Returns
    * (id, n_contaminated) for contaminated documents only.
    */
  def contamination(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val corpusGrams = corpus.select(col(idCol), explode(shingleHashes(tokens(col(textCol)), n)).as("h"))
    val benchGrams = benchmark.select(explode(shingleHashes(tokens(col(textCol)), n)).as("h")).distinct()
    corpusGrams.join(broadcast(benchGrams), Seq("h"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** Min-label connected components over an undirected edge list
    * (`u`,`v` — one direction suffices) for the given node ids; see
    * [[clusterNearDups]] for the algorithm. Returns (id, cluster_id).
    */
  def connectedComponents(ids: DataFrame, pairs: DataFrame, maxIterations: Int = 20): DataFrame = {
    val edges = pairs.select(col("u"), col("v"))
      .unionAll(pairs.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = true)
    var labels = ids.select(col("id")).withColumn("label", col("id"))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIterations) {
      // pointer jump: labels are themselves node ids, so a self-join
      // resolves label -> that node's current label
      val byId = labels.select(col("id").as("jid"), col("label").as("jl"))
      val jumped = labels.join(byId, labels("label") === byId("jid"), "left")
        .select(col("id"), col("label").as("orig"),
          least(col("label"), coalesce(col("jl"), col("label"))).as("jlabel"))
      val nbrMin = edges
        .join(jumped.select(col("id").as("v"), col("jlabel").as("nl")), Seq("v"))
        .groupBy(col("u").as("id")).agg(min("nl").as("nmin"))
      val updated = jumped.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("orig"),
          least(col("jlabel"), coalesce(col("nmin"), col("jlabel"))).as("next"))
        .localCheckpoint(eager = true)
      changed = updated.filter(col("next") < col("orig")).count()
      labels = updated.select(col("id"), col("next").as("label"))
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIterations iterations " +
          s"($changed labels still changing): raise maxIterations " +
          "(pointer-jumping converges in O(log diameter) rounds)")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** 60-bit multiset-weighted SimHash per document: (id, simhash). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col(idCol), simhash60(col("tk")).as("simhash"))

  /** All-pairs SimHash Hamming-distance pairs (exact, O(n^2) — small n or
    * verification only; use [[simhashBandedPairs]] at scale).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 10): DataFrame = {
    val sh = simhash(df, idCol, textCol)
    val a = sh.select(col(idCol).as("a_id"), col("simhash").as("ha"))
    val b = sh.select(col(idCol).as("b_id"), col("simhash").as("hb"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("hd", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hd") <= maxHamming)
      .select("a_id", "b_id", "hd")
  }

  /** Banded SimHash near-dup join: 60 bits split into 4 bands of 15; by
    * pigeonhole any pair with Hamming distance <= 3 shares at least one
    * exact band, so candidate recall is exactly 1 for maxHamming <= 3 and
    * the exchange is a narrow equi-join instead of an O(n^2) scan.
    */
  def simhashBandedPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "full recall is only guaranteed for maxHamming <= 3 with 4 bands")
    val sh = simhash(df, idCol, textCol)
    val bands = sh.select(col(idCol), col("simhash"),
      explode(expr("transform(sequence(0, 3), b -> struct(b AS b, shiftright(simhash, b * 15) & 32767 AS v))")).as("bk"))
    val a = bands.select(col(idCol).as("a_id"), col("simhash").as("ha"), col("bk"))
    val b = bands.select(col(idCol).as("b_id"), col("simhash").as("hb"), col("bk"))
    a.join(b, Seq("bk")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "ha", "hb").dropDuplicates("a_id", "b_id")
      .withColumn("hd", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hd") <= maxHamming)
      .select("a_id", "b_id", "hd")
  }
}
