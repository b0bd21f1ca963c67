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

  /** Compute-once materialization of a kernel output that the surrounding
    * query references from several operator subtrees. Catalyst plans each
    * reference as its own scan: the LSH pipelines referenced their band /
    * shingle-set passes from the hot-bucket census, BOTH self-join sides
    * and BOTH verify joins, so one `minHashLsh` executed the tokenize+md5
    * text kernel up to SIX times over the full corpus (measured in
    * q17's executed plan, round 20). A local checkpoint runs the kernel
    * ONCE and serves every reference from the materialized (small, shuffle-
    * shaped) intermediate — bands and shingle sets are the lightweight
    * PROXY of the text (guide §8: materialize the proxy, never the
    * payload), so the corpus text is read once per kernel instead of once
    * per reference. Values are unchanged; only the pass count drops.
    * Storage primitive (localCheckpoint vs lineage-backed persist) is
    * [[Materialize.once]]'s deployment policy.
    */
  private[operators] def oncePerQuery(df: DataFrame): DataFrame =
    Materialize.once(df, eager = false)

  /** Distinct hashed k-shingle sets per document: (id, hs array<long>). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    df.select(col(idCol), shingleHashes(tokens(col(textCol)), k).as("hs"))

  /** All distinct unordered candidate pairs `(a_id, b_id)`, `a_id < b_id`,
    * of ids sharing a bucket key — the LSH self-join, with per-task fanout
    * BOUNDED on hot buckets. `buckets` must have columns `(id, bk)`.
    *
    * The naive `a.join(b, "bk")` forms O(c²) pairs inside one join key for
    * a bucket of c members; templated web boilerplate (shared headers,
    * licence pages, mirrored docs) routinely puts thousands of near-but-
    * not-byte-identical documents in one band bucket, and that c² lands on
    * a single task. Here a band-key census finds buckets with more than
    * `cap` members (one cheap partial-aggregated count, broadcast back —
    * the hot set is at most |bucket rows|/cap entries), and hot buckets
    * are block-split: members hash into `G = ceil(c/cap)` groups, the join
    * key becomes `(bk, gl, gh)`, a row in group g joins as the LEFT of
    * group-pairs `(g, g..G-1)` and as the RIGHT of `(0..g, g)` — every
    * unordered pair meets in exactly one oriented group-pair (same-group
    * pairs order by id, cross-group pairs by group), so the OUTPUT IS
    * IDENTICAL to the naive join while no join key carries more than
    * ~cap² candidate combinations and a hot bucket spreads over
    * G(G+1)/2 keys instead of one straggler task. Cold buckets ride
    * group 0 unreplicated — the plan degenerates to the plain equi-join.
    */
  def boundedSelfPairs(buckets: DataFrame, cap: Int): DataFrame = {
    require(cap >= 2, "bucketCap must be >= 2")
    val hot = buckets.groupBy("bk").agg(count(lit(1)).as("__c"))
      .filter(col("__c") > cap)
      .withColumn("__ng", ceil(col("__c") / cap).cast("int")).drop("__c")
    // __ng = group count, __g = this row's group (names must differ under
    // the default case-INsensitive resolution — "__G" would alias "__g")
    val flagged = buckets.join(broadcast(hot), Seq("bk"), "left")
      .withColumn("__ng", coalesce(col("__ng"), lit(1)))
      .withColumn("__g", pmod(hash(col("id")), col("__ng")))
    val aSide = flagged.select(col("id").as("a_id"), col("bk"),
      col("__g").as("__gl"),
      explode(sequence(col("__g"), col("__ng") - lit(1))).as("__gh"))
    val bSide = flagged.select(col("id").as("b_id"), col("bk"),
      explode(sequence(lit(0), col("__g"))).as("__gl"),
      col("__g").as("__gh"))
    aSide.join(bSide, Seq("bk", "__gl", "__gh"))
      // same-group pairs meet in both orientations: keep the ordered one;
      // cross-group pairs meet once with arbitrary id order
      .filter(col("__gl") =!= col("__gh") || col("a_id") < col("b_id"))
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"))
      .dropDuplicates("a_id", "b_id")
  }

  /** Cross-set analogue of [[boundedSelfPairs]]: all distinct `(lid, rid)`
    * pairs sharing a bucket key between two bucket tables, block-split on
    * buckets hot on EITHER side (left rows replicate over the right side's
    * groups and vice versa, so each cross pair meets exactly once and
    * per-key fanout stays ~cap²).
    */
  def boundedCrossPairs(
      left: DataFrame, lidCol: String, right: DataFrame, ridCol: String,
      cap: Int): DataFrame = {
    require(cap >= 2, "bucketCap must be >= 2")
    def census(df: DataFrame, gName: String) =
      df.groupBy("bk").agg(count(lit(1)).as("__c")).filter(col("__c") > cap)
        .withColumn(gName, ceil(col("__c") / cap).cast("int")).drop("__c")
    val lc = census(left, "__ngl")
    val rc = census(right, "__ngr")
    def flag(df: DataFrame) = df
      .join(broadcast(lc), Seq("bk"), "left")
      .join(broadcast(rc), Seq("bk"), "left")
      .withColumn("__ngl", coalesce(col("__ngl"), lit(1)))
      .withColumn("__ngr", coalesce(col("__ngr"), lit(1)))
    val lSide = flag(left).select(col(lidCol), col("bk"),
      pmod(hash(col(lidCol)), col("__ngl")).as("__gl"),
      explode(sequence(lit(0), col("__ngr") - lit(1))).as("__gr"))
    val rSide = flag(right).select(col(ridCol), col("bk"),
      explode(sequence(lit(0), col("__ngl") - lit(1))).as("__gl"),
      pmod(hash(col(ridCol)), col("__ngr")).as("__gr"))
    lSide.join(rSide, Seq("bk", "__gl", "__gr"))
      .select(lidCol, ridCol).dropDuplicates(lidCol, ridCol)
  }

  /** MinHash-LSH near-duplicate pairs, exact-Jaccard-verified.
    * Returns (a_id, b_id, j) with a_id < b_id and j >= threshold.
    *
    * numBands bands of 2 signature rows: P(candidate | J) = 1-(1-J^2)^numBands
    * — at the default 64 bands, recall at J>=0.7 is 1-2e-19, so the output
    * equals the exact-Jaccard similarity join at a fraction of the pairs.
    *
    * `bucketCap` bounds per-task candidate fanout on hot band buckets
    * ([[boundedSelfPairs]]) without changing the result.
    */
  def minHashLsh(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, k: Int = 3, numBands: Int = 64,
      bucketCap: Int = 1000): DataFrame = {
    // one text pass each for the shingle sets and the band index — the
    // census + both self-join sides + both verify joins below would
    // otherwise each re-run the kernels over the whole corpus
    val sets = oncePerQuery(shingleSets(df, idCol, textCol, k))
    val bands = oncePerQuery(df
      .select(col(idCol), posexplode(minhashBands(tokens(col(textCol)), k, numBands)).as(Seq("p", "bk")))
      .select(col(idCol).as("id"), col("bk")))
    val candPairs = boundedSelfPairs(bands, bucketCap)
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
      threshold: Double = 0.7, k: Int = 3, numBands: Int = 64,
      bucketCap: Int = 1000): DataFrame = {
    // one band pass per side (the hot-bucket census and the cross-join
    // side would otherwise each recompute the minhash kernel)
    def bandsOf(df: DataFrame, as: String) = oncePerQuery(df
      .select(col(idCol).as(as),
        posexplode(minhashBands(tokens(col(textCol)), k, numBands)).as(Seq("p", "bk")))
      .select(col(as), col("bk")))
    val cand = boundedCrossPairs(
      bandsOf(batch, "batch_id"), "batch_id",
      bandsOf(corpus, "corpus_id"), "corpus_id", bucketCap)
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
      threshold: Double = 0.5, k: Int = 3, maxRows: Long = 100000): DataFrame = {
    // explicit wedge guard: with no LSH pruning the shared-shingle join's
    // output grows with shingle collision rates — refuse to start past the
    // cap so a larger-SF bench fails fast instead of wedging; minHashLsh is
    // the scale path
    val n = df.count()
    require(n <= maxRows,
      s"ngramJaccardPairs is the quarantined exact baseline (no LSH pruning): " +
        s"corpus has $n rows > cap $maxRows. Use minHashLsh at scale " +
        s"(or raise maxRows deliberately for an offline recall study).")
    // one text pass: the size census and both join sides below share it
    val sh = oncePerQuery(
      df.select(col(idCol), explode(shingleHashes(tokens(col(textCol)), k)).as("h")))
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
    * published corpus-dedup recipes). Keeps unordered pairs where either
    * direction clears `threshold`.
    *
    * EXACT at scale via prefix filtering (the PPJoin/set-similarity-join
    * technique): a naive shared-shingle self-join is quadratic in every hot
    * shingle's document frequency (a 10× corpus spot-check measured it at
    * exponent ~2). Instead, max-containment ≥ t implies i ≥ t·min(|A|,|B|),
    * so the SMALLER set of a qualifying pair shares at least one of its
    * ⌊(1−t)·n⌋+1 globally-RAREST shingles (pigeonhole over the global
    * document-frequency order). Candidates therefore come from joining
    * each document's rarity PREFIX against the full shingle table — hot
    * stop-shingles almost never appear in any prefix, so their buckets
    * contribute |prefix_h|·|full_h| ≈ 0 instead of |full_h|² — and each
    * candidate pair is verified exactly with one array intersection.
    * Recall is exact by construction; only the candidate count changed.
    */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.9, k: Int = 3): DataFrame = {
    // one text pass: the document-frequency census, the prefix window, the
    // candidate join and both verify joins all read the materialized sets
    val sets = oncePerQuery(shingleSets(df, idCol, textCol, k)
      .filter(size(col("hs")) > 0)
      .select(col(idCol), col("hs"), size(col("hs")).as("n")))
    val sh = sets.select(col(idCol), col("n"), explode(col("hs")).as("h"))
    // global document frequency per shingle = the rarity order
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val prefix = sh.join(dfreq, Seq("h"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
          .orderBy(col("df"), col("h"))))
      .filter(col("rn") <= floor(lit(1.0 - threshold) * col("n")) + 1)
      .select(col(idCol).as("p_id"), col("h"))
    val cand = prefix.join(sh.select(col(idCol).as("s_id"), col("h")), Seq("h"))
      .filter(col("p_id") =!= col("s_id"))
      .select(least(col("p_id"), col("s_id")).as("a_id"),
        greatest(col("p_id"), col("s_id")).as("b_id"))
      .distinct()
    val withSets = cand
      .join(sets.select(col(idCol).as("a_id"), col("hs").as("ha")), Seq("a_id"))
      .join(sets.select(col(idCol).as("b_id"), col("hs").as("hb")), Seq("b_id"))
    val i = size(array_intersect(col("ha"), col("hb"))).cast("double")
    val cab = i / size(col("ha"))
    val cba = i / size(col("hb"))
    withSets.filter(greatest(cab, cba) >= threshold)
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
    // one text pass: both cross-join sides read the materialized (id, hash)
    val sh = oncePerQuery(simhash(df, idCol, textCol))
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
    // one text pass: both band-join sides read the materialized (id, hash)
    val sh = oncePerQuery(simhash(df, idCol, textCol))
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
