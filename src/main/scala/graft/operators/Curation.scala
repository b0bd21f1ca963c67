package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * sampling, per-group caps, TF-IDF term scoring, and pattern scrubbing.
  * All are narrow or single-shuffle shapes that survive a 100 TB corpus.
  */
object Curation {

  /** Engine-portable 60-bit hash ([[graft.functions.GraftFunctions.graftHash]])
    * — the construction the DuckDB oracles replicate, so sampling/capping
    * decisions are reproducible across engines.
    */
  private def hash60Col(c: Column): Column = graftHash(c)

  /** Deterministic Bernoulli sample: keep a row iff the salted hash of its
    * id falls under `percent`. No RNG state, no shuffle, no driver
    * coordination — at 100 TB this is a pure narrow scan whose output is
    * byte-stable across runs, engines, and partitionings (unlike
    * `df.sample`, whose result depends on partition layout).
    */
  def deterministicSample(df: DataFrame, idCol: String, percent: Int, salt: String): DataFrame =
    df.filter(pmod(hash60Col(concat(lit(s"$salt:"), col(idCol).cast("string"))), lit(100)) < percent)

  /** Keep at most `n` rows per group, selected by stable salted hash (a
    * reproducible "random" subset, not head-of-scan bias). The rank filter
    * plans as WindowGroupLimit: partial top-n runs map-side before the
    * exchange, so the shuffle carries O(n) rows per group, not the group.
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, n: Int, salt: String = "cap"): DataFrame = {
    val h = hash60Col(concat(lit(s"$salt:"), col(idCol).cast("string")))
    val w = Window.partitionBy(groupCol).orderBy(h, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Top-k TF-IDF terms per document: tf from one (doc, word) aggregation,
    * df from one (word) aggregation, idf = ln((N+1)/(df+1)). Scores are
    * rounded to 6 dp BEFORE ranking so ordering is reproducible across
    * engines (ln differs in the last ulp between libms). Two shuffles total:
    * (doc, word) and (word); the per-doc rank filter is WindowGroupLimit.
    */
  def topTfidfTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("word"))
    val tf = toks.groupBy(idCol, "word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("nd"))
    val scored = tf.join(dfreq, "word")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", r6(col("tf") * log((col("nd") + 1.0) / (col("df") + 1.0))))
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("word"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("word"), col("tfidf"))
  }

  /** DSIR-style importance scores toward a TARGET slice (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * per-word add-one-smoothed log-probability ratio between the target
    * census and the raw census, summed over each document's tokens —
    * documents that look like the target domain score positive, documents
    * that look like everything else score negative. The resampling step on
    * top is the already-proven deterministic-hash machinery
    * ([[deterministicSample]]'s construction with the score as the rate).
    *
    * Scale shape: one token explode (narrow), ONE census shuffle computing
    * BOTH distributions (the target count is a conditional aggregate —
    * never two corpus passes), a scalar totals round-trip (3 longs), one
    * vocab-keyed equi-join back to the token stream, one doc-keyed
    * aggregation. Per-word log-ratios quantize to INTEGER micro-nats
    * (round(lr·10⁶) as a long — the mixCorpus ppm discipline), so the
    * per-doc sum is EXACT and associative: a float mean here measurably
    * flips its last rounded digit between engines at sf0.1 (doc 3488's
    * r4 mean landed on the 0.00125 boundary), an integer sum cannot.
    *
    * Returns (idCol, n_tok, dsir_ppm = Σ micro-nats) for documents with
    * ≥ 1 token; normalize by n_tok downstream if a rate is wanted.
    */
  def dsirScores(df: DataFrame, idCol: String, textCol: String, isTarget: Column): DataFrame = {
    // same reserved-name discipline as mixCorpus: the token stream and the
    // census introduce internal columns, and an input already carrying one
    // would shadow or misjoin silently (idCol == "w" makes the vocab join
    // ambiguous; "n_tok"/"dsir_ppm" collide with the output)
    val reservedDsir = Seq("w", "__t", "cr", "ct", "lr_ppm", "n_tok", "dsir_ppm")
    val clashDsir = df.columns.toSeq.intersect(reservedDsir)
    require(clashDsir.isEmpty,
      s"dsirScores reserves column name(s) ${clashDsir.mkString(", ")} and would " +
        "clobber or misjoin them; rename before scoring")
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("w"),
      isTarget.as("__t"))
    val census = toks.groupBy("w").agg(
      count(lit(1)).as("cr"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("ct"))
    val totals = census.agg(
      sum("cr").as("nr"), sum("ct").as("nt"), count(lit(1)).as("v")).head()
    val (nr, nt, v) = (totals.getLong(0), totals.getLong(1), totals.getLong(2))
    val lr = census.select(col("w"),
      round((log((col("ct") + 1.0) / lit((nt + v).toDouble)) -
        log((col("cr") + 1.0) / lit((nr + v).toDouble))) * 1e6, 0)
        .cast("long").as("lr_ppm"))
    toks.join(lr, "w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"), sum("lr_ppm").as("dsir_ppm"))
  }

  /** Deterministic train/val/test split assignment: each row gets the
    * label of the hash-range bucket its id falls in (`splits` are
    * (label, percent) pairs summing to ≤ 100; rows beyond the total get
    * the LAST label, so (train 98)(val 1)(test 1) is exhaustive). Pure
    * narrow map — no shuffle, no RNG state; membership is a function of
    * the id alone, so the split is byte-stable across engines, runs,
    * partitionings AND corpus versions: a document keeps its split when
    * the corpus grows, the property eval-set hygiene actually needs
    * (a re-rolled `randomSplit` leaks yesterday's train docs into
    * today's test set).
    */
  def assignSplits(
      df: DataFrame, idCol: String, splits: Seq[(String, Int)],
      salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "splits need positive percents")
    require(splits.map(_._2).sum <= 100, "split percents must sum to <= 100")
    val h = pmod(hash60Col(concat(lit(s"$salt:"), col(idCol).cast("string"))), lit(100))
    val bounds = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val expr = splits.zip(bounds).init.foldRight(lit(splits.last._1): Column) {
      case (((label, _), bound), rest) => when(h < bound, lit(label)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Domain-mixture sampling: re-weight a corpus to target domain
    * proportions under a total token budget — the mixture step every
    * pre-training pipeline runs ("web 60%, books 30%, code 10%"). One tiny
    * aggregation computes each domain's available token mass (O(domains)
    * rows to the driver, the bounded codebook class); each domain then
    * keeps rows by the deterministic engine-portable hash at rate
    * min(1, want/have) — an under-supplied domain contributes everything
    * it has (the standard clamp), and the output is byte-stable across
    * runs, engines and partitionings. Domains absent from `targets` drop.
    * Rates quantize to ppm via floor under one fixed evaluation order,
    * `((budget * (w/Σw)) / have) * 1e6`, so an oracle replaying the same
    * expression gets the identical threshold. The kept rows carry their
    * domain's `rate_ppm` for downstream accounting.
    *
    * OUTPUT SCHEMA is mode-dependent: input columns + `rate_ppm`, plus
    * `epoch` (0-based replica index) when `upsample = true` — downsampled
    * rows in upsample mode carry `epoch = 0`, so unions across modes must
    * align the extra column explicitly. The appended names (`rate_ppm`,
    * `epoch`, and the internal `__full`/`__frac` scratch pair) are
    * RESERVED: an input already carrying one would be silently clobbered,
    * so the call refuses loudly — rename the input column first.
    */
  def mixCorpus(
      df: DataFrame, idCol: String, domainCol: String, weightCol: String,
      targets: Map[String, Double], budgetTokens: Long,
      salt: String = "mix", upsample: Boolean = false): DataFrame = {
    require(budgetTokens > 0, "mixCorpus needs a positive token budget")
    val reserved = Seq("rate_ppm", "__full", "__frac") ++ (if (upsample) Seq("epoch") else Nil)
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"mixCorpus reserves column name(s) ${clash.mkString(", ")} and would " +
        "clobber the input's — rename them before mixing")
    require(targets.nonEmpty && targets.values.forall(_ >= 0.0),
      "mixCorpus targets must be non-negative weights")
    val wsum = targets.values.toSeq.sorted.sum // fixed fold order
    require(wsum > 0.0, "mixCorpus target weights must not all be zero")
    val inTargets = df.filter(col(domainCol).isin(targets.keys.toSeq: _*))
    // coalesce: a domain whose every weight is NULL sums to NULL, not 0 —
    // getLong would NPE; treat it as having nothing to contribute
    val have: Map[String, Long] = inTargets
      .groupBy(domainCol)
      .agg(coalesce(sum(col(weightCol).cast("long")), lit(0L)).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ratePpm: Map[String, Long] = targets.collect {
      case (d, w) if have.getOrElse(d, 0L) > 0 =>
        val raw = math.floor(
          budgetTokens.toDouble * (w / wsum) / have(d).toDouble * 1000000.0).toLong
        d -> (if (upsample) raw else math.min(1000000L, raw))
    }
    val rateCol = ratePpm.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (d, p)) => when(col(domainCol) === d, lit(p)).otherwise(acc)
    }
    val admitted = pmod(
      hash60Col(concat(lit(s"$salt:"), col(idCol).cast("string"))), lit(1000000L))
    val withRate = inTargets.withColumn("rate_ppm", rateCol)
    if (!upsample) withRate.filter(admitted < col("rate_ppm"))
    else {
      // REPEAT-FACTOR (upsampling) mixing: a rate of R ppm means each row
      // lands floor(R / 1e6) full EPOCHS plus one fractional epoch its
      // hash admits at R % 1e6 — the LLM-recipe "high-value domains see
      // >1 epoch" shape, deterministic row replication with an epoch
      // marker (0-based) so downstream shuffles/oracles see an exact
      // multiset, never a sampled one. A rate below 1e6 degenerates to
      // the downsampling path plus epoch = 0. O(1) expressions per row;
      // the posexplode fans out only upsampled domains.
      withRate
        .withColumn("__full", expr("rate_ppm DIV 1000000"))
        .withColumn("__frac", col("rate_ppm") % lit(1000000L))
        .withColumn("epoch", explode(sequence(lit(0L), col("__full"))))
        .filter(col("epoch") < col("__full") || admitted < col("__frac"))
        .drop("__full", "__frac")
    }
  }

  /** Temperature-based domain mixing — the multilingual-T5 / LLM-recipe
    * shape: sampling mass follows `p_d^alpha` over the natural domain
    * proportions, so `alpha = 1` keeps them and `alpha → 0` flattens
    * toward uniform, under the same token budget and deterministic ppm
    * hash-threshold admission as [[mixCorpus]]. Derived weights quantize
    * to INTEGERS (`floor(h^alpha)`, with the correctly-rounded `sqrt` at
    * `alpha = 0.5`), so the targets — and therefore the ppm thresholds —
    * are exactly reproducible across engines: integer-valued doubles sum
    * order-free, and the rate arithmetic is deterministic IEEE from there.
    * One extra O(domains) aggregation on top of mixCorpus's own.
    */
  def temperatureMix(
      df: DataFrame, idCol: String, domainCol: String, weightCol: String,
      alpha: Double, budgetTokens: Long, salt: String = "tmix",
      upsample: Boolean = false): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "temperatureMix: alpha must be in (0, 1]")
    val have: Map[String, Long] = df
      .groupBy(domainCol)
      .agg(coalesce(sum(col(weightCol).cast("long")), lit(0L)).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pw: Long => Double =
      if (alpha == 0.5) h => math.sqrt(h.toDouble)
      else h => math.pow(h.toDouble, alpha)
    val targets = have.collect { case (d, h) if h > 0 => d -> math.floor(pw(h)) }
    require(targets.nonEmpty, "temperatureMix: no domain carries positive weight")
    mixCorpus(df, idCol, domainCol, weightCol, targets, budgetTokens, salt, upsample)
  }

  /** Scrub text matching `pattern` (e.g. emails) with `replacement`,
    * reporting the match count per row. Pure narrow map work; patterns must
    * stay in the RE2-compatible subset so results are engine-portable.
    */
  def scrubPattern(
      df: DataFrame, idCol: String, textCol: String,
      pattern: String, replacement: String): DataFrame =
    df.select(
      col(idCol),
      size(regexp_extract_all(col(textCol), lit(pattern), lit(0))).as("n_matches"),
      regexp_replace(col(textCol), pattern, replacement).as("scrubbed"))

  /** Pack rows into training shards by a token budget: rows are laid out
    * in `idCol` order and `shard` = floor(tokens-before-this-row / budget)
    * — the sequential greedy packing every training-data pipeline runs
    * before writing shard files, exactly equal to a global running sum.
    *
    * A global-order window would execute in ONE task (Spark gives an
    * unpartitioned `Window.orderBy` a single partition — dead at corpus
    * scale), so the prefix sum is two-level: a range-partitioning pass
    * collects each partition's weight sum AND max id (one tiny aggregation
    * — O(partitions) rows to the driver, same bounded class as a centroid
    * codebook); the per-partition exclusive offsets and the id boundaries
    * then bake into the final plan as LITERALS — `__pid` is recomputed
    * from the boundary literals, not taken from a partitioner instance —
    * and the running sum runs as a PARALLEL per-partition window plus its
    * partition's offset.
    *
    * Baking boundaries as literals (rather than persisting the
    * range-partitioned frame and reusing its partitioner) makes the result
    * deterministic under ANY recompute — there is no sampled partitioner
    * state the two jobs must share, so nothing needs pinning and no cached
    * blocks outlive the call. Deterministic for a given partition count;
    * `numParts` is explicit so results are reproducible across cluster
    * sizes.
    */
  def packShards(
      df: DataFrame, idCol: String, weightCol: String, budget: Long,
      numParts: Int = 32): DataFrame = {
    require(budget > 0, "packShards needs a positive token budget")
    withPrefixBefore(
      df.select(col(idCol), col(weightCol).cast("long").as("__w")),
      idCol, col("__w"), numParts)
      .select(col(idCol), col("__w").as("n_tok"),
        floor(col("__before") / budget).cast("int").as("shard"))
  }

  /** [[packShards]] with a CORPUS-SCALED budget — the production shape. A
    * fixed token budget makes shard COUNT linear in the corpus: at 100×
    * the 4096-token toy budget produced 25k shard directories and the
    * write's per-shard-file constants dominated the wall (measured
    * second-decade exponent ~1.1). Here the budget derives from the total:
    * `max(minBudget, ⌈total / targetShards⌉)` — shard count saturates at
    * `targetShards` and grows only below the `minBudget` floor, so the
    * file count (and every per-file constant downstream: write tasks,
    * listing, footers) is corpus-independent at scale. The total comes
    * from the SAME bounded stats round-trip the two-level prefix sum
    * already makes — the auto budget costs nothing extra. Deterministic
    * and engine-replayable: the oracle recomputes the same integer budget
    * formula.
    */
  def packShardsAuto(
      df: DataFrame, idCol: String, weightCol: String,
      targetShards: Int = 256, minBudget: Long = 4096L,
      numParts: Int = 32): DataFrame = {
    require(targetShards > 0, "packShardsAuto needs a positive shard target")
    require(minBudget > 0, "packShardsAuto needs a positive budget floor")
    val (pre, total) = withPrefixBeforeTotal(
      df.select(col(idCol), col(weightCol).cast("long").as("__w")),
      idCol, col("__w"), numParts)
    val budget = math.max(minBudget, (total + targetShards - 1) / targetShards)
    pre.select(col(idCol), col("__w").as("n_tok"),
      floor(col("__before") / budget).cast("int").as("shard"))
  }

  /** `df` + a `__before` column = the exclusive running sum of `weight` in
    * `idCol` order — the shared two-level distributed prefix sum behind
    * [[packShards]] and [[packSequences]]. Carries every input column
    * through (plus `__w` = the evaluated weight), so callers can thread
    * payloads (token-id arrays) alongside their offsets.
    */
  private def withPrefixBefore(
      df: DataFrame, idCol: String, weight: Column, numParts: Int): DataFrame =
    withPrefixBeforeTotal(df, idCol, weight, numParts)._1

  /** [[withPrefixBefore]] plus the TOTAL weight — already known from the
    * stats round-trip, exposed so [[packShardsAuto]] can derive its budget
    * without a second pass.
    */
  private def withPrefixBeforeTotal(
      df: DataFrame, idCol: String, weight: Column, numParts: Int): (DataFrame, Long) = {
    val weighted = df.withColumn("__w", weight.cast("long"))
    // one pass: per-range-partition weight sum + max id. Only this job
    // sees the sampled RangePartitioner; its boundaries are captured as
    // data (max id per partition) and everything downstream derives from
    // those values, so partitioner nondeterminism cannot leak.
    val stats = weighted.select(col(idCol), col("__w"))
      .repartitionByRange(numParts, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .groupBy("__pid").agg(sum("__w").as("s"), max(col(idCol)).as("hi"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.get(2))).sortBy(_._1)
    val exclusive = stats.scanLeft((0, 0L)) { case ((_, acc), (pid, s, _)) => (pid, acc + s) }
      .init.map(_._2) // offset for partition i = sum of partitions < i
    val offsetOf = map(stats.map(_._1).zip(exclusive).flatMap {
      case (pid, off) => Seq(lit(pid), lit(off))
    }: _*)
    // range partitions are contiguous in id order, so partition i is
    // exactly (hi_{i-1}, hi_i]: the FIRST non-empty partition whose max id
    // is >= this row's id.
    val pidExpr = stats.init.foldRight(
      lit(stats.lastOption.map(_._1).getOrElse(0)): Column) { case ((pid, _, hi), rest) =>
      when(col(idCol) <= lit(hi), lit(pid)).otherwise(rest)
    }
    val w = Window.partitionBy("__pid").orderBy(idCol)
    // ENFORCE idCol uniqueness and non-nullness, shuffle-free: the window's
    // default RANGE frame would give duplicate ids identical __before —
    // overlapping offsets, nondeterministically ordered output — and a
    // null id has no defined position. Equal ids co-locate under the range
    // partitioner and sort adjacently inside the window's existing
    // per-partition sort, so a lag-equality probe detects every duplicate
    // with zero extra exchanges (a countDistinct check here measurably
    // doubled the stats pass's shuffle volume — review-wave finding). The
    // guard folds into __before as a raising zero so column pruning can
    // never drop it.
    val guardZero = when(col(idCol).isNull,
        raise_error(lit(s"prefix-sum order column '$idCol' must be non-null"))
          .cast("long"))
      .when(lag(col(idCol), 1).over(w) === col(idCol),
        raise_error(concat(
          lit(s"prefix-sum order column '$idCol' must be unique; duplicate key: "),
          col(idCol).cast("string"))).cast("long"))
      .otherwise(lit(0L))
    (weighted
      .withColumn("__pid", pidExpr)
      .withColumn("__before",
        offsetOf(col("__pid")) + sum("__w").over(w) - col("__w") + guardZero)
      .drop("__pid"),
      stats.map(_._2).sum)
  }

  /** Pack per-document token-id arrays into FIXED-LENGTH training
    * examples — the context-window packing step between tokenization and
    * the training loop: documents concatenate in `idCol` order into one
    * global token stream, which splits into ⌈total/seqLen⌉ windows of
    * exactly `seqLen` tokens (the last may be short; windows CROSS
    * document boundaries, the standard pretraining shape). Returns
    * (example_id, token_ids, n_tok).
    *
    * Scale shape: the per-document offsets come from the shared two-level
    * prefix sum (no global window), each token maps to its example by
    * pure arithmetic in one narrow explode, and examples reassemble
    * through ONE shuffle on example_id — total work O(total tokens),
    * deterministic for a given `numParts`, engine-replayable (the oracle
    * recomputes the same global positions as one running sum).
    */
  def packSequences(
      df: DataFrame, idCol: String, idsCol: String, seqLen: Int,
      numParts: Int = 32): DataFrame =
    packSequencesImpl(df, idCol, idsCol, seqLen, numParts, withSpans = false)

  /** [[packSequences]] plus per-example DOCUMENT-BOUNDARY metadata — the
    * `doc_spans` column the attention-masking pipelines ("no cross-document
    * attention") need next to the token ids: the sorted start offsets of
    * each document segment inside the example. A segment starts at offset
    * 0 (the example begins mid-document or exactly on a boundary) and at
    * every offset where a document's FIRST token lands; with the caller's
    * EOS convention (one reserved id appended per document) that is
    * exactly "offset 0 plus every position following an EOS".
    *
    * Derived in the SAME explode + example-key shuffle as the ids —
    * the per-token "first token of its document" flag is `__j == 0`, free
    * at posexplode time — so the spans column costs no extra pass and no
    * extra exchange at any corpus size.
    */
  def packSequencesSpans(
      df: DataFrame, idCol: String, idsCol: String, seqLen: Int,
      numParts: Int = 32): DataFrame =
    packSequencesImpl(df, idCol, idsCol, seqLen, numParts, withSpans = true)

  private def packSequencesImpl(
      df: DataFrame, idCol: String, idsCol: String, seqLen: Int,
      numParts: Int, withSpans: Boolean): DataFrame = {
    require(seqLen > 0, "packSequences needs a positive sequence length")
    // A null token-id array must fail LOUDLY: under Spark's default config
    // size(NULL) = -1, which would silently shift every later document's
    // offset by -1 (posexplode emits nothing for the null row), corrupting
    // example alignment corpus-wide with no error. The guard costs nothing
    // on the non-null path.
    val sz = when(col("__ids").isNotNull, size(col("__ids")).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"packSequences: null $idsCol array at $idCol="),
        col(idCol).cast("string"))).cast("long"))
    val pre = withPrefixBefore(
      df.select(col(idCol), col(idsCol).as("__ids")),
      idCol, sz, numParts)
    val toks = pre
      .select(col("__before"), posexplode(col("__ids")).as(Seq("__j", "__tid")))
      .select(
        expr(s"(__before + __j) div $seqLen").as("example_id"),
        ((col("__before") + col("__j")) % seqLen).cast("int").as("__pos"),
        col("__tid"),
        (col("__j") === 0).as("__docstart"))
    val spanAggs =
      if (!withSpans) Nil
      // collect_list skips the nulls the `when` leaves on non-start
      // tokens; offset 0 is always a segment start (continuation or not)
      else Seq(array_sort(array_distinct(concat(
        array(lit(0)),
        collect_list(when(col("__docstart"), col("__pos")))))).as("doc_spans"))
    toks
      .groupBy("example_id")
      .agg(transform(
        array_sort(collect_list(struct(col("__pos"), col("__tid")))),
        s => s("__tid")).as("token_ids"),
        spanAggs: _*)
      .withColumn("n_tok", size(col("token_ids")))
  }
}
