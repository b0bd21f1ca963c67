package graft.queries

import graft.QueryDef
import graft.functions.GraftFunctions.{graftHash, tokens}
import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Dataset-curation catalog entries over `documents`: deterministic
  * sampling, per-group caps, TF-IDF, and pattern scrubbing — each checked
  * against a DuckDB oracle computing the identical decision function (the
  * engine-portable md5-based 60-bit hash, r6-rounded scores, RE2-safe
  * regexes).
  */
object CurationOps {
  import RelationalSupport.t

  /** DuckDB rendering of the portable 60-bit hash used by Curation. */
  private def duckHash60(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  // planted-PII construction shared by the Spark and DuckDB sides of q78
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  val defs: Seq[QueryDef] = Seq(
    // deterministic 10% Bernoulli sample: the keep-decision is a pure
    // function of the id, so the sample is byte-stable across engines,
    // runs, and partition layouts — df.sample() is none of those.
    QueryDef("q75_sample_deterministic", (s, dir) => {
      Curation.deterministicSample(t(s, dir, "documents"), "doc_id", 10, "sample")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }, Some(
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${duckHash60("'sample:' || CAST(doc_id AS VARCHAR)")} % 100 < 10
         |ORDER BY doc_id""".stripMargin)),

    // DSIR importance scores toward a target domain (round 17): add-one-
    // smoothed per-word log-probability ratios between the target (lang =
    // 'en') census and the raw census, averaged per document — the
    // importance-resampling signal that tilts a web corpus toward a
    // high-quality slice. One conditional census shuffle computes BOTH
    // distributions; per-word ratios quantize to integer MICRO-NATS
    // (the mixCorpus ppm discipline) so the per-doc sum is exact and
    // associative — a float mean here flips its last rounded digit
    // between engines at sf0.1 — and the oracle replays training AND
    // scoring bit-identically.
    QueryDef("q223_dsir_scores", (s, dir) => {
      Curation.dsirScores(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en")
        .orderBy("doc_id")
    }, Some(
      """WITH toks AS (SELECT doc_id, lang,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents),
        |census AS (SELECT w, count(*) AS cr,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(cr) AS BIGINT) nr, CAST(sum(ct) AS BIGINT) nt,
        |    count(*) v FROM census),
        |lr AS (SELECT w,
        |    CAST(round((ln((ct + 1) / CAST(nt + v AS DOUBLE))
        |        - ln((cr + 1) / CAST(nr + v AS DOUBLE))) * 1e6) AS BIGINT) AS lr_ppm
        |  FROM census CROSS JOIN tot),
        |sc AS (SELECT t.doc_id, lr.lr_ppm FROM toks t JOIN lr USING (w))
        |SELECT doc_id, count(*) AS n_tok, CAST(sum(lr_ppm) AS BIGINT) AS dsir_ppm
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // QUALITY-BUCKETED CURRICULUM MIX (round 17): documents bucketed into
    // perplexity quartiles, each quartile admitted at its own rate — the
    // quality-curriculum sampling step between scoring and packing. The
    // quartile assignment needs a GLOBAL rank over (ppl, doc_id); a global
    // window would run in one task, so the rank rides packShards' two-level
    // prefix sum over a single sortable composite key — ppl micro-units
    // and doc_id as fixed-width zero-padded strings (order-safe for ANY id
    // magnitude; a bit-shifted BIGINT encode broke at the 10× dataset's
    // 10-digit ids) — weight 1, budget ceil(N/4): shard IS the quartile.
    // Admission is the deterministic 60-bit hash at per-bucket ppm rates.
    // The oracle replays perplexity training, the composite key, the
    // single global running count, and the hash rule.
    QueryDef("q224_quality_mix", (s, dir) => {
      // four uses of the bigram-census lineage (count, packShards' stats
      // pass, its final pass, the bucket join) — past the repo's measured
      // recompute-vs-checkpoint threshold (q219: three uses + write), so
      // materialize once
      val ppl = graft.operators.TextAnalysis
        .lmPerplexity(t(s, dir, "documents"), "doc_id", "text")
        .localCheckpoint()
      val keyed = ppl.select(
        concat(lpad(round(col("ppl") * 10000).cast("long").cast("string"), 12, "0"),
          lpad(col("doc_id").cast("string"), 20, "0")).as("k"),
        lit(1L).as("one"))
      val n = keyed.count()
      val bucketed = Curation.packShards(keyed, "k", "one", budget = (n + 3) / 4)
        .select(substring(col("k"), 13, 20).cast("long").as("doc_id"),
          col("shard").as("bucket"))
      val rate = element_at(
        array(lit(1000000L), lit(700000L), lit(400000L), lit(100000L)),
        col("bucket") + 1)
      val admitted = pmod(graftHash(concat(lit("qmix:"), col("doc_id").cast("string"))),
        lit(1000000L)) < rate
      bucketed.join(ppl, "doc_id")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(admitted, 1L).otherwise(0L)).as("n_admitted"),
          sum(when(admitted, col("n_bigrams")).otherwise(0L)).as("bigrams_admitted"))
        .orderBy("bucket")
    }, Some(
      s"""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents),
         |bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
         |       FROM toks, unnest(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
         |cb AS (SELECT w1, w2, count(*) c FROM bg GROUP BY 1, 2),
         |cu AS (SELECT w1, count(*) c FROM bg GROUP BY 1),
         |v AS (SELECT count(DISTINCT w) n FROM (SELECT unnest(t) AS w FROM toks)),
         |sc AS (SELECT b.doc_id, round(ln((cb.c + 1) / CAST(cu.c + v.n AS DOUBLE)), 6) AS lp
         |       FROM bg b JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v),
         |ppl AS (SELECT doc_id, count(*) AS n_bigrams, round(exp(-avg(lp)), 4) AS ppl
         |        FROM sc GROUP BY doc_id),
         |keyed AS (SELECT doc_id, n_bigrams,
         |    lpad(CAST(CAST(round(ppl * 10000) AS BIGINT) AS VARCHAR), 12, '0')
         |      || lpad(CAST(doc_id AS VARCHAR), 20, '0') AS k FROM ppl),
         |tot AS (SELECT count(*) AS n FROM keyed),
         |ranked AS (SELECT doc_id, n_bigrams,
         |    row_number() OVER (ORDER BY k) - 1 AS r FROM keyed),
         |b AS (SELECT doc_id, n_bigrams,
         |    CAST(r // ((tot.n + 3) // 4) AS INT) AS bucket FROM ranked CROSS JOIN tot),
         |adm AS (SELECT bucket, n_bigrams,
         |    ${duckHash60("'qmix:' || CAST(doc_id AS VARCHAR)")} % 1000000 <
         |      CASE bucket WHEN 0 THEN 1000000 WHEN 1 THEN 700000
         |                  WHEN 2 THEN 400000 ELSE 100000 END AS keep
         |  FROM b)
         |SELECT bucket, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
         |  CAST(sum(CASE WHEN keep THEN n_bigrams ELSE 0 END) AS BIGINT) AS bigrams_admitted
         |FROM adm GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // Token-budget shard packing: documents laid out in id order, shard =
    // floor(tokens-before / budget) — the greedy sequential packing before
    // writing training shards, computed as a TWO-LEVEL prefix sum (per-
    // partition windows + broadcast offsets; a global-order window would
    // run in one task). The oracle is the single global running sum the
    // two-level construction must equal exactly.
    QueryDef("q115_shard_packing", (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          size(graft.functions.GraftFunctions.tokens(col("text"))).as("nt"))
      graft.operators.Curation.packShards(docs, "doc_id", "nt", budget = 2000L)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tok"),
          min("doc_id").as("lo"), max("doc_id").as("hi"))
        .orderBy("shard")
    }, Some(
      """WITH t AS (SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n
        |  FROM documents),
        |c AS (SELECT doc_id, n,
        |  sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n AS pre FROM t),
        |s AS (SELECT doc_id, n, CAST(floor(pre / 2000.0) AS INT) AS shard FROM c)
        |SELECT shard, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS tok,
        |  min(doc_id) AS lo, max(doc_id) AS hi
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin)),

    // SHUFFLE → PACK (round 17): deterministic epoch shuffle before shard
    // packing — shards must be IID samples of the corpus, not id-ordered
    // runs (id order correlates with crawl time/source, and a shard of
    // consecutive ids trains on one domain at a time). The shuffle key is
    // the portable hash (salted by epoch, tie-broken by id so keys stay
    // unique), and packShards range-partitions on IT — same two-level
    // prefix sum, same budget semantics, byte-stable across engines,
    // partitionings and epochs. The oracle is the single global running
    // sum over the identical derived key.
    QueryDef("q218_shuffle_pack", (s, dir) => {
      val docs = t(s, dir, "documents")
      val keyed = docs.select(
        concat(
          lpad(graftHash(concat(lit("ep1:"), col("doc_id").cast("string")))
            .cast("string"), 19, "0"),
          lit("-"), lpad(col("doc_id").cast("string"), 10, "0")).as("skey"),
        size(tokens(col("text"))).cast("long").as("nt"))
      graft.operators.Curation.packShards(keyed, "skey", "nt", budget = 2000L)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tok"),
          min("skey").as("lo_key"), max("skey").as("hi_key"))
        .orderBy("shard")
    }, Some(
      s"""WITH t AS (SELECT
         |  lpad(CAST(${duckHash60("'ep1:' || CAST(doc_id AS VARCHAR)")} AS VARCHAR), 19, '0')
         |    || '-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS skey,
         |  len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n
         |  FROM documents),
         |c AS (SELECT skey, n,
         |  sum(n) OVER (ORDER BY skey ROWS UNBOUNDED PRECEDING) - n AS pre FROM t),
         |s2 AS (SELECT skey, n, CAST(floor(pre / 2000.0) AS INT) AS shard FROM c)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS tok,
         |  min(skey) AS lo_key, max(skey) AS hi_key
         |FROM s2 GROUP BY shard ORDER BY shard""".stripMargin)),

    // cap each language at 20 documents, chosen by stable hash (an unbiased
    // reproducible subset, not head-of-scan); WindowGroupLimit keeps the
    // shuffle at O(cap) rows per group.
    QueryDef("q76_cap_per_group", (s, dir) => {
      Curation.capPerGroup(t(s, dir, "documents"), "lang", "doc_id", 20)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    }, Some(
      s"""WITH h AS (SELECT doc_id, lang,
         |    ${duckHash60("'cap:' || CAST(doc_id AS VARCHAR)")} AS hv
         |  FROM documents),
         |r AS (SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn FROM h)
         |SELECT lang, doc_id FROM r WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin)),

    // top-3 TF-IDF terms per document; scores r6-rounded before ranking on
    // both sides so the ordering is engine-reproducible.
    QueryDef("q77_tfidf_topk", (s, dir) => {
      Curation.topTfidfTerms(t(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rk")
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS nd FROM documents),
        |scored AS (
        |  SELECT doc_id, word, round(tf * ln((nd + 1.0) / (df + 1.0)), 6) AS tfidf
        |  FROM tf JOIN dfreq USING (word) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, word, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rn
        |  FROM scored)
        |SELECT doc_id, CAST(rn AS INTEGER) AS rk, word, tfidf
        |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // pattern scrubbing on planted PII: each document gets a deterministic
    // email prefix (the corpus itself has none), the scrub must remove it,
    // and the md5 of the scrubbed text is compared — so the replacement has
    // to land byte-identically in both engines.
    QueryDef("q78_pii_scrub", (s, dir) => {
      val planted = t(s, dir, "documents").select(
        col("doc_id"),
        concat(lit("contact user"), col("doc_id").cast("string"),
          lit("@example.com said: "), col("text")).as("text"))
      Curation.scrubPattern(planted, "doc_id", "text", EmailPat, "<EMAIL>")
        .select(col("doc_id"), col("n_matches"), md5(col("scrubbed")).as("scrub_md5"))
        .orderBy("doc_id")
    }, Some(
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$EmailPat')) AS INTEGER) AS n_matches,
         |  md5(regexp_replace(t, '$EmailPat', '<EMAIL>', 'g')) AS scrub_md5
         |FROM (SELECT doc_id,
         |    'contact user' || CAST(doc_id AS VARCHAR) || '@example.com said: ' || text AS t
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin)),

    // Domain-mixture sampling under a token budget: per-language targets
    // (en 50%, de 25%, fr 25% of 2000 tokens; es/zh dropped), per-domain
    // availability from ONE tiny aggregation, then a deterministic
    // hash-threshold sample at rate min(1, want/have) — rates quantized to
    // ppm via floor under one fixed double evaluation order, so the oracle
    // replaying the identical expression computes the identical threshold.
    // At small SFs the de/fr targets exceed availability and clamp to keep
    // everything (rate_ppm = 1e6) while en genuinely samples.
    QueryDef("q126_domain_mixing", (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(graft.functions.GraftFunctions.tokens(col("text"))).as("nt"))
      Curation.mixCorpus(docs, "doc_id", "lang", "nt",
        Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25), budgetTokens = 2000L)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("tok"),
          max("rate_ppm").as("rate_ppm"))
        .orderBy("lang")
    }, Some(
      s"""WITH d AS (
         |  SELECT doc_id, lang, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nt
         |  FROM documents WHERE lang IN ('en', 'de', 'fr')),
         |have AS (SELECT lang, CAST(sum(nt) AS BIGINT) AS h FROM d GROUP BY lang),
         |rates AS (
         |  SELECT lang, CAST(LEAST(1000000, FLOOR(
         |    CAST(2000 AS DOUBLE) * (CASE lang WHEN 'en' THEN 0.5 ELSE 0.25 END)
         |      / h * 1000000.0)) AS BIGINT) AS ppm
         |  FROM have WHERE h > 0),
         |kept AS (
         |  SELECT d.lang, d.nt, r.ppm FROM d JOIN rates r ON d.lang = r.lang
         |  WHERE ${duckHash60("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000 < r.ppm)
         |SELECT lang, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS tok,
         |  max(ppm) AS rate_ppm
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin)),

    // TEMPERATURE-BASED DOMAIN MIXING (round 15) — the multilingual-T5 /
    // LLM-recipe sampler: rates follow sqrt(natural token mass) per
    // domain (alpha = 0.5) under a token budget. Weights quantize to
    // integers (floor of the correctly-rounded sqrt) so the oracle
    // recomputes bit-identical ppm thresholds; admission is the same
    // deterministic hash filter as q126.
    QueryDef("q201_temperature_mix", (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(graft.functions.GraftFunctions.tokens(col("text"))).as("nt"))
      Curation.temperatureMix(docs, "doc_id", "lang", "nt",
        alpha = 0.5, budgetTokens = 4000L)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("tok"),
          max("rate_ppm").as("rate_ppm"))
        .orderBy("lang")
    }, Some(
      s"""WITH d AS (
         |  SELECT doc_id, lang, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nt
         |  FROM documents),
         |have AS (SELECT lang, CAST(sum(nt) AS BIGINT) AS h FROM d GROUP BY lang),
         |w AS (SELECT lang, h, FLOOR(SQRT(CAST(h AS DOUBLE))) AS wt
         |      FROM have WHERE h > 0),
         |tot AS (SELECT SUM(wt) AS ws FROM w),
         |rates AS (
         |  SELECT lang, CAST(LEAST(1000000, FLOOR(
         |    CAST(4000 AS DOUBLE) * (wt / ws) / h * 1000000.0)) AS BIGINT) AS ppm
         |  FROM w, tot),
         |kept AS (
         |  SELECT d.lang, d.nt, r.ppm FROM d JOIN rates r ON d.lang = r.lang
         |  WHERE ${duckHash60("'tmix:' || CAST(doc_id AS VARCHAR)")} % 1000000 < r.ppm)
         |SELECT lang, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS tok,
         |  max(ppm) AS rate_ppm
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin)),

    // REPEAT-FACTOR (UPSAMPLING) MIXING (round 16): with `upsample` on,
    // a domain's rate may exceed 1e6 ppm — each row then lands
    // floor(rate/1e6) full EPOCHS plus one hash-admitted fractional epoch,
    // the LLM-recipe "high-value domains see >1 epoch" shape as
    // deterministic row replication with a 0-based epoch marker. The
    // budget (far above the corpus's own token mass) forces real
    // upsampling; the oracle recomputes the identical integer thresholds
    // and the identical replicated multiset via generate_series.
    QueryDef("q206_upsample_mix", (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(graft.functions.GraftFunctions.tokens(col("text"))).as("nt"))
      Curation.temperatureMix(docs, "doc_id", "lang", "nt",
        alpha = 0.5, budgetTokens = 2000000L, upsample = true)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_rows"), sum("nt").as("tok"),
          max("epoch").as("max_epoch"), max("rate_ppm").as("rate_ppm"))
        .orderBy("lang")
    }, Some(
      s"""WITH d AS (
         |  SELECT doc_id, lang, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nt
         |  FROM documents),
         |have AS (SELECT lang, CAST(sum(nt) AS BIGINT) AS h FROM d GROUP BY lang),
         |w AS (SELECT lang, h, FLOOR(SQRT(CAST(h AS DOUBLE))) AS wt
         |      FROM have WHERE h > 0),
         |tot AS (SELECT SUM(wt) AS ws FROM w),
         |rates AS (
         |  SELECT lang, CAST(FLOOR(
         |    CAST(2000000 AS DOUBLE) * (wt / ws) / h * 1000000.0) AS BIGINT) AS ppm
         |  FROM w, tot),
         |kept AS (
         |  SELECT lang, nt, ppm,
         |    (ppm // 1000000) +
         |      CASE WHEN adm < ppm % 1000000 THEN 1 ELSE 0 END AS reps
         |  FROM (
         |    SELECT d.lang, d.nt, r.ppm,
         |      ${duckHash60("'tmix:' || CAST(d.doc_id AS VARCHAR)")} % 1000000 AS adm
         |    FROM d JOIN rates r ON d.lang = r.lang))
         |SELECT lang, CAST(sum(reps) AS BIGINT) AS n_rows,
         |  CAST(sum(nt * reps) AS BIGINT) AS tok,
         |  CAST(max(reps) - 1 AS BIGINT) AS max_epoch, max(ppm) AS rate_ppm
         |FROM kept WHERE reps > 0 GROUP BY lang ORDER BY lang""".stripMargin)),

    // Deterministic split assignment (train 90 / val 5 / test 5): the
    // label is a pure function of the document id, so membership is
    // byte-stable across engines AND corpus versions — a document keeps
    // its split when the corpus grows, the leakage-hygiene property a
    // re-rolled randomSplit cannot give.
    QueryDef("q128_split_assignment", (s, dir) => {
      Curation.assignSplits(t(s, dir, "documents"), "doc_id",
        Seq(("train", 90), ("val", 5), ("test", 5)))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("lo"), max("doc_id").as("hi"))
        .orderBy("split")
    }, Some(
      s"""WITH labeled AS (
         |  SELECT doc_id,
         |    CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |      ${duckHash60("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS h
         |    FROM documents))
         |SELECT split, count(*) AS n_docs, min(doc_id) AS lo, max(doc_id) AS hi
         |FROM labeled GROUP BY split ORDER BY split""".stripMargin)),

    // THE COMPOSED CURATION PIPELINE — quality gate → exact dedup → chunk
    // → leakage-free split assignment, the full preprocessing chain in ONE
    // declarative plan. Every stage is individually oracled elsewhere
    // (q61, q13, q137, q128); this entry proves they COMPOSE — column
    // contracts align, no stage materializes, and Catalyst plans the
    // whole chain as one job tree. Split assignment keys on doc_id (all
    // of a document's chunks land in one split — the anti-leakage
    // property a per-chunk split would violate). The oracle replays the
    // identical four stages in SQL; min/max chunk md5 per split pins the
    // exact chunk text, not just counts.
    QueryDef("q178_curation_pipeline", (s, dir) => {
      import graft.operators.{Curation, Dedup, TextAnalysis}
      val docs = t(s, dir, "documents")
      val q = TextAnalysis.qualityScore(docs, "doc_id", "text")
      val kept = docs.join(q, Seq("doc_id"))
        .filter(col("n_tok") >= 30 && col("punct_ratio") <= 0.1)
        .select(docs.columns.map(col).toIndexedSeq: _*)
      val keepers = Dedup.exactByContent(kept, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val deduped = kept.join(keepers, Seq("doc_id"))
      val chunks = TextAnalysis.chunkDocuments(deduped, "doc_id", "text",
        maxTokens = 64, overlap = 16)
      Curation.assignSplits(chunks, "doc_id",
        Seq(("train", 90), ("val", 5), ("test", 5)))
        .groupBy("split")
        .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_chunks"),
          sum("n_tokens").as("tot_tokens"),
          min(md5(col("chunk_text"))).as("chunk_md5_lo"),
          max(md5(col("chunk_text"))).as("chunk_md5_hi"))
        .orderBy("split")
    }, Some(
      s"""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents),
         |q AS (SELECT doc_id, CAST(len(t) AS INTEGER) AS n_tok,
         |  round(len(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) * 1.0 / len(text), 6) AS punct_ratio
         |  FROM toks JOIN documents USING (doc_id)),
         |kept AS (SELECT d.* FROM documents d JOIN q USING (doc_id)
         |  WHERE n_tok >= 30 AND punct_ratio <= 0.1),
         |keepers AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
         |dd AS (SELECT k.* FROM kept k JOIN keepers USING (doc_id)),
         |ct AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM dd),
         |c AS (SELECT doc_id, toks, len(toks) AS n,
         |  greatest(1, CAST(ceil((len(toks) - 16) / 48.0) AS INT)) AS nc FROM ct),
         |x AS (SELECT doc_id, array_to_string(list_slice(toks, i * 48 + 1, i * 48 + 64), ' ') AS chunk_text,
         |    CAST(least(64, n - i * 48) AS BIGINT) AS n_tokens
         |  FROM c, unnest(generate_series(0, nc - 1)) AS u(i)),
         |lab AS (SELECT *,
         |  CASE WHEN ${duckHash60("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'train'
         |       WHEN ${duckHash60("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 95 THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM x)
         |SELECT split, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
         |  CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
         |  min(md5(chunk_text)) AS chunk_md5_lo, max(md5(chunk_text)) AS chunk_md5_hi
         |FROM lab GROUP BY split ORDER BY split""".stripMargin))
  )
}
