package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions._
import graft.functions.HashFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operator add-ons over the LLM-pipeline core: banded SimHash, corpus
  * profiling (full and metadata-only), heavy hitters (global and
  * per-group), and the auto-salted skew join. */
object OperatorsExt {
  import RelationalSupport.t

  val defs: Seq[QueryDef] = Seq(
    // banded SimHash near-dup: 60 bits = 4 bands x 15; Hamming distance <= 3
    // pigeonholes at least one identical band, so candidate recall is exactly
    // 1 and the all-pairs oracle is equivalent — the LSH shape that replaces
    // q19's O(n^2) scan at scale.
    QueryDef("q57_simhash_banded", (s, dir) => {
      graft.operators.Dedup.simhashBandedPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy("a_id", "b_id")
    }, Some(
      s"""WITH ${DedupOps.SimhashSql}
         |SELECT a.doc_id a_id, b.doc_id b_id, CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hd
         |FROM simhash_t a JOIN simhash_t b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY a_id, b_id""".stripMargin)),

    // one-pass dataset profiling (nulls/distincts/min/max per column)
    QueryDef("q71_profile", (s, dir) => {
      graft.operators.Profiling.profile(
        t(s, dir, "customer"), Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
        .orderBy("col_name")
    }, Some(
      """SELECT * FROM (
        |  SELECT 'c_custkey' AS col_name, count(*) AS n_rows, count(*) - count(c_custkey) AS n_null,
        |    count(DISTINCT c_custkey) AS n_distinct, CAST(min(c_custkey) AS VARCHAR) AS min_val, CAST(max(c_custkey) AS VARCHAR) AS max_val FROM customer
        |  UNION ALL SELECT 'c_name', count(*), count(*) - count(c_name), count(DISTINCT c_name), min(c_name), max(c_name) FROM customer
        |  UNION ALL SELECT 'c_nationkey', count(*), count(*) - count(c_nationkey), count(DISTINCT c_nationkey), CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR) FROM customer
        |  UNION ALL SELECT 'c_mktsegment', count(*), count(*) - count(c_mktsegment), count(DISTINCT c_mktsegment), min(c_mktsegment), max(c_mktsegment) FROM customer)
        |ORDER BY col_name""".stripMargin)),

    // Exact corpus heavy hitters with distinct-count-independent shuffle
    // (Misra-Gries candidates + exact verify — operators/Frequency.scala).
    // The oracle is the naive full groupBy top-k, so a hash match proves
    // the two-pass plan is exact on this corpus, ties included.
    QueryDef("q92_heavy_hitters", (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(graft.functions.GraftFunctions.tokens(col("text"))).as("token"))
      graft.operators.Frequency.heavyHitters(toks, "token", k = 20, capacity = 8192)
    }, Some(
      """SELECT w AS item, count(*) AS cnt FROM (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) w FROM documents)
        |GROUP BY w ORDER BY cnt DESC, item LIMIT 20""".stripMargin)),

    // Per-group heavy hitters: top-10 tokens PER LANGUAGE with the same
    // bounded-shuffle two-pass as q92, stratified — the per-domain
    // vocabulary query. Oracle = full groupBy + rank window, so the hash
    // match proves per-group exactness, ties included.
    QueryDef("q99_heavy_hitters_by_group", (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("lang"), explode(graft.functions.GraftFunctions.tokens(col("text"))).as("token"))
      graft.operators.Frequency.heavyHittersByGroup(toks, "lang", "token", k = 10, capacity = 8192)
        .withColumnRenamed("g", "lang")
        .orderBy(col("lang"), desc("cnt"), asc("item"))
    }, Some(
      """WITH c AS (
        |  SELECT lang, w AS item, count(*) AS cnt FROM (
        |    SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) w FROM documents)
        |  GROUP BY 1, 2),
        |r AS (SELECT lang, item, cnt,
        |  row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, item) AS rk FROM c)
        |SELECT lang, item, cnt FROM r WHERE rk <= 10
        |ORDER BY lang, cnt DESC, item""".stripMargin)),

    // Metadata-only profiling: rows/nulls/min/max served entirely from the
    // published _STATS.json manifest — zero data pages read (the scan-free
    // complement of q71's exact profile). The oracle recomputes the same
    // statistics from the raw table, so a hash match proves the manifest
    // contents are exact, not just prune-safe.
    QueryDef("q97_stats_profile", (s, dir) => {
      val root = RelationalSupport.scratchDir(s, dir, "q97_statsprof")
      graft.sources.reftable.VersionedTable.publish(
        Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey"), root)
      graft.operators.Profiling.profileFromStats(s, root).orderBy("col_name")
    }, Some(
      """SELECT * FROM (
        |  SELECT 'c_custkey' AS col_name, count(*) AS n_rows,
        |    count(*) - count(c_custkey) AS n_null,
        |    CAST(min(c_custkey) AS VARCHAR) AS min_val,
        |    CAST(max(c_custkey) AS VARCHAR) AS max_val FROM customer
        |  UNION ALL
        |  SELECT 'c_nationkey', count(*), count(*) - count(c_nationkey),
        |    CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR)
        |  FROM customer)
        |ORDER BY col_name""".stripMargin)),

    // Auto-salted (partial-salting) join: hot keys detected by a
    // Misra-Gries pass fan out over the salt domain, cold keys join
    // untouched, and the result must be EXACTLY the plain inner join —
    // proven against the oracle running the plain join. On this uniform
    // data the detector simply nominates the top keys; equality is the
    // contract being tested.
    QueryDef("q96_skew_autosalt", (s, dir) => {
      val fact = t(s, dir, "orders").select(col("o_custkey").as("ck"), col("o_totalprice"))
      val dim = t(s, dir, "customer").select(col("c_custkey").as("ck"), col("c_mktsegment"))
      graft.operators.Skew.autoSaltedJoin(fact, dim, "ck", saltFactor = 8, hotShare = 0.01)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), r4(sum("o_totalprice")).as("total"))
        .orderBy("c_mktsegment")
    }, Some(
      """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 4) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
