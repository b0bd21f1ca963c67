package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions._
import graft.functions.HashFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second wave of SQL-surface coverage: exact percentiles, ordered array
  * aggregation, grouping sets, JSON extraction, as-of joins, wider
  * string/date functions, banded SimHash near-dup, and session windows.
  */
object Advanced {
  import RelationalSupport.t

  val defs: Seq[QueryDef] = Seq(
    // exact interpolated percentiles (Spark `percentile` == DuckDB quantile_cont)
    QueryDef("q50_percentiles", (s, dir) => {
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          r6(expr("percentile(value, 0.5)")).as("p50"),
          r6(expr("percentile(value, 0.9)")).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }, Some(
      """SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ordered array aggregation (sort_array fixes collect_list's order).
    // The array is canonicalized to its compact JSON text on BOTH sides:
    // the driver's comparator sorts/hashes cell values, which is undefined
    // for native array cells, and `[1,2,3]` renders identically from Spark
    // to_json and DuckDB to_json.
    QueryDef("q51_array_agg", (s, dir) => {
      t(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(to_json(sort_array(collect_list(col("c_custkey")))).as("custkeys"))
        .orderBy("c_nationkey")
    }, Some(
      """SELECT c_nationkey, CAST(to_json(list_sort(list(c_custkey))) AS VARCHAR) AS custkeys
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // GROUPING SETS beyond rollup
    QueryDef("q52_grouping_sets", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT coalesce(c_mktsegment, 'ALL') AS seg, coalesce(CAST(c_nationkey AS STRING), 'ALL') AS nk,
          |   count(*) AS n, round(sum(c_acctbal), 4) AS bal
          | FROM customer
          | GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
          | ORDER BY seg, nk""".stripMargin)
    }, Some(
      """SELECT coalesce(c_mktsegment, 'ALL') AS seg, coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nk,
        |   count(*) AS n, round(sum(c_acctbal), 4) AS bal
        | FROM customer
        | GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        | ORDER BY seg, nk""".stripMargin)),

    // JSON property extraction from the events payload
    QueryDef("q53_json_extract", (s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(min("k").as("min_k"), max("k").as("max_k"), r6(avg("k")).as("avg_k"))
        .orderBy("event_type")
    }, Some(
      """SELECT event_type, min(k) AS min_k, max(k) AS max_k, round(avg(k), 6) AS avg_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // as-of join: for each purchase, the latest prior click by the same user
    // (composed from an inequality join + window top-1 — SURVEY §7.3
    // preference (a): built-ins before custom operators).
    QueryDef("q54_asof_join", (s, dir) => {
      val ev = t(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id"), col("ts").as("c_ts"))
      val w = Window.partitionBy("p_id").orderBy(col("c_ts").desc, col("c_id").desc)
      p.join(c, Seq("user_id"))
        .filter(col("c_ts") <= col("p_ts"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("p_id"), col("c_id"))
        .orderBy("p_id")
    }, Some(
      """SELECT p_id, c_id FROM (
        |  SELECT p.event_id AS p_id, c.event_id AS c_id,
        |    row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON c.user_id = p.user_id AND c.ts <= p.ts)
        |WHERE rn = 1 ORDER BY p_id""".stripMargin)),

    // wider string functions: levenshtein, lpad, replace, split_part
    QueryDef("q55_string_funcs", (s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        levenshtein(col("p_brand"), col("p_type")).as("lev"),
        lpad(col("p_brand"), 12, "_").as("padded"),
        regexp_replace(col("p_type"), " ", "-").as("dashed"),
        split_part(col("p_type"), lit(" "), lit(1)).as("first_word"))
        .orderBy("p_partkey")
    }, Some(
      """SELECT p_partkey, levenshtein(p_brand, p_type) AS lev,
        |  lpad(p_brand, 12, '_') AS padded,
        |  replace(p_type, ' ', '-') AS dashed,
        |  split_part(p_type, ' ', 1) AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin)),

    // ISO weekday + ISO week bucketing (epoch seconds to avoid ts typing)
    QueryDef("q56_date_funcs", (s, dir) => {
      t(s, dir, "events")
        .groupBy(
          (weekday(col("ts")) + 1).as("isodow"),
          unix_timestamp(date_trunc("week", col("ts"))).as("week_s"))
        .agg(count(lit(1)).as("n"), r4(sum("value")).as("v"))
        .orderBy("week_s", "isodow")
    }, Some(
      """SELECT CAST(isodow(ts) AS INTEGER) AS isodow,
        |  CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS week_s,
        |  count(*) AS n, round(sum(value), 4) AS v
        |FROM events GROUP BY 1, 2 ORDER BY week_s, isodow""".stripMargin)),

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

    // DECIMAL decode through the reftable source: the query derives a
    // decimal table from `customer`, reads it back through the source's
    // vectorized path, and aggregates; the oracle computes the same result
    // from the original table. The decimal sum is emitted as BIGINT cents
    // (exact — zero tolerance in the compare) rather than as a DECIMAL
    // column: a DECIMAL output dtype surfaces as Python Decimal objects on
    // the parquet side but float64 on the DuckDB side of the gate's
    // comparator, hash-mismatching identical values (q73 was red in r02/r03
    // with rows+schema matching while a both-sides-DuckDB compare passed).
    QueryDef("q73_reftable_decimal", (s, dir) => {
      // per-invocation path: unique per (session, sf) so concurrent runs
      // never overwrite each other mid-read; overwritten on re-run within a
      // session rather than leaking one copy per invocation
      val out = RelationalSupport.scratchDir(s, dir, "q73_refdec")
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal").cast("decimal(12,2)").as("bal"),
          col("c_nationkey"))
        .write.mode("overwrite").parquet(out)
      s.read.format("reftable")
        .option("path", out)
        .option("schema", "c_custkey BIGINT, bal DECIMAL(12,2), c_nationkey INT")
        .load()
        .groupBy("c_nationkey")
        .agg(sum("bal").as("total_dec"), count(lit(1)).as("n"))
        // exact: sum of scale-2 decimals × 100 has a zero fractional part,
        // so the long cast loses nothing regardless of sign
        .select(col("c_nationkey"), (col("total_dec") * 100).cast("long").as("total_cents"),
          col("n"))
        .orderBy("c_nationkey")
    }, Some(
      """SELECT c_nationkey,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) * 100 AS BIGINT) AS total_cents,
        |  count(*) AS n
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // DATE decode through the reftable source, same round-trip pattern.
    QueryDef("q74_reftable_date", (s, dir) => {
      val out = RelationalSupport.scratchDir(s, dir, "q74_refdate")
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"))
        .write.mode("overwrite").parquet(out)
      s.read.format("reftable")
        .option("path", out)
        .option("schema", "o_orderkey BIGINT, od DATE")
        .load()
        .groupBy("od")
        .agg(count(lit(1)).as("n"), min("o_orderkey").as("first_key"))
        .orderBy("od")
    }, Some(
      """SELECT CAST(o_orderdate AS DATE) AS od, count(*) AS n, min(o_orderkey) AS first_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Hive-partitioned snapshot through the reftable source: the table is
    // written as c_mktsegment=<v> directories, the source decodes the
    // partition value from the path (constant vector, zero per-row cost)
    // and the IN filter prunes the listing to 2 of 5 directories on the
    // driver (PlanSpec asserts the pruning; this oracle proves the values).
    QueryDef("q80_reftable_partitioned", (s, dir) => {
      val out = RelationalSupport.scratchDir(s, dir, "q80_refpart")
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"), col("c_mktsegment"))
        .write.mode("overwrite").partitionBy("c_mktsegment").parquet(out)
      s.read.format("reftable")
        .option("path", out)
        .option("schema", "c_custkey BIGINT, c_acctbal DOUBLE, c_nationkey INT, c_mktsegment STRING")
        .option("partitionColumns", "c_mktsegment")
        .load()
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("n"), r4(sum("c_acctbal")).as("bal"))
        .orderBy("c_mktsegment", "c_nationkey")
    }, Some(
      """SELECT c_mktsegment, c_nationkey, count(*) AS n, round(sum(c_acctbal), 4) AS bal
        |FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // snapshot diff (key-level CDC between two table states): the "after"
    // state deterministically deletes keys ending in 3, renames keys ending
    // in 5, and inserts key+1000000 copies of keys ending in 7; the diff
    // must recover exactly those changes. The oracle replays the same diff
    // as a FULL OUTER JOIN in DuckDB.
    QueryDef("q81_snapshot_diff", (s, dir) => {
      val before = t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      val after = before
        .filter(col("c_custkey") % 10 =!= 3)
        .withColumn("c_name",
          when(col("c_custkey") % 10 === 5, concat(col("c_name"), lit("*")))
            .otherwise(col("c_name")))
        .unionByName(before.filter(col("c_custkey") % 10 === 7)
          .withColumn("c_custkey", col("c_custkey") + 1000000))
      graft.operators.SnapshotDiff.diff(before, after, Seq("c_custkey"))
        .orderBy("c_custkey", "change_type")
    }, Some(
      """WITH before_t AS (
        |  SELECT c_custkey, c_name, c_acctbal, c_nationkey FROM customer),
        |after_t AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 5 THEN c_name || '*' ELSE c_name END AS c_name,
        |    c_acctbal, c_nationkey
        |  FROM customer WHERE c_custkey % 10 <> 3
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, c_acctbal, c_nationkey
        |  FROM customer WHERE c_custkey % 10 = 7)
        |SELECT coalesce(b.c_custkey, a.c_custkey) AS c_custkey,
        |  CASE WHEN a.c_custkey IS NULL THEN b.c_name ELSE a.c_name END AS c_name,
        |  CASE WHEN a.c_custkey IS NULL THEN b.c_acctbal ELSE a.c_acctbal END AS c_acctbal,
        |  CASE WHEN a.c_custkey IS NULL THEN b.c_nationkey ELSE a.c_nationkey END AS c_nationkey,
        |  CASE WHEN b.c_custkey IS NULL THEN 'insert'
        |       WHEN a.c_custkey IS NULL THEN 'delete' ELSE 'update' END AS change_type
        |FROM before_t b FULL OUTER JOIN after_t a ON b.c_custkey = a.c_custkey
        |WHERE b.c_custkey IS NULL OR a.c_custkey IS NULL
        |   OR NOT (b.c_name IS NOT DISTINCT FROM a.c_name
        |       AND b.c_acctbal IS NOT DISTINCT FROM a.c_acctbal
        |       AND b.c_nationkey IS NOT DISTINCT FROM a.c_nationkey)
        |ORDER BY c_custkey, change_type""".stripMargin)),

    // bucketed co-located join: both fact tables written bucketBy(orderkey)
    // + sortBy, so the join needs NO exchange and NO sort on either side —
    // the shape that turns the biggest shuffle of a 100 TB star join into a
    // local merge (PlanSpec asserts the exchange-free join plan). The oracle
    // is the same join from the raw tables.
    QueryDef("q79_bucketed_join", (s, dir) => {
      val nb = 8
      // table names + paths carry the invocation tag: the metastore-visible
      // names race across concurrent invocations just like shared paths do
      val tag = RelationalSupport.scratchTag(s, dir)
      val ordersTbl = s"graft_b_orders_$tag"
      val lineitemTbl = s"graft_b_lineitem_$tag"
      s.sql(s"DROP TABLE IF EXISTS $ordersTbl")
      s.sql(s"DROP TABLE IF EXISTS $lineitemTbl")
      Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
        .write.bucketBy(nb, "o_orderkey").sortBy("o_orderkey")
        .option("path", RelationalSupport.scratchDir(s, dir, "q79_orders"))
        .mode("overwrite").saveAsTable(ordersTbl)
      Tables.load(s, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
        .write.bucketBy(nb, "l_orderkey").sortBy("l_orderkey")
        .option("path", RelationalSupport.scratchDir(s, dir, "q79_lineitem"))
        .mode("overwrite").saveAsTable(lineitemTbl)
      val o = s.table(ordersTbl)
      val l = s.table(lineitemTbl)
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("o_custkey")
        .agg(r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev"),
          count(lit(1)).as("n"))
        .orderBy("o_custkey")
    }, Some(
      """SELECT o_custkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS rev, count(*) AS n
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // versioned snapshot roots: two publishes, the read resolves the
    // atomic pointer to the CURRENT version only (old versions retained
    // for pinned readers — the snapshot-isolation layer plain parquet
    // overwrites lack). The oracle recomputes version 2's content.
    QueryDef("q88_versioned_snapshot", (s, dir) => {
      val root = RelationalSupport.scratchDir(s, dir, "q88_ver")
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal")
      graft.sources.reftable.VersionedTable.publish(c, root)
      graft.sources.reftable.VersionedTable.publish(
        c.filter(col("c_custkey") % 2 === 0)
          .withColumn("c_acctbal", r4(col("c_acctbal") * 2)), root)
      s.read.format("reftable")
        .option("path", root)
        .option("schema", "c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE")
        .load()
        .orderBy("c_custkey")
    }, Some(
      """SELECT c_custkey, c_name, round(c_acctbal * 2, 4) AS c_acctbal
        |FROM customer WHERE c_custkey % 2 = 0 ORDER BY c_custkey""".stripMargin)),

    // forward schema evolution through the reftable source: the table has
    // an old epoch written without o_totalprice and a new epoch with it;
    // allowMissingColumns null-fills the old files, and the aggregate
    // proves the fill (count of non-nulls, null-safe sum) matches the
    // oracle's CASE-based reconstruction.
    QueryDef("q89_schema_evolution", (s, dir) => {
      val out = RelationalSupport.scratchDir(s, dir, "q89_evolve")
      val o = Tables.load(s, dir, "orders")
      o.filter(col("o_orderkey") % 2 === 0).select("o_orderkey", "o_custkey")
        .write.mode("overwrite").parquet(out)
      o.filter(col("o_orderkey") % 2 === 1).select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("append").parquet(out)
      s.read.format("reftable")
        .option("path", out)
        .option("schema", "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE")
        .option("allowMissingColumns", "true")
        .load()
        .groupBy((col("o_orderkey") % 2).as("epoch"))
        .agg(count(lit(1)).as("n"), count(col("o_totalprice")).as("n_price"),
          r4(sum("o_totalprice")).as("tp"))
        .orderBy("epoch")
    }, Some(
      """SELECT o_orderkey % 2 AS epoch, count(*) AS n,
        |  count(CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice END) AS n_price,
        |  round(sum(CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice END), 4) AS tp
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // metadata-only aggregation through the reftable source: COUNT/MIN/MAX
    // are answered from parquet footer statistics (one partial row per
    // file, no data pages read — RefTableSourceSpec asserts the pushed
    // plan); the oracle computes the same aggregates from the raw table.
    QueryDef("q86_agg_pushdown", (s, dir) => {
      val out = RelationalSupport.scratchDir(s, dir, "q86_aggpd")
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), to_date(col("o_orderdate")).as("od"))
        .write.mode("overwrite").parquet(out)
      s.read.format("reftable")
        .option("path", out)
        .option("schema", "o_orderkey BIGINT, o_totalprice DOUBLE, od DATE")
        .load()
        .agg(count(lit(1)).as("n"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"),
          r4(min("o_totalprice")).as("min_tp"), r4(max("o_totalprice")).as("max_tp"),
          min("od").as("min_od"), max("od").as("max_od"))
    }, Some(
      """SELECT count(*) AS n,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  round(min(o_totalprice), 4) AS min_tp, round(max(o_totalprice), 4) AS max_tp,
        |  CAST(min(o_orderdate) AS DATE) AS min_od, CAST(max(o_orderdate) AS DATE) AS max_od
        |FROM orders""".stripMargin)),

    // bloom-filter semi-join reduction: the fact side is pre-filtered by a
    // Bloom filter of the selective dim side's keys (codegen'd
    // might_contain at the scan, before the join shuffle) — result must be
    // IDENTICAL to the plain join, which is exactly what the oracle checks.
    QueryDef("q82_bloom_join", (s, dir) => {
      val sel = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      val fact = t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_quantity")
      graft.operators.BloomJoin.prunedJoin(fact, sel, "l_orderkey", expectedItems = 100000L)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"), r4(sum("l_extendedprice")).as("rev"),
          r4(max("o_totalprice")).as("tp"))
        .orderBy("l_orderkey")
    }, Some(
      """SELECT l_orderkey, count(*) AS n, round(sum(l_extendedprice), 4) AS rev,
        |  round(max(o_totalprice), 4) AS tp
        |FROM lineitem JOIN (SELECT o_orderkey, o_totalprice FROM orders
        |                    WHERE o_totalprice > 400000) o ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // sliding event-time windows (30-minute window, 10-minute slide: every
    // event lands in exactly 3 windows). The oracle fans each row out to
    // its 3 window starts explicitly.
    QueryDef("q83_sliding_window", (s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"))
        .agg(count(lit(1)).as("n"), r4(sum("value")).as("v"))
        .select(unix_timestamp(col("w.start")).as("ws"), col("n"), col("v"))
        .orderBy("ws")
    }, Some(
      """SELECT ws, count(*) AS n, round(sum(value), 4) AS v FROM (
        |  SELECT CAST(floor(epoch(ts)/600)*600 - 600*k AS BIGINT) AS ws, value
        |  FROM events, UNNEST([0, 1, 2]) AS t(k))
        |GROUP BY ws ORDER BY ws""".stripMargin)),

    // window-function breadth: lag/lead/first_value + running sum in one pass
    QueryDef("q65_window_breadth", (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        lead("o_totalprice", 1).over(w).as("next_price"),
        first("o_orderkey").over(running).as("first_order"),
        r4(sum("o_totalprice").over(running)).as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }, Some(
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // format breadth: the same relation round-tripped through CSV and JSON
    // (Spark's other batch sources) must agree with the parquet oracle.
    QueryDef("q62_format_roundtrip", (s, dir) => {
      val out = RelationalSupport.scratchDir(s, dir, "q62_fmt")
      val nation = t(s, dir, "nation")
      nation.write.mode("overwrite").option("header", "true").csv(s"$out/csv")
      nation.write.mode("overwrite").json(s"$out/json")
      val fromCsv = s.read.option("header", "true")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT").csv(s"$out/csv")
        .select(col("n_nationkey"), col("n_name"), lit("csv").as("src"))
      val fromJson = s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .json(s"$out/json")
        .select(col("n_nationkey"), col("n_name"), lit("json").as("src"))
      fromCsv.unionAll(fromJson).orderBy("src", "n_nationkey")
    }, Some(
      """SELECT n_nationkey, n_name, src FROM (
        |  SELECT n_nationkey, n_name, 'csv' AS src FROM nation
        |  UNION ALL SELECT n_nationkey, n_name, 'json' AS src FROM nation)
        |ORDER BY src, n_nationkey""".stripMargin)),

    // ORC round-trip: Spark's other bundled columnar format must agree
    // with the parquet-derived oracle (q62 covers CSV/JSON; spark-avro is
    // not on this classpath).
    QueryDef("q90_orc_roundtrip", (s, dir) => {
      val out = RelationalSupport.scratchDir(s, dir, "q90_orc")
      Tables.load(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), r4(sum("s_acctbal")).as("bal"), min("s_name").as("first_name"))
        .orderBy("s_nationkey")
    }, Some(
      """SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 4) AS bal,
        |  min(s_name) AS first_name
        |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Data skipping: customer published range-clustered on c_acctbal into a
    // versioned root (which also writes the _STATS.json manifest), then read
    // back through the source under a selective range filter. The oracle
    // proves values; RefTableStatsSpec proves most files are never planned.
    // At 100 TB this is the difference between O(matching) and O(files)
    // tasks for a range query on the cluster key.
    QueryDef("q91_clustered_skip", (s, dir) => {
      val root = RelationalSupport.scratchDir(s, dir, "q91_cluster")
      graft.sources.reftable.VersionedTable.publishClustered(
        Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment")),
        root, Seq("c_acctbal"), numFiles = 8)
      s.read.format("reftable")
        .option("path", root)
        .option("schema", "c_custkey BIGINT, c_acctbal DOUBLE, c_mktsegment STRING")
        .load()
        .filter(col("c_acctbal") >= 0.0 && col("c_acctbal") < 1000.0)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), r4(sum("c_acctbal")).as("bal"),
          r4(min("c_acctbal")).as("lo"), r4(max("c_acctbal")).as("hi"))
        .orderBy("c_mktsegment")
    }, Some(
      """SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 4) AS bal,
        |  round(min(c_acctbal), 4) AS lo, round(max(c_acctbal), 4) AS hi
        |FROM customer WHERE c_acctbal >= 0 AND c_acctbal < 1000
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

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

    // Categorical skipping: documents published clustered by `lang`, the
    // manifest augmented with exact per-file value sets (strings can't use
    // truncatable min/max bounds), then read under a lang filter — the
    // lang='en'-style predicate every training-data pipeline runs. The
    // oracle proves values; RefTableStatsSpec proves files are skipped.
    QueryDef("q98_categorical_skip", (s, dir) => {
      val root = RelationalSupport.scratchDir(s, dir, "q98_cat")
      graft.sources.reftable.VersionedTable.publishClustered(
        t(s, dir, "documents").select("doc_id", "lang", "text"),
        root, Seq("lang"), numFiles = 4)
      val resolved = graft.sources.reftable.SnapshotFiles.resolveDir(
        root, None, new org.apache.hadoop.conf.Configuration())
      graft.sources.reftable.RefTableStats.augmentCategorical(s, resolved, Seq("lang"))
      s.read.format("reftable")
        .option("path", root)
        .option("schema", "doc_id BIGINT, lang STRING, text STRING")
        .load()
        .filter(col("lang").isin("en", "de"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), min("doc_id").as("first_doc"),
          max(length(col("text"))).as("max_len"))
        .orderBy("lang")
    }, Some(
      """SELECT lang, count(*) AS n, min(doc_id) AS first_doc,
        |  max(length(text)) AS max_len
        |FROM documents WHERE lang IN ('en', 'de')
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

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
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The write path end-to-end: INSERT OVERWRITE then INSERT-style append
    // publish versions of a reftable (never mutating files in place), and
    // the read-back aggregate must match the oracle's replay of the same
    // two writes. Each bench re-run overwrites first, so the state is
    // deterministic per invocation.
    QueryDef("q95_write_roundtrip", (s, dir) => {
      val root = RelationalSupport.scratchDir(s, dir, "q95_write")
      val ddl = "n_nationkey INT, n_name STRING, n_regionkey INT"
      val nation = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      nation.write.format("reftable").option("path", root).option("schema", ddl)
        .mode("overwrite").save()
      nation.filter(col("n_regionkey") === 0)
        .select((col("n_nationkey") + 100).as("n_nationkey"), col("n_name"),
          col("n_regionkey"))
        .write.format("reftable").option("path", root).option("schema", ddl)
        .mode("append").save()
      s.read.format("reftable").option("path", root).option("schema", ddl).load()
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), min("n_nationkey").as("lo"), max("n_nationkey").as("hi"))
        .orderBy("n_regionkey")
    }, Some(
      """WITH written AS (
        |  SELECT n_nationkey, n_name, n_regionkey FROM nation
        |  UNION ALL
        |  SELECT n_nationkey + 100, n_name, n_regionkey FROM nation WHERE n_regionkey = 0)
        |SELECT n_regionkey, count(*) AS n, min(n_nationkey) AS lo, max(n_nationkey) AS hi
        |FROM written GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Incremental view maintenance: the customer-balance-per-nation
    // aggregate is maintained from a change set (delete %10==3, bump
    // balance %10==5, re-nation %10==7, insert shifted copies of %10==9)
    // instead of recomputed — O(changes) work. The oracle aggregates the
    // replayed after-state DIRECTLY, so a hash match proves maintenance
    // converges to recompute, null/count bookkeeping included. Cents keep
    // the sums integral (no float-order drift between the two plans).
    QueryDef("q94_incremental_agg", (s, dir) => {
      import graft.operators.{IncrementalAgg, SnapshotDiff}
      val cents = (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
      val before = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), cents.as("cents"))
      val after = before
        .filter(col("c_custkey") % 10 =!= 3)
        .withColumn("cents",
          when(col("c_custkey") % 10 === 5, col("cents") + 10000L).otherwise(col("cents")))
        .withColumn("c_nationkey",
          when(col("c_custkey") % 10 === 7, (col("c_nationkey") + 1) % 25)
            .otherwise(col("c_nationkey")))
        .unionAll(before.filter(col("c_custkey") % 10 === 9)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            col("c_nationkey"), col("cents")))
      IncrementalAgg.maintain(
        IncrementalAgg.aggregate(before, Seq("c_nationkey"), Seq("cents")),
        SnapshotDiff.diffImages(before, after, Seq("c_custkey")),
        Seq("c_nationkey"), Seq("cents"))
        .orderBy("c_nationkey")
    }, Some(
      """WITH base AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM customer),
        |after AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 7 THEN (c_nationkey + 1) % 25 ELSE c_nationkey END AS c_nationkey,
        |    CASE WHEN c_custkey % 10 = 5 THEN cents + 10000 ELSE cents END AS cents
        |  FROM base WHERE c_custkey % 10 <> 3
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_nationkey, cents FROM base WHERE c_custkey % 10 = 9)
        |SELECT c_nationkey, CAST(sum(cents) AS BIGINT) AS sum_cents, count(cents) AS nn_cents,
        |  count(*) AS cnt
        |FROM after GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // Compaction as a publish: a deliberately fragmented 32-file version
    // is compacted to a handful of files (small-file explosion is the slow
    // death of frequently refreshed tables — every listing, footer read
    // and task launch scales with file count), and the read-back must be
    // value-identical to the oracle over the same rows. Round-3 specs
    // assert the mechanics (file counts, partitioned layouts, manifest
    // re-derivation); this entry puts the content equality under the gate.
    QueryDef("q110_compact", (s, dir) => {
      import graft.sources.reftable.VersionedTable
      val root = RelationalSupport.scratchDir(s, dir, "q110_compact")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      VersionedTable.publish(
        Tables.load(s, dir, "supplier")
          .select("s_suppkey", "s_nationkey", "s_acctbal").repartition(32),
        root)
      VersionedTable.compact(s, root, targetFileBytes = 512L * 1024 * 1024)
      s.read.format("reftable")
        .option("path", root)
        .option("schema", "s_suppkey BIGINT, s_nationkey INT, s_acctbal DOUBLE")
        .load()
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), r4(sum("s_acctbal")).as("bal"))
        .orderBy("s_nationkey")
    }, Some(
      """SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 4) AS bal
        |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The SQL-catalog surface end-to-end: CREATE TABLE in the DSv2
    // TableCatalog, INSERT from a real table, DELETE FROM routed through
    // the copy-on-write mutation, aggregate read back via SQL. The oracle
    // replays insert + delete logically. Catalog name is unique per
    // (invocation, sf) — catalog plugin instances are cached per session.
    QueryDef("q109_sql_catalog", (s, dir) => {
      val wh = RelationalSupport.scratchDir(s, dir, "q109_cat")
      val cat = "graftcat_" + RelationalSupport.scratchTag(s, dir)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.reftable.RefTableCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      s.sql(s"DROP TABLE IF EXISTS $cat.db.nat")
      s.sql(s"CREATE TABLE $cat.db.nat " +
        "(n_nationkey INT, n_name STRING, n_regionkey INT) USING reftable")
      Tables.registerAll(s, dir)
      s.sql(s"INSERT INTO $cat.db.nat " +
        "SELECT n_nationkey, n_name, n_regionkey FROM nation")
      s.sql(s"DELETE FROM $cat.db.nat WHERE n_regionkey = 2")
      s.sql(s"SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name " +
        s"FROM $cat.db.nat GROUP BY n_regionkey ORDER BY n_regionkey")
    }, Some(
      """SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
        |FROM nation WHERE n_regionkey <> 2
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bloom-filter file skipping end-to-end through the writer option: a
    // high-cardinality string key (min/max untrusted for strings, value
    // sets refuse unbounded domains) gets per-file Bloom filters at
    // publish; the point-lookup IN prunes to the one file that might hold
    // the present key and proves the absent one away. The oracle replays
    // the lookup over the raw table; the spec asserts the file counts.
    QueryDef("q120_bloom_skip", (s, dir) => {
      val root = RelationalSupport.scratchDir(s, dir, "q120_bloom")
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), concat(lit("ord_"), col("o_orderkey")).as("okey"),
          col("o_totalprice"))
        .write.format("reftable").option("path", root)
        .option("schema", "o_orderkey BIGINT, okey STRING, o_totalprice DOUBLE")
        .option("clusterBy", "o_orderkey").option("clusterFiles", "8")
        .option("bloomStats", "okey")
        .mode("overwrite").save()
      s.read.format("reftable").option("path", root)
        .option("schema", "o_orderkey BIGINT, okey STRING, o_totalprice DOUBLE").load()
        .filter(col("okey").isin("ord_7", "ord_1284", "ord_does_not_exist"))
        .agg(count(lit(1)).as("n"), r4(sum("o_totalprice")).as("total"),
          min("o_orderkey").as("lo"))
    }, Some(
      """SELECT count(*) AS n, round(sum(o_totalprice), 4) AS total,
        |  min(o_orderkey) AS lo
        |FROM orders
        |WHERE 'ord_' || CAST(o_orderkey AS VARCHAR) IN
        |  ('ord_7', 'ord_1284', 'ord_does_not_exist')""".stripMargin)),

    // Schema evolution through SQL DDL: ADD COLUMN evolves the catalog
    // descriptor (old files null-fill via allowMissingColumns), the next
    // INSERT carries the new column, and one SELECT reads both
    // generations. The oracle replays the column's late arrival as a CASE.
    QueryDef("q118_sql_evolution", (s, dir) => {
      val wh = RelationalSupport.scratchDir(s, dir, "q118_cat")
      val cat = "graftevo_" + RelationalSupport.scratchTag(s, dir)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.reftable.RefTableCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      s.sql(s"DROP TABLE IF EXISTS $cat.db.ev")
      s.sql(s"CREATE TABLE $cat.db.ev (n_nationkey INT, n_name STRING) USING reftable")
      Tables.registerAll(s, dir)
      s.sql(s"INSERT INTO $cat.db.ev " +
        "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey < 2")
      s.sql(s"ALTER TABLE $cat.db.ev ADD COLUMN region INT")
      s.sql(s"INSERT INTO $cat.db.ev " +
        "SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey >= 2")
      s.sql(s"SELECT coalesce(region, -1) AS region, count(*) AS n, " +
        s"min(n_name) AS first_name FROM $cat.db.ev GROUP BY 1 ORDER BY 1")
    }, Some(
      """SELECT coalesce(CASE WHEN n_regionkey >= 2 THEN n_regionkey END, -1) AS region,
        |  count(*) AS n, min(n_name) AS first_name
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SQL metadata tables (Iceberg-style $commits / $history): the commit
    // log and version history join through plain SQL, rows counted from
    // the stats manifests — zero data pages, driver-local scan. The oracle
    // replays the two INSERTs' lineage and row counts from `nation`.
    QueryDef("q119_sql_metadata", (s, dir) => {
      val wh = RelationalSupport.scratchDir(s, dir, "q119_cat")
      val cat = "graftmeta_" + RelationalSupport.scratchTag(s, dir)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.reftable.RefTableCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      s.sql(s"DROP TABLE IF EXISTS $cat.db.m")
      s.sql(s"CREATE TABLE $cat.db.m (n_nationkey INT, n_name STRING) USING reftable")
      Tables.registerAll(s, dir)
      s.sql(s"INSERT INTO $cat.db.m SELECT n_nationkey, n_name FROM nation")
      s.sql(s"INSERT INTO $cat.db.m " +
        "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0")
      s.sql(
        s"""SELECT c.seq, c.parent IS NULL AS is_root, h.n_rows, h.is_current
           |FROM $cat.db.`m$$commits` c
           |JOIN $cat.db.`m$$history` h ON h.version = c.version
           |ORDER BY c.seq""".stripMargin)
    }, Some(
      """SELECT CAST(1 AS BIGINT) AS seq, TRUE AS is_root,
        |  (SELECT count(*) FROM nation) AS n_rows, FALSE AS is_current
        |UNION ALL
        |SELECT 2, FALSE,
        |  (SELECT count(*) FROM nation) +
        |    (SELECT count(*) FROM nation WHERE n_regionkey = 0), TRUE
        |ORDER BY seq""".stripMargin)),

    // SQL UPDATE end-to-end: the analyzer rewrite (RefTableDmlRewrite)
    // turns the resolved UpdateTable plan into the file-granular COW
    // update. RHS expressions see the OLD row, per SQL; the oracle replays
    // the SET as a CASE.
    QueryDef("q116_sql_update", (s, dir) => {
      val root = RelationalSupport.scratchDir(s, dir, "q116_upd")
      val tbl = "graft_q116_" + RelationalSupport.scratchTag(s, dir)
      Tables.registerAll(s, dir)
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl USING reftable OPTIONS (path '$root', " +
        "schema 'c_custkey BIGINT, c_nationkey INT, cents BIGINT')")
      s.sql(s"INSERT OVERWRITE $tbl SELECT c_custkey, c_nationkey, " +
        "CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) FROM customer")
      s.sql(s"UPDATE $tbl SET cents = cents + 100 WHERE c_custkey % 10 = 3")
      s.sql(s"SELECT c_nationkey, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents " +
        s"FROM $tbl GROUP BY c_nationkey ORDER BY c_nationkey")
    }, Some(
      """WITH base AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM customer)
        |SELECT c_nationkey, count(*) AS cnt,
        |  CAST(sum(CASE WHEN c_custkey % 10 = 3 THEN cents + 100 ELSE cents END) AS BIGINT)
        |    AS sum_cents
        |FROM base GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // SQL MERGE INTO end-to-end: three clauses with conditions, a subquery
    // source with fresh keys, through the same analyzer rewrite into
    // mergeClauses. The oracle replays the clause logic as set operations.
    QueryDef("q117_sql_merge", (s, dir) => {
      val root = RelationalSupport.scratchDir(s, dir, "q117_mrg")
      val tbl = "graft_q117_" + RelationalSupport.scratchTag(s, dir)
      Tables.registerAll(s, dir)
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl USING reftable OPTIONS (path '$root', " +
        "schema 's_suppkey BIGINT, s_nationkey INT, cents BIGINT')")
      s.sql(s"INSERT OVERWRITE $tbl SELECT s_suppkey, s_nationkey, " +
        "CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) FROM supplier")
      s.sql(
        s"""MERGE INTO $tbl t USING (
           |  SELECT s_suppkey AS k, s_nationkey AS nk,
           |    CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
           |  FROM supplier
           |  UNION ALL
           |  SELECT -s_suppkey - 1000, s_nationkey, CAST(777 AS BIGINT)
           |  FROM supplier WHERE s_suppkey % 20 = 0
           |) s ON t.s_suppkey = s.k
           |WHEN MATCHED AND s.k % 7 = 0 THEN DELETE
           |WHEN MATCHED AND s.k % 7 <> 0 AND s.k <= 50 THEN UPDATE SET cents = s.c + 5
           |WHEN NOT MATCHED THEN INSERT (s_suppkey, s_nationkey, cents)
           |  VALUES (s.k, s.nk, s.c)""".stripMargin)
      s.sql(s"SELECT s_nationkey, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents, " +
        s"min(s_suppkey) AS lo FROM $tbl GROUP BY s_nationkey ORDER BY s_nationkey")
    }, Some(
      """WITH base AS (
        |  SELECT s_suppkey, s_nationkey,
        |    CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM supplier),
        |merged AS (
        |  SELECT s_suppkey, s_nationkey,
        |    CASE WHEN s_suppkey % 7 <> 0 AND s_suppkey <= 50 THEN cents + 5
        |      ELSE cents END AS cents
        |  FROM base WHERE s_suppkey % 7 <> 0
        |  UNION ALL
        |  SELECT -s_suppkey - 1000, s_nationkey, 777 FROM base WHERE s_suppkey % 20 = 0)
        |SELECT s_nationkey, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  min(s_suppkey) AS lo
        |FROM merged GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // Table maintenance surface: DESCRIBE HISTORY analogue. Two publishes
    // with deterministic layouts, then VersionedTable.history — file
    // counts from listings, row counts from the stats manifests, ZERO
    // data pages read (the versioned-table sibling of q97). The oracle
    // recomputes the expected rows from the same source table.
    QueryDef("q107_table_history", (s, dir) => {
      import graft.sources.reftable.VersionedTable
      val root = RelationalSupport.scratchDir(s, dir, "q107_hist")
      val nation = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      // fresh root per invocation tag, but bench re-runs reuse it: reset by
      // deleting and republishing so version count stays deterministic
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      VersionedTable.publish(nation.repartition(2), root)
      VersionedTable.publish(nation.filter(col("n_regionkey") < 2).repartition(1), root)
      VersionedTable.history(s, root)
        .select("version_idx", "n_files", "n_rows", "is_current")
        .orderBy("version_idx")
    }, Some(
      """SELECT 0 AS version_idx, 2 AS n_files,
        |  (SELECT count(*) FROM nation) AS n_rows, FALSE AS is_current
        |UNION ALL
        |SELECT 1, 1, (SELECT count(*) FROM nation WHERE n_regionkey < 2), TRUE
        |ORDER BY version_idx""".stripMargin)),

    // File-granular copy-on-write DELETE: orders published clustered on
    // o_totalprice, then a selective price-band delete — the stats
    // manifest decides which files MAY match, only those are rewritten,
    // the rest carry over by hard link (RefTableMutationsSpec asserts the
    // carried file names). The read-back must equal the oracle's
    // NOT-IS-TRUE replay (rows where the predicate is NULL survive).
    QueryDef("q102_delete_where", (s, dir) => {
      val root = RelationalSupport.scratchDir(s, dir, "q102_del")
      graft.sources.reftable.VersionedTable.publishClustered(
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        root, Seq("o_totalprice"), numFiles = 8)
      graft.sources.reftable.RefTableMutations.deleteWhere(
        s, root, col("o_totalprice") >= 100000.0 && col("o_totalprice") < 200000.0)
      s.read.format("reftable")
        .option("path", root)
        .option("schema", "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE")
        .load()
        .agg(count(lit(1)).as("n"), r4(sum("o_totalprice")).as("total"),
          min("o_orderkey").as("first_key"), max("o_orderkey").as("last_key"))
    }, Some(
      """SELECT count(*) AS n, round(sum(o_totalprice), 4) AS total,
        |  min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
        |FROM orders
        |WHERE NOT (o_totalprice >= 100000 AND o_totalprice < 200000)""".stripMargin)),

    // Keyed MERGE (upsert), file-granular: customers clustered by key,
    // then one batch of updates (low keys) + inserts (negative keys) —
    // the source key range keeps the upper files provably untouched, so
    // only overlapping files rewrite. The read-back must equal the
    // oracle's (base ANTI JOIN src) UNION src replay.
    QueryDef("q103_merge_upsert", (s, dir) => {
      import graft.sources.reftable.{RefTableMutations, VersionedTable}
      val root = RelationalSupport.scratchDir(s, dir, "q103_merge")
      val cents = (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), cents.as("cents"))
      VersionedTable.publishClustered(base, root, Seq("c_custkey"), numFiles = 8)
      val src = base.filter(col("c_custkey") <= 200)
        .withColumn("cents", col("cents") + 5000L)
        .unionAll(base.filter(col("c_custkey") % 100 === 0)
          .select((-col("c_custkey")).as("c_custkey"), col("c_nationkey"), col("cents")))
      RefTableMutations.upsert(s, root, src, Seq("c_custkey"))
      s.read.format("reftable")
        .option("path", root)
        .option("schema", "c_custkey BIGINT, c_nationkey INT, cents BIGINT")
        .load()
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"),
          min("c_custkey").as("lo_key"))
        .orderBy("c_nationkey")
    }, Some(
      """WITH base AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM customer),
        |src AS (
        |  SELECT c_custkey, c_nationkey, cents + 5000 AS cents FROM base WHERE c_custkey <= 200
        |  UNION ALL
        |  SELECT -c_custkey, c_nationkey, cents FROM base WHERE c_custkey % 100 = 0),
        |merged AS (
        |  SELECT * FROM src
        |  UNION ALL
        |  SELECT * FROM base WHERE c_custkey NOT IN (SELECT c_custkey FROM src))
        |SELECT c_nationkey, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  min(c_custkey) AS lo_key
        |FROM merged GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // Full MERGE with all three clauses, CDC-shaped: one source feed
    // carries updates, deletes and inserts distinguished by an op marker
    // column that is NOT part of the table schema — the clause conditions
    // evaluate over the source row, so the marker drives the merge and
    // never lands in the table. The oracle replays the three clauses as
    // explicit set operations.
    QueryDef("q112_merge_clauses", (s, dir) => {
      import graft.sources.reftable.{RefTableMutations, VersionedTable}
      val root = RelationalSupport.scratchDir(s, dir, "q112_merge")
      val cents = (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), cents.as("cents"))
      VersionedTable.publishClustered(base, root, Seq("c_custkey"), numFiles = 8)
      val src = base
        .filter(col("c_custkey") <= 150 && col("c_custkey") % 7 =!= 0)
        .withColumn("cents", col("cents") + 1000L).withColumn("op", lit("u"))
        .unionAll(base.filter(col("c_custkey") % 7 === 0).withColumn("op", lit("d")))
        // custkey 0 would negate to itself and collide with its 'd' row,
        // breaking the source key-uniqueness contract
        .unionAll(base.filter(col("c_custkey") % 50 === 0 && col("c_custkey") > 0)
          .select((-col("c_custkey")).as("c_custkey"), col("c_nationkey"),
            col("cents"), lit("i").as("op")))
      RefTableMutations.merge(s, root, src, Seq("c_custkey"),
        matchedUpdate = Some(col("op") === "u"),
        matchedDelete = Some(col("op") === "d"),
        notMatchedInsert = Some(col("op") =!= "d"))
      s.read.format("reftable")
        .option("path", root)
        .option("schema", "c_custkey BIGINT, c_nationkey INT, cents BIGINT")
        .load()
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"),
          min("c_custkey").as("lo_key"), max("c_custkey").as("hi_key"))
        .orderBy("c_nationkey")
    }, Some(
      """WITH base AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM customer),
        |src AS (
        |  SELECT c_custkey, c_nationkey, cents + 1000 AS cents, 'u' AS op
        |  FROM base WHERE c_custkey <= 150 AND c_custkey % 7 <> 0
        |  UNION ALL
        |  SELECT c_custkey, c_nationkey, cents, 'd' FROM base WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT -c_custkey, c_nationkey, cents, 'i' FROM base
        |  WHERE c_custkey % 50 = 0 AND c_custkey > 0),
        |merged AS (
        |  SELECT c_custkey, c_nationkey, cents FROM base
        |  WHERE c_custkey NOT IN (SELECT c_custkey FROM src WHERE op IN ('u', 'd'))
        |  UNION ALL
        |  SELECT s.c_custkey, s.c_nationkey, s.cents
        |  FROM src s JOIN base b USING (c_custkey) WHERE s.op = 'u'
        |  UNION ALL
        |  SELECT s.c_custkey, s.c_nationkey, s.cents FROM src s
        |  WHERE s.op <> 'd' AND s.c_custkey NOT IN (SELECT c_custkey FROM base))
        |SELECT c_nationkey, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  min(c_custkey) AS lo_key, max(c_custkey) AS hi_key
        |FROM merged GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // Changefeed REPLICATION end-to-end: two versions of a source table,
    // VersionedTable.changes reads the delta off the commit history, and
    // applyChanges replays it onto a replica seeded with the old state —
    // the replica must equal the new state exactly. The oracle computes
    // the new state directly; a hash match proves the
    // diff → merge(update/delete/insert) loop loses and invents nothing.
    QueryDef("q113_changefeed_apply", (s, dir) => {
      import graft.sources.reftable.{RefTableMutations, VersionedTable}
      val rootA = RelationalSupport.scratchDir(s, dir, "q113_src")
      val rootB = RelationalSupport.scratchDir(s, dir, "q113_rep")
      val cents = (col("s_acctbal").cast("decimal(12,2)") * 100).cast("long")
      val state1 = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"), cents.as("cents"))
      val state2 = state1.filter(col("s_suppkey") % 10 =!= 0)
        .withColumn("cents",
          when(col("s_suppkey") % 3 === 0, col("cents") + 7L).otherwise(col("cents")))
        .unionAll(state1.filter(col("s_suppkey") % 25 === 0)
          .select((-col("s_suppkey")).as("s_suppkey"), col("s_nationkey"), col("cents")))
      val v1 = VersionedTable.publish(state1, rootA)
      VersionedTable.publish(state2, rootA)
      val changes = VersionedTable.changes(s, rootA, Seq("s_suppkey"), v1)
      VersionedTable.publish(state1, rootB) // replica starts at the old state
      RefTableMutations.applyChanges(s, rootB, changes, Seq("s_suppkey"))
      s.read.format("reftable")
        .option("path", rootB)
        .option("schema", "s_suppkey BIGINT, s_nationkey INT, cents BIGINT")
        .load()
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"),
          min("s_suppkey").as("lo_key"))
        .orderBy("s_nationkey")
    }, Some(
      """WITH base AS (
        |  SELECT s_suppkey, s_nationkey,
        |    CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM supplier),
        |state2 AS (
        |  SELECT s_suppkey, s_nationkey,
        |    CASE WHEN s_suppkey % 3 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM base WHERE s_suppkey % 10 <> 0
        |  UNION ALL
        |  SELECT -s_suppkey, s_nationkey, cents FROM base WHERE s_suppkey % 25 = 0)
        |SELECT s_nationkey, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  min(s_suppkey) AS lo_key
        |FROM state2 GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // COW mutations on a Hive-PARTITIONED versioned layout: DELETE narrowed
    // by the partition predicate (only the matching partition's files
    // rewrite; every other partition rides the manifest by reference), then
    // a keyed upsert that moves rows into a brand-new partition directory.
    // The partitioned read path must see the post-mutation state exactly.
    QueryDef("q122_partitioned_mutations", (s, dir) => {
      import graft.sources.reftable.{RefTableMutations, VersionedTable}
      val root = RelationalSupport.scratchDir(s, dir, "q122_pmut")
      val cents = (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), cents.as("cents"))
      VersionedTable.publishPartitioned(base, root, Seq("c_mktsegment"))
      RefTableMutations.deleteWhere(s, root,
        col("c_mktsegment") === "BUILDING" && col("cents") < 0L,
        partitionColumns = Seq("c_mktsegment"))
      val src = base.filter(col("c_custkey") % 500 === 0)
        .select(col("c_custkey"), lit("MOVED").as("c_mktsegment"),
          (col("cents") + 1L).as("cents"))
      RefTableMutations.upsert(s, root, src, Seq("c_custkey"),
        partitionColumns = Seq("c_mktsegment"))
      s.read.format("reftable")
        .option("path", root)
        .option("schema", "c_custkey BIGINT, c_mktsegment STRING, cents BIGINT")
        .option("partitionColumns", "c_mktsegment").load()
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"),
          min("c_custkey").as("lo_key"))
        .orderBy("c_mktsegment")
    }, Some(
      """WITH base AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM customer),
        |afterdel AS (
        |  SELECT * FROM base WHERE NOT (c_mktsegment = 'BUILDING' AND cents < 0)),
        |src AS (
        |  SELECT c_custkey, 'MOVED' AS c_mktsegment, cents + 1 AS cents
        |  FROM base WHERE c_custkey % 500 = 0),
        |merged AS (
        |  SELECT * FROM src
        |  UNION ALL
        |  SELECT * FROM afterdel WHERE c_custkey NOT IN (SELECT c_custkey FROM src))
        |SELECT c_mktsegment, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  min(c_custkey) AS lo_key
        |FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // SQL DML over a PARTITIONED catalog table end-to-end: the analyzer
    // rewrite and SupportsDelete thread the declared partitionColumns into
    // the COW mutations — DELETE pruned by partition value, UPDATE that
    // migrates rows across partition directories, MERGE inserting into a
    // partition that did not exist before the statement.
    QueryDef("q123_sql_dml_partitioned", (s, dir) => {
      val root = RelationalSupport.scratchDir(s, dir, "q123_pdml")
      val tbl = "graft_q123_" + RelationalSupport.scratchTag(s, dir)
      Tables.registerAll(s, dir)
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      s.sql(s"CREATE TABLE $tbl USING reftable OPTIONS (path '$root', " +
        "schema 's_suppkey BIGINT, s_nationkey INT, cents BIGINT', " +
        "partitionColumns 's_nationkey')")
      s.sql(s"INSERT OVERWRITE $tbl SELECT s_suppkey, s_nationkey, " +
        "CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) FROM supplier")
      s.sql(s"DELETE FROM $tbl WHERE s_nationkey = 3 AND cents < 0")
      s.sql(s"UPDATE $tbl SET s_nationkey = 77 WHERE s_nationkey = 7 AND s_suppkey % 2 = 0")
      s.sql(
        s"""MERGE INTO $tbl t USING (
           |  SELECT s_suppkey AS k, CAST(99 AS INT) AS nk, CAST(555 AS BIGINT) AS c
           |  FROM supplier WHERE s_suppkey % 100 = 0
           |) s ON t.s_suppkey = s.k
           |WHEN MATCHED THEN UPDATE SET cents = s.c
           |WHEN NOT MATCHED THEN INSERT (s_suppkey, s_nationkey, cents)
           |  VALUES (s.k, s.nk, s.c)""".stripMargin)
      s.sql(s"SELECT s_nationkey, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents " +
        s"FROM $tbl GROUP BY s_nationkey ORDER BY s_nationkey")
    }, Some(
      """WITH base AS (
        |  SELECT s_suppkey, s_nationkey,
        |    CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM supplier),
        |afterdel AS (
        |  SELECT * FROM base WHERE NOT (s_nationkey = 3 AND cents < 0)),
        |afterupd AS (
        |  SELECT s_suppkey,
        |    CASE WHEN s_nationkey = 7 AND s_suppkey % 2 = 0 THEN 77
        |      ELSE s_nationkey END AS s_nationkey,
        |    cents
        |  FROM afterdel),
        |merged AS (
        |  SELECT s_suppkey, s_nationkey,
        |    CASE WHEN s_suppkey % 100 = 0 THEN 555 ELSE cents END AS cents
        |  FROM afterupd
        |  UNION ALL
        |  SELECT s_suppkey, 99, 555 FROM base
        |  WHERE s_suppkey % 100 = 0
        |    AND s_suppkey NOT IN (SELECT s_suppkey FROM afterupd))
        |SELECT s_nationkey, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM merged GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // Hash-bucketed layout + scattered-key upsert: keys spread across the
    // whole range defeat [min,max] narrowing (every file's range overlaps)
    // but bucket narrowing rewrites only pmod(hash(key), n) buckets — the
    // CDC point-update shape. The oracle replays (base ANTI src) ∪ src.
    QueryDef("q127_bucketed_upsert", (s, dir) => {
      import graft.sources.reftable.{RefTableMutations, VersionedTable}
      val root = RelationalSupport.scratchDir(s, dir, "q127_bkt")
      val cents = (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), cents.as("cents"))
      VersionedTable.publishBucketed(base, root, Seq("c_custkey"), nBuckets = 16)
      // every 97th key: scattered across the whole key range by design
      val src = base.filter(col("c_custkey") % 97 === 0)
        .withColumn("cents", col("cents") + 11L)
      RefTableMutations.upsert(s, root, src, Seq("c_custkey"))
      s.read.format("reftable")
        .option("path", root)
        .option("schema", "c_custkey BIGINT, c_nationkey INT, cents BIGINT")
        .load()
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"),
          min("c_custkey").as("lo_key"))
        .orderBy("c_nationkey")
    }, Some(
      """WITH base AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM customer),
        |merged AS (
        |  SELECT c_custkey, c_nationkey,
        |    CASE WHEN c_custkey % 97 = 0 THEN cents + 11 ELSE cents END AS cents
        |  FROM base)
        |SELECT c_nationkey, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  min(c_custkey) AS lo_key
        |FROM merged GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // The layout-maintenance loop end-to-end: a clustered publish declares
    // its layout, append churn degrades it (full-range files), maintain()
    // detects the degradation from storage signals and re-clusters. The
    // oracle pins BOTH value identity across the restoring publish AND
    // the decision itself ('recluster' as a literal column).
    QueryDef("q133_maintenance", (s, dir) => {
      import graft.sources.reftable.{RefTableMaintenance, VersionedTable}
      val root = RelationalSupport.scratchDir(s, dir, "q133_maint")
      val ddl = "c_custkey BIGINT, c_nationkey INT, cents BIGINT"
      val cents = (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), cents.as("cents"))
      VersionedTable.publishClustered(base, root, Seq("c_custkey"), numFiles = 8)
      // churn: each appended batch is ONE file spanning ~the whole key range
      for (m <- Seq(1, 2))
        base.filter(col("c_custkey") % 100 === m).withColumn("cents", lit(0L))
          .coalesce(1).write.format("reftable")
          .option("path", root).option("schema", ddl).mode("append").save()
      val d = RefTableMaintenance.maintain(s, root, targetFileBytes = 64 * 1024)
      s.read.format("reftable").option("path", root).option("schema", ddl).load()
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"))
        .withColumn("action", lit(d.action))
        .orderBy("c_nationkey")
    }, Some(
      """WITH base AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM customer),
        |unioned AS (
        |  SELECT * FROM base
        |  UNION ALL SELECT c_custkey, c_nationkey, CAST(0 AS BIGINT) FROM base
        |  WHERE c_custkey % 100 IN (1, 2))
        |SELECT c_nationkey, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  'recluster' AS action
        |FROM unioned GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // Dynamic partition overwrite end-to-end (the daily-backfill shape):
    // INSERT OVERWRITE with partitionOverwriteMode=dynamic replaces
    // exactly the partitions present in the written data — one segment
    // re-derived with a transform, plus a brand-new segment — carrying
    // every other partition by manifest reference, O(touched partitions).
    QueryDef("q125_dynamic_overwrite", (s, dir) => {
      val root = RelationalSupport.scratchDir(s, dir, "q125_dynov")
      val pddl = "c_custkey BIGINT, c_mktsegment STRING, cents BIGINT"
      val cents = (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), cents.as("cents"))
      def w(df: org.apache.spark.sql.DataFrame, dynamic: Boolean) = {
        val wr = df.write.format("reftable")
          .option("path", root).option("schema", pddl)
          .option("partitionColumns", "c_mktsegment").mode("overwrite")
        (if (dynamic) wr.option("partitionOverwriteMode", "dynamic") else wr).save()
      }
      w(base, dynamic = false)
      // backfill: BUILDING re-derived (negated balances, odd keys only) and
      // a fresh AUDIT segment from the hot keys
      w(base.filter(col("c_mktsegment") === "BUILDING" && col("c_custkey") % 2 === 1)
        .select(col("c_custkey"), col("c_mktsegment"), (-col("cents")).as("cents"))
        .unionAll(base.filter(col("c_custkey") % 1000 === 0)
          .select(col("c_custkey"), lit("AUDIT").as("c_mktsegment"), col("cents"))),
        dynamic = true)
      s.read.format("reftable")
        .option("path", root).option("schema", pddl)
        .option("partitionColumns", "c_mktsegment").load()
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"),
          min("c_custkey").as("lo_key"))
        .orderBy("c_mktsegment")
    }, Some(
      """WITH base AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM customer),
        |final AS (
        |  SELECT * FROM base WHERE c_mktsegment NOT IN ('BUILDING', 'AUDIT')
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, -cents FROM base
        |  WHERE c_mktsegment = 'BUILDING' AND c_custkey % 2 = 1
        |  UNION ALL
        |  SELECT c_custkey, 'AUDIT', cents FROM base WHERE c_custkey % 1000 = 0)
        |SELECT c_mktsegment, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  min(c_custkey) AS lo_key
        |FROM final GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Manifest-chain endurance end-to-end: 40 successive single-key
    // upserts build a 40-deep mutation chain that CROSSES the
    // MaxChainDepth=32 materialization boundary (the writer re-lists
    // everything once, bounding every later resolution), then the final
    // state AND a VERSION AS OF pinned mid-chain read back through the
    // manifest-resolving listing. keepVersions retains the whole chain so
    // the pinned version's hop path stays intact.
    QueryDef("q124_manifest_chain", (s, dir) => {
      import graft.sources.reftable.{RefTableMutations, VersionedTable}
      val root = RelationalSupport.scratchDir(s, dir, "q124_chain")
      val ddl = "n_nationkey BIGINT, v BIGINT"
      // the 41-commit chain builds ONCE per invocation (the scratch root is
      // per (invocation, sf)): the bench's cold pass pays the 40 sequential
      // commit round-trips — an honest mutation-throughput figure — while
      // the warm pass measures what actually needs regression-tracking at
      // scale, resolving READS through the deep manifest chain
      val conf = new org.apache.hadoop.conf.Configuration()
      val log = if (VersionedTable.resolve(root, conf).isEmpty) Nil
        else VersionedTable.commitLog(root, conf)
      var vMid: String = if (log.size >= 41) log(20).version else null
      if (vMid == null) {
        val base = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").cast("long").as("n_nationkey"),
            col("n_regionkey").cast("long").as("v"))
        VersionedTable.publish(base, root, keepVersions = 50)
        (1 to 40).foreach { i =>
          val src = s.range(1).select(
            lit((i % 25).toLong).as("n_nationkey"), lit(1000L * i).as("v"))
          val v = RefTableMutations.upsert(s, root, src, Seq("n_nationkey"),
            keepVersions = 50)
          if (i == 20) vMid = v
        }
      }
      def read(version: Option[String], state: String) = {
        val r = s.read.format("reftable").option("path", root).option("schema", ddl)
        version.foreach(v => r.option("version", v))
        r.load().select(lit(state).as("state"), col("n_nationkey"), col("v"))
      }
      read(Some(vMid), "mid").unionAll(read(None, "final"))
        .orderBy("state", "n_nationkey")
    }, Some(
      """WITH states AS (
        |  SELECT 'mid' AS state, n_nationkey,
        |    CASE WHEN n_nationkey BETWEEN 1 AND 20 THEN 1000 * n_nationkey
        |      ELSE n_regionkey END AS v
        |  FROM nation
        |  UNION ALL
        |  SELECT 'final', n_nationkey,
        |    CASE WHEN n_nationkey BETWEEN 1 AND 15 THEN 1000 * (n_nationkey + 25)
        |      WHEN n_nationkey BETWEEN 16 AND 24 THEN 1000 * n_nationkey
        |      ELSE 25000 END
        |  FROM nation)
        |SELECT state, CAST(n_nationkey AS BIGINT) AS n_nationkey, CAST(v AS BIGINT) AS v
        |FROM states ORDER BY state, n_nationkey""".stripMargin)),

    // Changefeed-maintained aggregate over the WRITE PATH end-to-end: three
    // INSERTs publish three versions of a reftable; the per-nation balance
    // aggregate is advanced version-to-version from
    // VersionedTable.changesImages (O(changes) per step — q94 drives the
    // same maintenance from a synthetic diff) and must equal the oracle's
    // direct recompute of the FINAL table state, null/count bookkeeping
    // included. changesImages resolves version paths eagerly at call time,
    // so each maintenance step reads exactly the (from, to) pair it names.
    QueryDef("q101_changefeed_agg", (s, dir) => {
      import graft.operators.IncrementalAgg
      import graft.sources.reftable.VersionedTable
      val root = RelationalSupport.scratchDir(s, dir, "q101_cf")
      val ddl = "c_custkey BIGINT, c_nationkey INT, cents BIGINT"
      val cents = (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), cents.as("cents"))
      def write(part: Int, mode: String): Unit =
        base.filter(col("c_custkey") % 3 === part)
          .write.format("reftable").option("path", root).option("schema", ddl)
          .mode(mode).save()
      write(0, "overwrite") // fresh state per invocation (bench re-runs)
      val v1 = VersionedTable.versionDirs(root).last
      val agg1 = IncrementalAgg.aggregate(
        s.read.format("reftable").option("path", root).option("schema", ddl)
          .option("version", v1).load(),
        Seq("c_nationkey"), Seq("cents"))
      write(1, "append")
      val v2 = VersionedTable.versionDirs(root).last
      val agg2 = IncrementalAgg.maintain(agg1,
        VersionedTable.changesImages(s, root, Seq("c_custkey"), v1),
        Seq("c_nationkey"), Seq("cents"))
      write(2, "append")
      val agg3 = IncrementalAgg.maintain(agg2,
        VersionedTable.changesImages(s, root, Seq("c_custkey"), v2),
        Seq("c_nationkey"), Seq("cents"))
      agg3.orderBy("c_nationkey")
    }, Some(
      """WITH base AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM customer)
        |SELECT c_nationkey, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  count(cents) AS nn_cents, count(*) AS cnt
        |FROM base GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // Z-order layout: orders published Morton-clustered on (o_custkey,
    // o_totalprice), read back under a box filter on BOTH dimensions. The
    // oracle proves values; RefTableStatsSpec proves a lexicographic
    // layout cannot prune the trailing dimension while z-order prunes all.
    QueryDef("q93_zorder_skip", (s, dir) => {
      val root = RelationalSupport.scratchDir(s, dir, "q93_zorder")
      graft.sources.reftable.VersionedTable.publishZOrdered(
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        root, Seq("o_custkey", "o_totalprice"), numFiles = 8)
      s.read.format("reftable")
        .option("path", root)
        .option("schema", "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE")
        .load()
        .filter(col("o_custkey") < 300 && col("o_totalprice") >= 50000.0 &&
          col("o_totalprice") < 150000.0)
        .agg(count(lit(1)).as("n"), r4(sum("o_totalprice")).as("total"),
          min("o_orderkey").as("first_key"), max("o_orderkey").as("last_key"))
    }, Some(
      """SELECT count(*) AS n, round(sum(o_totalprice), 4) AS total,
        |  min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
        |FROM orders
        |WHERE o_custkey < 300 AND o_totalprice >= 50000 AND o_totalprice < 150000""".stripMargin)),

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

    // SQL-registered kernel functions: the same simhash through spark.sql
    QueryDef("q63_sql_functions", (s, dir) => {
      graft.functions.Registry.registerAll(s)
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT doc_id, graft_simhash60(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS simhash
          |FROM documents WHERE size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) > 0
          |ORDER BY doc_id""".stripMargin)
    }, Some(s"WITH ${DedupOps.SimhashSql} SELECT doc_id, simhash FROM simhash_t ORDER BY doc_id")),

    // session windows: per-user sessions with a 30-minute inactivity gap
    // (Spark session_window vs a gaps-and-islands oracle; microsecond
    // precision on both sides).
    QueryDef("q58_session_window", (s, dir) => {
      graft.operators.Sessionize.batch(t(s, dir, "events"), "user_id", "ts", "value", "30 minutes")
        .orderBy("user_id", "start_us")
    }, Some(
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
        |  count(*) AS n_events, round(sum(value), 4) AS v
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin))
  )
}
