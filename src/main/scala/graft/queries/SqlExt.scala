package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions._
import graft.functions.HashFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wider SQL-surface coverage: exact percentiles, ordered array aggregation,
  * grouping sets, JSON extraction, as-of joins, string/date function
  * breadth, window shapes, SQL-registered kernel functions, and session
  * windows. */
object SqlExt {
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
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin)),

    // static-list PIVOT: revenue by nation × order-year. Declaring the
    // pivot value list keeps the plan a SINGLE hash aggregate whose row
    // is one column per listed year — no collect-distinct driver job, no
    // second pass, and the width is O(listed values) no matter the data
    // size. The dims broadcast; the only shuffle is the final per-nation
    // aggregate. DuckDB oracle: conditional aggregation, the relational
    // rendering of the same contract (NULL where a nation has no orders
    // in a year, on both sides).
    QueryDef("q147_pivot", (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val yrs = (1995 to 2001).toSeq
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .select(col("n_name"), year(col("o_orderdate")).as("yr"), col("o_totalprice"))
        .groupBy("n_name")
        .pivot("yr", yrs)
        .agg(r4(sum("o_totalprice")))
        .select(col("n_name") +: yrs.map(y => col(s"`$y`").as(s"y$y")): _*)
        .orderBy("n_name")
    }, Some {
      val conds = (1995 to 2001).map(y =>
        s"round(sum(CASE WHEN year(o_orderdate) = $y THEN o_totalprice END), 4) AS y$y")
      s"""SELECT n_name, ${conds.mkString(",\n  ")}
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin
    }),

    // UNPIVOT (melt): per-priority metrics wide → long via the native
    // Dataset.unpivot — an Expand (row generator) node, zero shuffles
    // beyond the feeding aggregate, output 3× the (tiny) wide row count.
    QueryDef("q148_unpivot", (s, dir) => {
      val wide = t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("double").as("n_orders"),
          r4(sum("o_totalprice")).as("revenue"),
          r4(avg("o_totalprice")).as("avg_price"))
      wide.unpivot(Array(col("o_orderpriority")),
          Array(col("n_orders"), col("revenue"), col("avg_price")),
          "metric", "val")
        .orderBy("o_orderpriority", "metric")
    }, Some(
      """WITH w AS (SELECT o_orderpriority,
        |    CAST(count(*) AS DOUBLE) AS n_orders,
        |    round(sum(o_totalprice), 4) AS revenue,
        |    round(avg(o_totalprice), 4) AS avg_price
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, metric, val FROM (
        |  SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS val FROM w
        |  UNION ALL SELECT o_orderpriority, 'revenue', revenue FROM w
        |  UNION ALL SELECT o_orderpriority, 'avg_price', avg_price FROM w)
        |ORDER BY o_orderpriority, metric""".stripMargin)),

    // Mergeable sketch columns — the pre-aggregated-sketch-table pattern:
    // one Datasketches HLL per (year, quarter) stored as a binary column,
    // then quarters MERGED per year with hll_union_agg and estimated.
    // This is how a 100 TB warehouse serves distinct counts: sketches are
    // built once at ingest partition granularity (a narrow pass), and any
    // coarser rollup is a union of O(groups) few-KB sketches — the raw
    // keys are never re-shuffled. Gate: the lgK=12 estimate must land
    // within 5% of the exact per-year distinct (rel. std. error ≈1.6%),
    // q35-style boolean oracle.
    QueryDef("q149_hll_union", (s, dir) => {
      val o = t(s, dir, "orders")
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          quarter(col("o_orderdate")).as("qtr"), col("o_custkey"))
      val sketches = o.groupBy("yr", "qtr")
        .agg(hll_sketch_agg(col("o_custkey"), 12).as("sk"))
      val merged = sketches.groupBy("yr")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), allowDifferentLgConfigK = false)).as("est"))
      val exact = o.groupBy("yr").agg(countDistinct(col("o_custkey")).as("exact"))
      merged.join(exact, "yr")
        .select(col("yr"),
          (abs(col("est") - col("exact")) / col("exact") <= 0.05).as("ok"))
        .orderBy("yr")
    }, Some(
      "SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS yr, TRUE AS ok FROM orders ORDER BY yr")),

    // Mergeable QUANTILE sketch columns — the q149 pattern for percentiles:
    // one KLL sketch of o_totalprice per (year, quarter) stored as BINARY
    // (graft's KllSketchAgg TypedImperativeAggregate — Spark 4 ships the
    // HLL family but no mergeable quantile sketch column), then quarters
    // MERGED per year with kll_merge_agg and the median / p95 extracted
    // from the merged sketch. At 100 TB: sketches built once at ingest
    // granularity, any coarser percentile rollup is a union of O(groups)
    // few-KB blobs — raw values never re-shuffled. Gate, q142-style rank
    // band: each estimate must land between the exact (p−0.03) and
    // (p+0.03) quantiles (KLL k=200 rank error ≈1.65% at 99% conf., well
    // inside), per year.
    QueryDef("q156_kll_rollup", (s, dir) => {
      import graft.functions.KllFunctions._
      val o = t(s, dir, "orders")
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          quarter(col("o_orderdate")).as("qtr"), col("o_totalprice"))
      val sketches = o.groupBy("yr", "qtr")
        .agg(kllSketchAgg(col("o_totalprice")).as("sk"))
      val merged = sketches.groupBy("yr")
        .agg(kllMergeAgg(col("sk")).as("sk"))
        .select(col("yr"),
          kllQuantile(col("sk"), 0.5).as("est50"),
          kllQuantile(col("sk"), 0.95).as("est95"))
      val bands = o.groupBy("yr").agg(
        expr("percentile(o_totalprice, array(0.47, 0.53))").as("b50"),
        expr("percentile(o_totalprice, array(0.92, 0.98))").as("b95"))
      merged.join(bands, "yr")
        .select(col("yr"),
          (col("est50") >= col("b50")(0) && col("est50") <= col("b50")(1)).as("ok50"),
          (col("est95") >= col("b95")(0) && col("est95") <= col("b95")(1)).as("ok95"))
        .orderBy("yr")
    }, Some(
      """SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  TRUE AS ok50, TRUE AS ok95 FROM orders ORDER BY yr""".stripMargin)),

    // Quantile sketches as incrementally-maintained aggregate state — the
    // q153 pattern with KLL instead of HLL: a per-year KLL sketch TABLE
    // (BINARY column in a versioned root) advanced by an insert batch; the
    // batch is sketched in one narrow pass and kll_merge'd into the
    // stored sketches (O(batch + groups)); the base rows are never
    // re-read. Inserts-only by construction (KLL cannot retract). Gate:
    // the maintained median lands in the exact ±3%-rank band per year.
    QueryDef("q162_incremental_kll", (s, dir) => {
      import graft.functions.KllFunctions._
      import graft.sources.reftable.VersionedTable
      val root = RelationalSupport.scratchDir(s, dir, "q162_kll")
      val o = t(s, dir, "orders")
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          col("o_orderkey"), col("o_totalprice"))
      val base = o.filter(col("o_orderkey") % 5 =!= 0)
      val batch = o.filter(col("o_orderkey") % 5 === 0)
      VersionedTable.publish(
        base.groupBy("yr").agg(kllSketchAgg(col("o_totalprice")).as("sk")), root)
      val stored = s.read.format("reftable")
        .option("path", root).option("schema", "yr BIGINT, sk BINARY").load()
      val delta = batch.groupBy("yr").agg(kllSketchAgg(col("o_totalprice")).as("bsk"))
      val advanced = stored.join(delta, Seq("yr"), "full_outer")
        .select(col("yr"),
          when(col("sk").isNull, col("bsk"))
            .when(col("bsk").isNull, col("sk"))
            .otherwise(kllMerge(col("sk"), col("bsk"))).as("sk"))
      VersionedTable.publish(advanced, root)
      val est = s.read.format("reftable")
        .option("path", root).option("schema", "yr BIGINT, sk BINARY").load()
        .select(col("yr"), kllQuantile(col("sk"), 0.5).as("est50"))
      val bands = o.groupBy("yr").agg(
        expr("percentile(o_totalprice, array(0.47, 0.53))").as("b50"))
      est.join(bands, "yr")
        .select(col("yr"),
          (col("est50") >= col("b50")(0) && col("est50") <= col("b50")(1)).as("ok50"))
        .orderBy("yr")
    }, Some(
      """SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS yr, TRUE AS ok50
        |FROM orders ORDER BY yr""".stripMargin)),

    // Sketches as incrementally-maintained aggregate state: a per-year HLL
    // sketch TABLE (binary column in a versioned root) advanced by an
    // insert batch — the batch is sketched per group (one narrow pass over
    // O(batch) rows) and UNIONED into the stored sketches (O(groups)
    // few-KB merges); the base table's raw keys are never re-read or
    // re-shuffled. Inserts-only by construction (HLL cannot retract);
    // retractable distinct-count maintenance is q94/q101's exact path.
    // Gate: the maintained estimate lands within 5% of the exact distinct
    // over the full data, per year.
    QueryDef("q153_incremental_hll", (s, dir) => {
      import graft.sources.reftable.VersionedTable
      val root = RelationalSupport.scratchDir(s, dir, "q153_hll")
      val o = t(s, dir, "orders")
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          col("o_orderkey"), col("o_custkey"))
      val base = o.filter(col("o_orderkey") % 5 =!= 0)
      val batch = o.filter(col("o_orderkey") % 5 === 0)
      VersionedTable.publish(
        base.groupBy("yr").agg(hll_sketch_agg(col("o_custkey"), 12).as("sk")), root)
      val stored = s.read.format("reftable")
        .option("path", root).option("schema", "yr BIGINT, sk BINARY").load()
      val delta = batch.groupBy("yr").agg(hll_sketch_agg(col("o_custkey"), 12).as("bsk"))
      val advanced = stored.join(delta, Seq("yr"), "full_outer")
        .select(col("yr"),
          when(col("sk").isNull, col("bsk"))
            .when(col("bsk").isNull, col("sk"))
            .otherwise(hll_union(col("sk"), col("bsk"))).as("sk"))
      VersionedTable.publish(advanced, root)
      val est = s.read.format("reftable")
        .option("path", root).option("schema", "yr BIGINT, sk BINARY").load()
        .select(col("yr"), hll_sketch_estimate(col("sk")).as("est"))
      val exact = o.groupBy("yr").agg(countDistinct(col("o_custkey")).as("exact"))
      est.join(exact, "yr")
        .select(col("yr"),
          (abs(col("est") - col("exact")) / col("exact") <= 0.05).as("ok"))
        .orderBy("yr")
    }, Some(
      "SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS yr, TRUE AS ok FROM orders ORDER BY yr")),

    // Range (interval) join: orders against a tiny price-band table on
    // lo <= price < hi. The band side broadcasts, so the non-equi join is
    // ONE pass over the fact with 5 candidate rows per probe
    // (BroadcastNestedLoopJoin) — no shuffle, no cross-executor
    // cartesian. For a LARGE interval table the same query would pre-bin
    // both sides on floor(price/binWidth) and equi-join the bin (turning
    // it into a shuffle join on O(1) bins per row).
    QueryDef("q151_range_band_join", (s, dir) => {
      import s.implicits._
      val bands = Seq(
        ("b0_lt50k", 0.0, 50000.0),
        ("b1_50k", 50000.0, 100000.0),
        ("b2_100k", 100000.0, 150000.0),
        ("b3_150k", 150000.0, 200000.0),
        ("b4_ge200k", 200000.0, 1e15))
        .toDF("band", "lo", "hi")
      val o = t(s, dir, "orders")
      o.join(broadcast(bands), o("o_totalprice") >= col("lo") && o("o_totalprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), r4(sum("o_totalprice")).as("revenue"))
        .orderBy("band")
    }, Some(
      """SELECT band, count(*) AS n, round(sum(o_totalprice), 4) AS revenue
        |FROM orders JOIN (VALUES
        |  ('b0_lt50k', 0.0, 50000.0), ('b1_50k', 50000.0, 100000.0),
        |  ('b2_100k', 100000.0, 150000.0), ('b3_150k', 150000.0, 200000.0),
        |  ('b4_ge200k', 200000.0, 1e15)) AS b(band, lo, hi)
        |ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin))
  )
}
