package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the catalog queries must not just be correct,
  * they must produce the plans that survive a 100 TB scale-up — broadcast
  * joins for dimensions, filter pushdown into scans, top-k without a global
  * sort, whole-stage codegen on the hot aggregation path.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Catalog.byName(name).fn(spark, dir).queryExecution.executedPlan.toString()

  test("q05 lookup join broadcasts the dimension side") {
    assert(plan("q05_lookup_join").contains("BroadcastHashJoin"))
  }

  test("q08 multi-way join broadcasts all dimension tables") {
    val p = plan("q08_join_agg_revenue")
    assert(p.contains("BroadcastHashJoin"))
    // the only shuffle join permitted is lineitem join orders
    assert(p.split("BroadcastHashJoin").length >= 4, s"expected >=3 broadcast joins:\n$p")
  }

  test("q06 filters are pushed into the parquet scan") {
    val p = plan("q06_filter_project")
    assert(p.contains("PushedFilters") &&
      (p.contains("GreaterThan(l_discount") || p.contains("LessThan(l_quantity")),
      s"filters should reach the scan:\n$p")
  }

  test("q10 top-k avoids a global sort") {
    assert(plan("q10_topk").contains("TakeOrderedAndProject"))
  }

  test("q07 aggregation runs inside whole-stage codegen with partial agg") {
    val df = Catalog.byName("q07_agg_pricing").fn(spark, dir)
    df.collect() // finalize the adaptive plan; codegen stages appear only then
    val p = df.queryExecution.executedPlan.toString()
    // finalized AQE plans render whole-stage-codegen stages as "*(n)" markers
    assert(p.contains("WholeStageCodegen") || p.contains("*("), s"no codegen stage in:\n$p")
    assert(p.contains("partial_"), s"expected map-side partial aggregation:\n$p")
  }

  test("q15 knn broadcasts the query vectors, not the corpus") {
    val p = plan("q15_knn_cosine")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side must be broadcast:\n$p")
  }

  test("q16 near-dup join is a bucket equi-join, never a nested-loop join") {
    val p = plan("q16_neardup_embed")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"near-dup pairs must come from the LSH bucket join:\n$p")
  }

  test("IVF cell assignment stays narrow: no Exchange, no Window") {
    import org.apache.spark.sql.functions.col
    val e = Tables.load(spark, dir, "embeddings")
    val cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val p = operators.Similarity.assignCells(e, cent, "vec_id", "embedding")
      .queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange") && !p.contains("Window"),
      s"assignment must be a shuffle-free projection over the broadcast codebook:\n$p")
  }

  test("q104 repetition metrics run without a Generate (fused pass, no explode)") {
    val df = Catalog.byName("q104_repetition").fn(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("Generate"),
      s"repetition metrics must be one fused pass per doc, not explode+groupBy:\n$p")
  }

  test("q106 containment pairs come from an equi-join, never a nested-loop join") {
    val p = plan("q106_containment")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"containment candidates must come from the shared-shingle equi-join:\n$p")
  }

  test("q76 per-group cap uses WindowGroupLimit (partial top-n before the exchange)") {
    assert(plan("q76_cap_per_group").contains("WindowGroupLimit"))
  }

  test("q115 shard packing runs its prefix-sum window partitioned, never global") {
    val p = plan("q115_shard_packing")
    // the running sum must be a per-partition window (partitionBy __pid) —
    // an unpartitioned Window.orderBy would collapse to a single task
    assert(p.contains("Window"), s"expected a window in:\n$p")
    assert(!p.matches("(?s).*Window \\[[^\\]]*\\], \\[windowsort.*"),
      "window spec must not be empty-partitioned")
    assert(p.contains("__pid"), s"window must partition by __pid:\n$p")
  }

  test("q129 paragraph dedup broadcasts the boilerplate set, never the corpus") {
    val p = plan("q129_paragraph_dedup")
    assert(p.contains("BroadcastHashJoin"),
      s"the hot-paragraph membership join must broadcast:\n$p")
  }

  test("mixCorpus output is a narrow filter: no Exchange, no Window") {
    // the per-domain availability aggregation runs eagerly inside the
    // operator (O(domains) to the driver); the RETURNED plan must be a
    // pure scan+filter — at corpus scale the sample decision is a narrow
    // map over the data, never a shuffle
    val df = spark.range(1000).selectExpr(
      "id", "CAST(id % 3 AS STRING) AS dom", "CAST(10 AS BIGINT) AS nt")
    val out = graft.operators.Curation.mixCorpus(
      df, "id", "dom", "nt", Map("0" -> 0.5, "1" -> 0.5), budgetTokens = 500L)
    val p = out.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), s"mixCorpus must not shuffle:\n$p")
    assert(!p.contains("Window"), s"mixCorpus must not window:\n$p")
  }

  test("bucketed join needs no exchange on either side") {
    import org.apache.spark.sql.functions.col
    // write both sides bucketed+sorted on the join key, then force the
    // sort-merge path (broadcast off) — the join must read the buckets
    // directly with NO Exchange. (The residual per-bucket Sort remains
    // unless spark.sql.legacy.bucketedTableScan.outputOrdering is enabled —
    // Spark stopped trusting bucket sort order by default in SPARK-28632 —
    // and is a cheap in-memory pass over pre-sorted runs, not a shuffle.)
    val s = spark
        s.sql("DROP TABLE IF EXISTS graft_bspec_orders")
        s.sql("DROP TABLE IF EXISTS graft_bspec_lineitem")
    // one writer task → one file per bucket, so the scan can also trust the
    // bucket sort order (at scale: repartition by the bucket expression)
    Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      .repartition(1)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", sys.props("java.io.tmpdir") + "/graft_bspec_orders")
        .mode("overwrite").saveAsTable("graft_bspec_orders")
    Tables.load(s, dir, "lineitem").select("l_orderkey", "l_extendedprice")
      .repartition(1)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", sys.props("java.io.tmpdir") + "/graft_bspec_lineitem")
        .mode("overwrite").saveAsTable("graft_bspec_lineitem")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = s.table("graft_bspec_orders")
      val l = s.table("graft_bspec_lineitem")
      val joined = o.join(l, o("o_orderkey") === l("l_orderkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString()
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(p.contains("SelectedBucketsCount"), s"scan must be bucket-aware:\n$p")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("lineage listener records the tables a query read") {
    Lineage.register(spark)
    Lineage.reset()
    Catalog.byName("q05_lookup_join").fn(spark, dir).collect()
    // QueryExecutionListener callbacks run async; allow a short settle
    val deadline = System.currentTimeMillis() + 10000
    while (Lineage.sourcesRead.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
    val sources = Lineage.sourcesRead.mkString(";")
    assert(sources.contains("events.parquet") && sources.contains("customer.parquet"),
      s"expected lineage to record both join inputs, got: $sources")
  }

  test("every oracle query name exists in queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
