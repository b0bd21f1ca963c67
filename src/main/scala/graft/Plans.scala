package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps the executed physical plans of the headline queries to PLANS.md —
  * the audit trail that the catalog produces the plans we want at scale
  * (broadcasts on dimensions, pushdown into scans, partial aggregation,
  * top-k without global sort, codegen stages).
  */
object Plans {
  val Headline = Seq(
    "q05_lookup_join", "q06_filter_project", "q07_agg_pricing",
    "q08_join_agg_revenue", "q09_window_rank", "q10_topk",
    "q12_tumbling_window", "q15_knn_cosine", "q16_neardup_embed",
    "q17_minhash_lsh", "q45_ivf_ann", "q54_asof_join",
    "q58_session_window", "q71_profile",
    "q80_reftable_partitioned", "q81_snapshot_diff", "q82_bloom_join",
    "q86_agg_pushdown", "q91_clustered_skip", "q92_heavy_hitters",
    "q93_zorder_skip", "q94_incremental_agg", "q96_skew_autosalt",
    "q98_categorical_skip", "q99_heavy_hitters_by_group",
    "q102_delete_where", "q103_merge_upsert", "q104_repetition",
    "q106_containment", "q109_sql_catalog",
    "q112_merge_clauses", "q114_lm_perplexity", "q115_shard_packing",
    "q116_sql_update", "q117_sql_merge", "q119_sql_metadata",
    "q122_partitioned_mutations", "q125_dynamic_overwrite",
    "q126_domain_mixing", "q127_bucketed_upsert",
    "q129_paragraph_dedup", "q130_dup_ngram_fraction",
    "q132_ivf_indexed", "q133_maintenance", "q134_remove_dup_spans",
    "q137_chunk_documents", "q138_pii_redaction",
    "q140_rag_chunk_search", "q141_incremental_fingerprints",
    "q144_filtered_ann",
    "q147_pivot", "q149_hll_union", "q150_shallow_clone",
    "q151_range_band_join",
    // round-12 read-path flagships: the DV'd scan (now vectorized + split),
    // the storage-partitioned join (no Exchange on either side), the MoR
    // CDC chain's final read, and the renamed-column scan resolving
    // through the column mapping
    "q154_spj_join", "q157_deletion_vectors", "q163_mor_cdc_apply",
    "q168_composite_key_cdc", "q170_rename_column",
    // round-13: the mixed-width scan after a type-widening ALTER (q171's
    // final read decodes INT-written and BIGINT-written files per file)
    // and the composed curation pipeline (quality gate → dedup → chunk →
    // split as ONE job tree)
    "q171_type_widening", "q178_curation_pipeline",
    // round-14: the final read over a partition-evolved table (old files
    // serve the evolved column from data pages, new files from directory
    // constants — one scan, per-file decode decision) and the subquery
    // DELETE's post-state aggregate
    "q191_delete_subquery", "q193_partition_evolution",
    // the generated-partition-column scan: bucket is engine-computed at
    // write, Hive-laid-out, and the WHERE bucket IN (...) prunes listings
    "q197_generated_columns",
    // round-15: the batch changefeed TVF (the O(changed files) two-listing
    // diff), the VECTORIZED array<float> scan (ColumnarToRow over the
    // nested-column decode — the row-path fallback is gone), the COPY INTO
    // ingest CALL, and the post-fast-forward read of a branched table
    "q185_sql_table_changes", "q186_vector_scan", "q192_copy_into",
    "q199_branch_ff",
    // round-15 holdovers the verdict asked captured: the streaming-ingest
    // post-state read and the NDV-sketched CBO join
    "q198_stream_ingest", "q200_ndv_cbo_join",
    // round-16: the rebased concurrent-mutation post-state read, the
    // branch-rebase post-state read, the KLL-histogram range join (CBO
    // broadcast from real value mass), and the upsampled mix
    "q203_concurrent_disjoint", "q204_branch_rebase",
    "q206_upsample_mix", "q207_histogram_cbo_join",
    // round-17: the tokenize→pack composition (census-joined id
    // reassembly + two-level prefix sum), the string truncated-bounds
    // range/prefix skip, and the trained-codebook SemDeDup
    "q213_tokenize_pack", "q214_string_range_skip",
    "q215_trained_semdedup", "q216_hierarchical_semdedup",
    "q217_embed_admission", "q218_shuffle_pack", "q219_shard_write",
    "q220_ivf_admission", "q222_ivf_admission_loop",
    // round-18: the grouped metadata-only census (PushedGroupBy — zero
    // data pages), the SQ8-over-IVF probe (codes-column scan over pruned
    // cell listings), and the byte-level tokenizer's census train
    "q227_grouped_agg_pushdown", "q228_ivf_sq8_exact_limit",
    "q225_bpe_byte_train",
    // round-19: the day-census over hidden-transform dirs (PushedGroupBy
    // on CAST(ts AS DATE), zero data pages), the 2048-merge token-id
    // encode (the merge chain runs in a UDF over the census — the plan
    // must NOT grow with the merge count), and the SQ8-maintained layout's
    // final read
    "q234_day_census_pushdown", "q232_bpe_ids_prod", "q233_sq_maintenance",
    // round-20: the filtered SQ8 probe (metadata predicate pushed into the
    // probed-cell codes scan), the spans-carrying pack (same single
    // example-key shuffle as q230/q236), and the end-to-end tokenizer
    // pipeline's final shard read
    "q240_filtered_ivf_sq8", "q239_pack_doc_spans", "q241_tokenizer_pipeline")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — executed physical plans of the headline queries\n\n")
    sb.append(s"Generated by `graft.Plans` on `$dir`. Collected after execution, so\n")
    sb.append("AQE plans are final. What to look for: `BroadcastHashJoin` on every\n")
    sb.append("dimension side, `PushedFilters` reaching the parquet scans, `partial_`\n")
    sb.append("aggregates before exchanges, `TakeOrderedAndProject` for top-k, and\n")
    sb.append("`*(n)` whole-stage-codegen markers on the hot paths.\n")
    Headline.foreach { name =>
      val df = Catalog.byName(name).fn(spark, dir)
      df.collect()
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString().take(8000))
      sb.append("\n```\n")
    }
    streamingPlans(spark, dir, sb)
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }

  /** Streaming entries never surface their micro-batch plan through the
    * returned (batch) DataFrame, so the changefeed read path was invisible
    * in this audit. Capture the LAST micro-batch's executed physical plan
    * via the stream's IncrementalExecution: publish a small versioned
    * table, mutate it, stream the changefeed (and a plain snapshot read),
    * and dump `lastExecution.executedPlan` — the real per-batch plan,
    * including the reftable scan and the delta computation.
    */
  private def streamingPlans(spark: SparkSession, dir: String, sb: StringBuilder): Unit = {
    import graft.sources.reftable.VersionedTable
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft_plans_cf_").toString + "/t"
    val base = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    VersionedTable.publish(base, root)
    VersionedTable.publish(
      base.withColumn("s_nationkey",
        when(col("s_suppkey") % 5 === 0, col("s_nationkey") + 100)
          .otherwise(col("s_nationkey"))), root)
    def capture(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val q = df.writeStream.format("memory")
        .queryName("plans_" + label.replaceAll("[^a-zA-Z0-9]", "_"))
        .option("checkpointLocation", Files.createTempDirectory("graft_plans_ck_").toString)
        .start()
      q.processAllAvailable()
      val plan = org.apache.spark.sql.graft.DatasetBridge
        .lastMicroBatchPlan(q).toString()
      q.stop()
      sb.append(s"\n## $label (micro-batch physical plan)\n\n```\n")
      sb.append(plan.take(8000))
      sb.append("\n```\n")
    }
    capture("q169/q172 changefeed stream", spark.readStream.format("reftable")
      .option("path", root)
      .option("schema", "s_suppkey BIGINT, s_nationkey INT")
      .option("changefeed", "true").option("keyColumns", "s_suppkey")
      .option("refreshInterval", "1h")
      .load())
    capture("q40 snapshot stream (filter option pushed)", spark.readStream.format("reftable")
      .option("path", root)
      .option("schema", "s_suppkey BIGINT, s_nationkey INT")
      .option("filter", "s_suppkey < 100")
      .option("refreshInterval", "1h")
      .load()
      .filter(col("s_suppkey") < 100))

    // the streaming WRITE side (q175/q179/q180/q183): epoch plans of the
    // DSv2 write. What to look for: WriteToDataSourceV2/MicroBatchWrite at
    // the root; for PARTITIONED tables an Exchange clustering the epoch on
    // the partition columns (RequiresDistributionAndOrdering — without it
    // a P-partition epoch across T tasks writes P×T files); for update
    // mode the stateful aggregate feeding the write. The expectation gates
    // (q179/q180) are BOUND row-level expressions inside the epoch
    // writer's loop, deliberately not plan nodes — codegen'd predicates
    // evaluated as rows serialize, so they never break the write pipeline.
    def captureWrite(label: String, df: org.apache.spark.sql.DataFrame,
        writeRoot: String, extra: Map[String, String],
        outputMode: String = "append"): Unit = {
      val q = df.writeStream.format("reftable")
        .option("path", writeRoot)
        .options(extra)
        .option("checkpointLocation",
          Files.createTempDirectory("graft_plans_wck_").toString)
        .outputMode(outputMode)
        .start()
      q.processAllAvailable()
      val plan = org.apache.spark.sql.graft.DatasetBridge
        .lastMicroBatchPlan(q).toString()
      q.stop()
      sb.append(s"\n## $label (epoch write physical plan)\n\n```\n")
      sb.append(plan.take(8000))
      sb.append("\n```\n")
    }
    val feed = spark.readStream.format("reftable")
      .option("path", root)
      .option("schema", "s_suppkey BIGINT, s_nationkey INT")
      .option("refreshInterval", "1h")
      .load()
    captureWrite("q175 partitioned append sink",
      feed.withColumn("p", (col("s_suppkey") % 4).cast("int")),
      Files.createTempDirectory("graft_plans_w175_").toString + "/t",
      Map("schema" -> "s_suppkey BIGINT, s_nationkey INT, p INT",
        "partitionColumns" -> "p"))
    captureWrite("q180 expectation-gated sink (quarantine)",
      feed,
      Files.createTempDirectory("graft_plans_w180_").toString + "/t",
      Map("schema" -> "s_suppkey BIGINT, s_nationkey INT",
        "expect.valid_key" -> "s_suppkey >= 0", "onViolation" -> "quarantine"))
    captureWrite("q183 update-mode keyed upsert sink",
      feed.groupBy("s_nationkey").agg(count(lit(1)).as("cnt")),
      Files.createTempDirectory("graft_plans_w183_").toString + "/t",
      Map("schema" -> "s_nationkey INT, cnt BIGINT", "keyColumns" -> "s_nationkey"),
      outputMode = "update")
  }
}
