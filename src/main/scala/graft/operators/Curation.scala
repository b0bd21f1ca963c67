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
    * scale), so the prefix sum is two-level: range-partition by id, sum
    * each partition's weights (one tiny aggregation — O(partitions) rows
    * to the driver, same bounded class as a centroid codebook), fold the
    * exclusive per-partition offsets into a broadcast map, and run the
    * running sum as a PARALLEL per-partition window plus its partition's
    * offset. Deterministic for a given partition count; `numParts` is
    * explicit so results are reproducible across cluster sizes.
    */
  def packShards(
      df: DataFrame, idCol: String, weightCol: String, budget: Long,
      numParts: Int = 32): DataFrame = {
    require(budget > 0, "packShards needs a positive token budget")
    // persist() before the two downstream jobs (offset collect + windowed
    // sum): the range partitioner samples with a plan-instance-dependent
    // seed, so WITHOUT a shared materialization the two jobs could draw
    // different partition boundaries once the corpus outgrows the
    // sampler's full-coverage size — job-1 offsets would then be applied
    // to job-2's different partition membership, silently corrupting
    // every shard assignment. The cache pins ONE physical plan (one
    // RangePartitioner instance), so even recomputed blocks keep the same
    // boundaries. Blocks release via the ContextCleaner when the plan is
    // unreachable.
    val parts = df.select(col(idCol), col(weightCol).cast("long").as("__w"))
      .repartitionByRange(numParts, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offsets = parts.groupBy("__pid").agg(sum("__w").as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val exclusive = offsets.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) => (pid, acc + s) }
      .init.map(_._2) // offset for partition i = sum of partitions < i
    val offsetOf = map(offsets.map(_._1).zip(exclusive).flatMap {
      case (pid, off) => Seq(lit(pid), lit(off))
    }: _*)
    val w = Window.partitionBy("__pid").orderBy(idCol)
    parts
      .withColumn("__before",
        offsetOf(col("__pid")) + sum("__w").over(w) - col("__w"))
      .select(col(idCol), col("__w").as("n_tok"),
        floor(col("__before") / budget).cast("int").as("shard"))
  }
}
