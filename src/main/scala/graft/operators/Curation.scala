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
}
