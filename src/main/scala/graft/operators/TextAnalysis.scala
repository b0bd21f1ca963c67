package graft.operators

import graft.functions.GraftFunctions._
import graft.functions.HashFunctions.shingleHashes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: all pure narrow map
  * work over a text column, no shuffle except final aggregations.
  */
object TextAnalysis {

  /** Corpus token frequencies grouped by a dimension column. */
  def tokenCounts(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.select(col(groupCol), explode(tokens(col(textCol))).as("word"))
      .groupBy(groupCol, "word")
      .agg(count(lit(1)).as("n"))

  /** Rule-based language ID: CJK script detection + stopword profile scores
    * with a deterministic preference order. Honest limitation: a Latin-script
    * text with no distinctive stopwords classifies as English.
    */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    def score(words: String*): Column = size(filter(tk, x => x.isin(words: _*)))
    val sEn = score("the", "and", "of", "to", "in", "is")
    val sEs = score("el", "la", "los", "que", "y", "en")
    val sDe = score("der", "die", "und", "das", "ist")
    val sFr = score("le", "les", "des", "et", "une", "dans")
    df.select(
      col(idCol),
      when(col(textCol).rlike("[一-鿿]"), "zh")
        .when(sEn >= sEs && sEn >= sDe && sEn >= sFr, "en")
        .when(sEs >= sDe && sEs >= sFr, "es")
        .when(sDe >= sFr, "de")
        .otherwise("fr").as("pred_lang"))
  }

  /** Quality metrics: token count, mean token length, stopword ratio,
    * punctuation ratio.
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    val nTok = size(tk)
    val sumLen = aggregate(transform(tk, x => length(x)), lit(0), (a, x) => a + x)
    val nStop = size(filter(tk, x => x.isin("the", "a", "of", "and", "to", "in", "is", "on")))
    val punct = length(regexp_replace(lower(col(textCol)), "[a-z0-9 ]", ""))
    df.select(
      col(idCol),
      nTok.as("n_tok"),
      when(nTok > 0, r4(sumLen.cast("double") / nTok)).as("avg_tok_len"),
      when(nTok > 0, r6(nStop.cast("double") / nTok)).as("stop_ratio"),
      r6(punct.cast("double") / length(col(textCol))).as("punct_ratio"))
  }

  /** Document fingerprint: minimum hashed k-shingle (MinHash permutation 0 of
    * the identity permutation — a stable 60-bit content fingerprint robust to
    * local edits away from the minimum shingle).
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    df.select(col(idCol), array_min(shingleHashes(tokens(col(textCol)), k)).as("fp"))

  /** BPE-ish token count: letter runs, digit runs, single punctuation marks. */
  def bpeTokenCount(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), size(bpeTokens(col(textCol))).as("n_bpe"))
}

/** Dataset profiling: one row per numeric/string column with the stats a
  * pipeline health check needs (nulls, distincts, min/max). One pass — a
  * single aggregation over all requested columns.
  */
object Profiling {
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val total = df.count()
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.zipWithIndex.map { case (c, i) =>
      (c, total, total - row.getLong(i * 4), row.getLong(i * 4 + 1),
        row.getString(i * 4 + 2), row.getString(i * 4 + 3))
    }.toDF("col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")
  }
}
