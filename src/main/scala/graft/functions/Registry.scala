package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the graft kernel expressions as SQL functions, so `spark.sql`
  * users get the same surface as the Column API:
  *
  * {{{
  *   graft.functions.Registry.registerAll(spark)          // per session
  *   // or cluster-wide at session build time:
  *   //   --conf spark.sql.extensions=graft.functions.GraftExtensions
  *   spark.sql("SELECT graft_cosine(a.embedding, b.embedding) FROM ...")
  * }}}
  */
object Registry {

  /** The single function table: shared by per-session temp registration and
    * [[GraftExtensions]] injection, so both surfaces stay identical.
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "graft_simhash60" -> (exprs => SimHash60(exprs.head)),
    "graft_minhash_sig" -> (exprs => MinHashSignature(exprs(0), intArg(exprs(1)), intArg(exprs(2)))),
    "graft_minhash_bands" -> (exprs => MinHashBands(exprs(0), intArg(exprs(1)), intArg(exprs(2)))),
    "graft_shingle_hashes" -> (exprs => ShingleHashes(exprs(0), intArg(exprs(1)))),
    "graft_token_stats" -> (exprs => TokenStats(exprs.head)),
    "graft_kll_sketch_agg" -> (exprs => KllSketchAgg(exprs(0), intArg(exprs(1)))),
    "graft_kll_merge_agg" -> (exprs => KllMergeAgg(exprs(0), intArg(exprs(1)))),
    "graft_kll_merge" -> (exprs => KllMerge(exprs(0), exprs(1))),
    "graft_kll_quantile" -> (exprs => KllQuantile(exprs(0), exprs(1))))

  def registerAll(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) => r.createOrReplaceTempFunction(name, b, "scala_udf") }
  }

  private def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = e match {
    case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
      lit.value match {
        case n: Number => n.intValue()
        case other =>
          throw new IllegalArgumentException(s"expected an integer literal argument, got '$other'")
      }
    case other =>
      throw new IllegalArgumentException(s"expected an integer literal argument, got $other")
  }
}

/** `spark.sql.extensions` entry point: injects the kernel functions AND
  * the reftable DML rewrite (SQL `UPDATE` / `MERGE INTO` →
  * [[graft.sources.reftable.RefTableDmlRewrite]]) at session build time,
  * the idiomatic cluster-wide deployment
  * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`); session
  * code can still call [[Registry.registerAll]] for ad-hoc use of the
  * functions (the DML rewrite needs the extension point — analyzer rules
  * cannot be added to a live session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Registry.builders.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        b))
    }
    ext.injectPostHocResolutionRule(session =>
      graft.sources.reftable.RefTableDmlRewrite(session))
    // batch SQL changefeed: SELECT * FROM table_changes('t', from[, to]).
    // A delegating parser, NOT a resolution rule — the analyzer fails
    // eagerly on unknown TVF names before injected rules run.
    ext.injectParser((session, delegate) =>
      new graft.sources.reftable.GraftSqlParser(session, delegate))
  }
}
