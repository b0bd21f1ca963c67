package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers the graft kernel expressions as SQL functions, so `spark.sql`
  * users get the same surface as the Column API:
  *
  * {{{
  *   graft.functions.Registry.registerAll(spark)
  *   spark.sql("SELECT graft_cosine(a.embedding, b.embedding) FROM ...")
  * }}}
  */
object Registry {
  def registerAll(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    r.createOrReplaceTempFunction("graft_simhash60",
      exprs => SimHash60(exprs.head), "scala_udf")
    r.createOrReplaceTempFunction("graft_minhash_sig",
      exprs => MinHashSignature(exprs(0), intArg(exprs(1)), intArg(exprs(2))), "scala_udf")
    r.createOrReplaceTempFunction("graft_minhash_bands",
      exprs => MinHashBands(exprs(0), intArg(exprs(1)), intArg(exprs(2))), "scala_udf")
    r.createOrReplaceTempFunction("graft_shingle_hashes",
      exprs => ShingleHashes(exprs(0), intArg(exprs(1))), "scala_udf")
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
