package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Single-pass token repetition statistics: total tokens, distinct tokens,
  * and the highest single-token count — the repetition signals a corpus
  * quality gate needs (a high duplicate-token fraction or one token
  * dominating a document are the classic boilerplate/low-quality markers
  * in published corpus-filtering rules). Fused into ONE hash pass per
  * document: composing the same from built-in HOFs (transform over
  * array_distinct × filter) re-scans the array per distinct token —
  * O(distinct·n) interpreted work, the round-1 dedup lesson.
  * CodegenFallback: evaluated once per document, off the per-row hot path.
  *
  * Returns struct<n_tok:int, n_distinct:int, top_cnt:int>; null input →
  * null; empty array → (0, 0, 0).
  */
case class TokenStats(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = TokenStats.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_stats expects array<string>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.HashMap[String, Integer](math.max(16, n * 2))
    var top = 0
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      val c: Int = counts.merge(s, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      if (c > top) top = c
      i += 1
    }
    InternalRow(n, counts.size(), top)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokenStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_cnt", IntegerType, nullable = false)))
}

object TextFunctions {
  def tokenStats(toks: Column): Column =
    ColumnBridge.column(TokenStats(ColumnBridge.expression(toks)))
}
