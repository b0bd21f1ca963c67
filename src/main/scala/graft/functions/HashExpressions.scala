package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Portable 60-bit hash shared by all fingerprint/dedup operators.
  *
  * hash60(s) = first 15 hex digits of md5(utf8(s)) parsed as a long —
  * reproducible in any engine with an md5 function; the DuckDB oracle form is
  * `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)`.
  */
object GraftHash {
  val P: Long = 1000000007L

  private val mdLocal: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def hash60(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(bytes)
    // first 15 hex chars = 7.5 bytes: 7 full bytes + high nibble of byte 8
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def hash60(s: String): Long = hash60(s.getBytes("UTF-8"))

  /** Universal-hash family over Z_P used for MinHash permutations:
    * g_i(h) = ((2i+1) * (h mod P) + (i * 2654435761) mod P) mod P.
    * All intermediates fit comfortably in a signed 64-bit integer, so the
    * arithmetic is portable to SQL engines without unsigned/overflow quirks.
    */
  def perm(i: Int, h60: Long): Long = {
    val h = h60 % P
    ((2L * i + 1L) * h + (i.toLong * 2654435761L) % P) % P
  }
}

/** 60-bit SimHash of a token array (multiset semantics: repeated tokens carry
  * their counts as weights). Bit b of the result is set iff the count-weighted
  * sum of (±1 by bit b of hash60(token)) is strictly positive.
  *
  * Mirrors the reference's role of a document fingerprint for near-dup
  * detection; the exact same computation is expressible in the DuckDB oracle
  * (see DedupOps). CodegenFallback: evaluated once per document, off the
  * per-row hot path, so interpreted evaluation is acceptable.
  */
case class SimHash60(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash60 expects array<string>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      counts.update(s, counts.getOrElse(s, 0) + 1)
      i += 1
    }
    val acc = new Array[Long](60)
    counts.foreach { case (tok, c) =>
      val h = GraftHash.hash60(tok)
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) acc(b) += c else acc(b) -= c
        b += 1
      }
    }
    var res = 0L
    var b = 0
    while (b < 60) {
      if (acc(b) > 0) res |= (1L << b)
      b += 1
    }
    res
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature over a document's token array: k-shingling, hashing and
  * the `numPerms` universal-hash minima fused into one pass. Returns
  * array<long> of length numPerms, or null for a doc with fewer than k
  * tokens.
  *
  * One pass per document — no per-permutation explode/shuffle; at 100 TB the
  * signature computation is embarrassingly parallel map work and the only
  * shuffle in MinHash-LSH dedup is the band-bucket exchange.
  */
case class MinHashSignature(child: Expression, k: Int, numPerms: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig expects array<string>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val sig = MinHash.signature(v.asInstanceOf[ArrayData], k, numPerms)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHash {
  /** Distinct hashed k-shingles of a token array (shingle = k consecutive
    * tokens joined by a single space — identical to the SQL-side
    * `t[i] || ' ' || t[i+1] || ...` construction), insertion-ordered.
    * Empty when the doc has fewer than k tokens.
    *
    * Shingling + hashing is fused into one JVM pass: composing it from
    * higher-order functions (transform/concat_ws/md5 per element) runs
    * interpreted per element and measured ~30x slower at sf0.1.
    */
  def shingleHashes(arr: ArrayData, k: Int): Array[Long] = {
    val n = arr.numElements()
    if (n < k) return Array.emptyLongArray
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(GraftHash.hash60(sb.toString))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Signature over the distinct hashed shingles; null for an empty set. */
  def signature(arr: ArrayData, k: Int, numPerms: Int): Array[Long] = {
    val hs = shingleHashes(arr, k)
    if (hs.isEmpty) return null
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var p = 0
      while (p < numPerms) {
        val g = GraftHash.perm(p, h)
        if (g < sig(p)) sig(p) = g
        p += 1
      }
      i += 1
    }
    sig
  }
}

/** Distinct hashed k-shingles as array<long> — the join key column for exact
  * n-gram Jaccard and for LSH candidate verification.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_hashes expects array<string>, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(MinHash.shingleHashes(v.asInstanceOf[ArrayData], k))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** LSH band keys computed in the same pass as the MinHash signature:
  * array<struct<b:int, v0:long, v1:long>> with 2 signature rows per band.
  *
  * Exists so the banding stage evaluates the signature exactly once per
  * document: composing element_at(minhash_sig(...), i) per band would inline
  * the (CodegenFallback, hence not subexpression-eliminated) signature
  * expression into every band slot — observed as a 128x recompute and a 36s
  * stage at sf0.1 before this expression was introduced.
  */
case class MinHashBands(child: Expression, k: Int, numBands: Int)
    extends UnaryExpression with CodegenFallback {
  private val numPerms = numBands * 2

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("b", IntegerType, nullable = false),
      StructField("v0", LongType, nullable = false),
      StructField("v1", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_bands expects array<string>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val sig = MinHash.signature(v.asInstanceOf[ArrayData], k, numPerms)
    if (sig == null) return null
    val rows = new Array[Any](numBands)
    var b = 0
    while (b < numBands) {
      rows(b) = org.apache.spark.sql.catalyst.InternalRow(b, sig(2 * b), sig(2 * b + 1))
      b += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashFunctions {
  def simhash60(toks: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(toks)))

  def minhashSig(tokens: Column, k: Int, numPerms: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(tokens), k, numPerms))

  def minhashBands(tokens: Column, k: Int, numBands: Int): Column =
    ColumnBridge.column(MinHashBands(ColumnBridge.expression(tokens), k, numBands))

  def shingleHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), k))
}
