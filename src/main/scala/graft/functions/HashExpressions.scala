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

/** MinHash signature of a shingle array: for each of `numPerms` universal-hash
  * permutations, the minimum permuted hash over the *distinct* shingles.
  * Returns array<long> of length numPerms (null-element-free), or null for an
  * empty/absent shingle set.
  *
  * One pass over the shingles per document — no 128-way explode/shuffle; at
  * 100 TB the signature computation is embarrassingly parallel map work and
  * the only shuffle in MinHash-LSH dedup is the band-bucket exchange.
  */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig expects array<string>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val seen = new java.util.HashSet[String]()
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      if (seen.add(s)) {
        val h = GraftHash.hash60(s)
        var p = 0
        while (p < numPerms) {
          val g = GraftHash.perm(p, h)
          if (g < sig(p)) sig(p) = g
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashFunctions {
  def simhash60(toks: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(toks)))

  def minhashSig(shingles: Column, numPerms: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), numPerms))
}
