package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Cosine similarity over two numeric arrays, computed as a sequential
  * double-precision fold (dot / (|a| * |b|)) so the result is bit-identical to
  * the DuckDB oracle expression built from list_transform + list_sum.
  *
  * This is the hot-path kernel for similarity search (SURVEY.md §2c Q15/Q16):
  * a native Catalyst expression with `doGenCode`, so it stays inside
  * whole-stage codegen instead of breaking the stage the way a Scala UDF
  * would. At 100 TB the corpus side streams through this expression once per
  * (query, candidate) pair — no boxing, no Row materialization.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double x = (double) $a.$lGet($i);
         |    final double y = (double) $b.$rGet($i);
         |    $dot += x * y; $na += x * x; $nb += y * y;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Shared eval kernels for [[PackVector]]/[[UnpackVector]] — one static
  * implementation serves both the interpreted `nullSafeEval` and the
  * generated code (the codegen emits a call to these, the standard Spark
  * pattern for expressions whose body is too branchy to inline: the call
  * stays inside whole-stage codegen, no stage break).
  *
  * Wire format: element count implied by length; IEEE-754 doubles,
  * little-endian, 8 bytes each. Packing a float array widens each element
  * to double first (lossless), so pack∘unpack is value-identity for both
  * input element types.
  */
object VectorCodec {
  def pack(a: ArrayData, fromFloat: Boolean): Array[Byte] = {
    val n = a.numElements()
    val buf = java.nio.ByteBuffer.allocate(n * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      buf.putDouble(if (fromFloat) a.getFloat(i).toDouble else a.getDouble(i))
      i += 1
    }
    buf.array()
  }

  def unpack(b: Array[Byte]): ArrayData = {
    require(b.length % 8 == 0, s"packed vector length ${b.length} not a multiple of 8")
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](b.length / 8)
    var i = 0
    while (i < out.length) { out(i) = buf.getDouble(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `array<float|double>` → `binary`: 8-byte little-endian doubles. Exists so
  * embedding columns can live in layouts whose readers speak scalar+binary
  * parquet only (the reftable source) — and it is the compact at-rest shape
  * anyway: no parquet LIST nesting, one contiguous buffer per vector.
  */
case class PackVector(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  private def fromFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pack_vector expects array<float|double>, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    VectorCodec.pack(v.asInstanceOf[ArrayData], fromFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorCodec.pack($c, $fromFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `binary` (8-byte little-endian doubles) → `array<double>`; inverse of
  * [[PackVector]].
  */
case class UnpackVector(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"unpack_vector expects binary, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    VectorCodec.unpack(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorCodec.unpack($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared eval kernel for [[SqEncode]] — serves both the interpreted
  * `nullSafeEval` and the generated code (the codegen emits a call, so the
  * loop stays inside whole-stage codegen; same pattern as [[VectorCodec]]).
  *
  * Quantizer semantics pinned for engine replay (the oracle recomputes
  * them): code_i = floor((x_i − lo_i) / (hi_i − lo_i) · 255 + 0.5) clamped
  * to [0, 255] (HALF_UP), and a degenerate dimension (hi ≤ lo) encodes 0.
  */
object SqCodec {
  /** Returns null (→ NULL codes) when any element slot is null: ArrayData
    * getters read undefined/zero values at null slots, so quantizing one
    * would persist a plausible-but-wrong code into an index. NULL rides the
    * expression's null channel instead, where the layout builds' loud guard
    * ([[graft.operators.IvfIndex.buildSq]]) rejects the row.
    */
  def encode(a: ArrayData, lo: Array[Double], hi: Array[Double], fromFloat: Boolean): Array[Byte] = {
    val d = lo.length
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      if (a.isNullAt(i)) return null
      val x = if (fromFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val c =
        if (hi(i) <= lo(i)) 0
        else {
          val t = math.floor((x - lo(i)) / (hi(i) - lo(i)) * 255.0 + 0.5).toInt
          if (t < 0) 0 else if (t > 255) 255 else t
        }
      out(i) = (c & 0xff).toByte
      i += 1
    }
    out
  }
}

/** `array<float|double>` (dim d) → `binary` (d SQ8 codes, one byte per
  * dimension) against per-dimension [lo, hi] ranges — the codegen'd
  * Catalyst form of [[graft.operators.Sq]]'s quantizer (see [[SqCodec]]
  * for the pinned semantics). Like its siblings [[PackVector]] /
  * [[CosineSimilarity]] it stays inside whole-stage codegen: the SQ8
  * encode pass is the one corpus-wide scan of an index build, and a Scala
  * UDF there would break the stage and box every row at 100 TB.
  *
  * A DIMENSION-MISMATCHED input — or one with a NULL element slot — yields
  * NULL codes (matching the former UDF's contract): tolerable on the bare
  * corpus-scan path, and the persisted layouts
  * ([[graft.operators.IvfIndex.buildSq]]) wrap the call in a raise_error
  * guard so a bad row fails the build loudly instead. The ranges ride in
  * the expression as `Seq` params (STRUCTURAL equality — array-typed params
  * would compare by reference and defeat Catalyst canonicalization /
  * common-subexpression reuse when the same ranges are re-read in two plan
  * branches), converted once to primitive arrays for the kernel and
  * referenced from generated code via `addReferenceObj` (never stringified
  * into source).
  */
case class SqEncode(child: Expression, lo: Seq[Double], hi: Seq[Double])
    extends UnaryExpression {
  require(lo.length == hi.length, "SqEncode: lo/hi range arrays must have equal length")

  private lazy val loArr = lo.toArray
  private lazy val hiArr = hi.toArray

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  private def fromFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sq_encode expects array<float|double>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != lo.length) null
    else SqCodec.encode(a, loArr, hiArr, fromFloat) // null on a null element slot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", loArr, "double[]")
    val hiRef = ctx.addReferenceObj("sqHi", hiArr, "double[]")
    val r = ctx.freshName("sqCodes")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |byte[] $r = ($c.numElements() != ${lo.length})
         |  ? null : graft.functions.SqCodec.encode($c, $loRef, $hiRef, $fromFloat);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The ONE argmax kernel behind [[NearestCentroid]] and
  * [[HierarchicalNearestCentroid]] (each level of the latter). The
  * flat-vs-hierarchical and Spark-vs-oracle bit-exactness contracts all
  * reduce to "every argmax runs THIS code": round-6 cosine
  * (`BigDecimal.valueOf` HALF_UP — Spark's `round`), Spark SQL double
  * ordering (NaN greatest), strict `>` in ascending scan order (ties →
  * first/lowest id), length-mismatched centroids yield null similarity
  * and never win.
  */
private[functions] object ArgmaxKernel {
  def norms(cs: Array[Array[Double]]): Array[Double] = cs.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  // Spark SQL double ordering: NaN == NaN, NaN > any non-NaN
  def sparkGt(a: Double, b: Double): Boolean =
    if (java.lang.Double.isNaN(a)) !java.lang.Double.isNaN(b)
    else if (java.lang.Double.isNaN(b)) false
    else a > b

  // Spark's round(x, 6) for DoubleType: BigDecimal.valueOf semantics
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Copy the input array to primitives and compute its norm. */
  def decode(input: ArrayData, fromFloat: Boolean): (Array[Double], Double) = {
    val n = input.numElements()
    val v = new Array[Double](n)
    var nv = 0.0
    var i = 0
    while (i < n) {
      val x = if (fromFloat) input.getFloat(i).toDouble else input.getDouble(i)
      v(i) = x; nv += x * x; i += 1
    }
    (v, math.sqrt(nv))
  }

  /** Returns (winning index, its round-6 similarity, any-winner flag). */
  def argmax(
      v: Array[Double], vnorm: Double,
      cs: Array[Array[Double]], ns: Array[Double]): (Int, Double, Boolean) = {
    val n = v.length
    var bestIdx = -1
    var bestSim = -2.0
    var found = false
    var c = 0
    while (c < cs.length) {
      val cv = cs(c)
      if (cv.length == n) { // mismatched length -> null cosine -> never wins
        var dot = 0.0
        var d = 0
        while (d < n) { dot += v(d) * cv(d); d += 1 }
        val s = round6(dot / (vnorm * ns(c)))
        if (sparkGt(s, bestSim)) { bestSim = s; bestIdx = c; found = true }
      }
      c += 1
    }
    (bestIdx, bestSim, found)
  }
}

/** The per-row nearest-centroid argmax for LARGE codebooks: the centroids
  * ride the expression as plain runtime arrays, referenced from generated
  * code via `addReferenceObj` — they ship to executors once inside the
  * (torrent-broadcast) task binary, NOT as plan literals, so plan size,
  * codegen source, and driver memory stay O(1) in k·dim where the literal
  * `aggregate()` fold grows O(k·dim). The fold stays the right shape for
  * small codebooks (no collect-to-expression at plan time); Similarity
  * switches on k·dim.
  *
  * Semantics are BIT-IDENTICAL to the fold it replaces (q45/q108 oracles
  * hold on either path): similarity = round(cosine, 6) with
  * `BigDecimal.valueOf` HALF_UP (Spark's `round`); comparison = Spark SQL
  * double ordering (NaN greatest, so a zero-norm vector's NaN cosine wins
  * at the first centroid exactly like the fold); strict `>` in ascending
  * cid order (ties → lowest cid); length-mismatched centroids yield null
  * similarity and never win; a row where NO centroid wins (null/empty
  * vector, all-mismatched lengths) gets the lowest cid with null
  * similarity.
  *
  * `cids`/`cents` must be parallel arrays sorted ascending by cid.
  */
case class NearestCentroid(child: Expression, cids: Array[Long], cents: Array[Array[Double]])
    extends UnaryExpression {
  require(cids.nonEmpty && cids.length == cents.length, "empty or misaligned codebook")

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = true)))
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nearest_centroid expects array<float|double>, got $t")
  }

  private lazy val fromFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val norms: Array[Double] = ArgmaxKernel.norms(cents)

  /** The kernel, shared by interpreted eval and generated code. */
  def nearest(input: ArrayData): InternalRow = {
    if (input == null) return InternalRow(cids(0), null)
    val (v, vnorm) = ArgmaxKernel.decode(input, fromFloat)
    val (idx, sim, found) = ArgmaxKernel.argmax(v, vnorm, cents, norms)
    if (found) InternalRow(cids(idx), sim) else InternalRow(cids(0), null)
  }

  override def eval(input: InternalRow): Any =
    nearest(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this, classOf[NearestCentroid].getName)
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${c.code}
        $javaType ${ev.value} = $ref.nearest(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** TWO-LEVEL nearest-centroid: pick the best SUPER-centroid (g cosines),
  * then the best centroid among that super's CHILDREN (k/g expected) —
  * O(√k) work per row against a corpus-scaled codebook, where the flat
  * [[NearestCentroid]] pays O(k). Same reference-object shape: O(1) plan
  * size at any k, one compiled kernel, still a narrow projection.
  *
  * Each level reuses the flat argmax semantics exactly (round-6 cosine,
  * Spark double ordering with NaN greatest, strict `>` in ascending-id
  * scan order → ties to the lowest id; length-mismatched centroids never
  * win). A row with no winning super (null/empty vector) takes the first
  * super; no winning child takes that super's first child with null sim —
  * the two-level analogue of the flat fallback, replayed as
  * `DESC NULLS LAST, id` argmaxes by the q216 oracle.
  *
  * `sids`/`supers` sorted ascending by sid; `childCids(i)`/`childCents(i)`
  * are super i's children sorted ascending by cid. Every super must have
  * at least one child (the caller excludes childless supers — their cells
  * would be empty by construction).
  */
case class HierarchicalNearestCentroid(
    child: Expression,
    sids: Array[Long], supers: Array[Array[Double]],
    childCids: Array[Array[Long]], childCents: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(sids.nonEmpty && sids.length == supers.length &&
    sids.length == childCids.length && sids.length == childCents.length,
    "empty or misaligned hierarchical codebook")
  require(childCids.forall(_.nonEmpty), "every super needs at least one child")

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = true)))
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hierarchical_nearest_centroid expects array<float|double>, got $t")
  }

  private lazy val fromFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val superNorms: Array[Double] = ArgmaxKernel.norms(supers)
  @transient private lazy val childNorms: Array[Array[Double]] =
    childCents.map(ArgmaxKernel.norms)

  /** The kernel, shared by interpreted eval and generated code — each
    * level is one [[ArgmaxKernel.argmax]] call, so both levels carry the
    * flat expression's semantics by construction.
    */
  def nearest(input: ArrayData): InternalRow = {
    if (input == null) return InternalRow(childCids(0)(0), null)
    val (v, vnorm) = ArgmaxKernel.decode(input, fromFloat)
    val (si0, _, sFound) = ArgmaxKernel.argmax(v, vnorm, supers, superNorms)
    val si = if (sFound) si0 else 0
    val (ci, sim, cFound) =
      ArgmaxKernel.argmax(v, vnorm, childCents(si), childNorms(si))
    if (cFound) InternalRow(childCids(si)(ci), sim)
    else InternalRow(childCids(si)(0), null)
  }

  override def eval(input: InternalRow): Any =
    nearest(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hierNearestCentroid", this,
      classOf[HierarchicalNearestCentroid].getName)
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${c.code}
        $javaType ${ev.value} = $ref.nearest(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API for [[CosineSimilarity]]. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for [[NearestCentroid]]; `codebook` sorted ascending by cid. */
  def nearestCentroid(v: Column, codebook: Seq[(Long, Array[Double])]): Column = {
    val sorted = codebook.sortBy(_._1)
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray))
  }

  /** Column API for [[HierarchicalNearestCentroid]]: `groups` maps each
    * super (sid, super-centroid) to its non-empty children; sorted
    * ascending at both levels here.
    */
  def hierarchicalNearestCentroid(
      v: Column,
      groups: Seq[((Long, Array[Double]), Seq[(Long, Array[Double])])]): Column = {
    val sorted = groups.sortBy(_._1._1).map { case (s, kids) => (s, kids.sortBy(_._1)) }
    ColumnBridge.column(HierarchicalNearestCentroid(
      ColumnBridge.expression(v),
      sorted.map(_._1._1).toArray,
      sorted.map(_._1._2).toArray,
      sorted.map(_._2.map(_._1).toArray).toArray,
      sorted.map(_._2.map(_._2).toArray).toArray))
  }

  /** Column API for [[PackVector]]. */
  def packVector(v: Column): Column =
    ColumnBridge.column(PackVector(ColumnBridge.expression(v)))

  /** Column API for [[UnpackVector]]. */
  def unpackVector(b: Column): Column =
    ColumnBridge.column(UnpackVector(ColumnBridge.expression(b)))

  /** Column API for [[SqEncode]] (ranges copied to `Seq` so value-equal
    * ranges canonicalize to the same expression).
    */
  def sqEncode(v: Column, lo: Array[Double], hi: Array[Double]): Column =
    ColumnBridge.column(SqEncode(ColumnBridge.expression(v), lo.toSeq, hi.toSeq))
}
