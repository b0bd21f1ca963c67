package graft.sources.reftable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * Range-clustering on `(a, b)` lexicographically gives tight per-file
  * bounds on `a` only — a filter on `b` alone skips nothing. Interleaving
  * the bits of per-column quantile-bucket ids instead gives every file a
  * contiguous z-range, which projects to a bounded window in EVERY
  * dimension: with 8-bit buckets and 2^s files, each file spans roughly a
  * 2^-(s/d) fraction of each of the d dimensions, so the `_STATS.json`
  * manifest ([[RefTableStats]]) prunes selective filters on any clustered
  * column. This is the standard layout technique (Morton 1966; Delta/
  * Iceberg OPTIMIZE ZORDER BY) re-expressed as one narrow Spark pass.
  *
  * Bucket ids come from `approxQuantile` boundaries computed once at
  * publish time (equi-depth, so skew cannot collapse the curve onto a few
  * codes), mapped per row by a binary-search UDF — a deliberate exception
  * to the functions-not-UDFs rule: it runs once per published row in a
  * narrow write pass, not in any query hot path, and a 255-term expression
  * chain per column would be slower to compile than the lookup costs. The
  * bit interleave itself is plain codegen'd column arithmetic.
  */
object ZOrder {

  private val Bits = 8 // 256 equi-depth buckets per column

  /** A long z-value column interleaving `cols` (numeric, date or
    * timestamp; ≤ 7 columns). Dates bucket on epoch days and timestamps on
    * epoch seconds — only the ORDER matters for bucketing, so any
    * monotonic numeric image works. Nulls bucket to 0 and therefore
    * cluster together at the curve start.
    */
  def zColumn(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty && cols.size <= 7, "z-order needs 1..7 columns")
    val images: Seq[Column] = cols.map { c =>
      val f = df.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"z-order column '$c' not in schema"))
      f.dataType match {
        case _: NumericType => col(c).cast("double")
        case org.apache.spark.sql.types.DateType =>
          datediff(col(c), lit("1970-01-01")).cast("double")
        case org.apache.spark.sql.types.TimestampType => col(c).cast("double")
        case other => throw new IllegalArgumentException(
          s"z-order column '$c' must be numeric/date/timestamp, got ${other.simpleString}")
      }
    }
    val probs = (1 until (1 << Bits)).map(_.toDouble / (1 << Bits)).toArray
    // quantiles run over the numeric images; one batched job for all
    // columns, not one job per column
    val imageNames = cols.indices.map(i => s"__graft_z_img_$i")
    val imaged = df.select(cols.indices.map(i => images(i).as(imageNames(i))): _*)
    val allBounds = imaged.stat.approxQuantile(imageNames.toArray, probs, 0.001)
    val buckets: Seq[Column] = images.zip(allBounds.toIndexedSeq).map { case (img, bounds) =>
      val lookup = udf { (v: java.lang.Double) =>
        if (v == null) 0
        else {
          val i = java.util.Arrays.binarySearch(bounds, v.doubleValue())
          val ip = if (i >= 0) i + 1 else -i - 1 // boundaries <= v
          math.min(ip, (1 << Bits) - 1)
        }
      }
      lookup(img)
    }
    // interleave: output bit (i*d + j) = bit i of column j's bucket
    val d = buckets.size
    val terms = for (i <- 0 until Bits; j <- 0 until d) yield
      shiftleft(buckets(j).bitwiseAND(1 << i).cast("long"), i * (d - 1) + j)
    terms.reduce(_.bitwiseOR(_))
  }
}
