package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level helpers shared by the query catalog.
  *
  * Everything here is built from codegen'd Spark built-ins and is chosen to be
  * *portable*: each helper has an exact DuckDB-SQL equivalent, so catalog
  * queries can be hash-checked against the oracle bit-for-bit.
  *
  * The portable 60-bit hash is the foundation for MinHash / SimHash /
  * fingerprinting:
  *   Spark : conv(substr(md5(s), 1, 15), 16, 10)  cast to long
  *   DuckDB: CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
  * 15 hex digits = 60 bits, always non-negative, no sign/overflow mismatch.
  */
object GraftFunctions {

  /** Large prime for universal-hash permutations: fits products in a Long. */
  val HashP: Long = 1000000007L

  /** Deterministic 60-bit hash of a string column (md5-derived). */
  def graftHash(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  def r2(c: Column): Column = round(c, 2)
  def r4(c: Column): Column = round(c, 4)
  def r6(c: Column): Column = round(c, 6)

  /** Word tokens: lowercase alnum runs. DuckDB: regexp_extract_all(lower(x), '[a-z0-9]+') */
  def tokens(c: Column): Column =
    call_function("regexp_extract_all", lower(c), lit("[a-z0-9]+"), lit(0))

  /** BPE-ish tokens: letter runs, digit runs, single punctuation marks. */
  def bpeTokens(c: Column): Column =
    call_function("regexp_extract_all", c, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))

  /** Word k-shingles joined by a single space, 1-based element_at to mirror
    * DuckDB list indexing: transform(sequence(1, n-k+1), i -> t[i]..t[i+k-1]).
    * Empty array when the doc has fewer than k tokens.
    */
  def shingles(toks: Column, k: Int): Column = {
    val n = size(toks)
    val idx = when(n >= k, sequence(lit(1), n - lit(k - 1))).otherwise(array())
    transform(idx, i => concat_ws(" ", (0 until k).map(j => element_at(toks, (i + lit(j)).cast("int"))): _*))
  }

  /** Cosine similarity computed in double precision, sequential fold — exact
    * mirror of the DuckDB oracle expression
    * `list_sum(list_transform(list_zip(a::DOUBLE[], b::DOUBLE[]), x -> x[1]*x[2]))
    *  / (sqrt(..a..)*sqrt(..b..))`.
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(ad, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(bd, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }
}
