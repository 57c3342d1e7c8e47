package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SURVEY.md §2.F — vector math over `array<float>` embedding columns.
  *
  * All math is done in DOUBLE with a sequential left fold so results are
  * bit-identical to the DuckDB oracle's list comprehension + list_sum.
  * The SQL-string builders generate the oracle side from the same shape,
  * keeping both engines' evaluation order pinned.
  */
object VectorFunctions {

  /** Dot product in double (sequential fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity given precomputed norms (dot / (na * nb)) —
    * precomputing norms once per row is the at-scale shape. */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Sign-LSH bucket from the first `bits` dimensions (the 100 TB path:
    * same-bucket join replaces the O(n²) cross join). */
  def signBucket(emb: Column, bits: Int): Column =
    (0 until bits)
      .map(k => when(element_at(emb, k + 1) >= 0, lit(1L << k)).otherwise(lit(0L)))
      .reduce(_ + _)

  // ---- DuckDB oracle SQL builders (same math, same order) ----------------

  def dotSql(a: String, b: String): String =
    s"list_sum([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) FOR i IN generate_series(1, len($a))])"

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  def signBucketSql(emb: String, bits: Int): String =
    (0 until bits)
      .map(k => s"(CASE WHEN $emb[${k + 1}] >= 0 THEN ${1L << k} ELSE 0 END)")
      .mkString("CAST((", " + ", ") AS BIGINT)") // BIGINT: match Spark's long
}
