package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared by every operator module.
  *
  * Correctness-critical convention (see SURVEY.md §6): all aggregated money
  * math runs on DECIMAL so sums are exact and reduction-order-independent —
  * a raw double sum differs between Spark's parallel partial aggregates and
  * DuckDB's sequential fold. Per-row arithmetic stays in DOUBLE (IEEE ops are
  * engine-identical), is cast once to a decimal whose scale covers the exact
  * value, summed exactly, and cast back to DOUBLE for output.
  */
private[graft] object Cols {
  /** Cast a per-row double expression to an exact decimal of scale `s`. */
  def dec(c: Column, s: Int): Column = c.cast(DecimalType(18, s))

  /** Exact, order-independent sum of a double expression with `s` true
    * decimal places, returned as double. */
  def sumExact(c: Column, s: Int): Column = sum(dec(c, s)).cast("double")

  /** Timestamp literal (session TZ is UTC, matching DuckDB's naive TS). */
  def ts(lit0: String): Column = lit(lit0).cast("timestamp")

  /** Exact mean: decimal sum / count, both as double (engine-identical). */
  def avgExact(c: Column, s: Int): Column =
    sumExact(c, s) / count(lit(1))

  /** Portable 6-decimal rounding for NON-NEGATIVE per-row values:
    * floor(x·1e6 + 0.5)/1e6 is the same arithmetic on both engines,
    * where round(x, 6) tie-breaks HALF_UP in Spark but HALF_EVEN in
    * DuckDB — integer-ratio signals (quality scores, token fractions)
    * land exactly on .5 boundaries often enough to flip an oracle. The
    * SQL twin must use the identical floor form. */
  def fp6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** Portable 4-decimal rounding for ranked similarity scores (cosine in
    * [-1, 1]): the same floor device as [[fp6]]. On negatives floor(+0.5)
    * is round-half-toward-+∞ rather than half-away-from-zero — identical
    * on both engines, which is the point: round(x, 4) tie-breaks HALF_UP
    * in Spark but HALF_EVEN in DuckDB, a latent oracle flip the suite
    * convention closes (ADVICE r4, swept suite-wide; ANN scores r8). The
    * SQL twin must use the identical floor form. */
  def fp4(c: Column): Column = floor(c * 1e4 + 0.5) / 1e4

  /** SQL twin of [[fp4]]: ONE definition emits the floor fragment into
    * every DuckDB oracle string, the same one-definition-two-engines
    * pairing as md5Int/md5IntSql — an inlined copy that drifts from
    * [[fp4]] is a cross-engine hash flip waiting to happen (VERDICT r8
    * "what's missing" #3). */
  def fp4Sql(x: String): String = s"floor(($x) * 1e4 + 0.5) / 1e4"

  /** [[fp4]] kept in fixed-point (LONG ×1e4) for integer score arithmetic
    * (the MMR mix) — Scala twin of [[fp4FixSql]]. */
  def fp4Fix(c: Column): Column = floor(c * 1e4 + 0.5).cast("long")

  /** [[fp4Sql]] kept in fixed-point (BIGINT ×1e4) for oracle stages that
    * do integer arithmetic on scores before the final descale (MMR's
    * 7·sfp − 3·max sim mix). */
  def fp4FixSql(x: String): String = s"CAST(floor(($x) * 1e4 + 0.5) AS BIGINT)"

  /** SQL twin of [[fp6]] — same device, 6 decimal places. */
  def fp6Sql(x: String): String = s"floor(($x) * 1e6 + 0.5) / 1e6"
}
