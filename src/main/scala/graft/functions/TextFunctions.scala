package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SURVEY.md §2.D — text-analysis column builders.
  *
  * Pure Column→Column functions built from codegen'd built-ins (no UDFs):
  * they stay inside whole-stage codegen and scale linearly with the scan.
  * Each has an exact ANSI-SQL equivalent used by the DuckDB oracles.
  */
object TextFunctions {

  /** 60-bit md5-derived int64 (15 hex nibbles — the widest hex window that
    * fits a SIGNED int64 in both engines): THE cross-engine-reproducible
    * string hash, shared by every entry whose oracle must replay hashing
    * in SQL (MinHash universal hashes, SimHash, weighted-sampling
    * uniforms). Change it only together with [[md5IntSql]]. */
  def md5Int(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The DuckDB twin of [[md5Int]]. */
  def md5IntSql(x: String): String =
    s"(('0x' || substr(md5($x), 1, 15))::BIGINT)"

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Canonical form for fingerprinting/dedup: lower, strip non-alnum
    * (keep spaces), collapse whitespace. */
  def canonical(text: Column): Column =
    regexp_replace(
      regexp_replace(lower(trim(text)), "[^a-z0-9 ]", ""),
      "\\s+", " ")

  /** 128-bit content fingerprint of the canonical text (doc identity key
    * at 100 TB: dedup = one shuffle on this column). */
  def fingerprint(text: Column): Column = md5(canonical(text))

  /** Count of tokens drawn from a fixed stopword list (duplicates count). */
  def stopwordHits(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => t.isin(stops.map(x => x: Any): _*))).cast("long")

  /** The 0.3/0.4/0.3 length/diversity/stopword quality heuristic — the ONE
    * definition both txt_quality_score and the capstone pipeline gate use
    * (tuning it here changes both together). */
  def qualityScore(toks: Column): Column = {
    val n = size(toks).cast("double")
    lit(0.3) * least(lit(1.0), n / 100.0) +
      lit(0.4) * (size(array_distinct(toks)).cast("double") / n) +
      lit(0.3) * (stopwordHits(toks, stopsEn).cast("double") / n)
  }

  /** A stopword list as a SQL IN-list — the single source for every DuckDB
    * mirror, so tuning a list here updates both engines together. */
  def sqlInList(stops: Seq[String]): String = stops.map(w => s"'$w'").mkString(", ")

  /** DuckDB mirror of [[qualityScore]] over a token-list SQL expression. */
  def qualityScoreSqlExpr(toks: String): String =
    s"""0.3 * least(1.0, CAST(len($toks) AS DOUBLE) / 100.0)
       | + 0.4 * (CAST(len(list_distinct($toks)) AS DOUBLE) / CAST(len($toks) AS DOUBLE))
       | + 0.3 * (CAST(len(list_filter($toks, x -> x IN (${sqlInList(stopsEn)}))) AS DOUBLE)
       |          / CAST(len($toks) AS DOUBLE))""".stripMargin

  /** BPE-ish piece count: letter runs, digit runs, isolated symbols. */
  def bpePieces(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|\\S"), lit(0))).cast("long")

  // Stopword lists for the language-ID heuristic (votes per language).
  val stopsEn = Seq("the", "and", "of", "to", "in", "is", "a")
  val stopsDe = Seq("der", "die", "das", "und", "nicht", "ist", "ein")
  val stopsEs = Seq("el", "que", "los", "se", "por", "con", "una")
  val stopsFr = Seq("le", "les", "des", "et", "du", "dans", "pour")
}
