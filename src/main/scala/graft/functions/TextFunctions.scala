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

  /** BPE-ish piece count: letter runs, digit runs, isolated symbols. */
  def bpePieces(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|\\S"), lit(0))).cast("long")

  // Stopword lists for the language-ID heuristic (votes per language).
  val stopsEn = Seq("the", "and", "of", "to", "in", "is", "a")
  val stopsDe = Seq("der", "die", "das", "und", "nicht", "ist", "ein")
  val stopsEs = Seq("el", "que", "los", "se", "por", "con", "una")
  val stopsFr = Seq("le", "les", "des", "et", "du", "dans", "pour")
}
