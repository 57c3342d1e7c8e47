package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.D — text analysis over `documents`.
  *
  * Everything is a single scan + narrow per-row expressions (codegen'd) or
  * one aggregation — no shuffles except where the semantics require one
  * (corpus-wide n-gram counts). At 100 TB each of these is a map-only pass.
  */
object TextAnalysis extends QueryModule {

  private def withToks(df: DataFrame): DataFrame =
    df.withColumn("toks", tokens(col("text")))

  // Per-doc token statistics.
  def tokenStats(s: SparkSession, d: String): DataFrame =
    withToks(Tables.documents(s, d))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        (length(regexp_replace(trim(col("text")), "\\s+", "")).cast("double")
          / size(col("toks"))).as("avg_token_chars"))

  private val tokenStatsSql =
    """SELECT doc_id,
      | len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
      | len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_distinct,
      | CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
      |   / len(regexp_split_to_array(trim(text), '\s+')) AS avg_token_chars
      |FROM documents""".stripMargin

  // Heuristic quality score: length, lexical diversity, stopword density —
  // the shared TextFunctions.qualityScore definition (also the capstone
  // pipeline's gate).
  def qualityScore(s: SparkSession, d: String): DataFrame =
    withToks(Tables.documents(s, d))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        round(graft.functions.TextFunctions.qualityScore(col("toks")), 6)
          .as("quality_score"))

  private val qualityScoreSql =
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents)
       |SELECT doc_id, len(toks) AS n_tokens,
       | round(${graft.functions.TextFunctions.qualityScoreSqlExpr("toks")}, 6) AS quality_score
       |FROM t""".stripMargin

  // n-gram/stopword-vote language ID; output = confusion matrix vs `lang`.
  def langId(s: SparkSession, d: String): DataFrame = {
    val h = Map(
      "en" -> stopwordHits(col("toks"), stopsEn),
      "de" -> stopwordHits(col("toks"), stopsDe),
      "es" -> stopwordHits(col("toks"), stopsEs),
      "fr" -> stopwordHits(col("toks"), stopsFr))
    val predicted =
      when(h("en") >= h("de") && h("en") >= h("es") && h("en") >= h("fr"), "en")
        .when(h("de") >= h("es") && h("de") >= h("fr"), "de")
        .when(h("es") >= h("fr"), "es")
        .otherwise("fr")
    withToks(Tables.documents(s, d))
      .select(col("lang"), predicted.as("predicted"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
  }

  private val langIdSql =
    """WITH t AS (SELECT lang, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      | h AS (SELECT lang,
      |   len(list_filter(toks, x -> x IN ('the','and','of','to','in','is','a'))) AS h_en,
      |   len(list_filter(toks, x -> x IN ('der','die','das','und','nicht','ist','ein'))) AS h_de,
      |   len(list_filter(toks, x -> x IN ('el','que','los','se','por','con','una'))) AS h_es,
      |   len(list_filter(toks, x -> x IN ('le','les','des','et','du','dans','pour'))) AS h_fr
      |  FROM t)
      |SELECT lang,
      | CASE WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
      |      WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
      |      WHEN h_es >= h_fr THEN 'es' ELSE 'fr' END AS predicted,
      | COUNT(*) AS n
      |FROM h GROUP BY 1, 2""".stripMargin

  // Canonical-text md5 fingerprint (the dedup identity key).
  def fingerprintQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"),
        length(canonical(col("text"))).cast("long").as("n_canon_chars"))

  private val fingerprintSql =
    """SELECT doc_id,
      | md5(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'), '\s+', ' ', 'g')) AS fp,
      | CAST(length(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'), '\s+', ' ', 'g')) AS BIGINT) AS n_canon_chars
      |FROM documents""".stripMargin

  // Corpus-wide top-20 bigrams (the one genuinely shuffling text op).
  // Relational bigram construction (posexplode → window lead) — the
  // explode-over-HOF form re-evaluates the tokenizer per lambda element in
  // interpreted mode (see Dedup.shingleIndex for the measured pathology).
  def topNgrams(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "t")))
      .select(col("doc_id"), concat_ws(" ", col("t"), lead("t", 1).over(w)).as("ngram"),
        lead("t", 1).over(w).as("t1"))
      .filter(col("t1").isNotNull)
      .groupBy("ngram")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("ngram"))
      .limit(20)
  }

  private val topNgramsSql =
    """WITH t AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      | g AS (SELECT unnest([toks[i] || ' ' || toks[i+1] FOR i IN generate_series(1, len(toks)-1)]) AS ngram FROM t)
      |SELECT ngram, COUNT(*) AS n FROM g GROUP BY ngram
      |ORDER BY n DESC, ngram LIMIT 20""".stripMargin

  // Winnowing fingerprint (rolling-hash document fingerprinting, MOSS-style:
  // char-8-gram hashes, minimum over each window of 8 consecutive grams,
  // distinct minima = the doc's fingerprint set). Distributed shape: the
  // per-position gram hash is a codegen'd expression after a position
  // explode (a single-node impl would roll the hash; per-gram md5 is the
  // order-free equivalent), the window minimum shares the doc_id shuffle.
  // md5-hex strings compare identically in any engine → exact oracle.
  def winnowFingerprint(s: SparkSession, d: String): DataFrame = {
    val K = 8; val W = 8
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(W - 1), Window.currentRow)
    Tables.documents(s, d)
      .filter(length(col("text")) >= K)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - (K - 1))).as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(col("text").substr(col("pos"), lit(K))).as("h"))
      .withColumn("fp", min("h").over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        countDistinct(col("fp")).as("n_fingerprints"))
  }

  private val winnowFingerprintSql =
    """WITH g AS (
      |  SELECT doc_id, i AS pos, md5(substring(text, CAST(i AS BIGINT), 8)) AS h
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text)-7)) AS i
      |        FROM documents WHERE length(text) >= 8)),
      | w AS (SELECT doc_id,
      |         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
      |                      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS fp
      |       FROM g)
      |SELECT doc_id, COUNT(*) AS n_windows, COUNT(DISTINCT fp) AS n_fingerprints
      |FROM w GROUP BY doc_id""".stripMargin

  // BPE-ish token-count estimate.
  def bpeEstimate(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), bpePieces(col("text")).as("n_pieces"))

  private val bpeEstimateSql =
    """SELECT doc_id, len(regexp_extract_all(text, '[a-z]+|[0-9]+|\S')) AS n_pieces
      |FROM documents""".stripMargin

  override def entries: Seq[(String, QueryFn, Option[String])] = Seq(
    ("txt_token_stats", tokenStats _, Some(tokenStatsSql)),
    ("txt_quality_score", qualityScore _, Some(qualityScoreSql)),
    ("txt_lang_id", langId _, Some(langIdSql)),
    ("txt_fingerprint", fingerprintQ _, Some(fingerprintSql)),
    ("txt_top_ngrams", topNgrams _, Some(topNgramsSql)),
    ("txt_winnow_fingerprint", winnowFingerprint _, Some(winnowFingerprintSql)),
    ("txt_bpe_token_estimate", bpeEstimate _, Some(bpeEstimateSql)))
}
