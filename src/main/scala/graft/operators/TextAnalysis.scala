package graft.operators

import graft.{Cols, QueryModule, Tables}
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
        Cols.fp6(graft.functions.TextFunctions.qualityScore(col("toks")))
          .as("quality_score"))

  private val qualityScoreSql =
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents)
       |SELECT doc_id, len(toks) AS n_tokens,
       | floor((${graft.functions.TextFunctions.qualityScoreSqlExpr("toks")}) * 1e6 + 0.5) / 1e6 AS quality_score
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
    s"""WITH t AS (SELECT lang, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
      | h AS (SELECT lang,
      |   len(list_filter(toks, x -> x IN (${sqlInList(stopsEn)}))) AS h_en,
      |   len(list_filter(toks, x -> x IN (${sqlInList(stopsDe)}))) AS h_de,
      |   len(list_filter(toks, x -> x IN (${sqlInList(stopsEs)}))) AS h_es,
      |   len(list_filter(toks, x -> x IN (${sqlInList(stopsFr)}))) AS h_fr
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
  // Bigrams come from the count-preserving native kernel (plans.WordNgrams
  // — one codegen'd loop per row), so the only shuffle left is the
  // map-side-combined aggregate on the gram itself; the r4 relational
  // build paid an extra full-corpus token shuffle on doc_id for its
  // window lead first.
  def topNgrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(org.apache.spark.sql.GraftColumns.column(
        graft.plans.WordNgrams(
          org.apache.spark.sql.GraftColumns.expression(col("text")), 2))).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("ngram"))
      .limit(20)

  private val topNgramsSql =
    """WITH t AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      | g AS (SELECT unnest([toks[i] || ' ' || toks[i+1] FOR i IN generate_series(1, len(toks)-1)]) AS ngram FROM t)
      |SELECT ngram, COUNT(*) AS n FROM g GROUP BY ngram
      |ORDER BY n DESC, ngram LIMIT 20""".stripMargin

  // Winnowing fingerprint (rolling-hash document fingerprinting, MOSS-style:
  // char-8-gram hashes, minimum over each window of 8 consecutive grams,
  // distinct minima = the doc's fingerprint set).
  //
  // Distributed rolling hash (VERDICT r2 #3 — replaces md5-per-gram, whose
  // full digest per character offset was the suite's top constant factor):
  // explode the text to one row per CHARACTER (computed once), then build
  // each gram's hash from 8 window `lead`s — cheap codegen'd integer ops on
  // an already-sorted partition, the relational equivalent of rolling the
  // hash forward one char at a time. The pack is base-128 positional
  // (7 bits × 8 chars = 56 bits, exact in a BIGINT in both engines); an
  // LCG-style mix ((packed % M) * A + C) % M with M = 2^31-1 decorrelates
  // the window-min choice from raw prefix order (winnowing wants a
  // pseudo-random min), stays < 2^62 (no overflow in Java long OR DuckDB
  // BIGINT), and is bit-identical cross-engine → exact oracle. Both window
  // passes share one doc_id shuffle + sort.
  /** Shared winnowing pipeline: one row per gram-window position with its
    * selected fingerprint `fp` (columns doc_id, pos, fp). Both the per-doc
    * stats entry and the cross-doc substring-duplication pairs
    * (Dedup.winnowPairs) consume this.
    *
    * As of r4 the per-doc minima come from the NATIVE kernel
    * (plans.WinnowFingerprints — one codegen'd loop per row): the
    * relational form below shuffles every CHARACTER of the corpus on
    * doc_id just to sort positions the string already holds in order.
    * One posexplode of the fingerprint array replaces char-explode + two
    * windows; values are bit-identical (WinnowPropertySpec asserts
    * element-for-element equality, incl. non-ASCII), so the DuckDB CTE
    * oracle — which replays the relational math — is unchanged. */
  private[graft] def winnowed(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(org.apache.spark.sql.GraftColumns.column(
        graft.plans.WinnowFingerprints(
          org.apache.spark.sql.GraftColumns.expression(col("text")))))
        .as(Seq("pos0", "fp")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("fp"))

  /** The DISTINCT winnow fingerprint set per doc, deduplicated MAP-SIDE
    * (array_distinct on the kernel's array before the explode) for
    * consumers that only need the (doc_id, fp) set: winnow minima repeat
    * across ~W consecutive positions, so this shrinks the exploded frame
    * ~4-8× and removes the (doc_id, fp) distinct shuffle entirely —
    * per-doc uniqueness is already guaranteed when the rows are born.
    * Equals winnowed(docs).select(doc_id, fp).distinct() by construction
    * (WinnowPropertySpec asserts it). */
  private[graft] def winnowedDistinct(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(org.apache.spark.sql.GraftColumns.column(
        graft.plans.WinnowFingerprints(
          org.apache.spark.sql.GraftColumns.expression(col("text")))))).as("fp"))

  /** The engine-portable relational twin of the native kernel — kept as
    * the cross-engine specification (the DuckDB oracle CTE mirrors THIS
    * shape) and as WinnowPropertySpec's parity reference. */
  private[graft] def winnowedRelational(docs: DataFrame): DataFrame = {
    val K = 8; val W = 8
    val B = 128L; val M = 2147483647L; val A = 1103515245L; val C = 12345L
    val wLead = Window.partitionBy("doc_id").orderBy("pos")
    val wMin = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(W - 1), Window.currentRow)
    // packed = sum_k code(pos+k) * B^(K-1-k); null once any lead runs off
    // the end of the doc, which is exactly the invalid gram starts.
    val packed = (0 until K).map { k =>
      lead(col("c"), k).over(wLead) * lit(math.pow(B.toDouble, (K - 1 - k).toDouble).toLong)
    }.reduce(_ + _)
    docs
      .filter(length(col("text")) >= K)
      .select(col("doc_id"), posexplode(split(col("text"), "")).as(Seq("pos0", "ch")))
      // split(_, "") with the default -1 limit keeps a trailing "" element;
      // drop it or the last K-1 grams would read a phantom 0-code char
      .filter(col("ch") =!= "")
      .select(col("doc_id"), (col("pos0") + 1).as("pos"),
        pmod(ascii(col("ch")), lit(128)).cast("long").as("c"))
      .withColumn("packed", packed)
      .filter(col("packed").isNotNull)
      .withColumn("h", pmod(pmod(col("packed"), lit(M)) * A + C, lit(M)))
      .withColumn("fp", min("h").over(wMin))
      .select("doc_id", "pos", "fp")
  }

  /** DuckDB mirror of [[winnowed]] as a WITH-clause body: defines CTE `w2`
    * with (doc_id, pos, fp). Interpolated into every winnow oracle so the
    * two engines' pipelines cannot drift apart. */
  private[graft] val winnowedSqlCte =
    """c AS (
      |  SELECT doc_id, i AS pos,
      |    CAST(ascii(substring(text, CAST(i AS BIGINT), 1)) % 128 AS BIGINT) AS c
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
      |        FROM documents WHERE length(text) >= 8)),
      | p AS (
      |  SELECT doc_id, pos,
      |    c * 562949953421312 + lead(c, 1) OVER w * 4398046511104
      |      + lead(c, 2) OVER w * 34359738368 + lead(c, 3) OVER w * 268435456
      |      + lead(c, 4) OVER w * 2097152 + lead(c, 5) OVER w * 16384
      |      + lead(c, 6) OVER w * 128 + lead(c, 7) OVER w AS packed
      |  FROM c WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      | g AS (
      |  SELECT doc_id, pos,
      |    ((packed % 2147483647) * 1103515245 + 12345) % 2147483647 AS h
      |  FROM p WHERE packed IS NOT NULL),
      | w2 AS (SELECT doc_id, pos,
      |         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
      |                      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS fp
      |       FROM g)""".stripMargin

  def winnowFingerprint(s: SparkSession, d: String): DataFrame =
    winnowed(Tables.documents(s, d))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        countDistinct(col("fp")).as("n_fingerprints"))

  private val winnowFingerprintSql =
    s"""WITH $winnowedSqlCte
      |SELECT doc_id, COUNT(*) AS n_windows, COUNT(DISTINCT fp) AS n_fingerprints
      |FROM w2 GROUP BY doc_id""".stripMargin

  // Gopher-style rule filter (Rae et al. 2021, "Scaling Language Models" —
  // the public rule set most LLM-corpus pipelines start from): per-doc
  // structural signals + a hard pass/fail. All codegen'd expressions; at
  // 100 TB this is a map-only pass whose `passes` column is the pushdown
  // predicate for every downstream stage. Thresholds adapted to the test
  // corpus scale (real Gopher: 50..100k words, mean len 3..10, >=80%
  // alphabetic, >=2 stopword hits).
  def gopherRules(s: SparkSession, d: String): DataFrame = {
    val df = withToks(Tables.documents(s, d))
    val n = size(col("toks")).cast("long")
    val meanLen = aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x))
      .cast("double") / n
    val alphaFrac = size(filter(col("toks"), x => x.rlike("[a-z]")))
      .cast("double") / n
    val stopHits = stopwordHits(col("toks"), stopsEn)
    df.select(col("doc_id"), n.as("n_words"),
      Cols.fp6(meanLen).as("mean_word_len"),
      Cols.fp6(alphaFrac).as("alpha_frac"),
      stopHits.as("stop_hits"),
      (n.between(50, 100000) && meanLen.between(3.0, 10.0)
        && alphaFrac > 0.8 && stopHits >= 2).as("passes"))
  }

  private val gopherRulesSql =
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
       | m AS (SELECT doc_id,
       |   len(toks) AS n_words,
       |   CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS mean_word_len,
       |   CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(toks) AS alpha_frac,
       |   len(list_filter(toks, x -> x IN (${sqlInList(stopsEn)}))) AS stop_hits
       |  FROM t)
       |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       | floor(mean_word_len * 1e6 + 0.5) / 1e6 AS mean_word_len,
       | floor(alpha_frac * 1e6 + 0.5) / 1e6 AS alpha_frac,
       | CAST(stop_hits AS BIGINT) AS stop_hits,
       | (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
       |  AND alpha_frac > 0.8 AND stop_hits >= 2) AS passes
       |FROM m""".stripMargin

  /** Quality bar for the funnel's final gate: the survivor median at
    * sf0.01 is 0.393, so 0.39 splits the tail meaningfully (a corpus
    * pipeline tunes this against downstream evals). */
  private val FunnelQBar = 0.39

  /** FILTER FUNNEL — the selection-audit artifact every production corpus
    * pipeline publishes next to its output: each doc is attributed to the
    * FIRST gate it fails (lang → length → word shape → stopwords →
    * quality), and the funnel reports n_in/n_dropped/n_out per stage. This
    * is how a pipeline owner answers "where did my 100 TB go" and spots a
    * mis-tuned gate (a stage suddenly eating 40% is a regression alarm).
    * Shape: the per-doc signals are the SAME codegen'd expressions as
    * txt_gopher_rules/txt_quality_score (one definition, funnel cannot
    * drift from the gates it audits); the whole corpus reduces to ONE
    * partial-aggregable row of conditional counts, and the 5-stage
    * waterfall unrolls as literal column arithmetic on that row — no
    * global window, no triangular join, map-only at any scale.
    * Split into [[funnelStages]] (per-doc labeling) + a (stage, n)
    * counts→waterfall finisher so the streaming twin shares both halves. */
  /** Per-doc first-failed-gate label — the map-only half, shared VERBATIM
    * with the streaming twin (st_filter_funnel) so the live monitor
    * cannot drift from the batch audit. `docs` needs (text, lang). */
  private[graft] def funnelStages(docs: DataFrame): DataFrame = {
    val n = size(col("toks")).cast("long")
    val meanLen = aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x))
      .cast("double") / n
    val alphaFrac = size(filter(col("toks"), x => x.rlike("[a-z]")))
      .cast("double") / n
    val stopHits = stopwordHits(col("toks"), stopsEn)
    val q = graft.functions.TextFunctions.qualityScore(col("toks"))
    val firstFail = when(col("lang") =!= "en", lit("1_lang"))
      .when(!n.between(50, 100000), lit("2_length"))
      .when(!(meanLen.between(3.0, 10.0) && alphaFrac > 0.8), lit("3_word_shape"))
      .when(stopHits < 2, lit("4_stopwords"))
      .when(q < FunnelQBar, lit("5_quality"))
      .otherwise(lit("kept"))
    docs.withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))
      .select(col("doc_id"), firstFail.as("stage"))
  }

  /** (stage, n) counts → the 5-row waterfall. Literal column arithmetic
    * on a one-row conditional-sum frame — no global window, no
    * triangular join. */
  private[graft] def funnelFromStageCounts(counts: DataFrame): DataFrame = {
    val one = counts
      .agg(sum(col("n")).as("total"),
        sum(when(col("stage") === "1_lang", col("n")).otherwise(0L)).as("d1"),
        sum(when(col("stage") === "2_length", col("n")).otherwise(0L)).as("d2"),
        sum(when(col("stage") === "3_word_shape", col("n")).otherwise(0L)).as("d3"),
        sum(when(col("stage") === "4_stopwords", col("n")).otherwise(0L)).as("d4"),
        sum(when(col("stage") === "5_quality", col("n")).otherwise(0L)).as("d5"))
    val in1 = col("total")
    val in2 = in1 - col("d1"); val in3 = in2 - col("d2")
    val in4 = in3 - col("d3"); val in5 = in4 - col("d4")
    one.select(explode(array(
      struct(lit("1_lang").as("stage"), in1.as("n_in"), col("d1").as("n_dropped"), in2.as("n_out")),
      struct(lit("2_length").as("stage"), in2.as("n_in"), col("d2").as("n_dropped"), in3.as("n_out")),
      struct(lit("3_word_shape").as("stage"), in3.as("n_in"), col("d3").as("n_dropped"), in4.as("n_out")),
      struct(lit("4_stopwords").as("stage"), in4.as("n_in"), col("d4").as("n_dropped"), in5.as("n_out")),
      struct(lit("5_quality").as("stage"), in5.as("n_in"), col("d5").as("n_dropped"),
        (in5 - col("d5")).as("n_out")))).as("f"))
      .select(col("f.stage").as("stage"), col("f.n_in").as("n_in"),
        col("f.n_dropped").as("n_dropped"), col("f.n_out").as("n_out"))
  }

  def filterFunnel(s: SparkSession, d: String): DataFrame =
    funnelFromStageCounts(
      funnelStages(Tables.documents(s, d))
        .groupBy("stage").agg(count(lit(1)).as("n")))

  /** WITH-clause body yielding `f` = (doc_id, stage) — the per-doc
    * first-failed-gate relation, shared verbatim with the curated-corpus
    * capstone oracle (PipelineOps) so the two cannot drift. */
  private[graft] val funnelStageCtes =
    s"""t AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
       | m AS (SELECT doc_id, lang,
       |   len(toks) AS n_words,
       |   CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS mean_word_len,
       |   CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(toks) AS alpha_frac,
       |   len(list_filter(toks, x -> x IN (${sqlInList(stopsEn)}))) AS stop_hits,
       |   ${qualityScoreSqlExpr("toks")} AS q
       |  FROM t),
       | f AS (SELECT doc_id, CASE WHEN lang != 'en' THEN '1_lang'
       |   WHEN n_words NOT BETWEEN 50 AND 100000 THEN '2_length'
       |   WHEN NOT (mean_word_len BETWEEN 3.0 AND 10.0 AND alpha_frac > 0.8) THEN '3_word_shape'
       |   WHEN stop_hits < 2 THEN '4_stopwords'
       |   WHEN q < $FunnelQBar THEN '5_quality'
       |   ELSE 'kept' END AS stage FROM m)""".stripMargin

  private[graft] val filterFunnelSql =
    s"""WITH $funnelStageCtes,
       | one AS (SELECT COUNT(*) AS total,
       |   CAST(SUM(CASE WHEN stage = '1_lang' THEN 1 ELSE 0 END) AS BIGINT) AS d1,
       |   CAST(SUM(CASE WHEN stage = '2_length' THEN 1 ELSE 0 END) AS BIGINT) AS d2,
       |   CAST(SUM(CASE WHEN stage = '3_word_shape' THEN 1 ELSE 0 END) AS BIGINT) AS d3,
       |   CAST(SUM(CASE WHEN stage = '4_stopwords' THEN 1 ELSE 0 END) AS BIGINT) AS d4,
       |   CAST(SUM(CASE WHEN stage = '5_quality' THEN 1 ELSE 0 END) AS BIGINT) AS d5
       |  FROM f)
       |SELECT '1_lang' AS stage, total AS n_in, d1 AS n_dropped, total - d1 AS n_out FROM one
       |UNION ALL SELECT '2_length', total - d1, d2, total - d1 - d2 FROM one
       |UNION ALL SELECT '3_word_shape', total - d1 - d2, d3, total - d1 - d2 - d3 FROM one
       |UNION ALL SELECT '4_stopwords', total - d1 - d2 - d3, d4, total - d1 - d2 - d3 - d4 FROM one
       |UNION ALL SELECT '5_quality', total - d1 - d2 - d3 - d4, d5,
       |  total - d1 - d2 - d3 - d4 - d5 FROM one""".stripMargin

  // PII scrub — the redaction pass every LLM corpus pipeline runs before
  // training. The test corpus ships no PII, so the entry first SYNTHESIZES
  // deterministic PII per doc (an email and a phone derived from doc_id —
  // same pattern as the multimodal header synthesis: build realistic input,
  // then treat it as opaque), then scrubs with the email/phone regexes and
  // emits match counts + the scrubbed-text digest. The digest is the real
  // cross-engine check: both regex engines must match EXACTLY the same
  // spans. Map-only codegen'd pass at any scale.
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\d{3}-\\d{4}"

  def piiScrub(s: SparkSession, d: String): DataFrame = {
    val raw = concat(col("text"), lit(" contact user"), col("doc_id"),
      lit("@example.com or 555-01"), lpad(pmod(col("doc_id"), lit(100)), 2, "0"))
    val scrubbed = regexp_replace(
      regexp_replace(raw, EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]")
    Tables.documents(s, d).select(col("doc_id"),
      regexp_count(raw, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(raw, lit(PhoneRe)).cast("long").as("n_phones"),
      (length(raw) - length(scrubbed)).cast("long").as("chars_removed"),
      md5(scrubbed).as("scrubbed_md5"))
  }

  private val piiScrubSql =
    """WITH r AS (
      |  SELECT doc_id,
      |    text || ' contact user' || doc_id || '@example.com or 555-01'
      |      || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS raw
      |  FROM documents),
      | sc AS (
      |  SELECT doc_id, raw,
      |    regexp_replace(regexp_replace(raw,
      |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
      |      '\d{3}-\d{4}', '[PHONE]', 'g') AS scrubbed
      |  FROM r)
      |SELECT doc_id,
      | CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
      | CAST(len(regexp_extract_all(raw, '\d{3}-\d{4}')) AS BIGINT) AS n_phones,
      | CAST(length(raw) - length(scrubbed) AS BIGINT) AS chars_removed,
      | md5(scrubbed) AS scrubbed_md5
      |FROM sc""".stripMargin

  // BPE-ish token-count estimate.
  def bpeEstimate(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), bpePieces(col("text")).as("n_pieces"))

  private val bpeEstimateSql =
    """SELECT doc_id, len(regexp_extract_all(text, '[a-z]+|[0-9]+|\S')) AS n_pieces
      |FROM documents""".stripMargin

  /** Corpus-relative unigram statistics — the integer-exact core of a
    * unigram-LM quality filter (the CCNet-style "does this doc look like
    * the corpus" signal per-doc heuristics can't give): build the corpus
    * unigram table (one shuffle on token; the hot token collapses map-side
    * in the partial agg), join token occurrences back (second token-key
    * shuffle — hot tokens are exactly the head of a Zipf curve, so this
    * join is SALTED; see the in-body note), and reduce per doc:
    *  - mean corpus frequency of the doc's tokens (common-language docs
    *    high, gibberish low) — integer sum / count, one IEEE division;
    *  - hapax count (tokens occurring once in the whole corpus — the
    *    rare-junk detector);
    *  - distinct-token ratio.
    * All-integer accumulation, so the oracle is exact (a float unigram
    * LOG-prob would hit libm last-ulp divergence cross-engine; the
    * frequency statistics carry the same ordering signal exactly). */
  def unigramStats(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
    val freq = toks.groupBy("t").agg(count(lit(1)).as("cf"))
    // SALTED token join (VERDICT r4 missing #3, made real): the corpus
    // frequency table joins back on the token, and a Zipf head token would
    // serialize one reducer. AQE's skew-join CANNOT rescue this shape —
    // OptimizeSkewedJoin only matches a sort-merge join whose sorts sit
    // DIRECTLY on shuffle stages, and the freq side always carries its
    // final aggregate between the two — so the salt is structural: spread
    // hot-token rows by doc hash, replicate the vocab row per salt.
    // Exactness under a hostile Zipf corpus is asserted in SkewSpec.
    graft.functions.Skew.saltedJoin(toks, freq, "t", 8, col("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("cf")).cast("double") / count(lit(1))).as("mean_tok_freq"),
        sum(when(col("cf") === 1, 1L).otherwise(0L)).as("n_hapax"),
        (countDistinct(col("t")).cast("double") / count(lit(1))).as("distinct_ratio"))
  }

  private val unigramStatsSql =
    """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      |            FROM documents),
      | freq AS (SELECT t, COUNT(*) AS cf FROM tok GROUP BY t)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      | CAST(SUM(cf) AS DOUBLE) / COUNT(*) AS mean_tok_freq,
      | CAST(SUM(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      | CAST(COUNT(DISTINCT t) AS DOUBLE) / COUNT(*) AS distinct_ratio
      |FROM tok JOIN freq USING (t)
      |GROUP BY doc_id""".stripMargin

  /** Shared per-doc unigram-surprisal substrate — the ONE definition of
    * "nll/token under the corpus unigram LM" that txt_unigram_logprob
    * (the raw filter signal) and txt_perplexity_bucket (the tiering on
    * top) both read, so the fixed-point device cannot drift between
    * them (r11 review). nll/token = ln(N_total) − avg ln(cf_t). Float
    * sums are order-dependent, so ln values are rounded to FIXED-POINT
    * micro-nats BEFORE summation (the emb_centroid_per_label device):
    * the per-doc sum is exact integer arithmetic — order-independent,
    * bit-identical in any engine — and the per-token division floors
    * back to a µ-nat LONG. floor(x+0.5), not round(): Spark rounds
    * HALF_UP, DuckDB HALF_EVEN — a tie at the fixed-point boundary of
    * an ln-derived double would flip the oracle red (the quantizeInt8
    * device, applied per ADVICE r4); ln(cf) >= 0 so floor(x+0.5) ==
    * HALF_UP here. Plan: token explode → corpus frequencies on one term
    * shuffle (SALTED — Zipf heads, as unigramStats); N_total = Σcf over
    * the vocab-sized aggregate (not a second corpus scan), broadcast as
    * the 1-row scalar. Returns (doc_id, n_chars, n_tokens, nll_fp). */
  private def perDocNll(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"), explode(tokens(col("text"))).as("t"))
    val freq = toks.groupBy("t").agg(count(lit(1)).as("cf"))
    val total = freq.agg(sum("cf").as("n_total"))
    val lnFp: Column => Column =
      c => floor(log(c.cast("double")) * lit(1e6) + 0.5).cast("long")
    graft.functions.Skew.saltedJoin(toks, freq, "t", 8, col("doc_id"))
      .crossJoin(broadcast(total))
      .groupBy("doc_id", "n_chars", "n_total")
      .agg(count(lit(1)).as("n_tokens"), sum(lnFp(col("cf"))).as("sum_lncf_fp"))
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        floor((lnFp(col("n_total")) * col("n_tokens") - col("sum_lncf_fp"))
          .cast("double") / col("n_tokens") + 0.5).cast("long").as("nll_fp"))
  }

  /** The SQL twin of [[perDocNll]]: the WITH-clause prefix both oracles
    * open with — one definition, two consumers, zero drift. */
  private val perDocNllCtes =
    """tok AS (SELECT doc_id, n_chars,
      |    unnest(regexp_split_to_array(trim(text), '\s+')) AS t FROM documents),
      | freq AS (SELECT t, COUNT(*) AS cf FROM tok GROUP BY t),
      | n AS (SELECT COUNT(*) AS n_total FROM tok),
      | perdoc AS (SELECT doc_id, n_chars, COUNT(*) AS n_tokens,
      |    CAST(floor(CAST(CAST(floor(ln(CAST(n_total AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) * COUNT(*)
      |        - SUM(CAST(floor(ln(CAST(cf AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
      |      / COUNT(*) + 0.5) AS BIGINT) AS nll_fp
      |  FROM tok JOIN freq USING (t) CROSS JOIN n
      |  GROUP BY doc_id, n_chars, n_total)""".stripMargin

  /** Per-doc negative log-likelihood under the corpus unigram LM — the
    * CCNet-style perplexity filter ("does this doc look like the
    * corpus"), the standard soft quality signal next to the hard Gopher
    * gates. The raw per-doc read of [[perDocNll]]. */
  def unigramLogprob(s: SparkSession, d: String): DataFrame =
    perDocNll(s, d).select(col("doc_id"), col("n_tokens"),
      (col("nll_fp").cast("double") / 1e6).as("nll_per_token"))

  private val unigramLogprobSql =
    s"""WITH $perDocNllCtes
       |SELECT doc_id, n_tokens, CAST(nll_fp AS DOUBLE) / 1e6 AS nll_per_token
       |FROM perdoc""".stripMargin

  /** CCNet's perplexity TIERING on top of the unigram-LM surprisal
    * (Wenzek et al. 2020 split the corpus into head/middle/tail by LM
    * perplexity; training pipelines route the tiers differently): each
    * doc's nll/token ([[perDocNll]], µ-nat LONGs) is banded into 5
    * tiers of 0.02 nats around the CORPUS MEAN (unigram surprisal
    * varies far less per doc than full-LM perplexity — the corpus-level
    * σ is ~0.03 nats — so the bands are sized to the signal), and the
    * entry reports each band's population, mean length, and mean
    * surprisal. Banding by mean-relative thresholds rather than ntile
    * is the 100 TB-honest choice: quantile assignment needs a
    * corpus-wide rank (a global sort), while the mean is one scalar
    * aggregate and the banding is then map-only — the same reason the
    * histogram entry uses fixed decades. All threshold arithmetic is
    * exact integer µ-nats (shift → clamp → integer-divide, positive
    * operands so truncation == floor in both engines); only the
    * per-band means return to float. */
  def perplexityBucket(s: SparkSession, d: String): DataFrame = {
    // materialized: BOTH the mean aggregate and the banding read the one
    // expensive token-join frame
    val perDoc = graft.Checkpoints.materialize(perDocNll(s, d))
    // corpus mean in integer µ-nats: DIV (truncating; operands positive),
    // nullif-guarded for the empty corpus
    val m = perDoc.agg(sum("nll_fp").as("s"), count(lit(1)).as("nd"))
      .select(expr("s div nullif(nd, 0)").as("mean_fp"))
    perDoc.crossJoin(broadcast(m))
      .withColumn("band",
        expr("least(99999L, greatest(0L, nll_fp - mean_fp + 50000L)) div 20000L")
          .cast("int"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_docs"),
        (sum("n_chars").cast("double") / count(lit(1))).as("avg_chars"),
        (floor(sum("nll_fp").cast("double") / count(lit(1)) + 0.5) / 1e6)
          .as("avg_nll"))
  }

  private val perplexityBucketSql =
    s"""WITH $perDocNllCtes,
       | m AS (SELECT CAST(SUM(nll_fp) AS BIGINT) // NULLIF(COUNT(*), 0) AS mean_fp
       |       FROM perdoc)
       |SELECT CAST(least(99999, greatest(0, nll_fp - mean_fp + 50000)) // 20000 AS INT) AS band,
       | COUNT(*) AS n_docs,
       | CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       | floor(CAST(SUM(nll_fp) AS DOUBLE) / COUNT(*) + 0.5) / 1e6 AS avg_nll
       |FROM perdoc CROSS JOIN m
       |GROUP BY 1""".stripMargin

  /** Per-doc top-5 TF-IDF terms — the classic keyword/relevance extraction
    * pass. Plan: one explode → (doc, term) counts, a term-keyed document-
    * frequency aggregate joined back ON TERM (a shuffle join, deliberately
    * not broadcast: at 100 TB the vocabulary is itself large), and the
    * corpus size via the canonical crossJoin(broadcast(1-row agg)) scalar.
    * The rank window partitions per doc (never global) and orders by the
    * ROUNDED score so rank order is reproducible cross-engine; equal
    * rounded scores tie-break on the term. */
  def tfidfTopk(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), col("term"))
    // salted term join — same Zipf-head reasoning (and same AQE structural
    // blind spot) as unigramStats' token join above
    graft.functions.Skew.saltedJoin(tf, dfreq, "term", 8, col("doc_id"))
      .crossJoin(broadcast(n))
      // floor(x·1e6+0.5)/1e6, not round(,6): HALF_UP/HALF_EVEN parity at
      // the fixed-point boundary of an ln-derived double (ADVICE r4);
      // df <= n_docs so the score is never negative and floor(+0.5) is
      // exact HALF_UP in both engines
      .withColumn("score",
        floor(col("tf") * log(col("n_docs").cast("double") / col("df")) * 1e6 + 0.5) / 1e6)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select("doc_id", "term", "tf", "df", "score", "rk")
  }

  private val tfidfTopkSql =
    """WITH t AS (SELECT doc_id,
      |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      |  FROM documents),
      | tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
      | df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      | n AS (SELECT COUNT(*) AS n_docs FROM documents),
      | scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    floor(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) * 1e6 + 0.5) / 1e6 AS score
      |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
      |SELECT doc_id, term, tf, df, score, rk FROM (
      |  SELECT scored.*,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
      |  FROM scored) x WHERE rk <= 5""".stripMargin

  /** Gopher-style REPETITION signals (Rae et al. 2021 §A1.1 — the
    * duplicate-text filters next to txt_gopher_rules' structural ones):
    * per doc, the fraction of lines that are duplicates (by count and by
    * character mass) and the fraction of characters covered by the most
    * frequent word bigram. High values mark boilerplate/spam that
    * length/stopword heuristics miss. Two shuffles, both map-side
    * combinable and both partitioned by doc: (doc, line) counts and
    * (doc, bigram) counts — the bigram multiset comes from the native
    * count-preserving kernel, and the per-doc argmax window is bounded by
    * the doc's distinct bigrams (never global). Fractions are single
    * integer-over-integer divisions — IEEE-identical cross-engine; the
    * top-bigram tie breaks to the lexicographically smallest gram. */
  def gopherRepetition(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val lineStats = docs
      .select(col("doc_id"), explode(split(col("text"), "\n")).as("line"))
      .groupBy("doc_id", "line").agg(count(lit(1)).as("c"))
      .withColumn("len", length(col("line")).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_lines"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_lines"),
        sum(col("len") * col("c")).as("tot_line_chars"),
        sum(when(col("c") >= 2, col("len") * col("c")).otherwise(0L)).as("dup_line_chars"))
    val topBg = docs
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        explode(org.apache.spark.sql.GraftColumns.column(
          graft.plans.WordNgrams(
            org.apache.spark.sql.GraftColumns.expression(col("text")), 2))).as("bg"))
      .groupBy(col("doc_id"), col("n_chars"), col("bg")).agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("n"), asc("bg"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"),
        (col("n") * length(col("bg")).cast("long")).cast("double")
          ./(col("n_chars").cast("double")).as("top_bigram_char_frac"))
    lineStats.join(topBg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        (col("dup_lines").cast("double") / col("n_lines")).as("dup_line_frac"),
        when(col("tot_line_chars") > 0,
          col("dup_line_chars").cast("double") / col("tot_line_chars"))
          .otherwise(lit(0.0)).as("dup_line_char_frac"),
        coalesce(col("top_bigram_char_frac"), lit(0.0)).as("top_bigram_char_frac"))
  }

  private val gopherRepetitionSql =
    """WITH l AS (
      |  SELECT doc_id, line, COUNT(*) AS c, length(line) AS len
      |  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents) z
      |  GROUP BY doc_id, line),
      | ls AS (
      |  SELECT doc_id, SUM(c) AS n_lines,
      |    SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_lines,
      |    SUM(len * c) AS tot_line_chars,
      |    SUM(CASE WHEN c >= 2 THEN len * c ELSE 0 END) AS dup_line_chars
      |  FROM l GROUP BY doc_id),
      | t AS (SELECT doc_id, length(text) AS n_chars,
      |         regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      | g AS (SELECT doc_id, n_chars,
      |         unnest([toks[i] || ' ' || toks[i+1] FOR i IN generate_series(1, len(toks)-1)]) AS bg
      |       FROM t),
      | gc AS (SELECT doc_id, n_chars, bg, COUNT(*) AS n FROM g GROUP BY doc_id, n_chars, bg),
      | top AS (SELECT doc_id,
      |    CAST(n * length(bg) AS DOUBLE) / CAST(n_chars AS DOUBLE) AS top_bigram_char_frac
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, bg) AS rn
      |        FROM gc) r WHERE rn = 1)
      |SELECT ls.doc_id, CAST(ls.n_lines AS BIGINT) AS n_lines,
      | CAST(ls.dup_lines AS DOUBLE) / ls.n_lines AS dup_line_frac,
      | CASE WHEN ls.tot_line_chars > 0
      |      THEN CAST(ls.dup_line_chars AS DOUBLE) / ls.tot_line_chars
      |      ELSE 0.0 END AS dup_line_char_frac,
      | COALESCE(top.top_bigram_char_frac, 0.0) AS top_bigram_char_frac
      |FROM ls LEFT JOIN top USING (doc_id)""".stripMargin

  /** Bigram-LM perplexity signal — the next step up from the unigram
    * surprisal score: per-doc mean negative log of the ADD-ONE-SMOOTHED
    * conditional p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V), the classic quality
    * filter that catches locally-incoherent text a unigram model scores
    * as fluent. Same fixed-point-ln device as txt_unigram_logprob (each
    * ln quantized to integer µ-units, summed exactly, divided once) so
    * the reduction is order-independent cross-engine; both corpus joins
    * (bigram table, context table) are salted — Zipf heads are even
    * sharper at the bigram grain. Two vocabulary-sized aggregates + two
    * salted joins at any corpus scale; contexts/V are model frames. */
  def bigramLogprob(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
    // bigrams from the count-preserving native kernel (the topNgrams
    // idiom) instead of posexplode + per-doc window lead (r19, guide
    // §2.4): the lead() shuffled and sorted every token on doc_id, and
    // this frame feeds THREE consumers (bigram counts, context counts,
    // the salted join spine), so that shuffle ran three times. The
    // context token is the bigram's first word — tokens are \s+-split so
    // they never contain a space, making substring_index exact.
    val big = Tables.documents(s, d)
      .select(col("doc_id"), explode(org.apache.spark.sql.GraftColumns.column(
        graft.plans.WordNgrams(
          org.apache.spark.sql.GraftColumns.expression(col("text")), 2))).as("bg"))
      .withColumn("t", substring_index(col("bg"), " ", 1))
      .select("doc_id", "t", "bg")
    val bgf = big.groupBy("bg").agg(count(lit(1)).as("c12"))
    val ctx = big.groupBy("t").agg(count(lit(1)).as("c1"))
    val vocab = toks.agg(countDistinct(col("t")).as("v"))
    val lnFp: Column => Column =
      c => floor(log(c.cast("double")) * lit(1e6) + 0.5).cast("long")
    val withBg = graft.functions.Skew.saltedJoin(big, bgf, "bg", 8, col("doc_id"))
    graft.functions.Skew.saltedJoin(withBg, ctx, "t", 8, col("doc_id"))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(lnFp(col("c1") + col("v")) - lnFp(col("c12") + lit(1L))).as("nll_fp"))
      .select(col("doc_id"), col("n_bigrams"),
        (floor(col("nll_fp").cast("double") / col("n_bigrams") + 0.5) / 1e6)
          .as("nll_per_bigram"))
  }

  private val bigramLogprobSql =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |           FROM documents),
      | bgl AS (SELECT doc_id,
      |    unnest([toks[i] FOR i IN generate_series(1, len(toks)-1)]) AS t,
      |    unnest([toks[i]||' '||toks[i+1] FOR i IN generate_series(1, len(toks)-1)]) AS bg
      |  FROM t WHERE len(toks) >= 2),
      | bgf AS (SELECT bg, COUNT(*) AS c12 FROM bgl GROUP BY bg),
      | ctx AS (SELECT t, COUNT(*) AS c1 FROM bgl GROUP BY t),
      | v AS (SELECT COUNT(DISTINCT tk) AS v
      |       FROM (SELECT unnest(toks) AS tk FROM t))
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      | floor(CAST(SUM(CAST(floor(ln(CAST(c1 + v AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |              - CAST(floor(ln(CAST(c12 + 1 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
      |       / COUNT(*) + 0.5) / 1e6 AS nll_per_bigram
      |FROM bgl JOIN bgf USING (bg) JOIN ctx USING (t) CROSS JOIN v
      |GROUP BY doc_id""".stripMargin

  /** RAKE keyphrase extraction (Rose et al. 2010 — the classic unsupervised
    * keyphrase algorithm TF-IDF keyword ranking doesn't subsume, because it
    * scores multi-word PHRASES): candidate phrases are maximal stopword-free
    * token runs (split at the suite's stopword list), each word scored
    * deg/freq over the DOC's phrase set (per-doc RAKE, the original
    * formulation), phrase score = Σ word scores, top-3 phrases per doc.
    * Determinism: word scores are quantized to µ fixed-point BEFORE the
    * per-phrase sum (integer, order-free) and ranks tie-break on the phrase
    * text; phrase assembly sorts by position explicitly (collect_list order
    * is not a contract). Scale: one posexplode + phrase-id running count +
    * three aggregates, ALL riding the doc_id exchange — no corpus-global
    * join anywhere (unlike TF-IDF's vocabulary join).
    *
    * Shape note (r9, VERDICT r8 #4): the apparent 1.7× clean-run
    * regression was ambient — interleaved sentinel-corrected A/B at
    * sf0.1 measured THIS double-join shape (4 exchanges, 5 sorts,
    * min 0.98 s under 1.3× load) faster than both "reuse the joined
    * frame" rewrites: a (doc,phrase_id)-window phrase build scoring on
    * ids only (3 exchanges, 6 sorts — the extra full-partition sort
    * costs more than the saved exchange, min 1.39 s) and the same plus
    * localCheckpoint of the joined frame (materialization dominates,
    * min 1.97 s). Keep this shape unless a measurement says otherwise. */
  def rakeKeyphrases(s: SparkSession, d: String): DataFrame = {
    val stopSet = stopsEn.map(x => x: Any)
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "t")))
      .withColumn("is_stop", col("t").isin(stopSet: _*))
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pw = tok
      .withColumn("phrase_id", sum(when(col("is_stop"), 1L).otherwise(0L)).over(wDoc))
      .filter(!col("is_stop"))
      .select("doc_id", "phrase_id", "pos", "t")
    val phrases = pw.groupBy("doc_id", "phrase_id")
      .agg(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("t")))),
            x => x.getField("t"))).as("phrase"),
        count(lit(1)).as("plen"))
    val wordScores = pw.join(phrases, Seq("doc_id", "phrase_id"))
      .groupBy("doc_id", "t")
      .agg(floor(sum(col("plen")).cast("double") * 1e6 / count(lit(1)) + 0.5)
        .cast("long").as("wscore_fp"))
    val scored = pw.join(phrases, Seq("doc_id", "phrase_id"))
      .join(wordScores, Seq("doc_id", "t"))
      .groupBy("doc_id", "phrase_id", "phrase")
      .agg(sum(col("wscore_fp")).as("score_fp"))
      .select(col("doc_id"), col("phrase"), col("score_fp")).distinct()
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score_fp"), asc("phrase"))).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("phrase"),
        (col("score_fp").cast("double") / 1e6).as("rake_score"))
  }

  private val rakeKeyphrasesSql = {
    val stopList = sqlInList(stopsEn)
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      |           FROM documents),
      | tok AS (SELECT doc_id, pos, toks[pos] AS t,
      |     toks[pos] IN ($stopList) AS is_stop
      |   FROM (SELECT doc_id, toks,
      |           unnest(generate_series(1, len(toks))) AS pos FROM t)),
      | pw AS (SELECT doc_id, phrase_id, pos, t FROM (
      |     SELECT doc_id, pos, t, is_stop,
      |       SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
      |         PARTITION BY doc_id ORDER BY pos
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id
      |     FROM tok) WHERE NOT is_stop),
      | phr AS (SELECT doc_id, phrase_id,
      |     string_agg(t, ' ' ORDER BY pos) AS phrase, COUNT(*) AS plen
      |   FROM pw GROUP BY doc_id, phrase_id),
      | ws AS (SELECT doc_id, t,
      |     CAST(floor(CAST(SUM(plen) AS DOUBLE) * 1e6 / COUNT(*) + 0.5) AS BIGINT)
      |       AS wscore_fp
      |   FROM pw JOIN phr USING (doc_id, phrase_id) GROUP BY doc_id, t),
      | scored AS (SELECT DISTINCT doc_id, phrase, score_fp FROM (
      |     SELECT pw.doc_id, phr.phrase, SUM(ws.wscore_fp) AS score_fp
      |     FROM pw JOIN phr USING (doc_id, phrase_id) JOIN ws USING (doc_id, t)
      |     GROUP BY pw.doc_id, phr.phrase_id, phr.phrase)),
      | ranked AS (SELECT doc_id, phrase, score_fp,
      |     ROW_NUMBER() OVER (PARTITION BY doc_id
      |       ORDER BY score_fp DESC, phrase) AS rk
      |   FROM scored)
      |SELECT doc_id, rk, phrase, CAST(score_fp AS DOUBLE) / 1e6 AS rake_score
      |FROM ranked WHERE rk <= 3""".stripMargin
  }

  // The suite's fixed-point-ln device (txt_unigram_logprob /
  // txt_bigram_logprob): each ln of an INTEGER count quantized to µ-nat
  // longs, so every downstream sum/difference is exact integer arithmetic —
  // order-independent and bit-identical cross-engine.
  private def lnQ(c: Column): Column =
    floor(log(c.cast("double")) * lit(1e6) + 0.5).cast("long")

  /** PMI collocation mining (Church & Hanks 1990) — the corpus-level
    * phrase detector TF-IDF/RAKE don't cover: score each bigram by
    * pointwise mutual information against its parts' margins within the
    * bigram table, pmi = ln c₁₂ + ln N − ln c₁ − ln c₂ (each ln
    * µ-nat-quantized SEPARATELY, so no integer product can overflow at
    * any corpus size), min count 5, top 20. Margins derive from the
    * bigram counts themselves (one gram pass, no second corpus scan);
    * both margin joins are salted (Zipf heads); the final top-20 is
    * TakeOrdered — no global window. */
  private val PmiMinCount = 5
  def collocationsPmi(s: SparkSession, d: String): DataFrame = {
    val bgc = Tables.documents(s, d)
      .select(explode(org.apache.spark.sql.GraftColumns.column(
        graft.plans.WordNgrams(
          org.apache.spark.sql.GraftColumns.expression(col("text")), 2))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
      .withColumn("t1", substring_index(col("bg"), " ", 1))
      .withColumn("t2", substring_index(col("bg"), " ", -1))
    val c1 = bgc.groupBy(col("t1")).agg(sum("c12").as("c1"))
    val c2 = bgc.groupBy(col("t2")).agg(sum("c12").as("c2"))
    val nb = bgc.agg(sum("c12").as("nb"))
    val cand = bgc.filter(col("c12") >= PmiMinCount)
    graft.functions.Skew.saltedJoin(
        graft.functions.Skew.saltedJoin(cand, c1, "t1", 8, col("bg")),
        c2, "t2", 8, col("bg"))
      .crossJoin(broadcast(nb))
      .withColumn("pmi_fp",
        lnQ(col("c12")) + lnQ(col("nb")) - lnQ(col("c1")) - lnQ(col("c2")))
      .orderBy(desc("pmi_fp"), asc("bg"))
      .limit(20)
      .select(col("bg"), col("c12"),
        (col("pmi_fp").cast("double") / 1e6).as("pmi"))
  }

  private val collocationsPmiSql =
    s"""WITH t AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
       | g AS (SELECT unnest([toks[i] || ' ' || toks[i+1]
       |                     FOR i IN generate_series(1, len(toks)-1)]) AS bg FROM t),
       | bgc AS (SELECT bg, COUNT(*) AS c12,
       |    split_part(bg, ' ', 1) AS t1, split_part(bg, ' ', 2) AS t2
       |  FROM g GROUP BY bg),
       | m1 AS (SELECT t1, SUM(c12) AS c1 FROM bgc GROUP BY t1),
       | m2 AS (SELECT t2, SUM(c12) AS c2 FROM bgc GROUP BY t2),
       | nb AS (SELECT SUM(c12) AS nb FROM bgc),
       | scored AS (SELECT bg, c12,
       |    CAST(floor(ln(CAST(c12 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
       |    + CAST(floor(ln(CAST(nb AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
       |    - CAST(floor(ln(CAST(c1 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
       |    - CAST(floor(ln(CAST(c2 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS pmi_fp
       |  FROM bgc JOIN m1 USING (t1) JOIN m2 USING (t2) CROSS JOIN nb
       |  WHERE c12 >= $PmiMinCount)
       |SELECT bg, c12, CAST(pmi_fp AS DOUBLE) / 1e6 AS pmi
       |FROM scored ORDER BY pmi_fp DESC, bg LIMIT 20""".stripMargin

  /** Zipf-law fit over the corpus term distribution — the classic corpus
    * health gauge (natural text fits slope ≈ −1; templated/synthetic
    * corpora flatten or steepen): least-squares slope of ln(freq) on
    * ln(rank) over the top 100 terms. Rank is computed WITHOUT a global
    * window: the top-100 set is TakeOrdered, and each term's rank is
    * 1 + its dominator count via the constant-key broadcast self-join
    * idiom (100×100 = 10⁴ broadcast-hash pairs, never a BNLJ). The
    * regression sums run on µ-quantized ln longs — exact integer
    * Σx/Σy/Σxy/Σx², one slope division at the end. */
  private val ZipfTopN = 100
  def zipfFit(s: SparkSession, d: String): DataFrame = {
    // materialized: the 100-row frame feeds BOTH sides of the rank join —
    // without it each side re-runs the corpus token count (q11 pattern)
    val top = graft.Checkpoints.materialize(
      Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("t")).limit(ZipfTopN))
    val a = top.withColumn("j", lit(1))
    val b = top.select(col("t").as("bt"), col("n").as("bn"))
      .withColumn("j", lit(1))
    val ranked = a.join(broadcast(b), "j")
      .groupBy("t", "n")
      .agg((sum(when(col("bn") > col("n")
          || (col("bn") === col("n") && col("bt") < col("t")), 1L)
        .otherwise(0L)) + 1L).as("rank"))
    ranked
      .select(lnQ(col("rank")).as("x"), lnQ(col("n")).as("y"))
      .agg(count(lit(1)).as("cnt"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("cnt").cast("long").as("n_terms"),
        // nullif (the heapsFit guard): a single-term vocabulary has zero
        // x-variance — the slope is undefined there, not 0/0 = NaN
        Cols.fp6((col("cnt") * col("sxy") - col("sx") * col("sy")).cast("double")
          / nullif((col("cnt") * col("sxx") - col("sx") * col("sx")).cast("double"),
            lit(0.0)))
          .as("zipf_slope"))
  }

  private val zipfFitSql =
    s"""WITH t AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
       |           FROM documents),
       | tf AS (SELECT t, COUNT(*) AS n FROM t GROUP BY t
       |        ORDER BY n DESC, t LIMIT $ZipfTopN),
       | ranked AS (SELECT t, n, ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rank FROM tf),
       | q AS (SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
       |              CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
       |       FROM ranked)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       | floor(CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS DOUBLE)
       |   / NULLIF(CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS DOUBLE), 0.0)
       |   * 1e6 + 0.5) / 1e6 AS zipf_slope
       |FROM q""".stripMargin

  /** Per-source unigram KL divergence vs the corpus distribution — the
    * domain-mix diagnostic a pretraining pipeline watches per ingest
    * source (a source drifting from the corpus LM shifts the mixture):
    * KL(pₛ ‖ p) = Σ_w pₛ(w)·ln(pₛ(w)/p(w)), assembled as the exact
    * integer sum Σ c_sw·(lnq c_sw + lnq C − lnq c_w − lnq Cₛ) divided
    * once by Cₛ. Corpus margins derive from the (source, word) counts
    * (one token pass); the vocabulary join is salted (Zipf heads), the
    * per-source margin join too (a big source is a hot key). */
  def sourceKl(s: SparkSession, d: String): DataFrame = {
    val sw = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("csw"))
    val w = sw.groupBy("t").agg(sum("csw").as("cw"))
    val st = sw.groupBy("source").agg(sum("csw").as("cs"))
    val tot = w.agg(sum("cw").as("ctot"))
    graft.functions.Skew.saltedJoin(
        graft.functions.Skew.saltedJoin(sw, w, "t", 8, col("source")),
        st, "source", 8, col("t"))
      .crossJoin(broadcast(tot))
      .groupBy("source")
      .agg(min(col("cs")).as("cs"),
        sum(col("csw") * (lnQ(col("csw")) + lnQ(col("ctot"))
          - lnQ(col("cw")) - lnQ(col("cs")))).as("kl_fp"))
      .select(col("source"), col("cs").cast("long").as("n_tokens"),
        (floor(col("kl_fp").cast("double") / col("cs") + 0.5) / 1e6).as("kl_nats"))
  }

  private val sourceKlSql =
    """WITH tok AS (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      |            FROM documents),
      | sw AS (SELECT source, t, COUNT(*) AS csw FROM tok GROUP BY source, t),
      | w AS (SELECT t, SUM(csw) AS cw FROM sw GROUP BY t),
      | st AS (SELECT source, SUM(csw) AS cs FROM sw GROUP BY source),
      | tot AS (SELECT SUM(cw) AS ctot FROM w)
      |SELECT sw.source, CAST(MIN(cs) AS BIGINT) AS n_tokens,
      | floor(CAST(SUM(csw * (
      |     CAST(floor(ln(CAST(csw AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |   + CAST(floor(ln(CAST(ctot AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |   - CAST(floor(ln(CAST(cw AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |   - CAST(floor(ln(CAST(cs AS DOUBLE)) * 1e6 + 0.5) AS BIGINT))) AS DOUBLE)
      |   / MIN(cs) + 0.5) / 1e6 AS kl_nats
      |FROM sw JOIN w USING (t) JOIN st USING (source) CROSS JOIN tot
      |GROUP BY sw.source""".stripMargin

  /** Pairwise source vocabulary overlap (Jaccard of distinct-token sets) —
    * the cross-source contamination/redundancy gauge that complements
    * txt_source_kl's distributional view: two sources can have near-zero
    * KL yet share almost no vocabulary, and vice versa. Pair generation
    * rides the token posting lists (pairs per token ≤ |sources|², bounded
    * by the SOURCE taxonomy — a curated tens-to-hundreds set in practice;
    * a very-high-cardinality grouping would switch to per-source MinHash
    * sketches on the same machinery as dedup_minhash_lsh). Posting-list
    * self-join salted (every stopword token hits all sources); top 20
    * pairs via TakeOrdered. */
  def sourceOverlap(s: SparkSession, d: String): DataFrame = {
    val sv = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("t"))
      .distinct()
    val sizes = sv.groupBy("source").agg(count(lit(1)).as("v"))
    val pairs = graft.functions.Skew.saltedJoin(
        sv, sv.select(col("source").as("src_b"), col("t")), "t", 8, col("source"))
      .filter(col("source") < col("src_b"))
      .groupBy(col("source").as("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(broadcast(sizes.select(col("source").as("src_a"), col("v").as("va"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("v").as("vb"))), "src_b")
      .select(col("src_a"), col("src_b"), col("inter").cast("long").as("inter_vocab"),
        Cols.fp6(col("inter").cast("double") / (col("va") + col("vb") - col("inter")))
          .as("jaccard"))
      .orderBy(desc("jaccard"), asc("src_a"), asc("src_b"))
      .limit(20)
  }

  private val sourceOverlapSql =
    """WITH sv AS (SELECT DISTINCT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      |            FROM documents),
      | sz AS (SELECT source, COUNT(*) AS v FROM sv GROUP BY source),
      | pr AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
      |        FROM sv a JOIN sv b ON a.t = b.t AND a.source < b.source
      |        GROUP BY 1, 2)
      |SELECT pr.src_a, pr.src_b, CAST(pr.inter AS BIGINT) AS inter_vocab,
      | floor(CAST(pr.inter AS DOUBLE) / (sa.v + sb.v - pr.inter) * 1e6 + 0.5) / 1e6
      |   AS jaccard
      |FROM pr JOIN sz sa ON sa.source = pr.src_a JOIN sz sb ON sb.source = pr.src_b
      |ORDER BY jaccard DESC, pr.src_a, pr.src_b LIMIT 20""".stripMargin

  /** Per-doc character-level Shannon entropy — the cheapest garbage/
    * repetition gauge in a pretraining filter stack (binary blobs and
    * key-mashing score high, templated boilerplate scores low; C4-style
    * pipelines threshold on it before any tokenization): H = ln n −
    * (Σ c·ln c)/n over the doc's char counts. Each ln is µ-nat-quantized
    * (lnQ) so the weighted sum is exact integer arithmetic — the entropy
    * double is bit-identical cross-engine. Char grain = code points on
    * both engines (split("")/numChars vs generate_series+substring, the
    * mm_phash-proven device). Map-side explode + one (doc_id, ch)
    * aggregate: no corpus-global state at all, embarrassingly parallel
    * at 100 TB. */
  def charEntropy(s: SparkSession, d: String): DataFrame =
    charEntropyOf(Tables.documents(s, d))

  /** DataFrame-parametric entropy surface (`doc_id` + `text`) for library
    * composition; UnicodeRobustnessSpec replays it on non-ASCII input. */
  def charEntropyOf(docs: DataFrame): DataFrame =
    docs
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("n_distinct_chars"),
        sum(col("c") * lnQ(col("c"))).as("s"))
      .select(col("doc_id"), col("n").cast("long").as("n_chars_counted"),
        col("n_distinct_chars").cast("long"),
        Cols.fp6((lnQ(col("n")) * col("n") - col("s")).cast("double")
          / col("n") / 1e6).as("entropy_nats"))

  private val charEntropySql =
    """WITH c AS (
      |  SELECT doc_id, substring(text, CAST(i AS BIGINT), 1) AS ch, COUNT(*) AS c
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
      |        FROM documents WHERE length(text) > 0)
      |  GROUP BY 1, 2),
      | agg AS (
      |  SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_distinct_chars,
      |    SUM(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS s
      |  FROM c GROUP BY doc_id)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_chars_counted,
      | CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
      | floor(CAST(CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) * n - s
      |   AS DOUBLE) / n / 1e6 * 1e6 + 0.5) / 1e6 AS entropy_nats
      |FROM agg""".stripMargin

  /** Heaps'-law fit per source (+ corpus rollup row) — the vocabulary-
    * growth twin of `txt_zipf_fit`: least-squares slope β of ln V on
    * ln N over each doc's (token count N, type count V) point. Natural
    * text sits β ≈ 0.4–0.6; template/boilerplate sources flatten toward
    * 0, random-ish sources push 1 — the per-source β is the domain-mix
    * health gauge next to `txt_source_kl`. Per-doc N/V are array ops
    * (no explode, no shuffle); the regression sums are exact decimal
    * sums of µ-quantized ln longs (order-independent at any scale —
    * long sums could overflow past ~1e12 docs, DECIMAL(38,0) cannot),
    * combined in identical double arithmetic. ROLLUP gives the corpus
    * row from the same single aggregate. */
  def heapsFit(s: SparkSession, d: String): DataFrame = {
    val dec38 = (c: Column) => c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val pts = Tables.documents(s, d)
      // length(trim) gate, not size(toks) > 0: split('') yields [""] on
      // both engines, so an empty/whitespace doc passed the old gate and
      // entered the fit as a phantom (N=1, V=1) point (ADVICE r8)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("toks", tokens(col("text")))
      .select(col("source"), lnQ(size(col("toks"))).as("x"),
        lnQ(size(array_distinct(col("toks")))).as("y"))
    pts.rollup("source")
      .agg(grouping(col("source")).as("g"), count(lit(1)).as("cnt"),
        sum(dec38(col("x"))).as("sx"), sum(dec38(col("y"))).as("sy"),
        sum(dec38(col("x") * col("y"))).as("sxy"),
        sum(dec38(col("x") * col("x"))).as("sxx"))
      // GROUPING(), not COALESCE: a genuine NULL source group must keep
      // its NULL label instead of colliding with the grand-total row
      // (ADVICE r8)
      .select(when(col("g") === 1, lit("__corpus__")).otherwise(col("source")).as("source"),
        col("cnt").cast("long").as("n_docs"),
        // nullif: a degenerate group (all docs the same token count —
        // 1-doc sources, uniform synthetic corpora) has zero x-variance;
        // β is undefined there, not ±Inf
        Cols.fp6((col("cnt").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
          / nullif(col("cnt").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"), lit(0.0)))
          .as("heaps_beta"))
  }

  private val heapsFitSql =
    """WITH pts AS (
      |  SELECT source,
      |    CAST(floor(ln(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE))
      |      * 1e6 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(ln(CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
      |      AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
      |  FROM documents WHERE length(trim(text)) > 0),
      | agg AS (
      |  SELECT source, GROUPING(source) AS g, COUNT(*) AS cnt, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * y) AS sxy, SUM(x * x) AS sxx
      |  FROM pts GROUP BY ROLLUP (source))
      |SELECT CASE WHEN g = 1 THEN '__corpus__' ELSE source END AS source, CAST(cnt AS BIGINT) AS n_docs,
      | floor((CAST(cnt AS DOUBLE) * CAST(sxy AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |   / NULLIF(CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0) * 1e6 + 0.5) / 1e6 AS heaps_beta
      |FROM agg""".stripMargin

  /** Per-doc 3-gram novelty — the share of a doc's distinct word-3-gram
    * shingles that appear NOWHERE else in the corpus (df = 1): high means
    * genuinely new text, low means the doc is assembled from corpus
    * boilerplate — the doc-grain complement of the dedup pair views
    * (which only surface the top offenders, not a per-doc score to
    * filter on). Shingles come from the same native WordShingles kernel
    * as the dedup index (one definition corpus-wide). df is a
    * groupBy(sg) count — partial map-side combine collapses a Zipf-head
    * shingle's occurrences BEFORE the exchange, where the former
    * unbounded per-shingle window shuffled and sorted every occurrence
    * of the hot shingles into single partitions (ADVICE r8) — joined
    * back SALTED (the PMI-margin discipline: the probe side is exactly
    * as Zipf-headed as the aggregate was). Three linear exchanges,
    * never a pair join. The kernel/scan lineage feeds both the df
    * aggregate and the probe side and so evaluates twice — measured
    * (sf0.1, sentinel-interleaved): double-eval 0.93 s vs 1.12 s with a
    * localCheckpoint of the pair frame (write cost > kernel recompute,
    * the rakeKeyphrases lesson) vs 0.55 s for the old per-shingle window
    * that serializes Zipf-head shingles into single sort partitions at
    * scale — the salted shape's local premium is the price of the
    * hot-key ceiling. */
  def ngramNovelty(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(org.apache.spark.sql.GraftColumns.column(
          graft.plans.WordShingles(
            org.apache.spark.sql.GraftColumns.expression(col("text"))))).as("sg"))
    val dfCounts = pairs.groupBy("sg").agg(count(lit(1)).as("df"))
    graft.functions.Skew.saltedJoin(pairs, dfCounts, "sg", 8, col("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_shingles"), col("n_unique"),
        Cols.fp6(col("n_unique").cast("double") / col("n_shingles")).as("novelty"))
  }

  private val ngramNoveltySql =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |           FROM documents),
      | sh AS (SELECT doc_id, list_distinct([toks[i]||' '||toks[i+1]||' '||toks[i+2]
      |                 FOR i IN generate_series(1, len(toks)-2)]) AS sh FROM t),
      | inv AS (SELECT doc_id, unnest(sh) AS sg FROM sh),
      | dfd AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY sg) AS df FROM inv),
      | agg AS (SELECT doc_id, COUNT(*) AS n_shingles,
      |           SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS n_unique
      |         FROM dfd GROUP BY doc_id)
      |SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
      | CAST(n_unique AS BIGINT) AS n_unique,
      | floor(CAST(n_unique AS DOUBLE) / n_shingles * 1e6 + 0.5) / 1e6 AS novelty
      |FROM agg""".stripMargin

  override def entries: Seq[(String, QueryFn, Option[String])] = Seq(
    ("txt_ngram_novelty", ngramNovelty _, Some(ngramNoveltySql)),
    ("txt_char_entropy", charEntropy _, Some(charEntropySql)),
    ("txt_heaps_fit", heapsFit _, Some(heapsFitSql)),
    ("txt_source_overlap", sourceOverlap _, Some(sourceOverlapSql)),
    ("txt_collocations_pmi", collocationsPmi _, Some(collocationsPmiSql)),
    ("txt_zipf_fit", zipfFit _, Some(zipfFitSql)),
    ("txt_source_kl", sourceKl _, Some(sourceKlSql)),
    ("txt_rake_keyphrases", rakeKeyphrases _, Some(rakeKeyphrasesSql)),
    ("txt_bigram_logprob", bigramLogprob _, Some(bigramLogprobSql)),
    ("txt_gopher_repetition", gopherRepetition _, Some(gopherRepetitionSql)),
    ("txt_tfidf_topk", tfidfTopk _, Some(tfidfTopkSql)),
    ("txt_unigram_logprob", unigramLogprob _, Some(unigramLogprobSql)),
    ("txt_perplexity_bucket", perplexityBucket _, Some(perplexityBucketSql)),
    ("txt_token_stats", tokenStats _, Some(tokenStatsSql)),
    ("txt_unigram_stats", unigramStats _, Some(unigramStatsSql)),
    ("txt_quality_score", qualityScore _, Some(qualityScoreSql)),
    ("txt_lang_id", langId _, Some(langIdSql)),
    ("txt_fingerprint", fingerprintQ _, Some(fingerprintSql)),
    ("txt_top_ngrams", topNgrams _, Some(topNgramsSql)),
    ("txt_winnow_fingerprint", winnowFingerprint _, Some(winnowFingerprintSql)),
    ("txt_gopher_rules", gopherRules _, Some(gopherRulesSql)),
    ("txt_filter_funnel", filterFunnel _, Some(filterFunnelSql)),
    ("txt_pii_scrub", piiScrub _, Some(piiScrubSql)),
    ("txt_bpe_token_estimate", bpeEstimate _, Some(bpeEstimateSql)))
}
