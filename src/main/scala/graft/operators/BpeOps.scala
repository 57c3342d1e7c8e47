package graft.operators

import graft.{Cols, QueryModule, Tables}
import graft.functions.Bpe
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.D — the real subword tokenizer (VERDICT r8 ask #7 /
  * "what's missing" #2): a corpus-trained BPE merge table surfaced as a
  * model entry, a per-doc accounting entry, and the denomination behind
  * the mixing/packing entries (smp_token_budget, doc_pack_greedy,
  * pipeline_curated_budget re-denominate through [[bpeCount]]).
  *
  * Exactness device: training AND application are replayed in the DuckDB
  * oracle ([[Bpe.trainCtes]]/[[Bpe.applyCtes]] — the SemDeDup/IVF
  * trained-model-in-SQL discipline extended from k-means to BPE), so the
  * merge table and every downstream token count are hash-checked, not
  * estimated. */
object BpeOps extends QueryModule {

  /** Per-row BPE subword count column over `text` for a corpus dir — the
    * codegen'd kernel with that dir's trained merges riding along as a
    * broadcast-model literal. */
  def bpeCount(s: SparkSession, d: String): Column = {
    val m = Bpe.train(s, d).map(x => (x.pair, x.merged))
    org.apache.spark.sql.GraftColumns.column(
      graft.plans.BpeTokenCount(
        org.apache.spark.sql.GraftColumns.expression(col("text")), m))
  }

  /** The trained merge table itself as a driver entry — rank, pair,
    * merged symbol, and the weighted support it was chosen on. The
    * oracle re-trains from scratch in SQL, so a drifted trainer (wrong
    * tie-break, wrong pass count, stale cache) hash-mismatches. */
  def bpeMerges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Bpe.train(s, d).zipWithIndex
      .map { case (m, i) => (i + 1, m.pair, m.merged, m.weight) }
      .toDF("rank", "pair", "merged", "weight")
  }

  private val bpeMergesSql =
    s"""WITH ${Bpe.trainCtes}
       |SELECT * FROM (${Bpe.mergesUnionSql})
       |ORDER BY rank""".stripMargin

  /** Per-doc token accounting in BOTH denominations: whitespace words
    * and BPE subwords, plus their ratio — the fertility gauge (subwords
    * per word) a tokenizer owner watches per corpus slice. Map-only: the
    * kernel runs once per row, the merge table is a literal. */
  def bpeTokenize(s: SparkSession, d: String): DataFrame =
    tokenizeOf(s, d, Tables.documents(s, d))

  /** Parametric form over any (doc_id, text) frame — ONE definition for
    * the batch entry and the streaming twin (st_bpe_tokenize), so the
    * hash-equal proof of their equivalence cannot drift. The merge table
    * always comes from the dir's trained model (the nightly-build
    * lifecycle: train on the corpus, apply to whatever arrives). */
  private[graft] def tokenizeOf(s: SparkSession, d: String,
      docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        size(filter(graft.functions.TextFunctions.tokens(col("text")),
          t => length(t) > 0)).cast("long").as("n_ws_tokens"),
        bpeCount(s, d).as("n_bpe_tokens"))
      .withColumn("subword_ratio",
        Cols.fp6(col("n_bpe_tokens").cast("double") / nullif(col("n_ws_tokens").cast("double"), lit(0.0))))

  private[graft] val bpeTokenizeSql =
    s"""WITH ${Bpe.trainCtes},
       |${Bpe.applyCtes}
       |SELECT doc_id, n_ws_tokens, n_bpe_tokens,
       | ${Cols.fp6Sql("CAST(n_bpe_tokens AS DOUBLE) / nullif(CAST(n_ws_tokens AS DOUBLE), 0)")} AS subword_ratio
       |FROM doctok""".stripMargin

  /** Top-30 corpus subwords by occurrence — the derived VOCABULARY view
    * (what a tokenizer owner inspects after retraining: did the merges
    * produce the units the corpus actually repeats?). The array kernel
    * streams each doc's subword sequence; the corpus count is one
    * map-side-combined aggregate on the subword (Zipf-headed, so the
    * partial combine is what bounds the exchange), top-30 via
    * TakeOrdered. The oracle re-derives the same view from the
    * distinct-word replay: per-word subword multiplicities × word
    * occurrence counts. */
  def bpeVocab(s: SparkSession, d: String): DataFrame = {
    val m = Bpe.train(s, d).map(x => (x.pair, x.merged))
    Tables.documents(s, d)
      .select(explode(org.apache.spark.sql.GraftColumns.column(
        graft.plans.BpeTokens(
          org.apache.spark.sql.GraftColumns.expression(col("text")), m))).as("subword"))
      .groupBy("subword").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(desc("n_occurrences"), asc("subword"))
      .limit(30)
  }

  private val bpeVocabSql =
    s"""WITH ${Bpe.trainCtes},
       |${Bpe.applyCtes},
       |sw AS (SELECT word, unnest(string_split(trim(fs, ' '), ' ')) AS subword FROM apf),
       |wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM docw GROUP BY word)
       |SELECT sw.subword, CAST(SUM(wc.c) AS BIGINT) AS n_occurrences
       |FROM sw JOIN wc ON sw.word = wc.word
       |GROUP BY sw.subword
       |ORDER BY n_occurrences DESC, subword LIMIT 30""".stripMargin

  override def entries: Seq[(String, QueryFn, Option[String])] = Seq(
    ("txt_bpe_merges", bpeMerges _, Some(bpeMergesSql)),
    ("txt_bpe_tokenize", bpeTokenize _, Some(bpeTokenizeSql)),
    ("txt_bpe_vocab", bpeVocab _, Some(bpeVocabSql)))
}
