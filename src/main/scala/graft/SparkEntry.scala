package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2/§7.
  *
  * Aggregates every operator module's entries. Each SURVEY.md §2 operator is
  * one `queries` key; SQL-expressible ones also carry a DuckDB oracle.
  */
object SparkEntry {
  private def modules: Seq[QueryModule] = Seq(
    operators.Analytics, operators.AnalyticsSubqueries,
    operators.WideColumn, operators.Events,
    operators.TextAnalysis, operators.BpeOps, operators.PipelineOps, dedup.Dedup,
    dedup.SemDedup,
    similarity.Ann, similarity.Pca, multimodal.Multimodal,
    streaming.StreamingEntries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Analytics.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.entries.map { case (n, f, _) => n -> f }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.entries.flatMap { case (n, _, o) => o.map(n -> _) }).toMap
}
