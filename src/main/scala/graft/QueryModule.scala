package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One module per SURVEY.md §2 section. Each entry pairs the Spark query
  * with an optional DuckDB oracle (None → driver records a rows-only check
  * for ops whose hash functions / float reductions aren't reproducible in
  * SQL — see SURVEY.md §6). */
trait QueryModule {
  type QueryFn = (SparkSession, String) => DataFrame
  def entries: Seq[(String, QueryFn, Option[String])]
}
