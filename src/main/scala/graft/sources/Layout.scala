package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY.md §5 — the at-scale physical layout.
  *
  * At 100 TB the wide-column tables are not single parquet files: they are
  * bucketed-by-partition-key datasets, so that (a) partition-key lookups
  * prune to one bucket's files, (b) key↔key joins and per-key windows
  * (LWW compaction, clustering-order ranks, sessionization) read
  * pre-clustered data and shuffle NOTHING — the same win Cassandra gets
  * from its token-ring placement. LayoutSpec asserts the no-Exchange plans.
  */
object Layout {

  /** Murmur3-partitioner analog — the same deterministic token the
    * wide-column token-range scan uses (WideColumn.tokenRangeScan). */
  def token(pk: Column): Column = pmod(pk * 2654435761L, lit(1000000007L))

  /** Write `df` bucketed and sorted by `pk` (+ clustering columns) as a
    * managed table — the layout every key-addressed 100 TB table uses. */
  def writeBucketed(df: DataFrame, table: String, pk: String, buckets: Int,
      clusteringCols: Seq[String] = Nil): Unit = {
    val sortCols = (pk +: clusteringCols).distinct
    df.write.mode("overwrite")
      .bucketBy(buckets, pk)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .saveAsTable(table)
  }

  /** Write `df` hive-partitioned by the DAY of `tsCol` — the layout every
    * time-addressed 100 TB table uses: time-range predicates prune whole
    * directories (PartitionFilters) before any file is opened. Combine with
    * `writeBucketed` semantics by also bucketing within each day. */
  def writeTimePartitioned(df: DataFrame, table: String, tsCol: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("p_date")
      .saveAsTable(table)
}
