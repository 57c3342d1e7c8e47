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

  // ---- Z-order (multi-dimensional clustering) ----------------------------
  // A single-column sort gives perfect min/max file pruning on that column
  // and NONE on any other; Z-ordering interleaves the bits of two
  // range-bucket ids so every contiguous run of rows covers a compact
  // RECTANGLE in (a, b) space — parquet min/max stats stay tight on BOTH
  // columns and the scan prunes row groups for predicates on either.
  // (The device behind Delta's OPTIMIZE ZORDER, re-expressed as plain
  // integer Spark expressions.)
  private val ZBits = 8     // 256 × 256 Z-grid
  private val ZFiles = 64

  /** Bit-interleaved Z-value of two range-bucket ids in [0, 2^bits):
    * pure integer codegen ops, no UDF. */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .plus(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .plus(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Z-order `df` by (`a`, `b`): per-column range buckets via width_bucket
    * against the broadcast 1-row min/max (rank-free — two tiny aggregates,
    * no per-row window), then range-partition + sort on the interleaved
    * Z-value. Row CONTENT is untouched — layout only — so any query over
    * the result is oracle-exact against the unsorted table. */
  def zorderByRange(df: DataFrame, a: String, b: String): DataFrame = {
    val mm = broadcast(df.agg(
      min(col(a)).cast("long").as("_a_min"), max(col(a)).cast("long").as("_a_max"),
      min(col(b)).cast("long").as("_b_min"), max(col(b)).cast("long").as("_b_max")))
    df.crossJoin(mm)
      .withColumn("_zv", zValue(
        width_bucket(col(a), col("_a_min"), col("_a_max") + 1, lit(1 << ZBits)) - 1,
        width_bucket(col(b), col("_b_min"), col("_b_max") + 1, lit(1 << ZBits)) - 1,
        ZBits))
      .drop("_a_min", "_a_max", "_b_min", "_b_max")
      .repartitionByRange(ZFiles, col("_zv"))
      .sortWithinPartitions("_zv")
      .drop("_zv")
  }

  // sfDir → Z-ordered lineitem copy: built ONCE per corpus per JVM — the
  // same amortized layout-job lifecycle (and the same cache/scoping
  // semantics, stated once at graft.PrebuiltDirs) as Ann.prebuiltIndexDir.
  /** The (l_partkey, l_suppkey)-Z-ordered lineitem projection — the two
    * join/filter keys a part-supplier workload hits that a single-dim sort
    * can't serve together. */
  def zorderedLineitemDir(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.PrebuiltDirs.cached("graft_zorder", d) { dir =>
      val li = graft.Tables.lineitem(s, d).select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_returnflag")
      zorderByRange(li, "l_partkey", "l_suppkey")
        .write.mode("overwrite").parquet(dir)
      dir
    }
}
