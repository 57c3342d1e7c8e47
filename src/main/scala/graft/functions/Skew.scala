package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY.md §5 — skew handling for 100 TB shuffles.
  *
  * First line of defense is AQE skew-join splitting (on in GraftSession);
  * these helpers cover the cases AQE cannot re-plan: a single hot key
  * inside one shuffle partition of a shuffled join or aggregation.
  */
object Skew {

  /** Deterministic salt in [0, n) derived from a row-identifying column
    * (never `rand()` — reruns and retried tasks must agree). */
  def salt(rowId: Column, n: Int): Column = pmod(xxhash64(rowId), lit(n.toLong))

  /** Skew-safe inner equi-join: salt the (skewed) probe side n ways and
    * replicate the build side once per salt, so one hot key spreads over n
    * tasks instead of one. Results are identical to `probe.join(build,
    * key)` — only the shuffle distribution changes. Build-side cost: n×
    * replication, so use for fact↔mid-size-dim joins where the dim is too
    * big to broadcast and the fact has hot keys.
    *
    * Both sides are repartitioned on (key, _salt) EXPLICITLY: a
    * ClusteredDistribution over (key, _salt) is satisfied by a
    * key-only HashPartitioning (subset semantics), so when the build side
    * arrives already key-partitioned (a groupBy(key) aggregate — the
    * frequency-table shape), EnsureRequirements would co-partition the
    * join on the bare key and silently put every hot-key row back in one
    * task. The pinned partitioning keeps the salt load-bearing; SkewSpec
    * asserts it on a hostile Zipf corpus. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, n: Int,
      probeRowId: Column): DataFrame = {
    val p = probe.withColumn("_salt", salt(probeRowId, n))
      .repartition(col(key), col("_salt"))
    val b = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
      .repartition(col(key), col("_salt"))
    p.join(b, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-safe exact distinct-count per key: count distinct
    * within (key, salted-value) groups, then sum — the distinct set is
    * partitioned by value hash, so a key with millions of distinct values
    * never sits in one task. Exact, unlike approx_count_distinct. */
  def skewSafeDistinctCount(df: DataFrame, key: Column, value: Column,
      n: Int, out: String): DataFrame =
    df.select(key.as("_k"), value.as("_v"))
      .withColumn("_salt", salt(col("_v"), n))
      .groupBy("_k", "_salt")
      .agg(count_distinct(col("_v")).as("_partial"))
      .groupBy(col("_k"))
      .agg(sum("_partial").cast("long").as(out))
}
