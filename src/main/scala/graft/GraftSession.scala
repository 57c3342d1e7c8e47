package graft

import org.apache.spark.sql.SparkSession

/** Tuned session factory (SURVEY.md §2.H) for tests and benchmarks.
  *
  * The driver's Verify/Bench construct their own sessions; every query in
  * this library is written to be correct under a vanilla ANSI Spark 4
  * session — these settings only affect performance, never results.
  */
object GraftSession {

  /** Cluster-deploy builder: master/deploy config comes from spark-submit;
    * this applies the same semantic + performance settings as `local`.
    * `shufflePartitions` should track total executor cores (2-3×); at
    * 100 TB also size `spark.sql.files.maxPartitionBytes` (default 128 MB
    * is right for ~1 GB executors-per-core memory). */
  def cluster(shufflePartitions: Int = 2000): SparkSession = {
    val s = SparkSession.builder()
      .appName("graft")
      .withExtensions(new plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // a join keyed on a SUPERSET of a table's bucket columns can reuse the
      // bucket partitioning (rows equal on all keys are equal on the bucket
      // key, hence co-located) — required for the zero-shuffle incremental
      // compaction merge on tables bucketed by partition key alone
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      // janino class cache (static conf, default 100 entries): a workload
      // of many distinct query shapes — or ONE query whose plan generates
      // >100 codegen units — churns the cache and recompiles the same
      // sources every run (r19, guide §1.2 per-task work)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def local(cores: Int = Runtime.getRuntime.availableProcessors.min(32)): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Managed-table warehouse (MessageStore keyspaces) out of the cwd.
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      // AQE: runtime partition coalescing + skew-join splitting; at cluster
      // scale this is what keeps post-shuffle partitions memory-sized.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // see `cluster`: subset-of-join-keys bucket reuse for co-located joins
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      // see `cluster`: codegen class-cache sized for a many-query workload
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
