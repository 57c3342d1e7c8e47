package graft

import org.apache.spark.sql.DataFrame

/** Eager materialization with lineage truncation for iterative loops
  * (cluster propagation, Lloyd rounds): round N must schedule against a
  * small materialized frame, not the whole history of rounds 1..N-1.
  *
  * Fault-tolerance tradeoff: `localCheckpoint` blocks live only in
  * executor block managers and are NOT replayable — losing an executor
  * mid-job kills the query. Correct for single-JVM test/bench runs (fast,
  * no filesystem); on a real cluster set `sparkContext.setCheckpointDir`
  * and this helper automatically switches to RELIABLE checkpoints that
  * survive executor loss (also set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` there so
  * checkpoint files of GC'd frames are reaped). */
private[graft] object Checkpoints {
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // cache first: checkpoint's eager count job and its write job would
      // otherwise each compute the plan from scratch (2× every round)
      val cached = df.persist()
      val out = cached.checkpoint()
      cached.unpersist()
      out
    } else df.localCheckpoint()
}
