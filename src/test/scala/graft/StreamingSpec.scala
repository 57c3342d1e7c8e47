package graft

import graft.streaming.{EventStreams, EventRow}
import org.apache.spark.sql.functions._

/** Streaming twins tested through the public readStream file-source API
  * (no internal test harness classes): stream the events parquet, run each
  * streaming op into a memory sink, compare against the batch twin. */
class StreamingSpec extends SparkSpec {

  private def eventsBatch = Tables.events(spark, sf)

  // The file stream source wants a directory; stage the single parquet file
  // into a temp dir once.
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  /** A streaming DataFrame over the same events parquet (ts already
    * converted micros, same as Tables.events). */
  private def eventsStream = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet") // schema probe
    val st = spark.readStream.schema(raw.schema).parquet(streamDir)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        st.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => st.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  test("streaming CMS sketch serves exactly the batch estimates") {
    val streamed = graft.streaming.StreamingEntries.stCmsFrequency(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("est_count")).toMap
    val batch = graft.operators.Events.cmsFrequency(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("est_count")).toMap
    assert(streamed == batch,
      s"streamed CMS diverged from batch: $streamed vs $batch")
  }

  test("streaming tumbling counts equal the batch twin") {
    val q = EventStreams.tumblingCounts(eventsStream)
      .writeStream.format("memory").queryName("stream_tumbling")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
      "SELECT window_start, event_type, n_events FROM stream_tumbling").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = eventsBatch
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("streaming session windows cover every event, gaps respected") {
    val q = EventStreams.sessionWindows(eventsStream)
      .writeStream.format("memory").queryName("stream_sessions")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val total = spark.sql("SELECT sum(n_events) FROM stream_sessions").head().getLong(0)
    assert(total == eventsBatch.count())
    // session count matches the batch sessionizer
    val nBatchSessions = operators.Events.sessionization(spark, sf).count()
    val nStreamSessions = spark.sql("SELECT count(*) FROM stream_sessions").head().getLong(0)
    assert(nStreamSessions == nBatchSessions)
  }

  test("stateful sessionizer tracks per-user open sessions") {
    val s = spark
    import s.implicits._
    val ds = eventsStream.select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventRow]
    val q = EventStreams.statefulSessions(ds)
      .writeStream.format("memory").queryName("stream_stateful")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.sql(
      "SELECT user_id, n_events, start_ts, end_ts FROM stream_stateful").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) <= r.getLong(3))
    }
  }

  test("streaming funnel frontiers reproduce the batch funnel counts") {
    val s2 = spark
    import s2.implicits._
    val ds = eventsStream.select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventRow]
    val q = EventStreams.funnelStages(ds)
      .writeStream.format("memory").queryName("stream_funnel")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // state grows monotonically -> the max per user is the final frontier
    val fin = spark.sql(
      """SELECT user_id, max(signup_ts) AS st, max(view_ts) AS vt,
        |       max(purchase_ts) AS pt
        |FROM stream_funnel GROUP BY user_id""".stripMargin)
    val streamed = fin.agg(
      sum(when(col("st") > 0, 1).otherwise(0)),
      sum(when(col("vt") > 0, 1).otherwise(0)),
      sum(when(col("pt") > 0, 1).otherwise(0))).head()
    val batch = operators.Events.funnel(spark, sf).head()
    assert(streamed.getLong(0) == batch.getLong(0))
    assert(streamed.getLong(1) == batch.getLong(1))
    assert(streamed.getLong(2) == batch.getLong(2))
  }
}
