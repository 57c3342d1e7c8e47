package graft

import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Hostile-input harness for the EVENTS-table entries — the events twin of
  * EdgeCorpusSpec (which covers only documents-table entries): a tiny
  * adversarial events.parquet with an isolated single event, two events at
  * the IDENTICAL timestamp (every (ts, event_id) tiebreak fires), a day
  * where all events share one type (zero cross-type variance), zero and
  * negative values, and a 30-day calendar gap. Every ev_* and st_* entry
  * runs over it; no entry may throw and no result may carry NaN/Infinity —
  * degenerate days/users must drop out of an operator's domain (no gaps,
  * no variance, empty windows) rather than poison its arithmetic. */
class EdgeEventsSpec extends SparkSpec {

  private lazy val edgeDir: String = {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions._
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    val events = Seq(
      // one isolated event (no gaps, no pair, no window neighbors)
      (1L, ts("2024-01-02 10:00:00"), 10L, "view", 0.0, "{}"),
      // two events, same user, IDENTICAL timestamp (tiebreak on event_id)
      (2L, ts("2024-01-03 09:30:00"), 20L, "view", 5.5, "{}"),
      (3L, ts("2024-01-03 09:30:00"), 20L, "purchase", -2.25, "{}"),
      // a whole day of ONE type (zero cross-type variance that day)
      (4L, ts("2024-01-04 01:00:00"), 30L, "click", 1.0, "{}"),
      (5L, ts("2024-01-04 02:00:00"), 31L, "click", 1.0, "{}"),
      (6L, ts("2024-01-04 03:00:00"), 30L, "click", 1.0, "{}"),
      // a 30-day calendar gap, then one trailing event
      (7L, ts("2024-02-03 23:59:59"), 10L, "purchase", 1e9, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val customer = Seq((10L, "c10", "BUILDING"), (20L, "c20", "MACHINERY"),
      (30L, "c30", "BUILDING"))
      .toDF("c_custkey", "c_name", "c_mktsegment")
    val docs = Seq((1L, "alpha beta alpha", "en", "web"),
      (2L, "beta gamma", "de", "wiki"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft_edge_events")
    events.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    customer.coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // region: the streaming harness floor lists it
    spark.read.parquet(s"$sf/region.parquet").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    dir.toString
  }

  test("every events entry survives the edge stream, NaN/Inf-free") {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => n.startsWith("ev_") || n.startsWith("st_"))
      // the connector-stream prebuilt caches per (JVM, corpus); exercised
      // on the edge corpus explicitly below with its own cache clear
      .filterNot(_ == "st_connector_append")
    assert(names.size >= 50, s"harness should cover the event entries, got $names")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, edgeDir)
      val rows =
        try df.collect()
        catch { case scala.util.control.NonFatal(e) =>
          fail(s"$name threw on the edge events: ${e.getMessage}", e)
        }
      val floatCols = df.schema.fields.zipWithIndex.collect {
        case (f, i) if f.dataType == DoubleType || f.dataType == FloatType => (f.name, i)
      }
      rows.foreach { r =>
        floatCols.foreach { case (cn, i) =>
          if (!r.isNullAt(i)) {
            val v = r.get(i) match {
              case d: java.lang.Double => d.doubleValue()
              case f: java.lang.Float => f.doubleValue()
            }
            assert(!v.isNaN && !v.isInfinity,
              s"$name column $cn carries $v on the edge events")
          }
        }
      }
    }
  }

  test("connector stream ingest survives the edge events end-to-end") {
    graft.streaming.StreamingEntries.clearConnectorStreamCache()
    try {
      val got = SparkEntry.queries("st_connector_append")(spark, edgeDir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("view" -> 2L, "purchase" -> 2L, "click" -> 3L))
    } finally graft.streaming.StreamingEntries.clearConnectorStreamCache()
  }
}
