package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY.md §2.E — streaming twin of the dedup suite's exact dedup.
  *
  * Documents arriving on a stream are deduplicated on the canonical-text
  * fingerprint (the same key `Dedup.exact` shuffles on) with
  * watermark-bounded state: a duplicate arriving within the watermark is
  * dropped online; an older re-appearance is an offline-compaction concern
  * (run `Dedup.exact` over the sink) — the same online/offline split as
  * Cassandra read-repair vs compaction. State is per-fingerprint, hash
  * partitioned — the identical one-shuffle shape as the batch twin, so it
  * holds at 100 TB ingest.
  */
object DocumentStreams {

  /** `docs` must carry `text` and an event-time `ingest_ts` column. */
  def dedupExact(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
}
