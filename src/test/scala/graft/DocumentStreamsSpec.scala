package graft

import graft.streaming.DocumentStreams
import org.apache.spark.sql.functions._

/** Streaming exact dedup tested through the public file-source API, same
  * pattern as StreamingSpec: stage documents (with injected duplicates) as
  * parquet, stream them, assert one survivor per fingerprint. */
class DocumentStreamsSpec extends SparkSpec {

  test("streaming dedup keeps one row per canonical fingerprint") {
    val dir = java.nio.file.Files.createTempDirectory("graft_docs_stream").toString
    val docs = Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"), col("text"))
      .withColumn("ingest_ts", lit("2024-01-01 00:00:00").cast("timestamp"))
    // inject exact duplicates (same text, different ids)
    val dup = docs.limit(10).withColumn("doc_id", col("doc_id") + 1000000L)
    docs.unionByName(dup).repartition(4).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val q = DocumentStreams.dedupExact(stream)
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.sql("SELECT fp, count(*) AS n FROM stream_dedup GROUP BY fp")
    assert(out.filter(col("n") > 1).count() == 0, "no fingerprint may survive twice")
    // survivors equal the batch-distinct fingerprints of the staged input
    val expected = spark.read.parquet(dir)
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .distinct().count()
    assert(out.count() == expected)
  }
}
