package graft.multimodal

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded-media metadata produced by the (stubbed) batch decoder. */
case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                     channels: Int, checksum: Long)

/** SURVEY.md §2.G — multimodal columns: media as opaque `binary` payloads
  * with typed metadata.
  *
  * The container has no image/audio codecs by design, so the decode step is
  * a clearly-marked DETERMINISTIC STUB; everything Spark-side — binary
  * column handling, schema, Dataset encoders, partition-batched decode via
  * mapPartitions — is real and is exactly the shape a libjpeg/ffmpeg-backed
  * decoder would plug into at 100 TB (decode stays distributed, one batch
  * per partition chunk, no driver involvement).
  */
object Multimodal extends QueryModule {

  /** Typed metadata extracted from the raw payload — pure SQL expressions
    * (magic-byte sniff, digest, size), no decode needed. */
  def binaryMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("sha"),
        lower(hex(substring(col("payload"), 1, 4))).as("magic"),
        when(ascii(substring(col("text"), 1, 1)).between(97, 122), "text")
          .otherwise("binary").as("kind"))

  private val binaryMetaSql =
    """SELECT doc_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | sha256(text) AS sha,
      | lower(substr(hex(encode(text)), 1, 8)) AS magic,
      | CASE WHEN ascii(substr(text, 1, 1)) BETWEEN 97 AND 122
      |      THEN 'text' ELSE 'binary' END AS kind
      |FROM documents""".stripMargin

  /** STUB DECODER — stands in for a real image/audio decode (libs absent in
    * this environment). Deterministic function of the bytes so results are
    * reproducible; replace the body with the real codec call at deployment.
    */
  private[graft] def stubDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    var fnv = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { fnv = (fnv ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    MediaMeta(id, bytes.length,
      width = (bytes.length % 64) + 1,
      height = ((bytes.length / 64) % 64) + 1,
      channels = 3,
      checksum = fnv)
  }

  private val BatchSize = 32

  /** Partition-batched decode: each partition's rows are decoded in fixed
    * batches (the shape a vectorized codec wants), fully distributed. */
  def decodeBatch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          // one "batch decode" call per group, as a real codec API would take
          batch.map { case (id, bytes) => stubDecode(id, bytes) }
        }
      }
      .toDF()
  }

  private val FrameSize = 256
  private val SampleEvery = 4L

  /** Frame sampling over a video-like binary payload: fixed-size frame
    * slicing and every-k-th sampling are pure byte-range operations — no
    * codec needed, so unlike the decode this one is REAL, not stubbed. The
    * output (doc, frame_idx, bytes-digest) table is the input a distributed
    * GPU decode stage consumes at 100 TB. All codegen'd expressions; the
    * per-doc frame fan-out is an explode, never a driver loop. (The test
    * corpus is ASCII, so the DuckDB varchar oracle slices the same bytes.) */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val payload = col("text").cast("binary")
    val nFrames = expr(s"(octet_length(text) + ${FrameSize - 1}) DIV $FrameSize")
    val frame = payload.substr(
      (col("frame_idx") * FrameSize + 1).cast("int"), lit(FrameSize))
    Tables.documents(s, d)
      .filter(octet_length(payload) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), nFrames - 1)).as("frame_idx"))
      .filter(pmod(col("frame_idx"), lit(SampleEvery)) === 0)
      .select(col("doc_id"), col("frame_idx"),
        octet_length(frame).cast("long").as("n_bytes"),
        md5(frame).as("frame_md5"))
  }

  private val frameSampleSql =
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |         unnest(generate_series(0, (length(text)+${FrameSize - 1})//$FrameSize - 1)) AS frame_idx
       |  FROM documents WHERE length(text) > 0)
       |SELECT doc_id, frame_idx,
       |  CAST(length(substring(text, CAST(frame_idx*$FrameSize+1 AS BIGINT), $FrameSize)) AS BIGINT) AS n_bytes,
       |  md5(substring(text, CAST(frame_idx*$FrameSize+1 AS BIGINT), $FrameSize)) AS frame_md5
       |FROM f WHERE frame_idx % $SampleEvery = 0""".stripMargin

  /** Resize analog — 2× downsample of each sampled frame by dropping every
    * second element (stride-2 subsampling, what a nearest-neighbor halve
    * does per raster row). Pure slicing/regex ops — REAL like frameSample,
    * no codec; the regex engine runs inside codegen. Output digests are
    * what a dedup-after-resize stage would key on. CHARACTER semantics
    * throughout (frame count, slice, and oracle all use length(text)) so
    * the op is self-consistent on any text; on the ASCII corpus chars ==
    * bytes, matching frameSample's byte frames. */
  def resizeHalve(s: SparkSession, d: String): DataFrame = {
    val nFrames = expr(s"(length(text) + ${FrameSize - 1}) DIV $FrameSize")
    val frame = col("text").substr(
      (col("frame_idx") * FrameSize + 1).cast("int"), lit(FrameSize))
    Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), nFrames - 1)).as("frame_idx"))
      .filter(pmod(col("frame_idx"), lit(SampleEvery)) === 0)
      .select(col("doc_id"), col("frame_idx"),
        // dotall on both engines: a bare dot excludes CR and Unicode line
        // separators in Java but only LF in RE2 -- (?s) here and the 's'
        // option in DuckDB make the stride-2 pair consume EVERY char pair
        regexp_replace(frame, "(?s)(.).", "$1").as("half"))
      .select(col("doc_id"), col("frame_idx"),
        length(col("half")).cast("long").as("half_bytes"),
        md5(col("half")).as("half_md5"))
  }

  private val resizeHalveSql =
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |         unnest(generate_series(0, (length(text)+${FrameSize - 1})//$FrameSize - 1)) AS frame_idx
       |  FROM documents WHERE length(text) > 0),
       | h AS (
       |  SELECT doc_id, frame_idx,
       |    regexp_replace(substring(text, CAST(frame_idx*$FrameSize+1 AS BIGINT), $FrameSize),
       |                   '(.).', '\\1', 'gs') AS half
       |  FROM f WHERE frame_idx % $SampleEvery = 0)
       |SELECT doc_id, frame_idx, CAST(length(half) AS BIGINT) AS half_bytes,
       |       md5(half) AS half_md5
       |FROM h""".stripMargin

  override def entries: Seq[(String, QueryFn, Option[String])] = Seq(
    ("mm_binary_meta", binaryMeta _, Some(binaryMetaSql)),
    ("mm_decode_batch", decodeBatch _, None),
    ("mm_frame_sample", frameSample _, Some(frameSampleSql)),
    ("mm_resize_halve", resizeHalve _, Some(resizeHalveSql)))
}
