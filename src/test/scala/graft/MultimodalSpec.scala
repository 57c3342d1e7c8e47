package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("binary meta: sizes and digests line up with the text payloads") {
    val rows = Multimodal.binaryMeta(spark, sf).collect()
    assert(rows.length == spark.read.parquet(s"$sf/documents.parquet").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[String]("sha").length == 64)
      assert(r.getAs[String]("kind") == "text") // corpus is lowercase words
    }
  }

  test("decode batch: deterministic stub metadata for every doc") {
    val a = Multimodal.decodeBatch(spark, sf).collect()
    assert(a.length == spark.read.parquet(s"$sf/documents.parquet").count())
    a.foreach { r =>
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 64)
      assert(r.getAs[Int]("channels") == 3)
      assert(r.getAs[Int]("n_bytes") > 0)
    }
    // deterministic across runs
    val b = Multimodal.decodeBatch(spark, sf).collect()
    assert(a.map(_.getAs[Long]("checksum")).sorted.sameElements(
      b.map(_.getAs[Long]("checksum")).sorted))
  }

  test("frame sample: every 4th fixed-size frame, digests match direct slicing") {
    val rows = Multimodal.frameSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("frame_idx") % 4 == 0)
      assert(r.getAs[Long]("n_bytes") > 0 && r.getAs[Long]("n_bytes") <= 256)
    }
    // spot-check one frame digest against direct byte slicing
    val doc = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").head()
    val bytes = doc.getString(1).getBytes("UTF-8")
    val frame0 = java.util.Arrays.copyOfRange(bytes, 0, math.min(256, bytes.length))
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(frame0).map("%02x".format(_)).mkString
    val got = Multimodal.frameSample(spark, sf)
      .filter(col("doc_id") === doc.getLong(0) && col("frame_idx") === 0)
      .head().getAs[String]("frame_md5")
    assert(got == expected)
  }

  test("resize halve: stride-2 subsample digest matches direct computation") {
    val doc = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").head()
    val frame0 = doc.getString(1).take(256)
    val half = frame0.zipWithIndex.collect { case (c, i) if i % 2 == 0 => c }.mkString
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(half.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val row = Multimodal.resizeHalve(spark, sf)
      .filter(col("doc_id") === doc.getLong(0) && col("frame_idx") === 0)
      .head()
    assert(row.getAs[String]("half_md5") == expected)
    assert(row.getAs[Long]("half_bytes") == (frame0.length + 1) / 2)
  }

  test("stub decoder matches a direct call (same bytes, same checksum)") {
    val doc = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").head()
    val meta = graft.multimodal.Multimodal.stubDecode(
      doc.getLong(0), doc.getString(1).getBytes("UTF-8"))
    val viaSpark = Multimodal.decodeBatch(spark, sf)
      .filter(col("doc_id") === doc.getLong(0)).head()
    assert(viaSpark.getAs[Long]("checksum") == meta.checksum)
    assert(viaSpark.getAs[Int]("n_bytes") == meta.n_bytes)
  }
}
