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
