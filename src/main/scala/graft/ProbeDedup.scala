package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** THROWAWAY r19 probe: stage-by-stage timing of the MinHash-LSH pipeline
  * (copy of Dedup's private helpers). Deleted before round freeze. */
object ProbeDedup {
  private val P = 1000000007L
  private def md5Int(c: Column): Column = graft.functions.TextFunctions.md5Int(c)

  private def t[A](label: String)(f: => A): Unit = {
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PROBE $label%-44s min=${runs.min}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.read.parquet(s"$d/region.parquet").count()
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // trigger the shared stored shingle index build (one-time)
    val inv0 = graft.dedup.Dedup.shingleIndexOf(Tables.documents(spark, d))
    noop(inv0)

    // rebuild the stored-index lifecycle inline (parquet write once)
    val idxDir = java.nio.file.Files.createTempDirectory("probe_shingles")
    inv0.write.mode("overwrite").parquet(idxDir.toString)
    def inv = spark.read.parquet(idxDir.toString)

    t("0 shingleIndexOf fresh (native kernel)")(noop(inv0))
    t("1 inv read only")(noop(inv))
    val hashed = inv.select(col("doc_id"), pmod(md5Int(col("sg")), lit(P)).as("h"))
    t("2 + md5 hash")(noop(hashed))
    val sigCols = (0 until 64).map(i =>
      min(pmod(lit(2L * i + 1) * col("h") + lit(97L * i), lit(P))).as(s"m$i"))
    def sig = hashed.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    t("3 + 64-min signature")(noop(sig))
    val bandCols = (0 until 16).map { b =>
      (0 until 4).map(r => col(s"m${b * 4 + r}"))
        .foldLeft(lit(0L): Column)((acc, c) => pmod(acc * lit(1000003L) + c, lit(P)))
    }
    def bands = sig.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("b_idx", "b_hash")))
    t("4 + bands")(noop(bands))
    def cands = bands.select(col("doc_id").as("doc_a"), col("b_idx"), col("b_hash"))
      .join(bands.select(col("doc_id").as("doc_b"), col("b_idx").as("i2"), col("b_hash").as("h2")),
        col("b_idx") === col("i2") && col("b_hash") === col("h2") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    t("5 + band self-join cands")(noop(cands))
    // variant: bands materialized once
    t("5m cands w/ materialized bands") {
      val bm = Checkpoints.materialize(bands)
      val c = bm.select(col("doc_id").as("doc_a"), col("b_idx"), col("b_hash"))
        .join(bm.select(col("doc_id").as("doc_b"), col("b_idx").as("i2"), col("b_hash").as("h2")),
          col("b_idx") === col("i2") && col("b_hash") === col("h2") && col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      noop(c)
      Checkpoints.free(bm)
    }
    // full pipeline for reference
    t("6 full dedup_minhash_lsh entry")(
      noop(SparkEntry.queries("dedup_minhash_lsh")(spark, d)))
    t("7 full dedup_lsh_recall entry")(
      noop(SparkEntry.queries("dedup_lsh_recall")(spark, d)))
    t("8 full dedup_containment entry")(
      noop(SparkEntry.queries("dedup_containment")(spark, d)))
    t("9 full dedup_winnow_pairs entry")(
      noop(SparkEntry.queries("dedup_winnow_pairs")(spark, d)))
    t("10 full dedup_substring_exact entry")(
      noop(SparkEntry.queries("dedup_substring_exact")(spark, d)))
    spark.stop()
  }
}
