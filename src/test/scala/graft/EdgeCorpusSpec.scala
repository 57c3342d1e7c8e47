package graft

import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Hostile-input harness: every documents-table entry runs over a tiny
  * adversarial corpus — empty text, a single token, punctuation-only, exact
  * duplicates, one token repeated, a long doc — written as a real
  * documents.parquet so entries exercise their full path (scan included).
  * Asserts no entry throws and no result carries NaN/Infinity: degenerate
  * docs must drop out of an operator's domain (no bigrams, no shingles)
  * rather than poison its arithmetic. */
class EdgeCorpusSpec extends SparkSpec {

  private lazy val edgeDir: String = {
    val s2 = spark
    import s2.implicits._
    val docs = Seq(
      (1L, "", "en", "web"),
      (2L, "single", "en", "web"),
      (3L, "!!! ??? ... ---", "en", "forum"),
      (4L, "same same same same same same same same same same", "en", "web"),
      (5L, "the quick brown fox jumps over the lazy dog today", "en", "books"),
      (6L, "the quick brown fox jumps over the lazy dog today", "en", "books"),
      (7L, Seq.tabulate(400)(i => s"tok$i").mkString(" "), "de", "wiki"),
      (8L, "a b a b a b a b a b a b a b a b a b a b", "fr", "forum"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
    // embeddings twin: duplicates, a ZERO vector (the cosine-degenerate
    // case), an axis vector, and tiny magnitudes
    val embs = Seq(
      (1L, Array(0f, 0f, 0f, 0f), 0),
      (2L, Array(1f, 0f, 0f, 0f), 0),
      (3L, Array(1f, 0f, 0f, 0f), 1),
      (4L, Array(1e-20f, 0f, 0f, 1e-20f), 1),
      (5L, Array(-1f, 2f, -3f, 4f), 2),
      (6L, Array(4f, -3f, 2f, -1f), 2))
      .toDF("vec_id", "embedding", "label")
      .withColumn("label", org.apache.spark.sql.functions.col("label").cast("int"))
    val dir = java.nio.file.Files.createTempDirectory("graft_edge_corpus")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    embs.coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir.toString
  }

  test("every documents-table entry survives the edge corpus, NaN/Inf-free") {
    val prefixes = Seq("txt_", "smp_", "dedup_", "doc_", "pipeline_", "mm_", "ann_", "emb_", "vec_")
    // The PQ tiers slice embeddings into Dim/SubDim subspaces — a PQ index
    // is BUILT for one fixed dim, so a wrong-dim corpus fails LOUD (array
    // index error) by design rather than silently mis-scoring; excluded
    // here. (The LSH tiers handle ragged dims via the NULL-bucket
    // contract and stay covered.)
    val fixedDimIndex = Set("ann_pq_topk", "ann_ivfpq_topk", "ann_ivfpq_residual_topk",
      "ann_ivfpq_prebuilt_topk", "ann_ivfpq_residual_prebuilt_topk",
      "ann_recall_eval_pq")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
      .filterNot(fixedDimIndex)
    assert(names.size >= 30, s"harness should cover the doc entries, got $names")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, edgeDir)
      val rows =
        try df.collect()
        // NonFatal only (an OOM must propagate), and pass the exception as
        // the cause so the underlying stack trace survives (ADVICE r4)
        catch { case scala.util.control.NonFatal(e) =>
          fail(s"$name threw on the edge corpus: ${e.getMessage}", e)
        }
      val schema = df.schema
      val floatCols = schema.fields.zipWithIndex.collect {
        case (f, i) if f.dataType == DoubleType || f.dataType == FloatType => (f.name, i)
      }
      rows.foreach { r =>
        floatCols.foreach { case (cn, i) =>
          if (!r.isNullAt(i)) {
            val v = r.get(i) match {
              case d: java.lang.Double => d.doubleValue()
              case f: java.lang.Float => f.doubleValue()
            }
            assert(!v.isNaN && !v.isInfinite, s"$name.$cn = $v on the edge corpus")
          }
        }
      }
    }
  }
}
