package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("tfidf: at most 5 ranked terms per doc, scores descend, terms in doc") {
    val rows = TextAnalysis.tfidfTopk(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val ordered = rs.sortBy(_.getAs[Long]("rk"))
      assert(ordered.map(_.getAs[Long]("rk")).toSeq == (1L to rs.length).toSeq)
      val scores = ordered.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // every ranked term actually occurs in its document's token stream
    // (the shared SQL tokenizer, not Java trim/split defaults)
    val docToks = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        toks(r.getAs[String]("text")).toSet).toMap
    rows.foreach { r =>
      assert(docToks(r.getAs[Long]("doc_id")).contains(r.getAs[String]("term")))
    }
  }

  /** The operators' exact tokenizer (SQL trim + split limit −1, which
    * KEEPS trailing empty tokens) — one shared definition with the native
    * kernel, so the model cannot drift from the engine. */
  private def toks(s: String): Seq[String] =
    graft.plans.WordShingles.sqlTokens(s).toSeq

  test("unigram logprob matches a local recompute of the corpus LM") {
    val docs = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> toks(r.getAs[String]("text")))
    val cf = docs.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length }
    val nTotal = docs.map(_._2.length).sum
    def lnFp(x: Double): Long = math.round(math.log(x) * 1e6)
    val expected = docs.map { case (id, ts) =>
      val sum = ts.map(t => lnFp(cf(t).toDouble)).sum
      id -> BigDecimal((lnFp(nTotal.toDouble) * ts.length - sum).toDouble / (ts.length * 1e6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = operators.TextAnalysis.unigramLogprob(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll_per_token")).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, v) => assert(math.abs(v - expected(id)) < 1e-9, s"doc $id") }
    // and the signal points the right way: nll is positive (tokens rarer
    // than the whole corpus) for every doc
    assert(got.values.forall(_ > 0))
  }

  test("tfidf: corpus-wide terms score zero, rarer terms score higher at equal tf") {
    val n = Tables.documents(spark, sf).count()
    val rows = TextAnalysis.tfidfTopk(spark, sf).collect()
    rows.filter(_.getAs[Long]("df") == n)
      .foreach(r => assert(r.getAs[Double]("score") == 0.0))
    rows.foreach { r =>
      val expected = BigDecimal(r.getAs[Long]("tf") *
        math.log(n.toDouble / r.getAs[Long]("df")))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(expected - r.getAs[Double]("score")) < 1e-9)
    }
  }
}
