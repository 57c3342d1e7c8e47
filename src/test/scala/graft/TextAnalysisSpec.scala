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
    val docToks = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split("\\s+").toSet).toMap
    rows.foreach { r =>
      assert(docToks(r.getAs[Long]("doc_id")).contains(r.getAs[String]("term")))
    }
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
