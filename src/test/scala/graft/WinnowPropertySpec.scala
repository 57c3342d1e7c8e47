package graft

/** The winnowing guarantee (Schleimer et al., MOSS): with char-gram size
  * K=8 and window W=8, any substring shared between two docs of length
  * ≥ W+K−1 = 15 chars forces at least one shared fingerprint — a window of
  * grams lying fully inside the shared region selects the same minimum
  * hash VALUE in both docs. Property-tested on seeded random docs with
  * planted common substrings (the exact workload dedup_winnow_pairs
  * mines), plus the converse: disjoint alphabets share nothing. */
class WinnowPropertySpec extends SparkSpec {

  private def fps(docs: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    val s2 = spark
    import s2.implicits._
    operators.TextAnalysis.winnowed(docs.toDF("doc_id", "text")).collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("fp")).toSet }
  }

  test("planted shared substring of >= 15 chars forces a shared fingerprint") {
    val rnd = new scala.util.Random(7L)
    def noise(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    (1 to 8).foreach { i =>
      val shared = noise(15 + rnd.nextInt(30))
      val a = noise(rnd.nextInt(40)) + shared + noise(rnd.nextInt(40))
      val b = noise(rnd.nextInt(40)) + shared + noise(rnd.nextInt(40))
      val m = fps(Seq((1L, a), (2L, b)))
      assert((m(1L) & m(2L)).nonEmpty,
        s"case $i: '$shared' shared between '$a' and '$b' left no common fp")
    }
  }

  test("native kernel is bit-identical to the relational winnow, incl. non-ASCII") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(13L)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "学习数据 处理系统 学习数据 处理系统 需要 更多 文本"),
      (3L, "emoji 😀 mixed with ascii and café naïve résumé über"),
      (4L, "short"), // < K chars → no fingerprints in either form
      (5L, Seq.fill(200)(('a' + rnd.nextInt(26)).toChar).mkString))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("doc_id", "CAST(pos AS LONG) AS pos", "fp").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val native = rows(operators.TextAnalysis.winnowed(docs))
    val relational = rows(operators.TextAnalysis.winnowedRelational(docs))
    assert(native.nonEmpty)
    assert(native == relational)
  }

  test("map-side distinct form equals winnowed().distinct() exactly") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(23L)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog repeatedly today"),
      (2L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"), // degenerate: one repeated min
      (3L, Seq.fill(300)(('a' + rnd.nextInt(26)).toChar).mkString))
      .toDF("doc_id", "text")
    def set(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "fp").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaDistinct = set(operators.TextAnalysis.winnowed(docs).distinct())
    val mapSide = operators.TextAnalysis.winnowedDistinct(docs)
    assert(set(mapSide) == viaDistinct)
    // and per-doc uniqueness is born, not re-established by a shuffle
    assert(mapSide.count() == viaDistinct.size)
  }

  test("docs over disjoint alphabets share no fingerprints") {
    val rnd = new scala.util.Random(11L)
    val letters = Seq.fill(120)(('a' + rnd.nextInt(26)).toChar).mkString
    val digits = Seq.fill(120)(('0' + rnd.nextInt(10)).toChar).mkString
    val m = fps(Seq((1L, letters), (2L, digits)))
    assert(m(1L).nonEmpty && m(2L).nonEmpty)
    assert((m(1L) & m(2L)).isEmpty)
  }
}
