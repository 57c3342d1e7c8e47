package graft

import graft.dedup.Dedup

/** Parity for the native shingle kernel: per-doc shingle SETS from
  * plans.WordShingles must equal the relational posexplode + window-leads
  * build exactly — on ASCII, non-ASCII, degenerate (under 3 tokens), and
  * seeded random docs. The dedup DuckDB oracles replay the relational
  * construction, so this equality is what keeps them hash-green over the
  * native path. */
class ShinglePropertySpec extends SparkSpec {

  private def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[String]] =
    df.collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }

  test("native shingles equal the relational build on hostile docs") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(19L)
    def doc(n: Int) = Seq.fill(n)("tok" + rnd.nextInt(30)).mkString(" ")
    val docs = (Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one two"), // < 3 tokens → no shingles
      (3L, "学习数据 处理系统 学习数据 处理系统 需要 更多 文本"),
      (4L, "  padded   with   extra   whitespace  "),
      (5L, "same same same same same same"),
      // SQL trim keeps these; Java String.trim would strip them — the
      // empty boundary tokens MUST appear in both builds' shingles
      (13L, "\tleading tab and trailing newline doc\n"),
      (14L, "\r\ncarriage return bounded doc body here\r")) ++
      (6L to 12L).map(i => i -> doc(5 + rnd.nextInt(60)))).toDF("doc_id", "text")
    val native = sets(Dedup.shingleIndexOf(docs))
    val relational = sets(Dedup.shingleIndexRelational(docs))
    assert(native.nonEmpty)
    assert(native == relational)
    assert(!native.contains(2L))
  }
}
