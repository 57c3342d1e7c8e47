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

  test("count-preserving n-gram kernel equals the relational build as a MULTISET") {
    // the counting variant must keep duplicates AND order-insensitive
    // multiplicity exactly — a set-equality pass would hide a dropped
    // duplicate, which flips rep_score/top-ngram counts
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23L)
    def doc(n: Int) = Seq.fill(n)("w" + rnd.nextInt(8)).mkString(" ")
    val docs = (Seq(
      (1L, "a b a b a b"), // heavy duplication — the case sets can't see
      (2L, "solo"),        // < 2 tokens → no bigrams
      (3L, "same same same same"),
      (4L, "  pad  ded  "),
      (13L, "\ttab bounded doc\n"),
      (14L, "学习 数据 学习 数据 学习")) ++
      (5L to 12L).map(i => i -> doc(3 + rnd.nextInt(40)))).toDF("doc_id", "text")
    def multisets(df: org.apache.spark.sql.DataFrame): Map[Long, Map[String, Int]] =
      df.collect().groupBy(_.getLong(0)).map { case (k, rs) =>
        k -> rs.map(_.getString(1)).groupBy(identity).map { case (g, o) => g -> o.length }
      }
    val native = multisets(docs.select(col("doc_id"),
      explode(org.apache.spark.sql.GraftColumns.column(
        graft.plans.WordNgrams(
          org.apache.spark.sql.GraftColumns.expression(col("text")), 2))).as("bg")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val relational = multisets(docs
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.tokens(col("text"))).as(Seq("pos", "t")))
      .select(col("doc_id"), concat_ws(" ", col("t"), lead("t", 1).over(w)).as("bg"),
        lead("t", 1).over(w).as("t1"))
      .filter(col("t1").isNotNull)
      .select("doc_id", "bg"))
    assert(native.nonEmpty)
    assert(native == relational)
    assert(!native.contains(2L))
    assert(native(1L)("a b") == 3 && native(1L)("b a") == 2)
  }
}
