package graft

import graft.dedup.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The oracle corpus is ASCII; a library user's corpus is not. These tests
  * run the DataFrame-parametric text/dedup surfaces over non-ASCII input —
  * CJK, emoji, combining accents, CR/LF and Unicode line separators — and
  * assert they behave sanely (no crash, consistent dedup identity, stride-2
  * regex consuming every char pair regardless of line terminators — the
  * ADVICE r2 dotall concern). */
class UnicodeRobustnessSpec extends SparkSpec {

  private def unicodeDocs = {
    val s2 = spark
    import s2.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "学习数据 处理系统 学习数据 处理系统 学习数据 处理系统 需要 更多 文本"),
      (4L, "café naïve résumé über straße café naïve encore une fois"),
      (5L, "emoji 😀 line one\r\nline two line three line four and some more words here"),
      (6L, "mixed ascii and 日本語 tokens with spaces between every word token"))
      .toDF("doc_id", "text")
  }

  test("exact dedup identity is stable on non-ASCII text") {
    val surv = Dedup.survivorsOf(unicodeDocs).collect()
    // docs 1+2 are identical → one fingerprint shadows one dup; every other
    // doc keeps its own fingerprint (canonicalization strips non-alnum but
    // must do so deterministically)
    assert(surv.map(_.getAs[Long]("n_shadowed")).sum == 1)
    assert(surv.length == 5)
  }

  test("shingle index and minhash run on non-ASCII without error") {
    val idx = Dedup.shingleIndexOf(unicodeDocs).collect()
    assert(idx.nonEmpty)
    val pairs = Dedup.minhashLshOf(unicodeDocs).collect()
    // the identical pair must be found at jaccard 1.0
    assert(pairs.exists(r => r.getAs[Long]("doc_a") == 1L
      && r.getAs[Long]("doc_b") == 2L && r.getAs[Double]("jaccard") == 1.0))
  }

  test("winnow rolling hash yields fingerprints for non-ASCII docs") {
    val rows = graft.operators.TextAnalysis.winnowed(unicodeDocs)
      .groupBy("doc_id").agg(countDistinct("fp").as("n")).collect()
    assert(rows.length == unicodeDocs.count())
    rows.foreach(r => assert(r.getAs[Long]("n") > 0))
  }

  test("stride-2 dotall regex consumes CR/LF and Unicode line separators") {
    val s2 = spark
    import s2.implicits._
    // the LIVE mm_resize_halve expression (shared def, not a copy);
    // without (?s), CR and the U+2028/U+2029 separators would break pair
    // consumption (ADVICE r2)
    val text = "ab\r\ncd ef gh"
    val half = Seq(text).toDF("t")
      .select(graft.multimodal.Multimodal.strideHalf(col("t")).as("h"))
      .head().getString(0)
    assert(half == text.zipWithIndex.collect { case (c, i) if i % 2 == 0 => c }.mkString)
  }

  test("phash samples CODE POINTS: a driver-side replay matches on non-ASCII") {
    val s2 = spark
    import s2.implicits._
    // long bodies (>= 60 code points) with CJK/emoji/accents; 7 and 8 are
    // identical so the phash must collide and group_size must see it
    val base = "学习 数据 处理 café 😀 naïve " * 8
    val docs = Seq((7L, base), (8L, base), (9L, base + " 不同 的 结尾 extra tail"))
      .toDF("doc_id", "text")
    val media = graft.multimodal.Multimodal.synthesizeMedia(docs)
    val rows = graft.multimodal.Multimodal.phashOf(media).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("phash"), r.getAs[Long]("group_size"))).toMap
    assert(rows(7L) == rows(8L) && rows(7L)._2 == 2L, "identical bodies must collide")
    assert(rows(9L)._1 != rows(7L)._1, "different tail must separate")
    // independent code-point replay of doc 7 (the oracle's char arithmetic)
    val cps = base.codePoints().toArray
    val n = cps.length.toLong
    val sam = (0 until 60).map(i => cps(math.floor(i * n / 60.0).toInt).toLong)
    val ssum = sam.sum
    val expected = (0 until 60)
      .map(i => if (sam(i) * 60 > ssum) 1L << i else 0L).reduce(_ | _)
    assert(rows(7L)._1 == expected,
      s"phash ${rows(7L)._1} != code-point replay $expected")
  }

  test("char entropy counts CODE POINTS: a driver-side replay matches on non-ASCII") {
    def lnq(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong
    val rows = graft.operators.TextAnalysis.charEntropyOf(unicodeDocs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val want = unicodeDocs.collect().map { r =>
      val cps = r.getString(1).codePoints().toArray
      val counts = cps.groupBy(identity).map(_._2.length.toLong)
      val n = cps.length.toLong
      val s = counts.map(c => c * lnq(c)).sum
      val h = (lnq(n) * n - s).toDouble / n / 1e6
      r.getLong(0) -> ((n, counts.size.toLong, math.floor(h * 1e6 + 0.5) / 1e6))
    }.toMap
    assert(rows == want, "entropy must be code-point-exact on CJK/emoji/accents")
  }

  test("wav probe decodes PCM BYTES on non-ASCII text — the sign branch fires") {
    val media = graft.multimodal.Multimodal.synthesizeWav(unicodeDocs)
    val rows = graft.multimodal.Multimodal.parseWav(media).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_samples"), r.getAs[Long]("first_sample")))).toMap
    val texts = unicodeDocs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    var negSeen = false
    rows.foreach { case (id, (ns, s0)) =>
      val b = texts(id).getBytes("UTF-8")
      val ch = 1 + id % 2
      assert(ns == b.length / (ch * 2), s"doc $id: byte-grain sample count")
      val raw = (b(0) & 0xFF) + 256L * (b(1) & 0xFF)
      val want = if (raw >= 32768L) raw - 65536L else raw
      assert(s0 == want, s"doc $id: first PCM sample from UTF-8 bytes")
      if (want < 0) negSeen = true
    }
    // doc 3 starts with a CJK char (multi-byte, high second byte): the
    // 16-bit sign branch must actually fire somewhere in this corpus
    assert(negSeen, "fixture must exercise the negative-sample branch")
  }

  test("quality score and canonical fingerprint are defined on non-ASCII") {
    val out = unicodeDocs.select(col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp"),
      TextFunctions.qualityScore(TextFunctions.tokens(col("text"))).as("q"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[String]("fp").length == 32)
      val q = r.getAs[Double]("q")
      assert(!q.isNaN && q >= 0.0 && q <= 1.0)
    }
  }
}
