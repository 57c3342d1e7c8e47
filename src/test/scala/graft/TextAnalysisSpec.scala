package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private def lnq(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong

  private def corpusTokens: Seq[(String, Array[String])] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect().toSeq
      .map(r => r.getString(0) -> graft.plans.WordShingles.sqlTokens(r.getString(1)))

  test("char entropy recounts per doc from a driver-side replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).filter(_._2.nonEmpty).toMap
    val want = docs.map { case (id, text) =>
      val counts = text.split("").filter(_.nonEmpty)
        .groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val s = counts.map(c => c * lnq(c)).sum
      val h = (lnq(n) * n - s).toDouble / n / 1e6
      id -> ((n, counts.size.toLong, math.floor(h * 1e6 + 0.5) / 1e6))
    }
    val got = TextAnalysis.charEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want)
    // word-soup text must land strictly between degenerate (0) and the
    // uniform-ASCII ceiling ln(128)
    got.values.foreach { case (_, _, h) => assert(h > 0 && h < math.log(128)) }
  }

  test("heaps fit: corpus row recounts from per-doc (tokens, types) points") {
    val pts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
      .map(t => t.trim.split("\\s+")) // Spark's tokens(): no empty-filter
      .filter(_.length > 0)
      .map(ts => (lnq(ts.length.toLong), lnq(ts.distinct.length.toLong)))
    val cnt = BigInt(pts.length)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val beta = (cnt.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (cnt.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val want = math.floor(beta * 1e6 + 0.5) / 1e6
    val corpus = TextAnalysis.heapsFit(spark, sf).collect()
      .find(_.getString(0) == "__corpus__").get
    assert(corpus.getLong(1) == pts.length)
    assert(corpus.getDouble(2) == want)
    // vocabulary grows sublinearly but does grow
    assert(want > 0 && want < 1)
  }

  test("ngram novelty recounts from a local shingle-df model") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val perDoc = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toArray.distinct
    }.filter(_._2.nonEmpty)
    val df = perDoc.flatMap(_._2).groupBy(identity).map { case (s, g) => s -> g.length }
    val want = perDoc.map { case (id, sh) =>
      val uniq = sh.count(df(_) == 1).toLong
      id -> ((sh.length.toLong, uniq,
        math.floor(uniq.toDouble / sh.length * 1e6 + 0.5) / 1e6))
    }.toMap
    val got = TextAnalysis.ngramNovelty(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want)
  }

  test("zipf fit matches a local integer-regression model and slopes negative") {
    val counts = corpusTokens.flatMap(_._2).groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val top = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(100)
    val q = top.zipWithIndex.map { case ((_, n), i) => (lnq(i + 1L), lnq(n)) }
    val cnt = q.size.toLong
    val (sx, sy) = (q.map(_._1).sum, q.map(_._2).sum)
    val (sxy, sxx) = (q.map(p => p._1 * p._2).sum, q.map(p => p._1 * p._1).sum)
    val slope = (cnt * sxy - sx * sy).toDouble / (cnt * sxx - sx * sx).toDouble
    val want = math.floor(slope * 1e6 + 0.5) / 1e6
    val row = TextAnalysis.zipfFit(spark, sf).collect()(0)
    // the fixture vocabulary can be smaller than the top-N cap
    assert(row.getAs[Long]("n_terms") == math.min(counts.size, 100))
    assert(row.getAs[Double]("zipf_slope") == want)
    assert(row.getAs[Double]("zipf_slope") < 0.0)
  }

  test("PMI collocations match a local margin model, top-20 order exact") {
    val bgs = corpusTokens.flatMap { case (_, tk) => tk.dropRight(1).zip(tk.drop(1)) }
      .map { case (a, b) => s"$a $b" }
    val c12 = bgs.groupBy(identity).map { case (b, g) => b -> g.size.toLong }
    val c1 = c12.groupBy(_._1.split(' ')(0)).map { case (t, g) => t -> g.values.sum }
    val c2 = c12.groupBy(_._1.split(' ')(1)).map { case (t, g) => t -> g.values.sum }
    val nb = c12.values.sum
    val want = c12.filter(_._2 >= 5).toSeq.map { case (bg, n) =>
      val Array(a, b) = bg.split(' ')
      (bg, n, lnq(n) + lnq(nb) - lnq(c1(a)) - lnq(c2(b)))
    }.sortBy { case (bg, _, fp) => (-fp, bg) }.take(20)
      .map { case (bg, n, fp) => (bg, n, fp.toDouble / 1e6) }
    val got = TextAnalysis.collocationsPmi(spark, sf).collect()
      .map(r => (r.getAs[String]("bg"), r.getAs[Long]("c12"), r.getAs[Double]("pmi"))).toSeq
    assert(got == want)
  }

  test("per-source KL matches a local model and is nonneg within quantization") {
    val sw = corpusTokens.flatMap { case (s0, tk) => tk.map(s0 -> _) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val cw = sw.groupBy(_._1._2).map { case (t, g) => t -> g.values.sum }
    val cs = sw.groupBy(_._1._1).map { case (s0, g) => s0 -> g.values.sum }
    val ctot = cw.values.sum
    val want = cs.map { case (src, csTot) =>
      val klFp = sw.collect { case ((`src`, t), csw) =>
        csw * (lnq(csw) + lnq(ctot) - lnq(cw(t)) - lnq(csTot))
      }.sum
      src -> (math.floor(klFp.toDouble / csTot + 0.5) / 1e6)
    }
    val got = TextAnalysis.sourceKl(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("kl_nats")).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (src, k) =>
      assert(got(src) == k, s"source $src")
      // true KL >= 0; µ-quantization can dip at most ~2 µnat per term
      assert(got(src) > -1e-3, s"KL sharply negative for $src")
    }
  }

  test("source vocabulary overlap matches a local set model, top-20 order exact") {
    val vocab = corpusTokens.groupBy(_._1)
      .map { case (src, g) => src -> g.flatMap(_._2).toSet }
    val want = vocab.keys.toSeq.sorted.combinations(2).map { case Seq(a, b) =>
      val inter = vocab(a).intersect(vocab(b)).size.toLong
      val jac = inter.toDouble / (vocab(a).size + vocab(b).size - inter)
      (a, b, inter, math.floor(jac * 1e6 + 0.5) / 1e6)
    }.toSeq.sortBy { case (a, b, _, j) => (-j, a, b) }.take(20)
    val got = TextAnalysis.sourceOverlap(spark, sf).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
        r.getAs[Long]("inter_vocab"), r.getAs[Double]("jaccard"))).toSeq
    assert(got == want)
  }

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

  test("filter funnel conserves documents: stages chain and drops attribute once") {
    val rows = TextAnalysis.filterFunnel(spark, sf01).collect()
      .sortBy(_.getAs[String]("stage"))
    assert(rows.length == 5)
    val total = Tables.documents(spark, sf01).count()
    assert(rows.head.getAs[Long]("n_in") == total, "stage 1 sees the whole corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_in") - r.getAs[Long]("n_dropped") == r.getAs[Long]("n_out"),
        s"conservation broken at ${r.getAs[String]("stage")}")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_out") == b.getAs[Long]("n_in"),
        s"funnel chain broken between ${a.getString(0)} and ${b.getString(0)}")
    }
    // the calibrated bars keep a nonempty corpus and drop something
    assert(rows.last.getAs[Long]("n_out") > 0, "funnel must not annihilate the corpus")
    assert(rows.map(_.getAs[Long]("n_dropped")).sum > 0, "funnel must drop something")
  }

  test("gopher repetition signals match a hand-built corpus") {
    val s2 = spark
    import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rep_test").toString
    Seq(
      (1L, "aaa\nbbb\naaa\nccc"),           // line 'aaa' ×2 of 4 lines
      (2L, "unique lines only here\nsecond line"),
      (3L, "spam spam spam spam spam"),      // one bigram covers the doc
      (4L, "")                               // degenerate: no chars, no grams
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.gopherRepetition(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
    // doc 1: 2 of 4 lines are the duplicate 'aaa'; 6 of 12 line chars
    assert(rows(1L).getAs[Double]("dup_line_frac") == 0.5)
    assert(rows(1L).getAs[Double]("dup_line_char_frac") == 0.5)
    // doc 2: no duplicate lines, no repeated bigram dominates
    assert(rows(2L).getAs[Double]("dup_line_frac") == 0.0)
    // doc 3: 'spam spam' occurs 4× (9 chars each) over 24 chars = 1.5 —
    // overlapping occurrences can exceed 1, which is exactly the signal
    // (Gopher clips at a threshold; the raw ratio ranks harder)
    assert(rows(3L).getAs[Double]("top_bigram_char_frac") == 4 * 9 / 24.0)
    // doc 4: all-zero signals, no NaN from the 0-char guards
    Seq("dup_line_frac", "dup_line_char_frac", "top_bigram_char_frac").foreach { c =>
      assert(rows(4L).getAs[Double](c) == 0.0, s"doc 4 $c")
    }
  }

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

  test("perplexity bands recount from a local replay of the unigram LM") {
    val docs = Tables.documents(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"),
        toks(r.getAs[String]("text"))))
    val cf = docs.flatMap(_._3).groupBy(identity).map { case (t, xs) => t -> xs.length }
    val nTotal = docs.map(_._3.length).sum
    def lnFp(x: Double): Long = math.round(math.log(x) * 1e6)
    val nll = docs.map { case (id, nc, ts) =>
      val sum = ts.map(t => lnFp(cf(t).toDouble)).sum
      (id, nc,
        math.floor((lnFp(nTotal.toDouble) * ts.length - sum).toDouble / ts.length + 0.5).toLong)
    }
    val mean = nll.map(_._3).sum / nll.length // positive operands: trunc == floor == div
    val bands = nll.groupBy { case (_, _, f) =>
      (math.min(99999L, math.max(0L, f - mean + 50000L)) / 20000L).toInt }
    val got = TextAnalysis.perplexityBucket(spark, sf).collect()
      .map(r => r.getAs[Int]("band") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("avg_chars"), r.getAs[Double]("avg_nll")))
      .toMap
    assert(got.keySet == bands.keySet, s"bands: got ${got.keySet}, want ${bands.keySet}")
    bands.foreach { case (b, xs) =>
      val (n, avgChars, avgNll) = got(b)
      assert(n == xs.length, s"band $b population")
      assert(math.abs(avgChars - xs.map(_._2).sum.toDouble / xs.length) < 1e-9)
      val expNll = math.floor(xs.map(_._3).sum.toDouble / xs.length + 0.5) / 1e6
      assert(math.abs(avgNll - expNll) < 1e-12, s"band $b mean surprisal")
    }
    // every doc lands in exactly one band
    assert(got.values.map(_._1).sum == docs.length.toLong)
  }

  test("bigram LM: one score per multi-token doc, n-1 bigrams, nll positive") {
    val docs = TextAnalysis.bigramLogprob(spark, sf).collect()
    val tokCounts = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(docs.length == tokCounts.count(_._2 >= 2))
    docs.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") == tokCounts(r.getAs[Long]("doc_id")) - 1L)
      // smoothed conditionals are strict probabilities (< 1): nll > 0
      assert(r.getAs[Double]("nll_per_bigram") > 0.0)
    }
  }

  test("RAKE: top-3 per doc, no stopwords inside phrases, degree>=freq sanity") {
    val rows = TextAnalysis.rakeKeyphrases(spark, sf).collect()
    assert(rows.nonEmpty)
    val stops = graft.functions.TextFunctions.stopsEn.toSet
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to rs.length))
    }
    rows.foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      assert(words.forall(w => !stops.contains(w)),
        s"stopword leaked into phrase '${r.getAs[String]("phrase")}'")
      // deg/freq >= 1 per word (a word co-occurs at least with itself), so
      // a phrase of n words scores >= n
      assert(r.getAs[Double]("rake_score") >= words.length.toDouble - 1e-9)
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
