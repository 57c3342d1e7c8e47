package graft

import graft.functions.Bpe
import graft.operators.BpeOps
import org.apache.spark.sql.functions._

/** The BPE tokenizer family. The deep cross-engine parity proof is the
  * driver oracle (training AND application replayed in SQL); these specs
  * pin the local invariants the oracle can't see from one corpus: trainer
  * determinism, merge-table shape, code-point symbol grain, memoized
  * kernel correctness across distinct merge tables, and the downstream
  * re-denominations staying consistent with the accounting entry. */
class BpeSpec extends SparkSpec {

  test("merge table: contiguous ranks, single-space pairs, merged = pair sans space") {
    val rows = BpeOps.bpeMerges(spark, sf01).collect()
    assert(rows.length > 0 && rows.length <= Bpe.MergesCap)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length), "ranks contiguous")
    rows.foreach { r =>
      val pair = r.getString(1)
      assert(pair.count(_ == ' ') == 1, s"pair '$pair' must be two symbols")
      assert(r.getString(2) == pair.replace(" ", ""), s"merged of '$pair'")
      assert(r.getLong(3) > 0, "support weight must be positive")
    }
  }

  test("held-out spot-check gate: a production-size model (past the replay cap) serves identically through the codegen kernel") {
    // the documented ceiling (SURVEY section-5 / r10 verdict missing #3b):
    // past ~48 merges the DuckDB unrolled-CTE replay stops being feasible,
    // and the production gate is this — train big, then prove the SERVING
    // kernel (the codegen catalyst expression) agrees with the TRAINER's
    // own reference application on a held-out doc sample, out-of-vocab
    // words included (training only ever saw the top-vocab words; every
    // other word exercises the model on unseen input).
    val nMerges = 192; val vocabTop = 2048
    val merges = Bpe.trainAt(spark, sf01, nMerges, vocabTop)
    assert(merges.size > Bpe.MergesCap,
      s"the fixture must exceed the replay cap, got ${merges.size}")
    val pairs = merges.map(m => (m.pair, m.merged))

    // serving side: the distributed codegen kernel over the held-out docs
    val sample = Tables.documents(spark, sf01)
      .filter(col("doc_id") % 7 === 3)
    val served = sample
      .select(col("doc_id"), org.apache.spark.sql.GraftColumns.column(
        graft.plans.BpeTokens(
          org.apache.spark.sql.GraftColumns.expression(col("text")), pairs)).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

    // reference side: the trainer's own primitives (syms + rep2 chain),
    // applied word by word on the driver — the implementation the model
    // was fit under, i.e. the ground truth for what the merges MEAN
    def ref(text: String): Seq[String] =
      text.trim.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
        var sy = Bpe.syms(w)
        pairs.foreach { case (p, q) => sy = Bpe.rep2(sy, s" $p ", s" $q ") }
        sy.trim.split(" ").toSeq
      }
    val texts = sample.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(served.keySet == texts.keySet && served.nonEmpty)
    served.foreach { case (id, toks) =>
      assert(toks == ref(texts(id)), s"kernel/reference divergence in doc $id")
    }
    // the gate genuinely exercises out-of-vocab words: the sample must
    // contain words the trainer never saw in its top-vocab window — at
    // this fixture's vocabTop the whole vocabulary fits, so shrink the
    // training window and re-check on a model that cannot have seen all
    // sample words
    val smallVocab = Bpe.trainAt(spark, sf01, nMerges, 64)
      .map(m => (m.pair, m.merged))
    val servedSmall = sample
      .select(col("doc_id"), org.apache.spark.sql.GraftColumns.column(
        graft.plans.BpeTokens(
          org.apache.spark.sql.GraftColumns.expression(col("text")), smallVocab)).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    servedSmall.foreach { case (id, toks) =>
      val expected = texts(id).trim.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
        var sy = Bpe.syms(w)
        smallVocab.foreach { case (p, q) => sy = Bpe.rep2(sy, s" $p ", s" $q ") }
        sy.trim.split(" ").toSeq
      }
      assert(toks == expected, s"OOV kernel/reference divergence in doc $id")
    }
  }

  test("model size derives from the corpus: floors at small n, grows, caps") {
    // the derivation itself (pure function, engine-portable formula)
    assert(Bpe.mergesFor(500) == Bpe.MergesFloor, "sub-1024 corpora sit on the floor")
    assert(Bpe.vocabTopFor(500) == Bpe.VocabFloor)
    assert(Bpe.mergesFor(6000) > Bpe.MergesFloor
      && Bpe.mergesFor(6000) < Bpe.MergesCap, "mid-size corpora grow past the floor")
    assert(Bpe.vocabTopFor(6000) > Bpe.VocabFloor
      && Bpe.vocabTopFor(6000) < Bpe.VocabCap)
    assert(Bpe.mergesFor(100000000L) == Bpe.MergesCap, "the documented replay ceiling")
    assert(Bpe.vocabTopFor(100000000L) == Bpe.VocabCap)
    // and the trained tables actually differ in size across SFs when the
    // derivation says they should (sf0.01: 500 docs → floor 32;
    // sf0.1: 5000 docs → 40 — the strictly-between-floor-and-cap case)
    val sfBig = "/root/testdata/sf0.1"
    val nSmall = Tables.documents(spark, sf01).count()
    val nBig = Tables.documents(spark, sfBig).count()
    val mSmall = Bpe.train(spark, sf01).size
    val mBig = Bpe.train(spark, sfBig).size
    assert(mSmall <= Bpe.mergesFor(nSmall))
    assert(mBig <= Bpe.mergesFor(nBig))
    if (Bpe.mergesFor(nBig) > Bpe.mergesFor(nSmall))
      assert(mBig > mSmall,
        s"larger corpus ($nBig docs) must train a deeper table than $nSmall docs")
  }

  test("trainer is deterministic and the per-dir cache serves the same table") {
    val a = Bpe.train(spark, sf)
    Bpe.clearCache()
    val b = Bpe.train(spark, sf)
    assert(a == b, "retraining from scratch must reproduce the merge table")
    assert(Bpe.train(spark, sf) eq b, "second call must serve the cached table")
  }

  test("kernel: code-point symbols, empty-input zeros, per-table memo isolation") {
    // an astral code point is ONE symbol, not two UTF-16 units
    assert(graft.plans.BpeTokenCount.applyWord("𝄞a",
      Array.empty, Array.empty) == 2L)
    assert(Bpe.syms("𝄞a") == " 𝄞 a ")
    // no merges → token count = code points per word
    assert(graft.plans.BpeTokenCount.applyWord("abc", Array.empty, Array.empty) == 3L)
    // two DIFFERENT merge tables must not cross-contaminate the word memo
    val t1 = (Array(" a b "), Array(" ab "))
    val t2 = (Array(" b c "), Array(" bc "))
    assert(graft.plans.BpeTokenCount.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"), t1._1, t1._2) == 2L)
    assert(graft.plans.BpeTokenCount.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"), t2._1, t2._2) == 2L)
    assert(graft.plans.BpeTokenCount.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"), t1._1, t1._2) == 2L)
    // blank/whitespace-only text counts zero
    Seq("", "   ", "\n").foreach { t =>
      assert(graft.plans.BpeTokenCount.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t),
        t1._1, t1._2) == 0L, s"'$t' must count 0")
    }
  }

  test("tokenize: subwords bound between word count and code-point count") {
    val rows = BpeOps.bpeTokenize(spark, sf01).collect()
    assert(rows.length == Tables.documents(spark, sf01).count())
    rows.foreach { r =>
      val ws = r.getAs[Long]("n_ws_tokens")
      val bpe = r.getAs[Long]("n_bpe_tokens")
      assert(bpe >= ws, s"doc ${r.getLong(0)}: every word is >= 1 subword")
      if (ws == 0) assert(bpe == 0 && r.isNullAt(r.fieldIndex("subword_ratio")))
      else assert(r.getAs[Double]("subword_ratio") >= 1.0)
    }
    // merges must actually fire on a natural corpus: total subwords are
    // strictly fewer than total code points (the unmerged ceiling)
    val totBpe = rows.map(_.getAs[Long]("n_bpe_tokens")).sum
    val totCp = Tables.documents(spark, sf01)
      .select(sum(size(split(col("text"), ""))).cast("long")).head.getLong(0)
    assert(totBpe < totCp, "trained merges should compress below char grain")
  }

  test("pack budgets re-denominate through the SAME kernel as the accounting entry") {
    val perSource = BpeOps.bpeTokenize(spark, sf01)
      .join(Tables.documents(spark, sf01).select("doc_id", "source"), "doc_id")
      .groupBy("source").agg(sum("n_bpe_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val packed = graft.operators.PipelineOps.packGreedy(spark, sf01)
      .groupBy("source").agg(sum("tokens_started").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(packed == perSource,
      "pack token totals must equal the accounting entry's per-source sums")
  }
}
