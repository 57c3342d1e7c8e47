package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("every dedup entry runs") {
    Dedup.entries.foreach { case (name, fn, _) => fn(spark, sf).collect() }
  }

  test("substring-exact coverage matches a local span-scan model per doc") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val spanDocs = scala.collection.mutable.Map[String, scala.collection.mutable.Set[Long]]()
    val docToks = docs.map { case (id, t) => id -> graft.plans.WordShingles.sqlTokens(t) }
    for ((id, tk) <- docToks; i <- 0 to tk.length - 8)
      spanDocs.getOrElseUpdate(tk.slice(i, i + 8).mkString(" "),
        scala.collection.mutable.Set[Long]()) += id
    val dup = spanDocs.filter(_._2.size >= 2).keySet
    val want = docToks.map { case (id, tk) =>
      val covered = scala.collection.mutable.Set[Int]()
      for (i <- 0 to tk.length - 8; if dup(tk.slice(i, i + 8).mkString(" ")); o <- 0 until 8)
        covered += i + o
      id -> ((tk.length.toLong, covered.size.toLong))
    }
    val got = Dedup.substringExact(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_tokens"))))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, exp) => assert(got(id) == exp, s"doc $id") }
    // the synthetic corpus plants exact dups — the signal must be nonzero
    assert(want.values.exists(_._2 > 0), "no duplicated span found in fixture corpus")
  }

  test("exact dedup accounting is consistent") {
    val r = Dedup.exact(spark, sf).collect()(0)
    val (docs, uniq, dupes) =
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_unique"), r.getAs[Long]("n_dupes"))
    assert(docs == spark.read.parquet(s"$sf/documents.parquet").count())
    assert(uniq + dupes == docs && uniq > 0)
  }

  test("minhash LSH candidates agree with exact jaccard and catch strong pairs") {
    val cands = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    // jaccard on candidates must match the inverted-index exact computation
    val exact = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    cands.keySet.intersect(exact.keySet).foreach { k =>
      assert(math.abs(cands(k) - exact(k)) < 1e-12, s"jaccard mismatch for $k")
    }
    // any genuinely strong near-dup (jac >= 0.8) must be recalled by LSH
    exact.filter(_._2 >= 0.8).keySet.foreach { k =>
      assert(cands.contains(k), s"LSH missed strong pair $k")
    }
  }

  test("containment dominates jaccard on shared pairs and stays in (0,1]") {
    val cont = Dedup.containment(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("containment"))
      .toMap
    assert(cont.nonEmpty)
    cont.values.foreach(c => assert(c > 0.0 && c <= 1.0 + 1e-12))
    // containment normalizes by min(|A|,|B|) <= |A ∪ B|, so on any pair
    // both entries rank it holds containment >= jaccard
    val jac = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    jac.keySet.intersect(cont.keySet).foreach { k =>
      assert(cont(k) >= jac(k) - 1e-12, s"containment below jaccard for $k")
    }
  }

  test("containment pins an excerpt inside a long doc at 1.0 where jaccard stays low") {
    val s2 = spark
    import s2.implicits._
    val body = (1 to 120).map(i => s"w$i").mkString(" ")   // 120-token doc
    val excerpt = (1 to 12).map(i => s"w$i").mkString(" ") // its first 12 tokens
    val docs = Seq((1L, body), (2L, excerpt)).toDF("doc_id", "text")
    val pair = Dedup.containmentOf(docs).collect()
    assert(pair.length == 1)
    val c = pair(0).getAs[Double]("containment")
    // every one of the excerpt's 10 shingles occurs in the body
    assert(math.abs(c - 1.0) < 1e-12, s"excerpt containment $c != 1.0")
    // while union-normalized resemblance is 10/118 — the pair jaccard misses
    val j = Dedup.shinglePairCountsOf(docs).collect()(0)
    val jac = j.getAs[Long]("shared").toDouble /
      (j.getAs[Long]("na") + j.getAs[Long]("nb") - j.getAs[Long]("shared"))
    assert(jac < 0.1, s"fixture jaccard $jac unexpectedly high")
  }

  test("simhash: one deterministic 60-bit signature per doc") {
    val a = Dedup.simhash(spark, sf).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.simhash(spark, sf).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b && a.size == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("embedding near-dup pairs are same-bucket with sane scores") {
    val rows = Dedup.embeddingCosine(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sc = r.getAs[Double]("score")
      assert(sc >= -1.0001 && sc <= 1.0001)
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
    }
  }

  test("clusters equal union-find ground truth over the same pairs") {
    val pairs = Dedup.minhashLsh(spark, sf)
      .filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    // union-find ground truth on the driver (test data is small)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra.max(rb)) = ra.min(rb)
    }
    val ids = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = ids.groupBy(find).map { case (root, ms) => (ms.min, ms.length.toLong) }
      .filter(_._2 >= 2).toSet
    val got = Dedup.clusters(spark, sf).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_docs"))).toSet
    assert(got == expected)
  }

  test("dedup-weighted sampling recounts from the label table + md5 draw") {
    val labels = Dedup.labelsPrebuilt(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = labels.values.groupBy(identity).map { case (l, g) => l -> g.size.toLong }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      val cs = labels.get(id).map(sizes).getOrElse(1L)
      val keep = md5IntLocal(text).toDouble / math.pow(2.0, 60) < 0.5 / cs
      if (keep) Some(id -> ((cs, math.floor(0.5 / cs * 1e6 + 0.5) / 1e6))) else None
    }.toMap
    val got = Dedup.dedupWeighted(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want)
    // the draw must actually downweight: every clustered doc's keep_prob
    // is strictly below the base rate
    got.foreach { case (_, (cs, p)) => if (cs > 1) assert(p < 0.5) }
  }

  test("near-dup keep-list: survivors + shadowed partition the corpus") {
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    val kept = Dedup.nearSurvivors(spark, sf).collect()
    val clusters = Dedup.clusters(spark, sf).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_docs"))).toMap
    // every kept doc appears once; shadowed docs = sum over clusters of
    // (size - 1); kept + shadowed = corpus
    val shadowedTotal = clusters.values.map(_ - 1).sum
    assert(kept.length + shadowedTotal == total)
    // representatives carry their cluster's shadow count; unique docs 0
    kept.foreach { r =>
      val (id, ns) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shadowed"))
      clusters.get(id) match {
        case Some(size) => assert(ns == size - 1, s"rep $id shadow count")
        case None => assert(ns == 0L, s"unique doc $id must shadow nothing")
      }
    }
    // and every cluster representative IS in the keep-list
    val keptIds = kept.map(_.getAs[Long]("doc_id")).toSet
    clusters.keys.foreach(cid => assert(keptIds(cid), s"rep $cid missing"))
  }

  test("large/small-star converges in O(log n) rounds on a chain graph") {
    val s2 = spark
    import s2.implicits._
    // a 33-node path 0-1-2-...-32: min-label propagation needs ~32 rounds
    // (one hop per round); star contraction must do it in O(log n)
    val chain = (0L until 32L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponents(chain)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 33 && got.values.forall(_ == 0L),
      s"all chain nodes must label to the component min, got $got")
    assert(rounds <= 8, s"star contraction took $rounds rounds on a 33-chain " +
      "(min-label propagation territory — halving is broken)")
  }

  test("fuzzy verify sees order: block-swapped docs are candidates but rejected") {
    val s2 = spark
    import s2.implicits._
    val x = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val y = (1 to 30).map(i => s"omega$i").mkString(" ")
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, s"$x $y"), (2L, s"$y $x"), // same shingle bag, swapped halves
      (4L, base), (5L, base.replace("word7 ", "changed "))) // true near-dup
      .toDF("doc_id", "text")
    // the jaccard verifier pairs the swapped docs (bag-of-shingles ~0.93)…
    val mh = Dedup.minhashLshOf(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(mh.contains((1L, 2L)), s"swapped pair must be an LSH candidate: $mh")
    // …but the edit-distance verifier rejects them and keeps the real one
    val fuzzy = Dedup.fuzzyPairsOf(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(fuzzy.contains((4L, 5L)), s"true near-dup must pass: $fuzzy")
    assert(!fuzzy.contains((1L, 2L)),
      s"shingle-equal but reordered docs must fail the edit verify: $fuzzy")
  }

  test("LSH recall gauge: identical docs always caught, recount matches, bands sane") {
    val s2 = spark
    import s2.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base), // jaccard 1.0 → band 10, MUST be caught
      (3L, base.replace("tok5 ", "swap ")), // strong near-dup
      (4L, (100 to 140).map(i => s"other$i").mkString(" ")),
      (5L, (200 to 240).map(i => s"none$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.lshRecallOf(docs).collect()
      .map(r => r.getAs[Int]("j_band") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_caught"),
          r.getAs[Double]("recall")))).toMap
    // identical docs share every minhash signature, hence every band
    assert(got.contains(10), s"jaccard-1.0 band must exist: $got")
    assert(got(10)._3 == 1.0, "banded LSH must always catch identical docs")
    got.values.foreach { case (n, c, r) =>
      assert(c <= n && r >= 0.0 && r <= 1.0)
      assert(r == math.floor(c.toDouble / n * 1e6 + 0.5) / 1e6, "recall recount")
    }
    // independent recount of the truth side: the strong near-dup pair
    // (1,3)/(2,3) sits in a high band with the right pair count
    val jaccard13 = { // 39 shared of 38+38 distinct 3-grams... recount via sets
      def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val (a, b) = (sh(base), sh(base.replace("tok5 ", "swap ")))
      a.intersect(b).size.toDouble / a.union(b).size
    }
    val band13 = math.floor(jaccard13 * 10).toInt
    assert(got.contains(band13), s"near-dup band $band13 must appear: $got")
  }

  test("DataFrame-parametric forms work on an arbitrary corpus") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different text with no overlap at all here now"))
      .toDF("doc_id", "text")
    val surv = Dedup.survivorsOf(docs).collect()
    assert(surv.length == 2) // docs 1+2 share a fingerprint
    val pairs = Dedup.minhashLshOf(docs).collect()
    assert(pairs.exists(r =>
      r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L
        && r.getAs[Double]("jaccard") == 1.0))
    val cl = Dedup.clustersOf(docs).collect()
    assert(cl.length == 1 && cl.head.getAs[Long]("cluster_id") == 1L
      && cl.head.getAs[Long]("n_docs") == 2L)
  }
}
