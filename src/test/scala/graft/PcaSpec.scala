package graft

import graft.similarity.Pca
import org.apache.spark.sql.functions._

/** The linear-algebra contract emb_pca_project's rows-only entry rests
  * on: the fitted basis is orthonormal, PC1 captures at least as much
  * variance as ANY original axis (the defining property of the top
  * principal component), components come out variance-ordered, and the
  * projected sample variance reproduces each eigenvalue. */
class PcaSpec extends SparkSpec {

  private lazy val fitted = Pca.fit(spark, sf)
  private lazy val proj = Pca.project(spark, sf).collect()

  test("hi/lo split accumulation is exact past the old 2e7-row long ceiling (r14 #8)") {
    // a row count × per-term magnitude whose direct long sum WRAPS — the
    // exact configuration the old require() refused. The split partials
    // stay small, and the BigInt reassembly recovers the exact integer.
    val n = 25000000L
    val df = spark.range(n)
      .select((lit(400000000000L) + pmod(col("id"), lit(7)) - 3).as("q"))
    val r = df.agg(sum(Pca.splitHi(col("q"))).as("hi"),
      sum(Pca.splitLo(col("q"))).as("lo")).collect().head
    // exact total: each full 7-cycle contributes Σ(-3..3) = 0; the
    // n mod 7 = 4 leftover terms contribute (-3) + (-2) + (-1) + 0 = -6
    val exact = BigInt(400000000000L) * n - 6
    assert(exact > BigInt(Long.MaxValue),
      "fixture must overflow the direct long sum (the old 2e7-row ceiling)")
    assert(Pca.assembleSplit(r.getLong(0), r.getLong(1)) == exact.toDouble)
  }

  test("split assembly is bit-identical to the direct long sum within range, negatives included") {
    val s2 = spark; import s2.implicits._
    val vals = Seq(-400000000001L, -1048577L, -1L, 0L, 7L, 1048575L,
      1048576L, 399999999999L)
    val df = vals.toDF("q")
    val r = df.agg(sum(col("q")).as("direct"),
      sum(Pca.splitHi(col("q"))).as("hi"),
      sum(Pca.splitLo(col("q"))).as("lo")).collect().head
    assert(Pca.assembleSplit(r.getLong(1), r.getLong(2)) == r.getLong(0).toDouble)
    assert(BigInt(r.getLong(1)) * Pca.SplitBase + r.getLong(2) == BigInt(r.getLong(0)))
  }

  test("outlier screen is calibrated: mean whitened distance equals k") {
    val k = 16
    val (mu, eig) = Pca.fit(spark, sf, k)
    val embs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    // mean over the fit corpus of Σ ((x−μ)·e_i)²/λ_i must be exactly k:
    // the projected variance along e_i IS λ_i (the Rayleigh quotient),
    // so each whitened component contributes exactly 1 on average
    val mean = embs.map { x =>
      eig.map { case (lambda, v) =>
        val p = v.indices.foldLeft(0.0)((a, i) => a + (x(i) - mu(i)) * v(i))
        p * p / lambda
      }.sum
    }.sum / embs.length
    assert(math.abs(mean - k) < 1e-3, s"mean whitened m2 $mean != $k")
    // entry surface: top-20 by score, descending, non-negative
    val rows = Pca.outlierWhitened(spark, sf).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Double]("m2"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ >= 0.0))
  }

  test("basis is orthonormal and sign-canonicalized") {
    val vs = fitted._2.map(_._2)
    vs.foreach { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"norm $n")
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      assert(v(pivot) > 0, "largest component must be canonicalized positive")
    }
    val d = vs(0).indices.map(i => vs(0)(i) * vs(1)(i)).sum
    assert(math.abs(d) < 1e-6, s"v1·v2 = $d")
  }

  test("eigenvalues are positive and ordered") {
    val ls = fitted._2.map(_._1)
    assert(ls.forall(_ > 0))
    assert(ls == ls.sortBy(-_))
  }

  test("PC1 variance dominates every coordinate axis variance") {
    val axisVar = Tables.embeddings(spark, sf)
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i").agg(var_pop(col("x").cast("double")).as("v"))
      .agg(max("v")).collect()(0).getDouble(0)
    assert(fitted._2.head._1 >= axisVar - 1e-9,
      s"λ1 ${fitted._2.head._1} < max axis variance $axisVar")
  }

  test("projected sample variance reproduces each eigenvalue") {
    Seq("pc1" -> 0, "pc2" -> 1).foreach { case (c, k) =>
      val xs = proj.map(_.getAs[Double](c))
      val mean = xs.sum / xs.length
      val v = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      val lambda = fitted._2(k)._1
      assert(math.abs(v - lambda) / lambda < 0.01, s"$c: var $v vs λ $lambda")
    }
  }

  test("projection is centered") {
    val mean1 = proj.map(_.getAs[Double]("pc1")).sum / proj.length
    assert(math.abs(mean1) < 1e-3, s"pc1 mean $mean1")
  }
}
