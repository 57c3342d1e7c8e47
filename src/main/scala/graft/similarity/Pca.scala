package graft.similarity

import graft.{QueryModule, Tables}
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.F — distributed PCA over the embeddings table: the one
  * linear-algebra reduction an embedding pipeline runs before
  * visualization, whitening, or cheap dimensionality cuts.
  *
  * Spark-first shape, built so ONLY constant-size state ever leaves the
  * executors:
  *
  *  1. ONE moments pass over the data: each row explodes to its upper-
  *     triangle outer-product cells (i ≤ j → d(d+1)/2 = 2080 cells at
  *     d=64) which partial-aggregate map-side, so each task sends at most
  *     2080 cells into one exchange regardless of row count — the same
  *     "constant shuffle" discipline as the CMS sketch build. Products
  *     are fixed-pointed to 1e-10 longs before the SUM: integer
  *     accumulation is order-free, so the covariance matrix — and
  *     therefore the fitted basis — is bit-identical run to run (the
  *     repo-wide fixed-point convention applied to a float reduction).
  *  2. The d×d covariance is assembled driver-side from the 2080 cells
  *     (cov = E[xxᵀ] − μμᵀ). This is the repo's ONE deliberate
  *     `collect()`: it pulls a CONSTANT-size model (d(d+1)/2 cells,
  *     fixed by the schema, independent of row count), never data —
  *     the same structure as Spark MLlib's public
  *     RowMatrix.computePrincipalComponents (treeAggregate the Gramian,
  *     eigensolve on the driver). A relational eigensolve would replace
  *     one constant transfer with ~600 tiny iterative jobs; where the
  *     model IS data-sized (IVF centroid training, Ann.scala) this repo
  *     stays fully relational instead. Top-k eigenpairs by
  *     deterministic power iteration with deflation; each eigenvector
  *     is sign-canonicalized (largest-|component| made positive) so the
  *     basis is unique.
  *  3. Projection is a broadcast-literal dot product per component via
  *     the native codegen [[VectorFunctions.dot]] — map-only, inside
  *     whole-stage codegen, no second shuffle.
  *
  * At 100 TB only pass 1 touches the data, and its exchange carries
  * O(d² × tasks) cells. Rows-only entry: the eigensolve is not
  * SQL-expressible; PcaSpec asserts the linear-algebra contract instead
  * (orthonormal basis, PC1 variance ≥ every axis variance ≥ PC2
  * variance ordering, projected variance == eigenvalue).
  */
object Pca extends QueryModule {

  private val Dim = 64
  private val TopK = 2

  /** Upper-triangle second moments + per-dim sums + count, one pass:
    * returns (covariance, μ). */
  private def moments(s: SparkSession, d: String): (Array[Array[Double]], Array[Double]) = {
    val emb = Tables.embeddings(s, d).select(col("embedding"))
    // Products are FIXED-POINTED to 1e-10 before a plain LONG sum (the
    // emb_centroid device at model-fit precision): integer sums are
    // order-free like the earlier decimal(30,15) accumulation but run as
    // primitive codegen'd longs — the decimal hash-aggregate was this
    // pass's actual cost (emb_pca_project 5.7 → 0.6 s at sf0.1, same
    // 20M cells).
    // Magnitude bound: |xi·xj|·1e10 ≲ 4e11 per cell on this corpus, so
    // overflow needs ~2e7 rows; a 100 TB fit raises the moments pass to
    // decimal or a hi/lo split — the 1e-10 quantization itself is noise
    // (PcaSpec's tightest contract is 1e-6, eigenvalue recovery 1%).
    val cells = emb
      .select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("embedding")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(
        sum(floor(col("xi").cast("double") * col("xj") * 1e10 + 0.5).cast("long")).as("sxx"),
        // per-dim first moment rides the diagonal cells (j == i) for free
        sum(when(col("j") === col("i"),
          floor(col("xi").cast("double") * 1e10 + 0.5).cast("long"))).as("sx"),
        count(lit(1)).as("n"))
    val rows = cells.collect()
    val n = rows.collect { case r if r.getInt(0) == 0 && r.getInt(1) == 0 => r.getLong(4) }.head
    val sxx = Array.ofDim[Double](Dim, Dim)
    val sx = new Array[Double](Dim)
    rows.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val v = r.getLong(2) / 1e10
      sxx(i)(j) = v; sxx(j)(i) = v
      if (i == j) sx(i) = r.getLong(3) / 1e10
    }
    val cov = Array.tabulate(Dim, Dim) { (i, j) =>
      sxx(i)(j) / n - (sx(i) / n) * (sx(j) / n)
    }
    (cov, sx.map(_ / n))
  }

  private def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
    m.map(row => row.indices.foldLeft(0.0)((acc, i) => acc + row(i) * v(i)))

  private[similarity] def dotV(a: Array[Double], b: Array[Double]): Double =
    a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(dotV(v, v))
    v.map(_ / n)
  }

  /** Deterministic power iteration with deflation: fixed all-ones start,
    * fixed iteration count, sign-canonicalized output. */
  private[graft] def topEigen(cov: Array[Array[Double]], k: Int): Seq[(Double, Array[Double])] = {
    var m = cov.map(_.clone())
    (0 until k).map { _ =>
      var v = normalize(Array.fill(Dim)(1.0))
      var i = 0
      while (i < 300) { v = normalize(matVec(m, v)); i += 1 }
      val lambda = dotV(v, matVec(m, v))
      // sign canon: the largest-|x| component (lowest index on ties) positive
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      val canon = if (v(pivot) < 0) v.map(-_) else v
      // deflate: m ← m − λ vvᵀ
      m = Array.tabulate(Dim, Dim)((r, c) => m(r)(c) - lambda * canon(r) * canon(c))
      (lambda, canon)
    }
  }

  /** The fitted model — (μ, top-k eigenpairs) — for [[project]],
    * [[Ann.pcaTopK]], and library users (docs/USAGE.md). */
  def fit(s: SparkSession, d: String,
      k: Int = TopK): (Array[Double], Seq[(Double, Array[Double])]) = {
    val (cov, mu) = moments(s, d)
    (mu, topEigen(cov, k))
  }

  /** Driver entry: per-vector top-2 principal coordinates. */
  def project(s: SparkSession, d: String): DataFrame = {
    val (mu, eig) = fit(s, d)
    val cols = eig.zipWithIndex.map { case ((_, v), c) =>
      val vLit = array(v.map(lit): _*)
      val offset = dotV(mu, v) // scalar: (x−μ)·v = x·v − μ·v
      (floor((VectorFunctions.dot(col("embedding"), vLit) - lit(offset)) * 1e6 + 0.5) / 1e6)
        .as(s"pc${c + 1}")
    }
    Tables.embeddings(s, d)
      .select(col("vec_id") +: col("label") +: cols: _*)
  }

  /** Whitened-distance outlier screen — dims used by the Mahalanobis cut. */
  private val OutlierK = 16

  /** EMBEDDING OUTLIER SCREEN — the pre-index sanity gate of an embedding
    * pipeline (failed encoders emit near-zero, saturated, or off-manifold
    * vectors that poison ANN cells and centroid stats): per-vector
    * Mahalanobis-style whitened squared distance in the top-`OutlierK`
    * eigenspace, m² = Σᵢ ((x−μ)·eᵢ)²/λᵢ — each component's variance is
    * normalized away, so the score is scale-free and its corpus MEAN is
    * exactly k (the projected variance along eᵢ IS λᵢ — the PcaSpec
    * invariant), making "m² ≫ k" a calibrated cut with no tuning.
    * Projection is the same broadcast-literal codegen'd dot as
    * [[project]]; map-only after the one moments pass. Top-20 by score
    * (id tie-break). rows-only: the eigensolve isn't SQL-expressible;
    * PcaSpec asserts the mean-is-k calibration. */
  def outlierWhitened(s: SparkSession, d: String): DataFrame = {
    val (mu, eig) = fit(s, d, OutlierK)
    val m2 = eig.map { case (lambda, v) =>
      val vLit = array(v.map(lit): _*)
      val proj = VectorFunctions.dot(col("embedding"), vLit) - lit(dotV(mu, v))
      proj * proj / lit(lambda)
    }.reduce(_ + _)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        (floor(m2 * 1e6 + 0.5) / 1e6).as("m2"))
      .orderBy(desc("m2"), asc("vec_id"))
      .limit(20)
  }

  override def entries: Seq[(String, QueryFn, Option[String])] = Seq(
    ("emb_pca_project", project _, None),
    ("emb_outlier_whitened", outlierWhitened _, None))
}
