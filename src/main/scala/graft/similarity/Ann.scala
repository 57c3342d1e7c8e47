package graft.similarity

import graft.{QueryModule, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.F — similarity search over the `embeddings` table.
  *
  * Three tiers, one semantics:
  *  - brute force: exact cosine top-k (the correctness baseline; at scale
  *    this is a broadcast of the query set over a full scan — linear, no
  *    driver loops);
  *  - sign-LSH: bucket join replaces the cross join (sub-linear candidate
  *    generation — the 100 TB path);
  *  - IVF: per-cell centroids, probe the nearest cell(s) only.
  * Scores are rounded to 4 dp BEFORE ranking with a vec_id tiebreak so the
  * ordering is engine-stable.
  */
object Ann extends QueryModule {

  private val K = 10
  private def rank = Window.partitionBy("query_id").orderBy(desc("score"), asc("neighbor_id"))

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", norm(col("embedding")))

  private def queriesOf(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))

  private def score = round(cosine(col("qe"), col("embedding"), col("qn"), col("nrm")), 4)

  /** DataFrame-parametric exact cosine top-k for library users:
    * `corpus` needs (vec_id, embedding), `queries` needs (query_id,
    * embedding); the query set is broadcast over one corpus scan. */
  def topKOf(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = withNorm(corpus)
    val q = withNorm(queries)
      .select(col("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    c.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), score.as("score"))
      .withColumn("rk", row_number().over(rank).cast("long"))
      .filter(col("rk") <= k)
  }

  // Exact top-k by cosine for the 10-query set.
  def bruteForce(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
    e.crossJoin(broadcast(queriesOf(e)))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), score.as("score"))
      .withColumn("rk", row_number().over(rank).cast("long"))
      .filter(col("rk") <= K)
  }

  private val bruteForceSql =
    s"""WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
       | q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM n WHERE vec_id < 10),
       | pairs AS (
       |  SELECT query_id, n.vec_id AS neighbor_id,
       |    round(${dotSql("qe", "n.embedding")} / (qn * n.nrm), 4) AS score
       |  FROM q, n WHERE n.vec_id != query_id)
       |SELECT query_id, neighbor_id, score, rk FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk
       |  FROM pairs) t WHERE rk <= $K""".stripMargin

  // Sign-LSH: candidates restricted to the query's bucket.
  def lshTopK(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
      .withColumn("bucket", signBucket(col("embedding"), 4))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket").as("qbucket"))
    e.join(broadcast(q), col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("bucket"), score.as("score"))
      .withColumn("rk", row_number().over(rank).cast("long"))
      .filter(col("rk") <= K)
  }

  private val lshTopKSql =
    s"""WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
       |   ${signBucketSql("embedding", 4)} AS bucket FROM embeddings),
       | q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, bucket AS qbucket
       |       FROM n WHERE vec_id < 10),
       | pairs AS (
       |  SELECT query_id, n.vec_id AS neighbor_id, n.bucket,
       |    round(${dotSql("qe", "n.embedding")} / (qn * n.nrm), 4) AS score
       |  FROM q JOIN n ON n.bucket = qbucket AND n.vec_id != query_id)
       |SELECT query_id, neighbor_id, bucket, score, rk FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk
       |  FROM pairs) t WHERE rk <= $K""".stripMargin

  /** IVF-style: cells = labels, centroid = mean vector per cell, probe the
    * single nearest cell. rows-only oracle: float centroid averaging is
    * reduction-order-dependent, so no cross-engine hash (structure asserted
    * in AnnSpec instead). */
  def ivfTopK(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
    val centroids = Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg("v").as("cv"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        x => x.getField("cv")).as("centroid"))
      .select(col("label").as("cell"), col("centroid"),
        norm(col("centroid")).as("cnrm"))
    val q = queriesOf(e)
    val probe = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qe"), col("qn"), col("cell"),
        (dot(col("qe"), col("centroid")) / (col("qn") * col("cnrm"))).as("cscore"))
      .withColumn("crk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cscore"), asc("cell"))))
      .filter(col("crk") === 1)
      .select("query_id", "qe", "qn", "cell")
    e.join(broadcast(probe), col("label") === col("cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cell"), score.as("score"))
      .withColumn("rk", row_number().over(rank).cast("long"))
      .filter(col("rk") <= K)
  }

  // Norm statistics per label (exact decimal mean).
  def normStats(s: SparkSession, d: String): DataFrame =
    withNorm(Tables.embeddings(s, d))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("nrm").cast(DecimalType(18, 6))).cast("double") / count(lit(1))).as("avg_norm"),
        min("nrm").as("min_norm"), max("nrm").as("max_norm"))

  private val normStatsSql =
    s"""WITH n AS (SELECT label, ${normSql("embedding")} AS nrm FROM embeddings)
       |SELECT label, COUNT(*) AS n_vecs,
       | CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_norm,
       | MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
       |FROM n GROUP BY label""".stripMargin

  // ---- multi-table random-hyperplane LSH (the production ANN tier) -------
  private val RpTables = 8
  private val RpBits = 4
  private val Dim = 64

  /** Deterministic pseudo-random hyperplane component in [-1, 1): a
    * splitmix64-style integer mix of (table, bit, dim) — reproducible
    * across runs and executors, no RNG state to ship. */
  private def planeComponent(t: Int, b: Int, i: Int): Double = {
    var z = t.toLong * 0x9E3779B97F4A7C15L + b.toLong * 0xBF58476D1CE4E5B9L +
      i.toLong * 0x94D049BB133111EBL + 0x2545F4914F6CDD1DL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 12).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  /** Multi-table sign-LSH over random hyperplanes: L independent 4-bit
    * codes; candidates share a code in ANY table (union of buckets), then
    * exact cosine re-ranks. Recall grows with L at constant per-table
    * selectivity — the standard at-scale ANN shape: bucket equi-joins, no
    * cross join, hyperplane dots fused into the native kernel by
    * FuseDotProduct. rows-only oracle (the hyperplane constants aren't
    * portable SQL); AnnSpec bounds recall against brute force. */
  def rpLshTopK(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
    def code(t: Int): Column =
      (0 until RpBits).map { b =>
        val plane = lit(Array.tabulate(Dim)(i => planeComponent(t, b, i)))
        when(dot(col("embedding"), plane) >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    val flat = e
      .withColumn("codes",
        array((0 until RpTables).map(t => struct(lit(t).as("t"), code(t).as("c"))): _*))
      .select(col("vec_id"), col("embedding"), col("nrm"), explode(col("codes")).as("tc"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("tc.t").as("t"), col("tc.c").as("c"))
    val qs = flat.filter(col("vec_id") < 10).select(
      col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"),
      col("t").as("qt"), col("c").as("qc"))
    flat.join(broadcast(qs),
        col("t") === col("qt") && col("c") === col("qc") && col("vec_id") =!= col("query_id"))
      .dropDuplicates("query_id", "vec_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"), score.as("score"))
      .withColumn("rk", row_number().over(rank).cast("long"))
      .filter(col("rk") <= K)
  }

  override def entries: Seq[(String, QueryFn, Option[String])] = Seq(
    ("ann_bruteforce_topk", bruteForce _, Some(bruteForceSql)),
    ("ann_lsh_topk", lshTopK _, Some(lshTopKSql)),
    ("ann_rp_lsh_topk", rpLshTopK _, None),
    ("ann_ivf_topk", ivfTopK _, None),
    ("vec_norm_stats", normStats _, Some(normStatsSql)))
}
