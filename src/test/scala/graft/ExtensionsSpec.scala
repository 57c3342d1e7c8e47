package graft

import graft.similarity.Ann
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  test("graft_cosine SQL function is registered and computes cosine") {
    val r = spark.sql(
      """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    val orth = spark.sql(
      """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(0.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(orth) < 1e-12)
  }

  test("FuseDotProduct rewrites the declarative dot into the native kernel") {
    val df = Ann.normStats(spark, sf) // built on VectorFunctions.dot
    val optimized = df.queryExecution.optimizedPlan.toString()
    assert(optimized.contains("graft_dot"),
      "expected fused graft_dot in plan:\n" + optimized.take(800))
  }

  test("fusion is bit-exact: same results with the rule disabled") {
    val fused = Ann.bruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.FuseDotProduct")
    try {
      val plain = Ann.bruteForce(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(fused == plain)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("zero-norm vectors: native and HOF cosine agree on NULL (not NaN/error)") {
    import graft.functions.VectorFunctions
    val s2 = spark
    import s2.implicits._
    val pairs = Seq(
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f)),
      (Array(0f, 0f, 0f), Array(0f, 0f, 0f)),
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)))
      .toDF("a", "b")
    val both = pairs.select(
      call_function("graft_cosine", col("a"), col("b")).as("native"),
      VectorFunctions.cosine(col("a"), col("b"),
        VectorFunctions.norm(col("a")), VectorFunctions.norm(col("b"))).as("hof"))
      .collect()
    both.take(2).foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1), "zero-norm cosine must be NULL in both paths")
    }
    assert(both(2).getDouble(0) == both(2).getDouble(1))
    assert(math.abs(both(2).getDouble(0) - 1.0) < 1e-12)
  }

  test("native cosine equals the composed HOF cosine on real embeddings") {
    import graft.functions.VectorFunctions
    val e = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), col("embedding"))
    val pairs = e.crossJoin(e.select(col("vec_id").as("v2"), col("embedding").as("e2")))
      .filter(col("vec_id") < col("v2"))
    val both = pairs.select(
      call_function("graft_cosine", col("embedding"), col("e2")).as("native"),
      (VectorFunctions.dot(col("embedding"), col("e2"))
        / (VectorFunctions.norm(col("embedding")) * VectorFunctions.norm(col("e2")))).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }
}
