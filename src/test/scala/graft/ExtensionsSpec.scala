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

  test("FuseL2Squared rewrites the (x-y)^2 fold and is bit-exact (r19)") {
    import org.apache.spark.sql.functions.{aggregate => agg_, zip_with, transform, array, expr}
    // non-foldable source (a local Seq constant-folds away before the
    // plan assert can see the fused expression)
    val pairs = spark.range(0, 50).select(
      transform(array((0 until 8).map(i => col("id") * (i + 1)): _*),
        x => (x.cast("double") / 7.0) - 3.0).as("a"),
      transform(array((0 until 8).map(i => col("id") + i * 13): _*),
        x => (x.cast("double") / 11.0) - 1.0).as("b"))
    val l2 = agg_(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _)
    val df = pairs.select(l2.as("d2"))
    val optimized = df.queryExecution.optimizedPlan.toString()
    assert(optimized.contains("graft_l2sq"),
      "expected fused graft_l2sq in plan:\n" + optimized.take(800))
    val fused = df.collect().map(_.getDouble(0)).toSeq
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.FuseDotProduct")
    try {
      val plain = pairs.select(l2.as("d2")).collect().map(_.getDouble(0)).toSeq
      assert(fused == plain, s"fused $fused != interpreted $plain")
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    // float-element arrays must NOT fuse (the HOF subtracts in float)
    val fpairs = spark.range(0, 5).select(
      transform(array(col("id"), col("id") + 1), _.cast("float")).as("a"),
      transform(array(col("id") * 2, col("id")), _.cast("float")).as("b"))
    val fdf = fpairs.select(agg_(zip_with(col("a"), col("b"),
      (x, y) => (x - y) * (x - y)), lit(0.0), _ + _).as("d2"))
    assert(!fdf.queryExecution.optimizedPlan.toString().contains("graft_l2sq"),
      "float-element l2sq must stay interpreted (different subtract width)")
  }

  test("FuseDotProduct long-dot rewrite is exact and overflow-loud (r19)") {
    import org.apache.spark.sql.functions.{aggregate => agg_, zip_with, array}
    val pairs = spark.range(0, 50).select(
      array((0 until 8).map(i => col("id") * (i + 1) - 100): _*).as("a"),
      array((0 until 8).map(i => col("id") - i * 13): _*).as("b"))
    val idot = agg_(zip_with(col("a"), col("b"), _ * _), lit(0L), _ + _)
    val df = pairs.select(idot.as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString()
    assert(optimized.contains("graft_dot_long"),
      "expected fused graft_dot_long in plan:\n" + optimized.take(800))
    val fused = df.collect().map(_.getLong(0)).toSeq
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.FuseDotProduct")
    try {
      val plain = pairs.select(idot.as("d")).collect().map(_.getLong(0)).toSeq
      assert(fused == plain, s"fused $fused != interpreted $plain")
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    // overflow must throw (ANSI parity), not wrap
    val big = spark.range(1).select(
      array(lit(Long.MaxValue)).as("a"), array(col("id") + 2).as("b"))
    intercept[Exception] { big.select(idot.as("d")).collect() }
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
