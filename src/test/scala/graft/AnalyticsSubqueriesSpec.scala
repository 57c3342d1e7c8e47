package graft

import graft.operators.AnalyticsSubqueries
import org.apache.spark.sql.functions._

class AnalyticsSubqueriesSpec extends SparkSpec {

  test("every subquery-wave entry runs and has a stable schema") {
    AnalyticsSubqueries.entries.foreach { case (name, fn, _) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.collect()
    }
  }

  test("q2: every surviving row carries its part's global min price") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val mins = li.groupBy("l_partkey").agg(min("l_extendedprice").as("mp"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    AnalyticsSubqueries.q2(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("min_price") == mins(r.getAs[Long]("p_partkey")))
    }
  }

  test("q11: each kept part's value exceeds 1/1000 of the group total") {
    val rows = AnalyticsSubqueries.q11(spark, sf).collect()
    assert(rows.nonEmpty)
    // re-derive the total from an unfiltered run of the same aggregate
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
    val nat = spark.read.parquet(s"$sf/nation.parquet").filter(col("n_nationkey") < 13)
    val total = li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .agg(sum(Cols.dec(col("l_extendedprice") * col("l_quantity"), 2)))
      .head().getDecimal(0).doubleValue()
    rows.foreach(r => assert(r.getAs[Double]("value") * 1000 > total - 1e-6))
  }

  test("q12: high + low line counts partition the late lines") {
    val rows = AnalyticsSubqueries.q12(spark, sf).collect()
    val late = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .count()
    val sum = rows.map(r => r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    assert(sum == late)
  }

  test("q16: no excluded (negative-balance) supplier leaks into any bucket") {
    // the exclusion is per supplier key; re-check against a raw recount that
    // skips the NOT-IN, which must be >= the filtered counts everywhere
    val filtered = AnalyticsSubqueries.q16(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getAs[Long]("supplier_cnt")).toMap
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/part.parquet")
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO"
            && col("p_size").isin(1, 14, 23, 45)),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    filtered.foreach { case (k, v) => assert(v <= raw(k)) }
  }

  test("q21: qualifying orders have >=2 suppliers and exactly 1 returning") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val stats = li.groupBy("l_orderkey")
      .agg(countDistinct("l_suppkey").as("ns"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey"))).as("nr"))
    val qualifying = stats.filter(col("ns") >= 2 && col("nr") === 1)
      .join(li.filter(col("l_returnflag") === "R"), "l_orderkey")
      .join(spark.read.parquet(s"$sf/orders.parquet").filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    val numwaitTotal = AnalyticsSubqueries.q21(spark, sf)
      .agg(sum("numwait")).head().getLong(0)
    assert(numwaitTotal <= qualifying) // limit 20 may drop suppliers, never add
  }

  test("q20: only high-key-half-nation suppliers of heavy red parts survive") {
    val rows = AnalyticsSubqueries.q20(spark, sf).collect()
    assert(rows.nonEmpty, "q20 must be non-degenerate at the test SF")
    val highNat = spark.read.parquet(s"$sf/supplier.parquet")
      .filter(col("s_nationkey") >= 13)
      .collect().map(_.getAs[Long]("s_suppkey")).toSet
    rows.foreach(r => assert(highNat.contains(r.getAs[Long]("s_suppkey"))))
  }

  test("q22: every grouped customer beats the positive-balance average") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val avgPos = cust.filter(col("c_acctbal") > 0.0)
      .agg(avg("c_acctbal")).head().getDouble(0)
    val rows = AnalyticsSubqueries.q22(spark, sf).collect()
    assert(rows.nonEmpty)
    // totacctbal / numcust must exceed the positive average for every code
    rows.foreach { r =>
      val mean = r.getAs[Double]("totacctbal") / r.getAs[Long]("numcust")
      assert(mean > avgPos - 1e-6, s"code ${r.getString(0)} mean $mean <= avg $avgPos")
    }
  }
}
