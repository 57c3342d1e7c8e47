package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("every analytics entry runs and has a stable schema") {
    Analytics.entries.foreach { case (name, fn, _) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.collect() // must execute without throwing
    }
  }

  test("q1 aggregates by the 6 (returnflag, linestatus) groups") {
    val rows = Analytics.q1(spark, sf).collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count())
  }

  test("bloom pre-filter keeps every true match and actually prunes") {
    val sel = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0)
      .select("o_orderkey")
    val total = Tables.lineitem(spark, sf).count()
    val trueMatches = Tables.lineitem(spark, sf)
      .join(sel, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val survivors = Analytics.bloomPruneLineitem(spark, sf, sel).count()
    // no false negatives: the bloom superset covers every real match
    assert(survivors >= trueMatches,
      s"bloom dropped true matches: $survivors < $trueMatches")
    // and it is a real pre-filter, not a pass-through: the false-positive
    // layer stays a small fraction of the NON-matching rows
    val fpp = (survivors - trueMatches).toDouble / (total - trueMatches)
    assert(fpp < 0.10, s"bloom fpp too high to be useful: $fpp")
  }

  test("topk per group emits at most 3 rows per customer, ranked") {
    val bad = Analytics.topkPerGroup(spark, sf)
      .groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(bad == 0)
  }

  test("running total is monotone per customer") {
    val df = Analytics.runningTotal(spark, sf)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val viol = df.withColumn("prev", lag("running_spend", 1).over(w))
      .filter(col("prev").isNotNull && col("running_spend") < col("prev")).count()
    assert(viol == 0)
  }

  test("asof join: every purchase's last_view_ts is <= purchase_ts") {
    val df = Analytics.asofJoin(spark, sf)
    assert(df.filter(col("last_view_ts") > col("purchase_ts")).count() == 0)
    assert(df.count() > 0)
  }

  test("q3/q10 top-k limits hold") {
    assert(Analytics.q3(spark, sf).count() <= 10)
    assert(Analytics.q10(spark, sf).count() <= 20)
  }

  test("bucketized range join equals the literal non-equi form") {
    val got = Analytics.rangeJoinPriceTiers(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val bands = Seq((0L, 5000L, "budget"), (5000L, 20000L, "mid"),
      (20000L, 60000L, "premium"), (60000L, 200000L, "luxury"))
    val want = bands.map { case (lo, hi, tier) =>
      tier -> li.filter(col("l_extendedprice") >= lo && col("l_extendedprice") < hi).count()
    }.filter(_._2 > 0).toMap
    assert(got.view.mapValues(_._1).toMap == want)
    // every line lands in exactly one tier
    assert(got.values.map(_._1).sum == li.count())
  }
}
