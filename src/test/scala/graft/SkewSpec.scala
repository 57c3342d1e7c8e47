package graft

import graft.functions.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain join on skewed data") {
    val s2 = spark; import s2.implicits._
    // 10k rows, 90% on one hot key
    val probe = spark.range(10000)
      .select((when(col("id") % 10 === 0, col("id") % 5).otherwise(0L)).as("k"),
        col("id").as("rid"))
    val build = (0L until 5L).map(k => (k, s"dim_$k")).toSeq.toDF("k", "attr")
    val plain = probe.join(build, "k").select("k", "rid", "attr").collect().toSet
    val salted = Skew.saltedJoin(probe, build, "k", 8, col("rid"))
      .select("k", "rid", "attr").collect().toSet
    assert(salted == plain)
  }

  test("skewSafeDistinctCount is exact under a hot key") {
    val df = spark.range(20000)
      .select((col("id") % 3).as("k"), (col("id") % 7000).as("v"))
    val expected = df.groupBy("k").agg(count_distinct(col("v")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Skew.skewSafeDistinctCount(df, col("k"), col("v"), 16, "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
