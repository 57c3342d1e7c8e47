package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  test("every events entry runs") {
    Events.entries.foreach { case (name, fn, _) =>
      fn(spark, sf).collect()
    }
  }

  test("sessionization: sessions partition all events, gaps respected") {
    val sess = Events.sessionization(spark, sf)
    val total = sess.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == spark.read.parquet(s"$sf/events.parquet").count())
    // no session spans a >30min internal gap start-to-start sanity: durations nonneg
    assert(sess.filter(col("duration_sec") < 0).count() == 0)
  }

  test("funnel stages are monotonically non-increasing") {
    val r = Events.funnel(spark, sf).collect()(0)
    val (a, b, c) = (r.getAs[Long]("n_signup"), r.getAs[Long]("n_signup_view"),
      r.getAs[Long]("n_signup_view_purchase"))
    assert(a >= b && b >= c && a > 0)
  }

  test("daily active: dau never exceeds event count") {
    assert(Events.dailyActive(spark, sf).filter(col("dau") > col("n_events")).count() == 0)
  }
}
