package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  test("every events entry runs") {
    Events.entries.foreach { case (name, fn, _) =>
      fn(spark, sf).collect()
    }
  }

  private def dailyCounts: Map[(String, java.time.LocalDate), Long] =
    Tables.events(spark, sf).select("event_type", "ts").collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }

  test("EWMA matches a local truncated-kernel model on every (type, day)") {
    val w = Seq(1000000L, 700000L, 490000L, 343000L, 240100L, 168070L, 117649L, 82354L)
    val daily = dailyCounts
    val want = daily.map { case ((typ, day), n) =>
      val terms = (0 until 8).flatMap { j =>
        daily.get((typ, day.minusDays(j.toLong))).map(x => (x * w(j), w(j)))
      }
      val (swn, sw) = (terms.map(_._1).sum, terms.map(_._2).sum)
      (typ, day) -> ((n, math.floor(swn.toDouble / sw * 1e6 + 0.5) / 1e6))
    }
    val got = Events.ewmaSmoothing(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toLocalDate)
        -> ((r.getAs[Long]("n_events"), r.getAs[Double]("ewma")))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(got(k) == v, s"mismatch at $k") }
  }

  test("Holt trend matches a local double-smoothing model; trend tracks growth direction") {
    val w = Seq(1000000L, 700000L, 490000L, 343000L, 240100L, 168070L, 117649L, 82354L)
    val daily = dailyCounts
    def smooth(series: Map[(String, java.time.LocalDate), Long], scale: Double)
        : Map[(String, java.time.LocalDate), Long] =
      series.map { case ((typ, day), _) =>
        val terms = (0 until 8).flatMap { j =>
          series.get((typ, day.minusDays(j.toLong))).map(x => (x * w(j), w(j)))
        }
        val (swv, sw) = (terms.map(_._1).sum, terms.map(_._2).sum)
        (typ, day) -> math.floor(swv.toDouble / sw * scale + 0.5).toLong
      }
    val s1 = smooth(daily, 1e6)
    val s2 = smooth(s1, 1.0) // s1 already carries the 1e6 fixed point
    val want = daily.map { case (k, n) =>
      val (f1, f2) = (s1(k), s2(k))
      val tFp = math.floor((f1 - f2).toDouble * 3.0 / 7.0 + 0.5).toLong
      k -> ((n, (2 * f1 - f2).toDouble / 1e6, tFp.toDouble / 1e6,
        (2 * f1 - f2 + tFp).toDouble / 1e6))
    }
    val got = Events.holtTrend(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toLocalDate)
        -> ((r.getAs[Long]("n_events"), r.getAs[Double]("level"),
             r.getAs[Double]("trend"), r.getAs[Double]("forecast_next")))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(got(k) == v, s"mismatch at $k") }
    // directional sanity on a synthetic ramp: a strictly increasing series
    // must carry positive trend once the kernel warms up
    val ramp = (0 until 16).map(i =>
      ("ramp", java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)) -> (100L + 50L * i)).toMap
    val r1 = smooth(ramp, 1e6); val r2 = smooth(r1, 1.0)
    val lastDay = ("ramp", java.time.LocalDate.of(2024, 1, 1).plusDays(15L))
    assert(r1(lastDay) > r2(lastDay), "on a ramp S1 leads S2, giving positive trend")
  }

  test("CUSUM peak matches a local integer-scan model per type") {
    val daily = dailyCounts
    val want = daily.keys.map(_._1).toSet.map { (typ: String) =>
      val series = daily.collect { case ((`typ`, day), n) => day -> n }.toSeq.sortBy(_._1)
      val nd = series.size.toLong
      val sn = series.map(_._2).sum
      val devs = series.zipWithIndex.map { case ((day, _), i) =>
        val cn = series.take(i + 1).map(_._2).sum
        (day, math.abs(nd * cn - (i + 1).toLong * sn))
      }
      val (peakDay, peakAbs) = devs.maxBy { case (day, a) => (a, -day.toEpochDay) }
      typ -> ((nd, peakDay, math.floor(peakAbs.toDouble / nd * 1e6 + 0.5) / 1e6))
    }.toMap
    val got = Events.cusumChangepoint(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), r.getAs[java.sql.Date]("peak_day").toLocalDate,
          r.getAs[Double]("peak_dev")))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(got(k) == v, s"mismatch for $k") }
  }

  test("ACF matches a local calendar-aligned Pearson recount per (type, lag)") {
    val daily = dailyCounts
    val want = daily.keys.map(_._1).toSet.flatMap { (typ: String) =>
      val series = daily.collect { case ((`typ`, day), n) => day -> n }.toMap
      (1 to 7).flatMap { k =>
        val pairs = series.toSeq.flatMap { case (day, x) =>
          series.get(day.plusDays(k.toLong)).map(y => (x, y))
        }
        if (pairs.isEmpty) None
        else {
          val np = pairs.size.toLong
          val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
          val sxy = pairs.map(p => p._1 * p._2).sum
          val sxx = pairs.map(p => p._1 * p._1).sum
          val syy = pairs.map(p => p._2 * p._2).sum
          val den = math.sqrt(((np * sxx - sx * sx) * (np * syy - sy * sy)).toDouble)
          val acf = if (den == 0.0) null
                    else java.lang.Double.valueOf(
                      math.floor((np * sxy - sx * sy).toDouble / den * 1e6 + 0.5) / 1e6)
          Some((typ, k) -> ((np, acf)))
        }
      }
    }.toMap
    val got = Events.autocorr(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("lag")) ->
        ((r.getAs[Long]("n_pairs"), r.getAs[java.lang.Double]("acf")))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(got(k) == v, s"mismatch at $k") }
    // the synthetic events table spans months — every type must have all 7 lags
    assert(got.keySet.map(_._1).forall(t => (1 to 7).forall(k => got.contains((t, k)))))
  }

  test("day-of-week profile matches a local recount with ISO weekday numbering") {
    val daily = dailyCounts
    val want = daily.toSeq
      .groupBy { case ((typ, day), _) => (typ, day.getDayOfWeek.getValue) }
      .map { case ((typ, dow), rows) =>
        val total = rows.map(_._2).sum
        (typ, dow) -> ((rows.size.toLong, total,
          math.floor(total.toDouble / rows.size * 1e6 + 0.5) / 1e6))
      }
    val got = Events.seasonalityDow(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("iso_dow")) ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("total_events"),
          r.getAs[Double]("mean_daily")))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(got(k) == v, s"mismatch at $k") }
  }

  test("bitmap distinct: merged bitmap counts equal exact COUNT(DISTINCT)") {
    val got = Events.bitmapDistinct(spark, sf).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(date_trunc("week", col("ts")).as("week"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("merged HLL partials track exact weekly distincts within 5%") {
    // the entry now carries the bound AS DATA (merged_ok, the r5 #3
    // oracle-signal device): the exact column must equal a recompute and
    // every threshold boolean must hold
    val got = Events.hllMerge(spark, sf).collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(date_trunc("week", col("ts")).as("week"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (w, (e, ok)) =>
      assert(e == exact(w), s"week $w: exact_users $e vs ${exact(w)}")
      assert(ok, s"week $w: merged HLL estimate outside the 5% bound")
    }
  }

  test("HLL inclusion-exclusion tracks the exact weekly intersection") {
    val got = Events.hllWowRetained(spark, sf).collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    val wk = Tables.events(spark, sf)
      .select(date_trunc("week", col("ts")).as("week"), col("user_id")).distinct()
    val exact = wk.alias("a")
      .join(wk.alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.week") === col("a.week") + expr("INTERVAL 7 DAY"))
      .groupBy(col("a.week")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    // the retained column is served from the exact bitmap layer; the
    // boolean carries the 15% inclusion-exclusion bound (three ~2% sketch
    // errors scaled by the union/intersection ratio)
    got.foreach { case (w, (ret, ok)) =>
      assert(ret == exact(w), s"week $w: retained $ret vs ${exact(w)}")
      assert(ok, s"week $w: HLL retained estimate outside the 15% bound")
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

  test("top paths match a driver-side recount of per-user trigram sequences") {
    val got = Events.topPaths(spark, sf).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n"))
    val events = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("tsu"),
        col("event_id"), col("event_type")).collect()
    val expected = events
      .groupBy(_.getAs[Long]("user_id"))
      .values.flatMap { rows =>
        val seq = rows.sortBy(r =>
          (r.getAs[Long]("tsu"), r.getAs[Long]("event_id")))
          .map(_.getAs[String]("event_type"))
        seq.sliding(3).filter(_.length == 3).map(_.mkString(">"))
      }
      .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (p, n) =>
      assert(expected(p) == n, s"path $p: $n != recount ${expected(p)}")
    }
    // the returned 20 must be the true maxima under the (n desc, path) order
    val top = expected.toSeq.sortBy { case (p, n) => (-n, p) }.take(got.length)
    assert(got.toSeq == top, "top-20 set/order drifts from the recount")
  }

  test("daily active: dau never exceeds event count") {
    assert(Events.dailyActive(spark, sf).filter(col("dau") > col("n_events")).count() == 0)
  }

  test("pivot: per-day type columns sum to the day's event count") {
    val rows = operators.Events.pivotDaily(spark, sf).collect()
    val total = rows.map(r => (1 to 5).map(r.getLong).sum).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("sliding windows: each event counted in exactly 4 windows") {
    val total = operators.Events.slidingWindow(spark, sf)
      .agg(sum("n_events")).head().getLong(0)
    assert(total == 4 * Tables.events(spark, sf).count())
  }

  test("retention: offset-0 cohort sizes cover every user exactly once") {
    val rows = operators.Events.retention(spark, sf).collect()
    val week0 = rows.filter(_.getAs[Long]("week_offset") == 0L)
      .map(_.getAs[Long]("n_active")).sum
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(week0 == users, s"week-0 total $week0 != $users users")
    rows.foreach(r => assert(r.getAs[Long]("week_offset") >= 0L))
  }

  test("percentiles: ordered and drawn from actual values") {
    val rows = Events.valuePercentiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
    }
  }

  test("approx percentiles track the exact percentiles per type") {
    // exact columns must replicate the exact twin; the *_ok booleans
    // carry the 2%-of-spread sketch bound (accuracy=10000 is effectively
    // exact on the test corpus — the bound catches swapped quantiles or
    // a wrong column, not sketch variance)
    val exact = Events.valuePercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Events.valuePercentilesApprox(spark, sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val t = r.getString(0)
      assert((r.getDouble(1), r.getDouble(2), r.getDouble(3)) == exact(t),
        s"exact percentile columns drifted from the exact twin for $t")
      assert(r.getBoolean(5), s"p50 off for $t")
      assert(r.getBoolean(6), s"p95 off for $t")
      assert(r.getBoolean(7), s"p99 off for $t")
    }
  }

  test("CMS estimates never underestimate and stay within the epsilon-N bound") {
    val exact = Tables.events(spark, sf)
      .filter(col("user_id").between(1, 20))
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = Tables.events(spark, sf).count()
    // the classic CMS guarantee at w=1024: est >= true, est <= true + eN
    // with e = e/w ~ 0.27% (we allow the full Markov-bound slack)
    val eps = math.E / 1024
    Events.cmsFrequency(spark, sf).collect().foreach { r =>
      val (u, est) = (r.getLong(0), r.getAs[Long]("est_count"))
      val truth = exact.getOrElse(u, 0L)
      assert(est >= truth, s"CMS underestimated user $u: $est < $truth")
      assert(est <= truth + eps * n * 4,
        s"CMS overestimate for user $u out of bound: $est vs $truth (N=$n)")
    }
  }

  test("CMS heavy hitters are EXACT: sketch-filter + recount equals the full groupBy") {
    // sf0.01: the fixed T=80 bar admits 13 keys — enough to exercise the
    // candidate filter and the exact-recount verification together
    val brute = Tables.events(spark, sf01)
      .groupBy("user_id").count().filter(col("count") >= 80)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hh = Events.heavyHitters(spark, sf01)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cnt")).toMap
    // CMS never underestimates -> candidates are a provable superset of
    // the true heavy keys; the recount makes equality a theorem
    assert(hh == brute, s"heavy hitters must be exact: $hh vs $brute")
    assert(hh.nonEmpty, "threshold admits no keys - bar miscalibrated")
    // shape: the sketch filter is MAP-SIDE - below the (single) exchange,
    // so only candidate rows shuffle, never the key histogram
    val plan0 = Events.heavyHitters(spark, sf01).queryExecution.executedPlan
    val plan = plan0 match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p }
    val filters = plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition.toString.contains("least") => f }
    assert(filters.nonEmpty, "sketch-estimate filter missing from the plan")
    filters.foreach { f =>
      val shuffledBelow = f.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(shuffledBelow.isEmpty,
        "the estimate filter must run before any exchange (map-side prune)")
    }
  }

  test("CMS daily partials merge to exactly the one-shot sketch estimates") {
    val merged = Events.cmsDailyRollup(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("est_count")).toMap
    val oneShot = Events.cmsFrequency(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("est_count")).toMap
    assert(merged == oneShot,
      s"summing daily partials must commute with the one-shot build: $merged vs $oneShot")
  }

  test("RFM grid partitions all users once, scores in 1..5") {
    val rows = Events.rfm(spark, sf01).collect()
    val nUsers = Tables.events(spark, sf01).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers,
      "every user lands in exactly one (cohort,r,f,m) cell")
    rows.foreach { r =>
      Seq("r", "f", "m").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 1L && v <= 5L, s"$c score $v out of quintile range")
      }
    }
  }

  test("Markov transition rows sum to 1 per from-type, counts to n-1 per user") {
    val rows = Events.markovTransitions(spark, sf01).collect()
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (t, rs) =>
      val p = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(p - 1.0) < 1e-4, s"$t: probabilities sum to $p")
    }
    // total transitions = total events - one per user (the unled last event)
    val n = Tables.events(spark, sf01).count()
    val users = Tables.events(spark, sf01).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_transitions")).sum == n - users)
  }

  test("stationary rank: masses recount from an independent local replay") {
    val got = Events.stationaryRank(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("mass"), r.getAs[Double]("pi"), r.getAs[Long]("rk")))).toMap
    // independent replay: transitions from a local sort, then the same
    // fixed-point iteration written from the SURVEY math, not the entry
    val ev = Tables.events(spark, sf).select("user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { rows =>
      val s = rows.sortBy(r => (r._2.getTime, r._2.getNanos, r._3)).map(_._4)
      s.zip(s.drop(1))
    }.toSeq.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val nodes = ev.map(_._4).distinct.sorted
    val nT = nodes.length
    val out = trans.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    var mass = nodes.map(_ -> math.floor(1e12 / nT.toDouble).toLong).toMap
    (1 to 20).foreach { _ =>
      val dang = nodes.filterNot(out.contains).map(mass).sum
      mass = nodes.map { t =>
        val c = trans.collect { case ((f, `t`), n) =>
          math.floor(mass(f).toDouble * (n.toDouble / out(f).toDouble)).toLong
        }.sum
        t -> (math.floor(0.15 * (1e12 / nT.toDouble)).toLong
          + math.floor(0.85 * c.toDouble).toLong
          + math.floor(0.85 * (dang.toDouble / nT.toDouble)).toLong)
      }.toMap
    }
    assert(got.keySet == nodes.toSet)
    nodes.foreach { t =>
      assert(got(t)._1 == mass(t), s"$t: ${got(t)._1} != replay ${mass(t)}")
      assert(math.abs(got(t)._2 - math.floor(mass(t).toDouble / 1e12 * 1e6 + 0.5) / 1e6) < 1e-12)
    }
    // rk is the (mass desc, type) permutation; total mass conserved up to
    // the per-iteration floor leak (≤ 3 units/node/iteration)
    val byRank = got.toSeq.sortBy { case (t, (m, _, _)) => (-m, t) }.map(_._1)
    byRank.zipWithIndex.foreach { case (t, i) => assert(got(t)._3 == i + 1L) }
    val total = got.values.map(_._1).sum
    assert(total <= 1000000000000L && total >= 1000000000000L - 3L * nT * 21,
      s"mass leak out of bounds: $total")
  }

  test("stationary rank: degenerate chains (one type; no transitions) stay lawful") {
    val s2 = spark
    import s2.implicits._
    def ev(rows: Seq[(Long, String, Long, String)]) = rows
      .map { case (u, t, e, ty) => (u, java.sql.Timestamp.valueOf(t), e, ty) }
      .toDF("user_id", "ts", "event_id", "event_type")
    // one type, self-loop chain: the stationary law forces ALL mass there
    val one = Events.stationaryRankOf(
      ev(Seq((1L, "2024-01-01 00:00:00", 1L, "view"),
             (1L, "2024-01-01 00:01:00", 2L, "view")))).collect()
    assert(one.length == 1 && one.head.getAs[Long]("rk") == 1L)
    assert(one.head.getAs[Long]("mass") > 990000000000L, s"${one.head}")
    // no transitions at all: every type dangles, teleport + uniform
    // redistribution keep the distribution exactly symmetric
    val iso = Events.stationaryRankOf(
      ev(Seq((1L, "2024-01-01 00:00:00", 1L, "a"),
             (2L, "2024-01-01 00:00:00", 2L, "b"),
             (3L, "2024-01-01 00:00:00", 3L, "c")))).collect()
    assert(iso.length == 3)
    assert(iso.map(_.getAs[Long]("mass")).distinct.length == 1,
      "transition-free chain must stay uniform")
    assert(iso.map(_.getAs[String]("event_type")).toSeq == Seq("a", "b", "c"),
      "uniform masses tie-break by type name")
  }

  test("time-to-convert: medians recount from a driver-side replay") {
    val rows = Events.timeToConvert(spark, sf01).collect()
    assert(rows.nonEmpty)
    // independent recount: first signup, first later purchase, per cohort
    val ev = Tables.events(spark, sf01)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val st = ev.filter(_._2 == "signup").groupBy(_._1).map { case (u, xs) => u -> xs.map(_._3).min }
    val deltas = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, t) => st.get(u).filter(t > _).map(s => (u, s, t)) }
      .groupBy(_._1).map { case (u, xs) => val m = xs.minBy(_._3); (u, m._2, m._3 - m._2) }
    rows.foreach { r =>
      val cohortMs = r.getAs[java.sql.Timestamp]("cohort").getTime
      val inCohort = deltas.filter { case (_, s, _) =>
        // week truncation replay: Spark date_trunc('week') is Monday-based
        val z = java.time.Instant.ofEpochMilli(s).atZone(java.time.ZoneOffset.UTC)
        z.toLocalDate.`with`(java.time.DayOfWeek.MONDAY).atStartOfDay(java.time.ZoneOffset.UTC)
          .toInstant.toEpochMilli == cohortMs
      }.toSeq
      assert(inCohort.size == r.getAs[Long]("n_converted"))
      val sorted = inCohort.map(x => x._3 / 60000L).sorted
      assert(r.getAs[Long]("median_min") == sorted((sorted.size + 1) / 2 - 1))
    }
  }

  test("value histogram: decade buckets partition all events and recount") {
    val vals = Tables.events(spark, sf).select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = vals.groupBy { case (t, v) =>
      val f = math.floor(v).toLong
      (t, if (f == 0) 0 else f.toString.length)
    }.map { case ((t, dec), g) =>
      (t, dec) -> ((g.length.toLong,
        g.map(x => BigDecimal(x._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum,
        g.map(_._2).min, g.map(_._2).max))
    }
    val got = Events.valueHistogram(spark, sf).collect().map { r =>
      (r.getString(0), r.getInt(1)) -> ((r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(2), r.getDouble(4), r.getDouble(5)))
    }.toMap
    assert(got == want)
    assert(got.values.map(_._1).sum == vals.length)
  }

  test("interarrival: per-type gap stats recount from a driver-side replay") {
    val rows = Tables.events(spark, sf)
      .select("user_id", "event_type", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getTimestamp(3).toInstant.toEpochMilli * 1000L +
          r.getTimestamp(3).getNanos / 1000 % 1000))
    val byType = rows.groupBy(r => (r._1, r._2)).toSeq.flatMap { case ((_, t), es) =>
      val us = es.sortBy(e => (e._4, e._3)).map(_._4)
      us.zip(us.drop(1)).map { case (a, b) => t -> (b - a) }
    }.groupBy(_._1).map { case (t, g) =>
      val v = g.map(_._2)
      t -> ((v.size.toLong, math.floor(v.sum.toDouble / v.size / 1e6 * 1e6 + 0.5) / 1e6,
        v.min.toDouble / 1e6, v.max.toDouble / 1e6))
    }
    assert(byType.nonEmpty)
    val got = Events.interarrival(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == byType)
  }

  test("cohort LTV is cumulative per cohort and totals the purchase revenue") {
    val got = Events.cohortLtv(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // non-decreasing LTV within each cohort by week offset
    got.groupBy(_._1).values.foreach { g =>
      val curve = g.sortBy(_._2).map(_._4)
      assert(curve.zip(curve.drop(1)).forall { case (a, b) => b >= a })
    }
    // week revenues sum to the exact corpus purchase total
    val total = BigDecimal(Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(18,2)"))).collect()(0)
      .getDecimal(0))
    val gotTotal = got.map(r => BigDecimal(r._3).setScale(2)).sum
    assert(gotTotal == total)
  }

  test("sketch distinct counts within 5% of exact") {
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Events.approxDistinct(spark, sf).collect().foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == exact(t), s"exact_users drifted for $t")
      assert(r.getBoolean(3), s"approx_count_distinct off for $t")
      assert(r.getBoolean(4), s"hll sketch off for $t")
    }
  }
}
