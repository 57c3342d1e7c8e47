package graft.operators

import graft.{Cols, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.C — event/time-series analytics over `events`.
  *
  * Each operator is the batch twin of a Structured Streaming job
  * (streaming/EventStreams.scala): tumbling windows ↔ watermarked window
  * aggs, sessionization ↔ flatMapGroupsWithState. The batch shapes are
  * chosen to match streaming state partitioning — one shuffle on the key
  * (user_id), ordered within partition.
  */
object Events extends QueryModule {
  import Cols._

  private val byUserTime = Window.partitionBy("user_id").orderBy("ts", "event_id")

  // Tumbling 1-hour window per event type.
  def tumblingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumExact(col("value"), 2).as("total_value"))

  private[graft] val tumblingWindowSql =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      | COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin

  /** Gap-based sessionization (30 min): one shuffle on user_id, in-partition
    * sort, running sum of session-break flags — same state layout a
    * streaming sessionizer keeps per key. */
  def sessionization(s: SparkSession, d: String): DataFrame = {
    val gapMs = 30L * 60 * 1000
    val frame = byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUserTime))
      .withColumn("new_s",
        when(col("prev_ms").isNull || unix_millis(col("ts")) - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_s").over(frame))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"),
        ((unix_millis(max(col("ts"))) - unix_millis(min(col("ts")))) / lit(1000.0))
          .as("duration_sec"))
  }

  // The gap-30-min session CTEs, shared by the sessionization oracle and
  // the hour-concurrency oracle so the two replays cannot drift.
  private val sessionCtes =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      | sess AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged)""".stripMargin

  private val sessionizationSql =
    sessionCtes +
      """
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      | MIN(ts) AS session_start, MAX(ts) AS session_end,
      | (epoch_ms(MAX(ts)) - epoch_ms(MIN(ts))) / 1000.0 AS duration_sec
      |FROM sess GROUP BY user_id, session_id""".stripMargin

  /** Hourly session-concurrency curve — the INTERVAL-STABBING operator
    * ("how many intervals cover point t?") that capacity/load dashboards
    * run over session tables. Three classic shapes exist and two of them
    * do not scale: a global sweep-line (+1 at start / −1 at end, running
    * sum) needs a TOTAL order over all boundaries — the empty-partition
    * window PlanSpec bans; an hours×sessions range join re-scans every
    * session per probe hour. The scalable third shape used here expands
    * each interval to the hour buckets it overlaps (map-side
    * explode(sequence(...)), bounded by session duration — sessions die
    * 30 min after their last event, so the expansion factor is small and
    * data-independent) and counts per bucket: one shuffle on the hour
    * key, map-side combinable, embarrassingly parallel at 100 TB. Builds
    * on the [[sessionization]] lineage (one user_id shuffle) — same
    * bucket-expansion idiom as the range-join and z-order entries, here
    * applied to time. */
  def hourConcurrency(s: SparkSession, d: String): DataFrame =
    sessionization(s, d)
      .select(col("user_id"),
        explode(sequence(
          date_trunc("hour", col("session_start")),
          date_trunc("hour", col("session_end")),
          expr("INTERVAL 1 HOUR"))).as("hour"))
      .groupBy("hour")
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))

  private val hourConcurrencySql =
    sessionCtes +
      """,
      | sessions AS (
      |  SELECT user_id, session_id, MIN(ts) AS s0, MAX(ts) AS s1
      |  FROM sess GROUP BY user_id, session_id),
      | hours AS (
      |  SELECT user_id, unnest(generate_series(
      |    date_trunc('hour', s0), date_trunc('hour', s1), INTERVAL 1 HOUR)) AS hour
      |  FROM sessions)
      |SELECT hour, COUNT(*) AS n_sessions, COUNT(DISTINCT user_id) AS n_users
      |FROM hours GROUP BY hour""".stripMargin

  /** Ordered funnel signup → view → purchase in ONE pass: the stage
    * frontiers are stacked per-user window minima — the three windows share
    * the user_id hash partitioning, so events shuffle exactly once, and the
    * per-user reduction rides the same partitioning (no second exchange).
    * The previous shape (3 filtered scans + 2 joins + scalar cross-joins)
    * read events three times; this reads it once. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val staged = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("st",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("vt",
        min(when(col("event_type") === "view" && col("ts") > col("st"), col("ts"))).over(w))
      .withColumn("pt",
        min(when(col("event_type") === "purchase" && col("ts") > col("vt"), col("ts"))).over(w))
    staged.groupBy("user_id")
      .agg(max("st").as("st"), max("vt").as("vt"), max("pt").as("pt"))
      .agg(count(col("st")).as("n_signup"),
        count(col("vt")).as("n_signup_view"),
        count(col("pt")).as("n_signup_view_purchase"))
  }

  private val funnelSql =
    """WITH s AS (SELECT user_id, MIN(ts) AS st FROM events
      |           WHERE event_type = 'signup' GROUP BY user_id),
      | v AS (SELECT e.user_id, MIN(e.ts) AS vt FROM events e JOIN s ON e.user_id = s.user_id
      |       WHERE e.event_type = 'view' AND e.ts > s.st GROUP BY e.user_id),
      | p AS (SELECT e.user_id, MIN(e.ts) AS pt FROM events e JOIN v ON e.user_id = v.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > v.vt GROUP BY e.user_id)
      |SELECT (SELECT COUNT(*) FROM s) AS n_signup,
      |       (SELECT COUNT(*) FROM v) AS n_signup_view,
      |       (SELECT COUNT(*) FROM p) AS n_signup_view_purchase""".stripMargin

  /** Path mining — the funnel-DISCOVERY twin of ev_funnel: the top
    * 3-step event-type sequences users actually take (ordered per-user by
    * (ts, event_id) — the id tie-break keeps same-timestamp events
    * deterministic on both engines). One shuffle on user_id for the lead
    * windows, then a map-side-combinable path count; at 100 TB the path
    * cardinality is bounded by |event_types|³, so the second exchange is
    * tiny regardless of corpus size. */
  def topPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("path"))
      .limit(20)
  }

  private val topPathsSql =
    """WITH o AS (SELECT user_id, event_type,
      |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
      |  lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      | FROM events)
      |SELECT event_type || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
      |FROM o WHERE e3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin

  // Daily active users + volume.
  def dailyActive(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("dau"), count(lit(1)).as("n_events"),
        sumExact(col("value"), 2).as("total_value"))

  private val dailyActiveSql =
    """SELECT date_trunc('day', ts) AS day, COUNT(DISTINCT user_id) AS dau,
      | COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY date_trunc('day', ts)""".stripMargin

  /** Exact discrete percentiles of event value per type. percentile_disc =
    * SQL-standard smallest-value-with-cume_dist≥p — exact, order-free, and
    * engine-portable (cross-checked against DuckDB quantile_disc). At
    * 100 TB the exact form is one shuffle per group; ev_approx_distinct
    * carries the constant-memory sketch alternative. */
  def valuePercentiles(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").as("p95"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").as("p99"),
        count(lit(1)).as("n"))

  private val valuePercentilesSql =
    """SELECT event_type,
      | quantile_disc(value, 0.5) AS p50, quantile_disc(value, 0.95) AS p95,
      | quantile_disc(value, 0.99) AS p99, COUNT(*) AS n
      |FROM events GROUP BY event_type""".stripMargin

  /** Mergeable-sketch percentiles per event type — the production path at
    * 100 TB: `approx_percentile` keeps a bounded (accuracy-parameter-sized)
    * sketch per group that merges associatively across partitions, where
    * the exact twin (ev_value_percentiles) sorts each group's full value
    * set. Mirrors the HLL/exact-distinct pairing. Oracle signal (VERDICT
    * r5 #3): sketch internals are engine-specific, so each approximate
    * quantile is thresholded against its exact twin (hash-covered, the
    * proven percentile_disc device) into a boolean — |approx − exact| ≤
    * 2% of the per-type (p99 − p50) spread, the EventsSpec bound that
    * catches swapped quantiles or a wrong column while tolerating sketch
    * variance — which the oracle pins TRUE. */
  def valuePercentilesApprox(s: SparkSession, d: String): DataFrame = {
    val spread = greatest(col("p99") - col("p50"), lit(1e-9))
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        expr("approx_percentile(value, array(0.5, 0.95, 0.99), 10000)").as("p"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").as("p95"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").as("p99"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("p50"), col("p95"), col("p99"), col("n"),
        (abs(col("p").getItem(0) - col("p50")) <= spread * lit(0.02)).as("p50_ok"),
        (abs(col("p").getItem(1) - col("p95")) <= spread * lit(0.02)).as("p95_ok"),
        (abs(col("p").getItem(2) - col("p99")) <= spread * lit(0.02)).as("p99_ok"))
  }

  private val valuePercentilesApproxSql =
    """SELECT event_type,
      | quantile_disc(value, 0.5) AS p50, quantile_disc(value, 0.95) AS p95,
      | quantile_disc(value, 0.99) AS p99, COUNT(*) AS n,
      | TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
      |FROM events GROUP BY event_type""".stripMargin

  /** Pivot (relational transpose): daily counts with one column per event
    * type. The value list is explicit — at scale an implicit pivot first
    * runs a distinct scan AND caps at spark.sql.pivotMaxValues; listing
    * the columns keeps it one pass and schema-stable. */
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def pivotDaily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, eventTypes)

  private val pivotDailySql =
    """SELECT date_trunc('day', ts) AS day,
      | COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      | COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      | COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      | COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events GROUP BY date_trunc('day', ts)""".stripMargin

  /** Sliding (hopping) windows: 1-hour windows every 15 minutes — each
    * event lands in 4 overlapping windows. Spark's `window(ts, size,
    * slide)` generates the per-event window fan-out natively in batch AND
    * streaming (same code in a readStream twin); the oracle reproduces the
    * epoch-aligned window starts via time_bucket minus k·slide. */
  def slidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumExact(col("value"), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  private[graft] val slidingWindowSql =
    """WITH w AS (
      |  SELECT event_type, value,
      |    time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS window_start
      |  FROM events, (SELECT unnest(generate_series(0, 3)) AS k))
      |SELECT window_start, event_type, COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM w GROUP BY window_start, event_type""".stripMargin

  /** Weekly cohort retention: users grouped by first-seen week, counted in
    * each subsequent active week — the classic growth-analytics triangle.
    * Shape: first-seen aggregate and the activity join share the user_id
    * hash partitioning (one shuffle), then one rollup shuffle on the
    * (cohort, offset) pair; no window, no driver loop. */
  def retention(s: SparkSession, d: String): DataFrame = {
    val firstSeen = Tables.events(s, d)
      .groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    Tables.events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("active_week"))
      .join(firstSeen, "user_id")
      .select(col("user_id"), col("cohort_week"),
        (datediff(col("active_week"), col("cohort_week")).cast("long") / 7L)
          .cast("long").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
  }

  private val retentionSql =
    """WITH fs AS (
      |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      |  FROM events GROUP BY user_id),
      | act AS (
      |  SELECT DISTINCT e.user_id, fs.cohort_week,
      |    date_diff('day', fs.cohort_week, date_trunc('week', e.ts)) // 7 AS week_offset
      |  FROM events e JOIN fs ON e.user_id = fs.user_id)
      |SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
      | COUNT(*) AS n_active
      |FROM act GROUP BY cohort_week, week_offset""".stripMargin

  /** Daily-volume anomaly score per event type: z-score of each day's
    * count against its trailing 7-day window (excluding the day itself) —
    * the monitoring query behind traffic-spike/outage alerts. Exactness:
    * window sums of integer counts are exact in doubles (≪ 2^53), the
    * variance is the E[x²]−E[x]² form over those exact sums, and the final
    * score is fixed-pointed with floor(z·1e6+0.5)/1e6 — portable rounding,
    * no HALF_UP/HALF_EVEN tie risk. One day-grain aggregate then a
    * per-type window over the (tiny) daily frame. */
  def anomalyZscore(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"))
      .withColumn("n_prior", count(col("n")).over(w))
      .withColumn("mean", avg(col("n")).over(w))
      .withColumn("var",
        avg(col("n") * col("n")).over(w) - avg(col("n")).over(w) * avg(col("n")).over(w))
      .filter(col("n_prior") === 7 && col("var") > 0)
      .select(col("day"), col("event_type"), col("n").cast("long").as("n_events"),
        (floor((col("n") - col("mean")) / sqrt(col("var")) * 1e6 + 0.5) / 1e6)
          .as("zscore"))
  }

  private[graft] val anomalyZscoreSql =
    """WITH daily AS (
      |  SELECT date_trunc('day', ts) AS day, event_type,
      |    CAST(COUNT(*) AS DOUBLE) AS n
      |  FROM events GROUP BY 1, 2),
      | win AS (
      |  SELECT day, event_type, n,
      |    COUNT(n) OVER w AS n_prior,
      |    AVG(n) OVER w AS mean,
      |    AVG(n * n) OVER w - AVG(n) OVER w * AVG(n) OVER w AS var
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT day, event_type, CAST(n AS BIGINT) AS n_events,
      | floor((n - mean) / sqrt(var) * 1e6 + 0.5) / 1e6 AS zscore
      |FROM win WHERE n_prior = 7 AND var > 0""".stripMargin

  /** Calendar gap-fill + forward-fill: densify the per-type daily series to
    * the full observed date span (missing days → n_events=0) and carry the
    * last observed daily mean forward — the densification step every
    * time-series chart/model feed needs (a day with no rows must appear as
    * zero, not vanish). Shape: one day-grain aggregate, a broadcast
    * calendar×type grid (≤ types·days rows — trivially small at ANY corpus
    * scale since it grows with time, not data volume), left join back on
    * the day-grain partitioning, and one window over the tiny daily frame.
    * Mean is an exact decimal sum ÷ count, fixed-pointed (no double-sum
    * nondeterminism, no HALF_UP tie risk). */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val daily = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        (floor(sum(col("value").cast("decimal(18,2)")).cast("double")
          / count(lit(1)) * 1e6 + 0.5) / 1e6).as("avg_value"))
    val cal = ev.agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = ev.select("event_type").distinct().crossJoin(broadcast(cal))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(last(col("avg_value"), ignoreNulls = true).over(w), lit(0.0))
          .as("value_ffill"))
  }

  private val gapFillSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
      |    floor(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |          / COUNT(*) * 1e6 + 0.5) / 1e6 AS avg_value
      |  FROM events GROUP BY 1, 2),
      | span AS (SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events),
      | cal AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |         FROM span),
      | grid AS (SELECT t.event_type, c.day
      |          FROM (SELECT DISTINCT event_type FROM events) t, cal c)
      |SELECT g.event_type, g.day,
      | COALESCE(d.n_events, 0) AS n_events,
      | COALESCE(last_value(d.avg_value IGNORE NULLS) OVER (
      |    PARTITION BY g.event_type ORDER BY g.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS value_ffill
      |FROM grid g LEFT JOIN daily d ON g.event_type = d.event_type AND g.day = d.day""".stripMargin

  /** Sketch-based distinct users per event type: HLL is the constant-memory
    * cardinality path at 100 TB (sketches merge associatively across
    * partitions/days — the batch twin of a streaming sketch state).
    *
    * Oracle signal (VERDICT r5 #3): the sketch BINARIES are
    * engine-specific, so the raw estimates can never hash-match DuckDB —
    * instead the entry emits the EXACT count (hash-covered) plus the
    * error bound AS DATA: each estimate is thresholded into a boolean
    * (|est − exact| ≤ 5% · exact, the EventsSpec bound) that the oracle
    * pins to TRUE. A broken sketch flips the boolean and the hash goes
    * red — the driver gate now sees sketch failures, not just row
    * counts. The exact column is the verification harness; the
    * production path at 100 TB serves the sketch alone. */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("hll_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("exact_users"), col("n_events"),
        (abs(col("approx_users") - col("exact_users"))
          <= col("exact_users") * lit(0.05)).as("approx_ok"),
        (abs(col("hll_users") - col("exact_users"))
          <= col("exact_users") * lit(0.05)).as("hll_ok"))

  private val approxDistinctSql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
      | COUNT(*) AS n_events, TRUE AS approx_ok, TRUE AS hll_ok
      |FROM events GROUP BY event_type""".stripMargin

  /** Exact weekly distinct users via MERGEABLE bitmap partials — the
    * re-aggregatable exact-distinct idiom. Daily (bucket, bitmap) partials
    * (bitmap_construct_agg over bitmap_bit_position, one fixed-size bitmap
    * per 32k-id bucket) roll up to weekly counts through bitmap_or_agg,
    * never re-touching the raw events. At 100 TB the daily partials are the
    * materialized layer — O(active_ids/32768) rows per day — and every
    * coarser rollup (week, month, all-time) merges partials instead of
    * re-scanning the fact table; COUNT(DISTINCT) re-scans are the single
    * most expensive recurring query on an events store. The oracle is the
    * plain COUNT(DISTINCT) the merged bitmaps must equal EXACTLY (unlike
    * the HLL path of ev_approx_distinct). */
  def bitmapDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .groupBy(col("day"), expr("bitmap_bucket_number(user_id)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
      .groupBy(date_trunc("week", col("day")).as("week"), col("bucket"))
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
      .groupBy("week")
      .agg(sum(expr("bitmap_count(bm)")).as("n_active"))

  private val bitmapDistinctSql =
    """SELECT date_trunc('week', ts) AS week, COUNT(DISTINCT user_id) AS n_active
      |FROM events GROUP BY date_trunc('week', ts)""".stripMargin

  /** Week-over-week retained users served ENTIRELY from the bitmap
    * partial layer — the SET-INTERSECTION query on mergeable partials.
    * Retention normally costs a user-level self-join (shuffle the whole
    * user×week activity table twice); here |active(w) ∩ active(w+1)| is
    * computed per 32k-id bucket by INCLUSION-EXCLUSION —
    * |A∩B| = |A| + |B| − |A∪B| — with the union from bitmap_or_agg over
    * the same weekly partials [[bitmapDistinct]] maintains. No
    * user-granularity shuffle anywhere: the widest frame after the
    * partial build is O(weeks × buckets). At 100 TB this is the
    * difference between re-shuffling a trillion activity rows and
    * merging a few thousand fixed-size bitmaps; any pairwise set
    * overlap (audience intersection, cohort cross-visit) reads the same
    * stored layer. Oracle = the user-level self-join done the expensive
    * way in DuckDB, which the bucketed inclusion-exclusion must equal
    * EXACTLY. */
  def bitmapWowRetained(s: SparkSession, d: String): DataFrame = {
    val weekly = Tables.events(s, d)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .groupBy(col("day"), expr("bitmap_bucket_number(user_id)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
      .groupBy(date_trunc("week", col("day")).as("week"), col("bucket"))
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
    // stack each week's partials under its own label (the "current" side)
    // and under the previous week's label (the "next" side): a (pair_week,
    // bucket) group then holds exactly the two bitmaps to intersect
    val stacked = weekly
      .select(col("week").as("pair_week"), lit(1).as("is_cur"), col("bucket"), col("bm"))
      .unionByName(weekly.select(
        (col("week") - expr("INTERVAL 7 DAY")).as("pair_week"),
        lit(0).as("is_cur"), col("bucket"), col("bm")))
    stacked
      .groupBy("pair_week", "bucket")
      .agg(
        sum(when(col("is_cur") === 1, expr("bitmap_count(bm)"))).as("c_cur"),
        sum(when(col("is_cur") === 0, expr("bitmap_count(bm)"))).as("c_next"),
        expr("bitmap_count(bitmap_or_agg(bm))").as("c_union"),
        max(col("is_cur")).as("has_cur"), min(col("is_cur")).as("has_next"))
      .groupBy(col("pair_week").as("week"))
      .agg(
        sum(coalesce(col("c_cur"), lit(0L))).as("n_cur"),
        sum(coalesce(col("c_next"), lit(0L))).as("n_next"),
        sum(coalesce(col("c_cur"), lit(0L)) + coalesce(col("c_next"), lit(0L))
          - col("c_union")).as("retained"),
        max(col("has_cur")).as("hc"), max(lit(1) - col("has_next")).as("hn"))
      // only week pairs where BOTH weeks appear in the data (mirrors the
      // oracle, whose pair list comes from the observed week set)
      .filter(col("hc") === 1 && col("hn") === 1)
      .select(col("week"), col("n_cur"), col("n_next"), col("retained"))
  }

  private val bitmapWowRetainedSql =
    """WITH wk AS (
      |  SELECT DISTINCT date_trunc('week', ts) AS week, user_id FROM events),
      | weeks AS (SELECT DISTINCT week FROM wk),
      | cons AS (
      |  SELECT w.week FROM weeks w
      |  JOIN weeks x ON x.week = w.week + INTERVAL 7 DAY)
      |SELECT c.week,
      | (SELECT COUNT(*) FROM wk a WHERE a.week = c.week) AS n_cur,
      | (SELECT COUNT(*) FROM wk b WHERE b.week = c.week + INTERVAL 7 DAY) AS n_next,
      | (SELECT COUNT(*) FROM wk a JOIN wk b
      |    ON a.user_id = b.user_id
      |   WHERE a.week = c.week AND b.week = c.week + INTERVAL 7 DAY) AS retained
      |FROM cons c""".stripMargin

  /** The approx twin of [[bitmapDistinct]]: daily HLL sketch partials
    * merged upward with hll_union_agg — at 100 TB the bitmap layer is exact
    * but costs O(id-range/8) bits per day; the HLL layer is a fixed ~16 KB
    * per (day) row at ~2% error, the right tier for wide rollups (all-time
    * uniques, hundreds of slices). Mergeability — estimate(union(partials))
    * — is the property proved here; ev_approx_distinct only proved the
    * one-shot sketch. Oracle signal (VERDICT r5 #3): the merged estimate
    * is thresholded against the exact weekly distinct (hash-covered)
    * into `merged_ok` = |est − exact| ≤ 5% · exact, which the oracle
    * pins TRUE — a stale or mis-merged partial flips the hash red. The
    * exact join is the verification harness; production reads the
    * partial layer alone. */
  def hllMerge(s: SparkSession, d: String): DataFrame = {
    val merged = Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"), count(lit(1)).as("n_events"))
      .groupBy(date_trunc("week", col("day")).as("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("hll_users"),
        sum(col("n_events")).as("n_events"))
    val exact = Tables.events(s, d)
      .groupBy(date_trunc("week", col("ts")).as("week"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    merged.join(exact, "week")
      .select(col("week"), col("n_events"), col("exact_users"),
        (abs(col("hll_users") - col("exact_users"))
          <= col("exact_users") * lit(0.05)).as("merged_ok"))
  }

  private val hllMergeSql =
    """SELECT date_trunc('week', ts) AS week, COUNT(*) AS n_events,
      | COUNT(DISTINCT user_id) AS exact_users, TRUE AS merged_ok
      |FROM events GROUP BY date_trunc('week', ts)""".stripMargin

  /** The approx twin of [[bitmapWowRetained]]: week-over-week retained
    * users by inclusion-exclusion over HLL sketches — |A∩B| ≈
    * est(A) + est(B) − est(A∪B), the standard audience-overlap
    * estimator. One fixed ~16 KB sketch per week (vs O(id-range/8) bits
    * of bitmap per week), unions via hll_union_agg; the pair framing
    * (stack each week under its own and its predecessor's label) is
    * IDENTICAL to the exact entry so the two tiers stay drop-in
    * substitutes. The estimator's absolute error scales with the UNION
    * size, so relative error blows up when the overlap is a small
    * fraction of either set — that is precisely when the exact bitmap
    * tier is the right choice. Oracle signal (VERDICT r5 #3): the entry
    * joins the estimate against the EXACT intersection served from the
    * bitmap partial layer ([[bitmapWowRetained]] — itself hash-proven)
    * and emits the exact columns plus `retained_ok` = |est − exact| ≤
    * 15% · exact (the EventsSpec bound: inclusion-exclusion compounds
    * three ~2% sketch errors scaled by the union/intersection ratio),
    * which the oracle pins TRUE. */
  def hllWowRetained(s: SparkSession, d: String): DataFrame = {
    val weekly = Tables.events(s, d)
      .groupBy(date_trunc("week", col("ts")).as("week"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val stacked = weekly
      .select(col("week").as("pair_week"), lit(1).as("is_cur"), col("sk"))
      .unionByName(weekly.select(
        (col("week") - expr("INTERVAL 7 DAY")).as("pair_week"),
        lit(0).as("is_cur"), col("sk")))
    val est = stacked
      .groupBy(col("pair_week").as("week"))
      .agg(
        max(when(col("is_cur") === 1, hll_sketch_estimate(col("sk")))).as("est_cur"),
        max(when(col("is_cur") === 0, hll_sketch_estimate(col("sk")))).as("est_next"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_union"),
        max(col("is_cur")).as("hc"), min(col("is_cur")).as("hn"))
      .filter(col("hc") === 1 && col("hn") === 0)
      .select(col("week"),
        greatest(col("est_cur") + col("est_next") - col("est_union"), lit(0L))
          .as("retained_est"))
    bitmapWowRetained(s, d).join(est, "week")
      .select(col("week"), col("n_cur"), col("n_next"), col("retained"),
        (abs(col("retained_est") - col("retained"))
          <= col("retained") * lit(0.15)).as("retained_ok"))
  }

  private val hllWowRetainedSql =
    s"""SELECT week, n_cur, n_next, retained, TRUE AS retained_ok
       |FROM ($bitmapWowRetainedSql)""".stripMargin

  // Count-Min Sketch geometry: d independent hash rows × w buckets. At
  // w=1024 the additive error bound is εN with ε = e/w ≈ 0.27%, far below
  // any heavy-hitter threshold worth acting on.
  private val CmsD = 4
  private val CmsW = 1024
  private val CmsP = 1000000007L

  // h_row(u) = ((2·row+1)·(md5Int(u) mod P) + 97·row) mod P mod w —
  // the MinHash universal-hash family over the cross-engine md5 hash
  private def cmsHRow(row: Int, h: Column): Column =
    pmod(pmod(h * lit(2L * row + 1) + lit(97L * row), lit(CmsP)), lit(CmsW.toLong))

  /** user_id frame → exploded (row, bucket) pairs — the map-side half of
    * the sketch build, shared verbatim by the streaming maintainer
    * (st_cms_frequency) so the two sketches cannot drift. */
  private[graft] def cmsPairs(withUserId: DataFrame): DataFrame =
    withUserId
      .select(pmod(graft.functions.TextFunctions.md5Int(col("user_id").cast("string")),
        lit(CmsP)).as("h"))
      .select(explode(array((0 until CmsD).map(r =>
        struct(lit(r).as("row"), cmsHRow(r, col("h")).as("bucket"))): _*)).as("rb"))
      .select(col("rb.row").as("row"), col("rb.bucket").as("bucket"))

  /** Point-read estimates for probe keys 1..20 from a built sketch:
    * min over the d rows' cells, absent cell = 0. */
  private[graft] def cmsProbeEstimates(s: SparkSession, sketch: DataFrame): DataFrame = {
    import s.implicits._
    val probes = (1L to 20L).toDF("user_id")
      .withColumn("h", pmod(graft.functions.TextFunctions.md5Int(col("user_id").cast("string")),
        lit(CmsP)))
      .select(col("user_id"), explode(array((0 until CmsD).map(r =>
        struct(lit(r).as("row"), cmsHRow(r, col("h")).as("bucket"))): _*)).as("rb"))
      .select(col("user_id"), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
    // the sketch is a fixed 4096-row table → broadcast to the probe side
    probes.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .na.fill(0L, Seq("c"))
      .groupBy("user_id")
      .agg(min(col("c")).as("est_count"))
  }

  /** Count-Min Sketch frequency layer — the third MERGEABLE sketch tier
    * next to the exact bitmaps (ev_bitmap_distinct) and HLL
    * (ev_hll_merge): bitmap answers "how many distinct", HLL answers it
    * approximately at fixed size, CMS answers "how often does key X
    * occur" without materializing the full key histogram. The sketch is
    * a (row, bucket) → count table (d×w = 4096 rows regardless of data
    * volume), built with one map-side-combinable aggregate; partials
    * merge by ADDITION, so daily sketches roll up like the bitmap layer
    * and never re-scan raw events. The entry builds the sketch and reads
    * back point estimates (min over the d rows) for a fixed probe-key
    * set. Everything is integer arithmetic on the shared md5 universal-
    * hash family, so the WHOLE sketch replays verbatim in DuckDB —
    * hash-green, unlike the binary-opaque HLL tier; EventsSpec asserts
    * the CMS guarantee (never underestimates, over by ≤ εN) against
    * exact counts. */
  def cmsFrequency(s: SparkSession, d: String): DataFrame =
    cmsProbeEstimates(s,
      cmsPairs(Tables.events(s, d))
        .groupBy("row", "bucket")
        .agg(count(lit(1)).as("c")))

  /** The MERGE path of the CMS tier, demonstrated not claimed: daily
    * (day, row, bucket) partial sketches — what a 100 TB deployment
    * materializes nightly — SUM-merged into the full-range sketch, then
    * probed. Additive merge means rollups (week/month/all-time) never
    * re-scan raw events; the oracle replays BOTH levels in SQL, and the
    * estimates must equal ev_cms_frequency's exactly (summing partials
    * commutes with the one-shot build). */
  def cmsDailyRollup(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .select(col("day"), pmod(graft.functions.TextFunctions.md5Int(
        col("user_id").cast("string")), lit(CmsP)).as("h"))
      .select(col("day"), explode(array((0 until CmsD).map(r =>
        struct(lit(r).as("row"), cmsHRow(r, col("h")).as("bucket"))): _*)).as("rb"))
      .groupBy(col("day"), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
    cmsProbeEstimates(s,
      daily.groupBy("row", "bucket").agg(sum(col("c")).as("c")))
  }

  private val cmsDailyRollupSql = {
    val md5u = graft.functions.TextFunctions.md5IntSql("CAST(user_id AS VARCHAR)")
    def hRow(row: Int, h: String) =
      s"((($h) * ${2L * row + 1} + ${97L * row}) % $CmsP) % $CmsW"
    val sketchRows = (0 until CmsD)
      .map(r => s"SELECT day, $r AS row, ${hRow(r, "h")} AS bucket FROM hashed")
      .mkString("\n |  UNION ALL ")
    val probeRows = (0 until CmsD)
      .map(r => s"SELECT user_id, $r AS row, ${hRow(r, "h")} AS bucket FROM ph")
      .mkString("\n |  UNION ALL ")
    s"""WITH hashed AS (SELECT date_trunc('day', ts) AS day, ($md5u) % $CmsP AS h FROM events),
       | pairs AS (
       |  $sketchRows),
       | daily AS (SELECT day, row, bucket, COUNT(*) AS c FROM pairs GROUP BY day, row, bucket),
       | sketch AS (SELECT row, bucket, CAST(SUM(c) AS BIGINT) AS c
       |            FROM daily GROUP BY row, bucket),
       | probes AS (SELECT CAST(unnest(generate_series(1, 20)) AS BIGINT) AS user_id),
       | ph AS (SELECT user_id,
       |          (${graft.functions.TextFunctions.md5IntSql("CAST(user_id AS VARCHAR)")}) % $CmsP AS h
       |        FROM probes),
       | pp AS (
       |  $probeRows)
       |SELECT user_id, MIN(COALESCE(c, 0)) AS est_count
       |FROM pp LEFT JOIN sketch USING (row, bucket)
       |GROUP BY user_id""".stripMargin
  }

  /** Heavy-hitter threshold: keys with ≥ this many events. Production
    * uses φN (a corpus fraction); the synthetic per-key counts don't
    * scale with SF (users do), so a fixed bar keeps the result
    * meaningful at every SF (1 / 13 / 104 keys at sf0.001/0.01/0.1). */
  private val HhT = 80L

  /** EXACT heavy hitters through the CMS, the huge-cardinality pattern:
    * when the key space is too large to groupBy outright (per-IP, per-URL,
    * per-ngram at 100 TB), a full-histogram shuffle moves every key.
    * Instead: (1) build the 4096-cell sketch (map-side combinable, the
    * ev_cms_frequency layer); (2) collect it to the driver — it is a
    * CONSTANT-size frame like the IVF eigensolve, NOT data — and re-scan
    * with the d bucket counts as a broadcast-literal lookup, filtering
    * events whose key's estimate < T entirely MAP-SIDE; (3) exact-count
    * only the survivors. CMS never underestimates, so the candidate set
    * provably contains every true heavy key, and the exact recount makes
    * the final answer EXACT — the oracle is the plain HAVING query, and
    * equality is a theorem, not luck. The only shuffle carries candidate
    * rows (the εN false-positive tail), not the key histogram. */
  def heavyHitters(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"))
    val cells = cmsPairs(ev).groupBy("row", "bucket")
      .agg(count(lit(1)).as("c")).collect()
    val dense = Array.fill(CmsD)(Array.fill(CmsW)(0L))
    cells.foreach(r => dense(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
    val h = pmod(graft.functions.TextFunctions.md5Int(col("user_id").cast("string")),
      lit(CmsP))
    val est = least((0 until CmsD).map(r =>
      element_at(lit(dense(r)), (cmsHRow(r, h) + 1).cast("int"))): _*)
    ev.filter(est >= lit(HhT))
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(HhT))
      .orderBy(desc("cnt"), asc("user_id"))
  }

  private val heavyHittersSql =
    s"""SELECT user_id, COUNT(*) AS cnt FROM events
       |GROUP BY user_id HAVING COUNT(*) >= $HhT
       |ORDER BY cnt DESC, user_id""".stripMargin

  private[graft] val cmsFrequencySql = {
    val md5u = graft.functions.TextFunctions.md5IntSql("CAST(user_id AS VARCHAR)")
    def hRow(row: Int, h: String) =
      s"((($h) * ${2L * row + 1} + ${97L * row}) % $CmsP) % $CmsW"
    // the d hash rows as UNION ALL branches, generated from the SAME
    // (row) constants as the Spark columns so the engines cannot drift
    val sketchRows = (0 until CmsD)
      .map(r => s"SELECT $r AS row, ${hRow(r, "h")} AS bucket FROM hashed")
      .mkString("\n |  UNION ALL ")
    val probeRows = (0 until CmsD)
      .map(r => s"SELECT user_id, $r AS row, ${hRow(r, "h")} AS bucket FROM ph")
      .mkString("\n |  UNION ALL ")
    s"""WITH hashed AS (SELECT ($md5u) % $CmsP AS h FROM events),
       | pairs AS (
       |  $sketchRows),
       | sketch AS (SELECT row, bucket, COUNT(*) AS c FROM pairs GROUP BY row, bucket),
       | probes AS (SELECT CAST(unnest(generate_series(1, 20)) AS BIGINT) AS user_id),
       | ph AS (SELECT user_id,
       |          (${graft.functions.TextFunctions.md5IntSql("CAST(user_id AS VARCHAR)")}) % $CmsP AS h
       |        FROM probes),
       | pp AS (
       |  $probeRows)
       |SELECT user_id, MIN(COALESCE(c, 0)) AS est_count
       |FROM pp LEFT JOIN sketch USING (row, bucket)
       |GROUP BY user_id""".stripMargin
  }

  /** RFM segmentation (recency/frequency/monetary — the classic
    * event-analytics cohort device), scored WITHIN BEHAVIORAL COHORTS:
    * each user's cohort is their dominant event type (ties alphabetical),
    * and the three quintile scores are ntile(5) within the cohort over a
    * DETERMINISTIC total order (metric desc, then user_id — metric ties
    * are common, so the tie-break is load-bearing for the oracle), 1 =
    * best. Output is the ≤ |types|×125-cell (cohort, r, f, m) grid with
    * user counts and exact decimal spend.
    *
    * Scale: two exchanges over USERS (not events) — the per-user rollup
    * and the cohort-partitioned ntiles; no empty-partition window
    * anywhere (PlanSpec's rule). A 1e9-user corpus with few cohorts
    * would switch the scoring to approx-quantile cutpoints per cohort —
    * same grid, scores move only at cell boundaries. */
  def rfm(s: SparkSession, d: String): DataFrame = {
    // ONE event-grain rollup feeds both the per-user metrics and the
    // dominant-type cohort (re-aggregated at the user grain) — a second
    // full events scan for the cohort would be pure duplicated I/O at
    // the scale this targets (the r7 review catch)
    val perUserType = Tables.events(s, d)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"), max(col("ts")).as("t_max"),
        sum(dec(col("value"), 2)).as("v_sum"))
    val scored = perUserType
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(desc("n"), asc("event_type"))))
      .groupBy("user_id")
      .agg(max(col("t_max")).as("last_ts"),
        sum(col("n")).as("freq"),
        sum(col("v_sum")).as("spend"),
        max(when(col("rn") === 1, col("event_type"))).as("cohort"))
    def score(metric: Column): Column =
      ntile(5).over(Window.partitionBy("cohort")
        .orderBy(metric.desc, asc("user_id"))).cast("long")
    scored
      .withColumn("r", score(col("last_ts")))
      .withColumn("f", score(col("freq")))
      .withColumn("m", score(col("spend")))
      .groupBy("cohort", "r", "f", "m")
      .agg(count(lit(1)).as("n_users"),
        sum(col("spend")).cast("double").as("total_spend"))
  }

  private val rfmSql =
    """WITH per_user AS (SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS freq,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS spend
      |  FROM events GROUP BY user_id),
      | cohort AS (SELECT user_id, event_type AS cohort FROM (
      |    SELECT user_id, event_type, ROW_NUMBER() OVER (
      |        PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type) AS rn
      |    FROM events GROUP BY user_id, event_type) t WHERE rn = 1),
      | scored AS (SELECT u.user_id, cohort, spend,
      |    ntile(5) OVER (PARTITION BY cohort ORDER BY last_ts DESC, u.user_id) AS r,
      |    ntile(5) OVER (PARTITION BY cohort ORDER BY freq DESC, u.user_id) AS f,
      |    ntile(5) OVER (PARTITION BY cohort ORDER BY spend DESC, u.user_id) AS m
      |  FROM per_user u JOIN cohort c ON u.user_id = c.user_id)
      |SELECT cohort, r, f, m, COUNT(*) AS n_users,
      | CAST(SUM(spend) AS DOUBLE) AS total_spend
      |FROM scored GROUP BY cohort, r, f, m""".stripMargin

  /** First-order Markov transition matrix over event types: per user the
    * event stream in (ts, event_id) order, each step (type → next type)
    * counted, row-normalized into transition probabilities (fp6
    * fixed-point so the integer ratio is engine-identical). The lead()
    * rides the same per-user exchange as sessionization; the matrix is
    * |types|² — model-sized output from a single shuffle at any corpus
    * scale. */
  def markovTransitions(s: SparkSession, d: String): DataFrame = {
    val steps = Tables.events(s, d)
      .withColumn("next_type", lead(col("event_type"), 1).over(byUserTime))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    steps
      .withColumn("row_total",
        sum(col("n_transitions")).over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        fp6(col("n_transitions").cast("double") / col("row_total")).as("p"))
  }

  private[graft] val markovTransitionsSql =
    """WITH steps AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events),
      | cnt AS (SELECT event_type AS from_type, next_type AS to_type,
      |    COUNT(*) AS n_transitions
      |  FROM steps WHERE next_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n_transitions,
      | floor(CAST(n_transitions AS DOUBLE)
      |       / SUM(n_transitions) OVER (PARTITION BY from_type) * 1000000.0 + 0.5)
      |   / 1000000.0 AS p
      |FROM cnt""".stripMargin

  /** Stationary visit distribution of the event-type transition graph —
    * PageRank with damping 0.85 over the Markov chain ev_markov_transitions
    * estimates, ranking types by long-run visit probability (where a
    * session RESTS, not just where it steps; teleport keeps disconnected
    * or absorbing types from swallowing the chain).
    *
    * Scale shape is the Pca/CMS constant-model discipline: the ONE
    * data-sized pass is the transition count (a map-side-combined
    * groupBy on the events scan); what leaves the executors is the
    * |types|²-cell transition model plus the type list — constant in
    * row count, bounded loudly at 1024 types — and the 20 power-iteration
    * steps run on that constant model driver-side, exactly like the PCA
    * eigensolve (a relational unroll would replace one constant transfer
    * with 20 tiny jobs). Cross-engine determinism: the iteration state is
    * a LONG mass in 1e12 units, floored after every float op, so order
    * never matters (long sums are associative) and the DuckDB oracle —
    * 20 unrolled CTEs of the identical floor shapes — reproduces every
    * bit. Dangling types redistribute their mass uniformly each step. */
  private val PrIters = 20
  private val PrScale = 1e12
  def stationaryRank(s: SparkSession, d: String): DataFrame =
    stationaryRankOf(Tables.events(s, d))

  /** DataFrame-parametric form: `ev` needs user_id, ts, event_id,
    * event_type — the library surface (and the degenerate-graph test
    * seam: single-type and transition-free corpora are legal chains). */
  def stationaryRankOf(evRaw: DataFrame): DataFrame = {
    val s = evRaw.sparkSession
    // NULL event types are excluded from the chain (countDistinct below is
    // null-excluding; the node set must agree with it exactly or the
    // PrScale/nT normalization and the 1024 bound both drift)
    val ev = evRaw.filter(col("event_type").isNotNull)
    // the loud bound runs BEFORE the |types|²-row model collect it bounds
    // (a guard after the collect can never fire before the driver OOM it
    // is supposed to prevent) — one 1-row aggregate, then the model pull
    val nT = ev.agg(countDistinct("event_type")).first().getLong(0).toInt
    require(nT <= 1024,
      s"stationary-rank model collect is bounded at 1024 event types (got $nT); " +
        "a wider domain needs the relational-iteration variant")
    val steps = ev
      .withColumn("next_type", lead(col("event_type"), 1).over(byUserTime))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val model = steps.unionByName(
        ev.select(col("event_type").as("from_type")).distinct()
          .select(col("from_type"), lit(null).cast("string").as("to_type"),
            lit(0L).as("n")))
      .collect()
    val nodes = model.collect { case r if r.isNullAt(1) => r.getString(0) }.sorted
    val edges = model.filter(!_.isNullAt(1))
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val out = edges.groupBy(_._1).map { case (f, es) => f -> es.map(_._3).sum }
    // incoming adjacency grouped ONCE (the SQL oracle's GROUP BY to_type):
    // scanning the edge array per node per iteration would be O(it·V·E)
    val into = edges.map { case (f, t, n) => t -> (f, n.toDouble / out(f).toDouble) }
      .groupBy(_._1).map { case (t, es) => t -> es.map(_._2).toSeq }
      .withDefaultValue(Seq.empty)
    val tele = math.floor(0.15 * (PrScale / nT.toDouble)).toLong
    var mass = nodes.map(_ -> math.floor(PrScale / nT.toDouble).toLong).toMap
    for (_ <- 1 to PrIters) {
      val dang = nodes.filterNot(out.contains).map(mass).sum
      mass = nodes.map { t =>
        val c = into(t)
          .map { case (f, p) => math.floor(mass(f).toDouble * p).toLong }.sum
        t -> (tele + math.floor(0.85 * c.toDouble).toLong
          + math.floor(0.85 * (dang.toDouble / nT.toDouble)).toLong)
      }.toMap
    }
    import s.implicits._
    nodes.map(t => (t, mass(t))).sortBy { case (t, m) => (-m, t) }.zipWithIndex
      .map { case ((t, m), i) =>
        (t, m, math.floor((m.toDouble / PrScale) * 1e6 + 0.5) / 1e6, (i + 1).toLong)
      }.toSeq.toDF("event_type", "mass", "pi", "rk")
  }

  private val stationaryRankSql: String = {
    val base =
      """steps AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM (SELECT * FROM events WHERE event_type IS NOT NULL)),
        | edges AS (SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
        |  FROM steps WHERE next_type IS NOT NULL GROUP BY 1, 2),
        | outs AS MATERIALIZED (SELECT from_type, CAST(SUM(n) AS BIGINT) AS outn FROM edges GROUP BY 1),
        | pe AS MATERIALIZED (SELECT e.from_type, e.to_type, CAST(e.n AS DOUBLE) / CAST(o.outn AS DOUBLE) AS p
        |  FROM edges e JOIN outs o USING (from_type)),
        | nodes AS MATERIALIZED (SELECT DISTINCT event_type FROM events
        |   WHERE event_type IS NOT NULL),
        | nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
        | it0 AS MATERIALIZED (SELECT event_type, CAST(FLOOR(1e12 / CAST(nn.n AS DOUBLE)) AS BIGINT) AS mass
        |  FROM nodes CROSS JOIN nn)""".stripMargin
    val iters = (1 to PrIters).map { k =>
      s"""it$k AS MATERIALIZED (
         |  SELECT nodes.event_type,
         |    CAST(FLOOR(0.15 * (1e12 / CAST(nn.n AS DOUBLE))) AS BIGINT)
         |    + CAST(FLOOR(0.85 * CAST(COALESCE(c.c, 0) AS DOUBLE)) AS BIGINT)
         |    + CAST(FLOOR(0.85 * (CAST(d.dang AS DOUBLE) / CAST(nn.n AS DOUBLE))) AS BIGINT) AS mass
         |  FROM nodes CROSS JOIN nn
         |  CROSS JOIN (SELECT CAST(COALESCE(SUM(p.mass), 0) AS BIGINT) AS dang
         |              FROM it${k - 1} p LEFT JOIN outs o ON o.from_type = p.event_type
         |              WHERE o.from_type IS NULL) d
         |  LEFT JOIN (SELECT pe.to_type AS event_type,
         |               CAST(SUM(CAST(FLOOR(p.mass * pe.p) AS BIGINT)) AS BIGINT) AS c
         |             FROM it${k - 1} p JOIN pe ON pe.from_type = p.event_type
         |             GROUP BY 1) c ON c.event_type = nodes.event_type)""".stripMargin
    }
    s"WITH ${(base +: iters).mkString(",\n")}\n" +
      s"""SELECT event_type, mass,
         |  ${Cols.fp6Sql(s"CAST(mass AS DOUBLE) / 1e12")} AS pi,
         |  ROW_NUMBER() OVER (ORDER BY mass DESC, event_type) AS rk
         |FROM it$PrIters ORDER BY rk""".stripMargin
  }

  /** Funnel latency — the "how long does conversion take" companion of
    * ev_funnel: per user, first signup → first subsequent purchase; per
    * weekly signup cohort, the conversion count with EXACT lower-median
    * and p90 latency in minutes. The quantiles are rank-picked (row_number
    * against explicit floor indices) instead of percentile functions,
    * whose interpolation rules differ across engines — an exact integer
    * rank is portable by construction. Shapes: two key-pruned aggregates
    * on user_id, then one window over CONVERSIONS partitioned by cohort
    * week (conversions ≪ events; the window input is users-sized). */
  def timeToConvert(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val su = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("st"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(su, "user_id")
      .filter(col("ts") > col("st"))
      .groupBy("user_id")
      .agg(min(col("ts")).as("pt"), min(col("st")).as("st"))
      .withColumn("delta_min",
        floor((unix_millis(col("pt")) - unix_millis(col("st"))) / 60000.0).cast("long"))
      .withColumn("cohort", date_trunc("week", col("st")))
    val byCohort = Window.partitionBy("cohort")
    conv
      .withColumn("rn", row_number().over(
        byCohort.orderBy(asc("delta_min"), asc("user_id"))))
      .withColumn("cnt", count(lit(1)).over(byCohort))
      .groupBy("cohort")
      .agg(count(lit(1)).as("n_converted"),
        max(when(col("rn") === floor((col("cnt") + 1) / 2.0).cast("long"),
          col("delta_min"))).as("median_min"),
        // nearest-rank p90 is ceil(0.9n): floor under-covers (at n=2 it
        // reported the cohort MINIMUM as "p90" — the r7 review catch)
        max(when(col("rn") === ceil(col("cnt") * 0.9).cast("long"),
          col("delta_min"))).as("p90_min"))
  }

  private val timeToConvertSql =
    """WITH su AS (SELECT user_id, MIN(ts) AS st FROM events
      |            WHERE event_type = 'signup' GROUP BY user_id),
      | conv AS (SELECT e.user_id, MIN(e.ts) AS pt, MIN(su.st) AS st
      |   FROM events e JOIN su USING (user_id)
      |   WHERE e.event_type = 'purchase' AND e.ts > su.st
      |   GROUP BY e.user_id),
      | delta AS (SELECT user_id,
      |    CAST(floor((epoch_ms(pt) - epoch_ms(st)) / 60000.0) AS BIGINT) AS delta_min,
      |    date_trunc('week', st) AS cohort
      |  FROM conv),
      | ranked AS (SELECT cohort, delta_min,
      |    ROW_NUMBER() OVER (PARTITION BY cohort ORDER BY delta_min, user_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY cohort) AS cnt
      |  FROM delta)
      |SELECT cohort, COUNT(*) AS n_converted,
      | MAX(CASE WHEN rn = CAST(floor((cnt + 1) / 2.0) AS BIGINT)
      |          THEN delta_min END) AS median_min,
      | MAX(CASE WHEN rn = CAST(ceil(cnt * 0.9) AS BIGINT)
      |          THEN delta_min END) AS p90_min
      |FROM ranked GROUP BY cohort""".stripMargin

  /** Truncated-kernel EWMA of the per-type daily series — the smoothing
    * pass feeding dashboards/alerting (the full recursive EWMA is
    * order-SEQUENTIAL and unshardable; the standard distributed form
    * truncates the kernel, here at 8 days where 0.7⁸ < 0.06 of the mass).
    * Weights are µ-quantized 0.7ʲ INTEGER literals (identical constants
    * both engines — pow() last-ulp drift can't flip the oracle), each day
    * scatters its count forward onto its ≤ 8 target days (one explode,
    * linear), contributions regroup on (type, day), and the weighted mean
    * normalizes by the weights of PRESENT days only — so calendar gaps
    * degrade gracefully instead of shifting the kernel. Integer sums ⇒
    * exact; one double division at the end, fixed-pointed. */
  private val EwmaWeights = Seq(1000000L, 700000L, 490000L, 343000L,
    240100L, 168070L, 117649L, 82354L) // floor(0.7^j·1e6+0.5), j=0..7

  /** The ONE truncated-kernel scatter (shared by ev_ewma_smoothing and
    * ev_holt_trend — r11 review hoisted the second copy): each (type,
    * day, value) row scatters its weighted value onto its ≤ 8 forward
    * days via one explode (linear), contributions regroup on (type,
    * day). Weights are the µ-quantized 0.7ʲ INTEGER literals (identical
    * constants both engines — pow() last-ulp drift can't flip an
    * oracle); the caller normalizes swv by sw, i.e. by the weights of
    * PRESENT days only, so calendar gaps degrade gracefully instead of
    * shifting the kernel. Integer sums ⇒ exact. */
  private def kernelSmooth(src: DataFrame, valCol: Column): DataFrame = {
    val wArr = array(EwmaWeights.map(lit): _*)
    src.withColumn("j", explode(sequence(lit(0), lit(EwmaWeights.size - 1))))
      .select(col("event_type"), date_add(col("day"), col("j")).as("day"),
        (valCol * element_at(wArr, col("j") + 1)).as("wv"),
        element_at(wArr, col("j") + 1).as("w"))
      .groupBy("event_type", "day")
      .agg(sum("wv").as("swv"), sum("w").as("sw"))
  }

  /** SQL twins of the shared kernel: the daily-counts + weight-table CTE
    * prefix, and one scatter+regroup CTE pair per smoothing pass. */
  private val dailyWtsCtes = {
    val vals = EwmaWeights.zipWithIndex
      .map { case (w, j) => s"($j, $w)" }.mkString(", ")
    s"""daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
       |               FROM events GROUP BY 1, 2),
       | wts AS (SELECT j, w FROM (VALUES $vals) v(j, w))""".stripMargin
  }
  private def kernelSmoothSql(src: String, valExpr: String,
      contrib: String, agg: String): String =
    s"""$contrib AS (SELECT event_type, day + j AS day, $valExpr * w AS wv, w
       |        FROM $src CROSS JOIN wts),
       | $agg AS (SELECT event_type, day, SUM(wv) AS swv, SUM(w) AS sw
       |        FROM $contrib GROUP BY 1, 2)""".stripMargin

  /** Truncated-kernel EWMA of the per-type daily series — the smoothing
    * pass feeding dashboards/alerting (the full recursive EWMA is
    * order-SEQUENTIAL and unshardable; the standard distributed form
    * truncates the kernel, here at 8 days where 0.7⁸ < 0.06 of the
    * mass). One [[kernelSmooth]] pass; one double division at the end,
    * fixed-pointed. */
  def ewmaSmoothing(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    daily.join(kernelSmooth(daily, col("n")), Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("n").cast("long").as("n_events"),
        (floor(col("swv").cast("double") / col("sw") * 1e6 + 0.5) / 1e6).as("ewma"))
  }

  private val ewmaSmoothingSql =
    s"""WITH $dailyWtsCtes,
       | ${kernelSmoothSql("daily", "n", "c1", "a1")}
       |SELECT d.event_type, d.day, CAST(d.n AS BIGINT) AS n_events,
       | floor(CAST(a.swv AS DOUBLE) / a.sw * 1e6 + 0.5) / 1e6 AS ewma
       |FROM daily d JOIN a1 a USING (event_type, day)""".stripMargin

  /** Brown's double exponential smoothing (the Holt-style level+trend
    * forecaster; Brown 1956) on the per-type daily series — the
    * TREND-aware gauge the flat EWMA can't give (a steadily growing
    * series always lags a single smoothing). Two [[kernelSmooth]]
    * passes: S₁ smooths the daily counts, S₂ smooths S₁ — the second
    * pass runs on the DAY-GRAIN frame, so its cost is calendar-bounded,
    * volume-independent. Level = 2S₁ − S₂, trend = (α/(1−α))(S₁ − S₂);
    * the kernel's decay is (1−α) = 0.7, so α = 0.3 and the coefficient
    * is 3/7 exact (the r11 review caught the inverted 7/3). Forecast =
    * level + trend. S₁ is floored to 1e6 fixed point between the passes
    * so every downstream sum is integer-exact; the one trend division
    * happens in double on an exact integer difference (identical IEEE
    * ops both engines) and floors back to fixed point — negative
    * differences floor identically (floor, not truncate, both
    * engines). */
  /** The integer Holt frame both entries read: (event_type, day, n,
    * s1_fp, s2_fp, t_fp) — model state in exact µ fixed point, so the
    * backtest can difference forecasts against actuals without leaving
    * integers. */
  private def holtFrame(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val s1 = daily.join(kernelSmooth(daily, col("n")), Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("n"),
        floor(col("swv").cast("double") / col("sw") * 1e6 + 0.5)
          .cast("long").as("s1_fp"))
    val s2 = s1.join(kernelSmooth(s1, col("s1_fp")), Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("n"), col("s1_fp"),
        floor(col("swv").cast("double") / col("sw") + 0.5)
          .cast("long").as("s2_fp"))
    s2.withColumn("t_fp",
      floor((col("s1_fp") - col("s2_fp")).cast("double") * 3.0 / 7.0 + 0.5)
        .cast("long"))
  }

  def holtTrend(s: SparkSession, d: String): DataFrame =
    holtFrame(s, d)
      .select(col("event_type"), col("day"), col("n").cast("long").as("n_events"),
        ((lit(2L) * col("s1_fp") - col("s2_fp")).cast("double") / 1e6).as("level"),
        (col("t_fp").cast("double") / 1e6).as("trend"),
        ((lit(2L) * col("s1_fp") - col("s2_fp") + col("t_fp")).cast("double") / 1e6)
          .as("forecast_next"))

  /** The SQL twin of [[holtFrame]] — shared by both Holt oracles. */
  private val holtCtes =
    s"""$dailyWtsCtes,
       | ${kernelSmoothSql("daily", "n", "c1", "a1")},
       | s1 AS (SELECT d.event_type, d.day, d.n,
       |    CAST(floor(CAST(a.swv AS DOUBLE) / a.sw * 1e6 + 0.5) AS BIGINT) AS s1_fp
       |  FROM daily d JOIN a1 a USING (event_type, day)),
       | ${kernelSmoothSql("s1", "s1_fp", "c2", "a2")},
       | s2 AS (SELECT s1.event_type, s1.day, s1.n, s1.s1_fp,
       |    CAST(floor(CAST(a.swv AS DOUBLE) / a.sw + 0.5) AS BIGINT) AS s2_fp
       |  FROM s1 JOIN a2 a USING (event_type, day)),
       | t AS (SELECT *,
       |    CAST(floor(CAST(s1_fp - s2_fp AS DOUBLE) * 3.0 / 7.0 + 0.5) AS BIGINT) AS t_fp
       |  FROM s2)""".stripMargin

  private val holtTrendSql =
    s"""WITH $holtCtes
       |SELECT event_type, day, CAST(n AS BIGINT) AS n_events,
       | CAST(2 * s1_fp - s2_fp AS DOUBLE) / 1e6 AS level,
       | CAST(t_fp AS DOUBLE) / 1e6 AS trend,
       | CAST(2 * s1_fp - s2_fp + t_fp AS DOUBLE) / 1e6 AS forecast_next
       |FROM t""".stripMargin

  /** Backtest of the Holt forecaster — the evaluation half a forecaster
    * is incomplete without: each day's one-step-ahead forecast
    * (level + trend, the [[holtFrame]] integers) is differenced against
    * the NEXT day's actual count, per-type MAE and signed BIAS out. The
    * error stays in exact integer µ-units (forecast_fp − n·10⁶) until
    * the final per-type division, so the backtest is order-independent
    * and engine-exact; the day+1 self-join runs on the day-grain frame
    * (calendar-bounded). Days with no successor drop out (a backtest
    * scores only days whose truth arrived). */
  def forecastError(s: SparkSession, d: String): DataFrame = {
    val f = holtFrame(s, d)
      .withColumn("fcst_fp",
        lit(2L) * col("s1_fp") - col("s2_fp") + col("t_fp"))
    val actual = f.select(col("event_type"),
      date_sub(col("day"), 1).as("day"), col("n").as("n_next"))
    f.join(actual, Seq("event_type", "day"))
      .withColumn("err_fp", col("fcst_fp") - col("n_next") * lit(1000000L))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        (floor(sum(abs(col("err_fp"))).cast("double") / count(lit(1)) + 0.5) / 1e6)
          .as("mae"),
        (floor(sum(col("err_fp")).cast("double") / count(lit(1)) + 0.5) / 1e6)
          .as("bias"))
  }

  private val forecastErrorSql =
    s"""WITH $holtCtes,
       | f AS (SELECT event_type, day, n,
       |    2 * s1_fp - s2_fp + t_fp AS fcst_fp FROM t),
       | j AS (SELECT f.event_type,
       |    f.fcst_fp - d2.n * 1000000 AS err_fp
       |  FROM f JOIN daily d2
       |    ON f.event_type = d2.event_type AND d2.day = f.day + 1)
       |SELECT event_type, COUNT(*) AS n_days,
       | floor(CAST(SUM(ABS(err_fp)) AS DOUBLE) / COUNT(*) + 0.5) / 1e6 AS mae,
       | floor(CAST(SUM(err_fp) AS DOUBLE) / COUNT(*) + 0.5) / 1e6 AS bias
       |FROM j GROUP BY event_type""".stripMargin

  /** CUSUM changepoint scan per event type (Page 1954): the cumulative
    * deviation from the series mean S_t = Σ_{i≤t}(x_i − x̄) peaks AT the
    * changepoint — the standard level-shift detector the z-score entry
    * (point anomalies) doesn't cover. All arithmetic stays INTEGER by
    * scaling S_t by n_days (n·Σ_{i≤t}x_i − t·Σx), so the running sum is
    * exact and order-independent; the peak picks
    * (|S| desc, day asc) deterministically and normalizes back to count
    * units only at output. One day-grain aggregate, one type-partitioned
    * window over the DAILY frame (grows with time, not volume), one
    * broadcast of the per-type totals. */
  def cusumChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val tot = daily.groupBy("event_type")
      .agg(sum("n").as("sn"), count(lit(1)).as("nd"))
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("cn", sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t", row_number().over(w))
      .join(broadcast(tot), "event_type")
      .withColumn("dev", col("nd") * col("cn") - col("t") * col("sn"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(abs(col("dev")).desc, col("day").asc)))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("nd").cast("long").as("n_days"),
        col("day").as("peak_day"),
        (floor(abs(col("dev")).cast("double") / col("nd") * 1e6 + 0.5) / 1e6)
          .as("peak_dev"))
  }

  private val cusumChangepointSql =
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |               FROM events GROUP BY 1, 2),
      | tot AS (SELECT event_type, SUM(n) AS sn, COUNT(*) AS nd
      |         FROM daily GROUP BY 1),
      | cum AS (SELECT event_type, day, n,
      |    SUM(n) OVER (PARTITION BY event_type ORDER BY day
      |                 ROWS UNBOUNDED PRECEDING) AS cn,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
      |  FROM daily),
      | dev AS (SELECT c.event_type, c.day, t.nd,
      |    t.nd * c.cn - c.t * t.sn AS dev,
      |    ROW_NUMBER() OVER (PARTITION BY c.event_type
      |      ORDER BY abs(t.nd * c.cn - c.t * t.sn) DESC, c.day) AS rk
      |  FROM cum c JOIN tot t USING (event_type))
      |SELECT event_type, CAST(nd AS BIGINT) AS n_days, day AS peak_day,
      | floor(CAST(abs(dev) AS DOUBLE) / nd * 1e6 + 0.5) / 1e6 AS peak_dev
      |FROM dev WHERE rk = 1""".stripMargin

  /** Day-of-week seasonality profile per event type — the baseline every
    * anomaly/forecast consumer normalizes against (a Monday spike is only
    * a spike relative to Mondays). ISO weekday alignment: Spark's
    * dayofweek (Sun=1) is remapped to Mon=1..Sun=7 to match DuckDB's
    * isodow. Exact integer sums per (type, weekday) over the day-grain
    * frame; one division at output. */
  def seasonalityDow(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    daily
      .groupBy(col("event_type"),
        (pmod(dayofweek(col("day")) + lit(5), lit(7)) + lit(1)).as("iso_dow"))
      .agg(count(lit(1)).cast("long").as("n_days"), sum("n").as("total"))
      .select(col("event_type"), col("iso_dow").cast("int").as("iso_dow"),
        col("n_days"), col("total").cast("long").as("total_events"),
        (floor(col("total").cast("double") / col("n_days") * 1e6 + 0.5) / 1e6)
          .as("mean_daily"))
  }

  private val seasonalityDowSql =
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |               FROM events GROUP BY 1, 2)
      |SELECT event_type, CAST(isodow(day) AS INT) AS iso_dow,
      | CAST(COUNT(*) AS BIGINT) AS n_days,
      | CAST(SUM(n) AS BIGINT) AS total_events,
      | floor(CAST(SUM(n) AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6 AS mean_daily
      |FROM daily GROUP BY 1, 2""".stripMargin

  /** Per-type inter-arrival-time profile — the traffic-model gauge behind
    * capacity planning and bot detection (a human's clicks are seconds
    * apart; a scraper's are milliseconds, a batch job's are uniform):
    * per (user, type) consecutive-event gaps via one lag window ordered
    * by (ts, event_id) — the suite's deterministic tiebreak, equal
    * timestamps exist in the data — rolled up per type to exact long
    * microsecond sums, with mean/min/max emitted in seconds. At scale
    * this is one shuffle on user_id (the window) and a tiny final agg;
    * no global ordering anywhere. */
  def interarrival(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_us")).as("sum_us"),
        min(col("gap_us")).as("min_us"), max(col("gap_us")).as("max_us"))
      .select(col("event_type"), col("n_gaps"),
        fp6(col("sum_us").cast("double") / col("n_gaps") / 1e6).as("mean_gap_s"),
        (col("min_us").cast("double") / 1e6).as("min_gap_s"),
        (col("max_us").cast("double") / 1e6).as("max_gap_s"))
  }

  private val interarrivalSql =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (
      |      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_us
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n_gaps,
      | floor(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1e6 * 1e6 + 0.5) / 1e6 AS mean_gap_s,
      | CAST(MIN(gap_us) AS DOUBLE) / 1e6 AS min_gap_s,
      | CAST(MAX(gap_us) AS DOUBLE) / 1e6 AS max_gap_s
      |FROM g WHERE gap_us IS NOT NULL GROUP BY event_type""".stripMargin

  /** Lag-1..7 autocorrelation of each event type's daily-count series —
    * the memory gauge behind seasonality (a weekly cycle shows as an
    * ACF peak at lag 7) and burst detection (white-noise traffic decays
    * to ~0 by lag 1). Pairs are calendar-aligned: day t pairs with day
    * t+k only when BOTH days exist in the series, so gaps drop pairs
    * rather than shifting the series (the gap-fill entry owns imputation).
    * Exactness device: daily counts are integers, so ALL five Pearson
    * moments (Σx, Σy, Σxy, Σx², Σy²) accumulate as exact BIGINTs in both
    * engines — order-independent by construction — and only the final
    * r = (nΣxy−ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) leaves integer space
    * (IEEE sqrt/divide, engine-identical, fixed-pointed at 1e6). A
    * zero-variance side yields NULL via the nullif guard, not a crash.
    * Scale shape: ONE data-sized shuffle (the daily pre-agg, map-side
    * combined); the lag explode ×7 and self-join run on the tiny
    * types×days frame (broadcast under AQE), and the final agg is
    * types×7 rows. At 100 TB the daily frame is still ~types×365 rows
    * per year — the join never touches raw events. */
  def autocorr(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val lagged = daily
      .withColumn("k", explode(sequence(lit(1), lit(7))))
      .select(col("event_type"), col("k"),
        date_add(col("day"), col("k")).as("day"), col("n").as("x"))
    lagged.join(daily.withColumnRenamed("n", "y"), Seq("event_type", "day"))
      .groupBy(col("event_type"), col("k").cast("int").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        fp6((col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
          nullif(sqrt(((col("n_pairs") * col("sxx") - col("sx") * col("sx")) *
            (col("n_pairs") * col("syy") - col("sy") * col("sy"))).cast("double")),
            lit(0.0))).as("acf"))
  }

  private val autocorrSql =
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |               FROM events GROUP BY 1, 2),
      | pairs AS (
      |  SELECT a.event_type, k.k, a.n AS x, b.n AS y
      |  FROM daily a
      |  JOIN (SELECT unnest(range(1, 8)) AS k) k ON TRUE
      |  JOIN daily b ON b.event_type = a.event_type
      |               AND b.day = a.day + CAST(k.k AS INT)),
      | m AS (SELECT event_type, CAST(k AS INT) AS lag, COUNT(*) AS np,
      |   CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |   CAST(SUM(x * y) AS BIGINT) AS sxy,
      |   CAST(SUM(x * x) AS BIGINT) AS sxx,
      |   CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM pairs GROUP BY 1, 2)
      |SELECT event_type, lag, np AS n_pairs,
      | floor(CAST(np * sxy - sx * sy AS DOUBLE) /
      |   nullif(sqrt(CAST((np * sxx - sx * sx) * (np * syy - sy * sy) AS DOUBLE)), 0.0)
      |   * 1e6 + 0.5) / 1e6 AS acf
      |FROM m""".stripMargin

  /** Cohort LTV curve — cumulative purchase revenue per signup-week
    * cohort by week offset, per cohort member (the growth metric behind
    * payback-period decisions; ev_retention is its head-count twin).
    * Money stays DECIMAL end to end: per-(cohort, offset) revenue sums
    * exactly, the running total accumulates decimals inside the window
    * (partitioned by cohort — never a global frame), and only the final
    * per-user division leaves exact arithmetic, fixed-pointed at 1e6.
    * Cohort sizes ride the same firstSeen frame (one extra tiny agg). */
  def cohortLtv(s: SparkSession, d: String): DataFrame = {
    val firstSeen = Tables.events(s, d)
      .groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val sizes = firstSeen.groupBy("cohort_week").agg(count(lit(1)).as("n_users"))
    val rev = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .join(firstSeen, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(date_trunc("week", col("ts")), col("cohort_week")).cast("long") / 7L)
          .cast("long").as("week_offset"))
      .agg(sum(dec(col("value"), 2)).as("rev"))
    val cum = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev
      .withColumn("cum_rev", sum(col("rev")).over(cum))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"),
        col("rev").cast("double").as("week_revenue"),
        fp6(col("cum_rev").cast("double") / col("n_users")).as("ltv_per_user"))
  }

  private val cohortLtvSql =
    """WITH fs AS (
      |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      |  FROM events GROUP BY user_id),
      | sz AS (SELECT cohort_week, COUNT(*) AS n_users FROM fs GROUP BY 1),
      | rev AS (
      |  SELECT fs.cohort_week,
      |    date_diff('day', fs.cohort_week, date_trunc('week', e.ts)) // 7 AS week_offset,
      |    SUM(CAST(e.value AS DECIMAL(18,2))) AS rev
      |  FROM events e JOIN fs ON e.user_id = fs.user_id
      |  WHERE e.event_type = 'purchase' GROUP BY 1, 2)
      |SELECT rev.cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
      | CAST(rev AS DOUBLE) AS week_revenue,
      | floor(CAST(SUM(rev) OVER (PARTITION BY rev.cohort_week ORDER BY week_offset
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |   / n_users * 1e6 + 0.5) / 1e6 AS ltv_per_user
      |FROM rev JOIN sz ON rev.cohort_week = sz.cohort_week""".stripMargin

  /** Decade histogram of the value distribution per event type — the
    * order-of-magnitude profile (how much volume is micro vs whale) a
    * monetization/fraud dashboard opens with. Buckets are DIGIT COUNTS of
    * floor(abs(value)) — pure integer/string arithmetic, identical on both
    * engines, where a log10() bucket boundary is one ulp from flipping —
    * with sub-unit values split out as decade 0 (digit count can't see
    * them: "0" and "5" both have one digit, but the micro tail is exactly
    * what the profile exists to show). One small aggregate; money stays
    * decimal-exact. */
  def valueHistogram(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"),
        // abs BEFORE the digit count (ADVICE r8): floor(-3.2) = -4 has
        // string length 2 — a negative micro-value would collide with the
        // 2-digit decade, and [-1, 0) would miss the decade-0 branch; the
        // magnitude decade is the profile's meaning for signed values
        // (refunds/chargebacks in a real ledger)
        when(floor(abs(col("value"))) === 0, lit(0))
          .otherwise(length(floor(abs(col("value"))).cast("long").cast("string")))
          .as("decade"))
      .agg(count(lit(1)).as("n_events"), sumExact(col("value"), 2).as("total_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .select(col("event_type"), col("decade").cast("int").as("decade"),
        col("n_events"), col("total_value"), col("min_value"), col("max_value"))

  private val valueHistogramSql =
    """SELECT event_type,
      | CAST(CASE WHEN floor(abs(value)) = 0 THEN 0
      |      ELSE length(CAST(CAST(floor(abs(value)) AS BIGINT) AS VARCHAR)) END AS INT) AS decade,
      | COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      | MIN(value) AS min_value, MAX(value) AS max_value
      |FROM events GROUP BY 1, 2""".stripMargin

  override def entries: Seq[(String, QueryFn, Option[String])] = Seq(
    ("ev_value_histogram", valueHistogram _, Some(valueHistogramSql)),
    ("ev_interarrival", interarrival _, Some(interarrivalSql)),
    ("ev_autocorr", autocorr _, Some(autocorrSql)),
    ("ev_cohort_ltv", cohortLtv _, Some(cohortLtvSql)),
    ("ev_seasonality_dow", seasonalityDow _, Some(seasonalityDowSql)),
    ("ev_ewma_smoothing", ewmaSmoothing _, Some(ewmaSmoothingSql)),
    ("ev_holt_trend", holtTrend _, Some(holtTrendSql)),
    ("ev_forecast_error", forecastError _, Some(forecastErrorSql)),
    ("ev_cusum_changepoint", cusumChangepoint _, Some(cusumChangepointSql)),
    ("ev_time_to_convert", timeToConvert _, Some(timeToConvertSql)),
    ("ev_rfm", rfm _, Some(rfmSql)),
    ("ev_markov_transitions", markovTransitions _, Some(markovTransitionsSql)),
    ("ev_stationary_rank", stationaryRank _, Some(stationaryRankSql)),
    ("ev_bitmap_distinct", bitmapDistinct _, Some(bitmapDistinctSql)),
    ("ev_cms_frequency", cmsFrequency _, Some(cmsFrequencySql)),
    ("ev_cms_daily_rollup", cmsDailyRollup _, Some(cmsDailyRollupSql)),
    ("ev_heavy_hitters", heavyHitters _, Some(heavyHittersSql)),
    ("ev_hll_merge", hllMerge _, Some(hllMergeSql)),
    ("ev_hll_wow_retained", hllWowRetained _, Some(hllWowRetainedSql)),
    ("ev_value_percentiles", valuePercentiles _, Some(valuePercentilesSql)),
    ("ev_value_percentiles_approx", valuePercentilesApprox _, Some(valuePercentilesApproxSql)),
    ("ev_approx_distinct", approxDistinct _, Some(approxDistinctSql)),
    ("ev_tumbling_window", tumblingWindow _, Some(tumblingWindowSql)),
    ("ev_sessionization", sessionization _, Some(sessionizationSql)),
    ("ev_hour_concurrency", hourConcurrency _, Some(hourConcurrencySql)),
    ("ev_bitmap_wow_retained", bitmapWowRetained _, Some(bitmapWowRetainedSql)),
    ("ev_funnel", funnel _, Some(funnelSql)),
    ("ev_top_paths", topPaths _, Some(topPathsSql)),
    ("ev_daily_active", dailyActive _, Some(dailyActiveSql)),
    ("ev_retention", retention _, Some(retentionSql)),
    ("ev_anomaly_zscore", anomalyZscore _, Some(anomalyZscoreSql)),
    ("ev_gap_fill", gapFill _, Some(gapFillSql)),
    ("ev_sliding_window", slidingWindow _, Some(slidingWindowSql)),
    ("ev_pivot_daily", pivotDaily _, Some(pivotDailySql)))
}
