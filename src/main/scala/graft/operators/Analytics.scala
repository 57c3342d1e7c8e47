package graft.operators

import graft.{Cols, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.B — the analytical query layer (TPC-H-style) over the star
  * schema. Reference analog: the "Spark handles analytical queries" half of
  * the Cassandra deployment (BASELINE.json).
  *
  * Scale notes (SURVEY.md §5): every dimension-side join (region, nation,
  * supplier, part, customer) is explicitly `broadcast()`; fact-fact joins
  * (orders ⋈ lineitem) shuffle on the join key where AQE handles skew; all
  * aggregates are decimal-exact so map-side partial aggregation is safe.
  */
object Analytics extends QueryModule {
  import Cols._

  /** revenue term: per-row double product, cast once to exact decimal(18,4). */
  private def revenue(ep: Column, disc: Column): Column =
    dec(ep * (lit(1.0) - disc), 4)
  private val revSql =
    "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))"

  // ---- q1: pricing summary: full-scan multi-aggregate --------------------
  def q1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumExact(col("l_quantity"), 2).as("sum_qty"),
        sumExact(col("l_extendedprice"), 2).as("sum_base_price"),
        sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6))
          .cast("double").as("sum_charge"),
        avgExact(col("l_quantity"), 2).as("avg_qty"),
        avgExact(col("l_extendedprice"), 2).as("avg_price"),
        avgExact(col("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private val q1Sql =
    s"""SELECT l_returnflag, l_linestatus,
       | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       | CAST(SUM($revSql) AS DOUBLE) AS sum_disc_price,
       | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       | CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       | COUNT(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---- q3: top revenue orders (3-way join, deterministic top-k) ----------
  def q3(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    Tables.lineitem(s, d).filter(col("l_shipdate") > ts("1996-01-01"))
      .join(Tables.orders(s, d).filter(col("o_orderdate") < ts("1996-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
  }

  private val q3Sql =
    s"""SELECT l_orderkey, CAST(SUM($revSql) AS DOUBLE) AS revenue, o_orderdate, o_orderpriority
       |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1996-01-01'
       |  AND l_shipdate > TIMESTAMP '1996-01-01'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---- q5: local supplier volume (6-way join through dims) ---------------
  def q5(s: SparkSession, d: String): DataFrame = {
    val asiaNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("1995-01-01") && col("o_orderdate") < ts("1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
  }

  private val q5Sql =
    s"""SELECT n_name, CAST(SUM($revSql) AS DOUBLE) AS revenue
       |FROM region JOIN nation ON n_regionkey = r_regionkey
       | JOIN customer ON c_nationkey = n_nationkey
       | JOIN orders ON o_custkey = c_custkey
       | JOIN lineitem ON l_orderkey = o_orderkey
       | JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
       |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1995-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name""".stripMargin

  // ---- q6: revenue forecast (tight-filter scalar aggregate) --------------
  def q6(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1995-01-01") && col("l_shipdate") < ts("1997-01-01")
        && col("l_discount").between(0.04, 0.08) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice") * col("l_discount"), 4)).cast("double").as("revenue"))

  private val q6Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 24""".stripMargin

  // ---- q10: returned-item reporting (top-20 customers) -------------------
  def q10(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("1995-01-01") && col("o_orderdate") < ts("1995-07-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")

  private val q10Sql =
    s"""SELECT c_custkey, c_name, CAST(SUM($revSql) AS DOUBLE) AS revenue, c_acctbal, n_name
       |FROM customer JOIN orders ON c_custkey = o_custkey
       | JOIN lineitem ON l_orderkey = o_orderkey
       | JOIN nation ON c_nationkey = n_nationkey
       |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'
       |  AND l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ---- q13: customer order-count distribution (left outer join) ----------
  def q13(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))

  private val q13Sql =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count""".stripMargin

  // ---- q14: promo revenue share (conditional aggregate) ------------------
  def q14(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1995-09-01") && col("l_shipdate") < ts("1995-12-01"))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0)
        * sum(when(col("p_type") === "PROMO", revenue(col("l_extendedprice"), col("l_discount")))
            .otherwise(lit(0).cast(DecimalType(18, 4)))).cast("double")
        / sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double"))
        .as("promo_revenue_pct"))

  private val q14Sql =
    s"""SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revSql ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       |  / CAST(SUM($revSql) AS DOUBLE) AS promo_revenue_pct
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1995-09-01' AND l_shipdate < TIMESTAMP '1995-12-01'""".stripMargin

  // ---- q18: large-volume orders (agg-as-filter / HAVING) -----------------
  def q18(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sum(dec(col("l_quantity"), 2)).as("qty_dec"))
      .filter(col("qty_dec") > 300)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("qty_dec").cast("double").as("sum_qty"))

  private val q18Sql =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      |HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300""".stripMargin

  // ---- q19: bracket predicates (OR-of-ANDs pushdown + broadcast) ---------
  def q19(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) && col("l_quantity").between(1, 21)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 25) && col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#19" && col("p_size").between(1, 35) && col("l_quantity").between(20, 40)))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  private val q19Sql =
    s"""SELECT CAST(SUM($revSql) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  // ---- q4: order priority check (EXISTS semi-join) -----------------------
  def q4(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= ts("1995-07-01") && col("o_orderdate") < ts("1996-01-01"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-07-01' AND o_orderdate < TIMESTAMP '1996-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority""".stripMargin

  // ---- anti-join: customers with no recent orders ------------------------
  def antiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderdate") >= ts("2001-01-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  private val antiJoinSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')""".stripMargin

  // ---- window: top-3 orders per customer ---------------------------------
  def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
  }

  private val topkPerGroupSql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t WHERE rk <= 3""".stripMargin

  // ---- window: running spend per customer --------------------------------
  def runningTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("running_spend", sum(dec(col("o_totalprice"), 2)).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "o_orderdate", "running_spend")
  }

  private val runningTotalSql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders""".stripMargin

  // ---- rollup: nation × status multi-level aggregate ---------------------
  def rollupAgg(s: SparkSession, d: String): DataFrame = {
    // Dataset.rollup trips Spark's self-join ambiguity check on joined
    // attrs, so the ROLLUP itself runs as SQL over a temp view; the join
    // stays in the DataFrame API with explicit broadcasts.
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nat"), col("o_orderstatus").as("st"), col("o_totalprice"))
      .createOrReplaceTempView("graft_rollup_src")
    s.sql(
      """SELECT COALESCE(nat, 'ALL') AS nation, COALESCE(st, 'ALL') AS status,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM graft_rollup_src GROUP BY ROLLUP(nat, st)""".stripMargin)
  }

  private val rollupAggSql =
    """SELECT COALESCE(n_name, 'ALL') AS nation, COALESCE(o_orderstatus, 'ALL') AS status,
      | COUNT(*) AS n_orders,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      |FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP(n_name, o_orderstatus)""".stripMargin

  // ---- CUBE: all 2^k aggregate slices in one pass ------------------------
  /** CUBE over (order priority, order status): rollup_nation_status proves
    * the HIERARCHY slices; CUBE adds the cross slices (status totals
    * without priority) — all 2² groupings in ONE shuffle with map-side
    * partial aggregation, where a dashboard would otherwise issue four
    * separate scans of a 100 TB fact table. Same COALESCE('ALL') device
    * as the rollup entry so the slice labels hash identically. */
  def cubeAgg(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d)
      .select(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"),
        col("o_totalprice"))
      .createOrReplaceTempView("graft_cube_src")
    s.sql(
      """SELECT COALESCE(pri, 'ALL') AS priority, COALESCE(st, 'ALL') AS status,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM graft_cube_src GROUP BY CUBE(pri, st)""".stripMargin)
  }

  private val cubeAggSql =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      | COALESCE(o_orderstatus, 'ALL') AS status,
      | COUNT(*) AS n_orders,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin

  // ---- ntile deciles within partitions -----------------------------------
  /** Customer-spend deciles WITHIN each nation: exact decimal spend per
    * customer, ntile(10) over (spend desc, custkey) — a total order, so
    * both engines assign identical deciles — then per-decile stats. The
    * window is PARTITIONED by nation (never a global ntile, which plans a
    * single-partition window — the shape PlanSpec forbids suite-wide);
    * per-decile sums re-cast to decimal so the aggregate is order-free. */
  def windowDecilePerNation(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sumExact(col("o_totalprice"), 2).as("spend"))
    val w = Window.partitionBy("n_name").orderBy(desc("spend"), asc("o_custkey"))
    spend
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_custkey"), col("spend"))
      // long, not Spark's int: the oracle's ntile is BIGINT and the gate
      // compares dtype-strict
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("n_name", "decile")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend").cast(DecimalType(18, 2))).cast("double").as("total_spend"))
  }

  private val windowDecilePerNationSql =
    """WITH spend AS (
      |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |  FROM orders GROUP BY o_custkey),
      | deciled AS (
      |  SELECT n_name, o_custkey, spend,
      |    ntile(10) OVER (PARTITION BY n_name ORDER BY spend DESC, o_custkey) AS decile
      |  FROM spend JOIN customer ON o_custkey = c_custkey
      |    JOIN nation ON c_nationkey = n_nationkey)
      |SELECT n_name, decile, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      |FROM deciled GROUP BY n_name, decile""".stripMargin

  // ---- exact distinct count per group ------------------------------------
  def distinctParts(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_suppkey")
      .agg(countDistinct(col("l_partkey")).as("n_parts"), count(lit(1)).as("n_lines"))

  private val distinctPartsSql =
    "SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_lines FROM lineitem GROUP BY l_suppkey"

  // ---- as-of join: last view before each purchase ------------------------
  /** Composed as-of join (Spark has no native one): single shuffle on
    * user_id + one in-partition sort, NOT an O(n²) range join — the running
    * max of view-timestamps over the time-ordered union gives each purchase
    * its most recent prior view. Identical shape at 100 TB (one shuffle). */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .withColumn("last_view_ts", max(when(col("event_type") === "view", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("last_view_ts"))
  }

  private val asofJoinSql =
    """SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS purchase_ts,
      |       MAX(v.ts) AS last_view_ts
      |FROM events p LEFT JOIN events v
      |  ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.event_id, p.user_id, p.ts""".stripMargin

  // ---- q15: top supplier by quarterly revenue ----------------------------
  /** Scalar-max selection over an already-aggregated (supplier-grained)
    * frame via the crossJoin(broadcast(1-row agg)) idiom (same as q11) —
    * no global window, so no "move all data to a single partition"
    * WindowExec even if the aggregate ever grows past dim size. The
    * aggregate is materialized once (it feeds both the 1-row max and the
    * probe side). */
  def q15(s: SparkSession, d: String): DataFrame = {
    val rev = graft.Checkpoints.materialize(
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).as("tr")))
    val top = rev
      .crossJoin(broadcast(rev.agg(max("tr").as("mx"))))
      .filter(col("tr") === col("mx"))
    Tables.supplier(s, d).join(broadcast(top), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("tr").cast("double").as("total_revenue"))
  }

  private val q15Sql =
    s"""WITH rev AS (SELECT l_suppkey, SUM($revSql) AS tr
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_revenue
       |FROM supplier JOIN rev ON s_suppkey = l_suppkey
       |WHERE tr = (SELECT MAX(tr) FROM rev)""".stripMargin

  // ---- q17: small-quantity revenue vs 1/5 of the per-part average --------
  /** The correlated-average predicate is rewritten in EXACT integer/decimal
    * arithmetic — qty < 0.2·avg(qty) ⟺ 5·qty·n < sum(qty) — so both
    * engines agree bit-for-bit (no double division at the boundary). */
  def q17(s: SparkSession, d: String): DataFrame = {
    val perPart = Tables.lineitem(s, d).groupBy(col("l_partkey").as("pk"))
      .agg(sum(dec(col("l_quantity"), 2)).as("sum_qty"), count(lit(1)).as("n_li"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#23")),
        col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(dec(col("l_quantity"), 2) * 5 * col("n_li") < col("sum_qty"))
      .agg((sum(dec(col("l_extendedprice"), 2)).cast("double") / 7.0).as("avg_yearly"))
  }

  private val q17Sql =
    """WITH pp AS (SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
      |                   COUNT(*) AS n_li
      |            FROM lineitem GROUP BY l_partkey)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN pp ON pk = l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * n_li < sum_qty""".stripMargin

  // ---- q7: bi-nation volume shipping by year -----------------------------
  /** Two broadcast nation lookups (supplier-side, customer-side) over the
    * lineitem↔orders shuffle join; the OR-of-nation-pairs predicate filters
    * before the year aggregation. */
  def q7(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").between(ts("1995-01-01"), ts("1996-12-31")))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
        || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
  }

  private val q7Sql =
    s"""SELECT supp_nation, cust_nation, l_year,
       |  CAST(SUM($revSql) AS DOUBLE) AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |         EXTRACT(year FROM l_shipdate) AS l_year,
       |         l_extendedprice, l_discount
       |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       |    AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31')
       |GROUP BY supp_nation, cust_nation, l_year""".stripMargin

  // ---- q8: market share of one supplier nation in a region ---------------
  /** Conditional-share aggregation over a 7-table join; numerator and
    * denominator are exact decimal sums, divided once in double. */
  def q8(s: SparkSession, d: String): DataFrame = {
    val custNation = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val suppNation = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val zero = lit(0).cast(DecimalType(18, 4))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate").between(ts("1995-01-01"), ts("1996-12-31"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("c_nk"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .withColumn("volume", revenue(col("l_extendedprice"), col("l_discount")))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_3", col("volume")).otherwise(zero))
          .cast("double")
        / sum(col("volume")).cast("double")).as("mkt_share"))
  }

  private val q8Sql =
    s"""WITH all_nations AS (
       |  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
       |         $revSql AS volume,
       |         n2.n_name AS supp_nation
       |  FROM part JOIN lineitem ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |  JOIN region ON n1.n_regionkey = r_regionkey
       |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
       |    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31')
       |SELECT o_year,
       |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
       |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
       |FROM all_nations GROUP BY o_year""".stripMargin

  // ---- range join (bucketized — the operator Spark lacks natively) -------
  /** Price-tier classification via a RANGE JOIN, in its scalable form:
    * instead of the non-equi `price BETWEEN lo AND hi` (which Spark can
    * only execute as a nested-loop), each band is EXPLODED into the fixed-
    * width buckets it covers and the fact side computes its bucket with one
    * division — turning the range join into an equi-join on bucket plus a
    * residual range filter. At 100 TB both sides shuffle/broadcast on the
    * bucket key; no BNLJ regardless of band-table size. The DuckDB oracle
    * keeps the literal BETWEEN form, proving the rewrite's semantics. */
  def rangeJoinPriceTiers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = 25000L // bucket width: bands explode into ≤ a handful of buckets
    val bands = Seq(
      (0L, 5000L, "budget"), (5000L, 20000L, "mid"),
      (20000L, 60000L, "premium"), (60000L, 200000L, "luxury"))
      .toDF("lo", "hi", "tier")
      .withColumn("bucket", explode(sequence(expr(s"lo div $W"), expr(s"(hi - 1) div $W"))))
    Tables.lineitem(s, d)
      .withColumn("bucket", expr(s"CAST(l_extendedprice AS BIGINT) div $W"))
      .join(broadcast(bands),
        Seq("bucket")) // equi on bucket …
      .filter(col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi")) // … + residual
      .groupBy("tier")
      .agg(count(lit(1)).as("n_lines"),
        sumExact(col("l_extendedprice"), 2).as("total_price"))
  }

  private val rangeJoinPriceTiersSql =
    """WITH bands(lo, hi, tier) AS (VALUES
      |  (0, 5000, 'budget'), (5000, 20000, 'mid'),
      |  (20000, 60000, 'premium'), (60000, 200000, 'luxury'))
      |SELECT tier, COUNT(*) AS n_lines,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM lineitem JOIN bands
      |  ON l_extendedprice >= lo AND l_extendedprice < hi
      |GROUP BY tier""".stripMargin

  // ---- skew-safe shapes (functions/Skew.scala helpers, proven here) ------
  /** Revenue per order priority through a SALTED fact↔fact join: lineitem
    * (probe, salted 8 ways on a row-identifying hash) ⋈ orders (build,
    * replicated per salt, shuffle_hash-hinted so the demo exercises the
    * salted SHUFFLE even where the test-SF build side would auto-broadcast).
    * Results are identical to the plain join — only the shuffle key gains
    * the salt, so one hot orderkey spreads over 8 tasks. The at-100 TB use:
    * fact↔mid-size-dim joins with hot keys that AQE's skew splitting can't
    * reach (e.g. a single partition-filling key). PlanSpec asserts the
    * `_salt` column reaches the exchange. */
  def saltedJoinVolume(s: SparkSession, d: String): DataFrame = {
    val build = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      .hint("shuffle_hash")
    graft.functions.Skew.saltedJoin(
        Tables.lineitem(s, d), build, "l_orderkey", 8,
        struct(col("l_orderkey"), col("l_linenumber")))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
  }

  private val saltedJoinVolumeSql =
    s"""SELECT o_orderpriority, COUNT(*) AS n_lines,
       | CAST(SUM($revSql) AS DOUBLE) AS revenue
       |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
       |GROUP BY o_orderpriority""".stripMargin

  // ---- bloom-filter semi-join pruning -------------------------------------
  // m = 2^17 bits packed into 2048 BIGINT words; at the selective-order
  // cardinalities this targets (n ≈ thousands), fpp ≈ n/m ≈ low percent —
  // false positives only cost a wasted probe row, the exact join removes
  // them from the RESULT.
  private val BloomBits = 1L << 17

  /** Semi-join with an EXPLICIT Bloom pre-filter on the probe side:
    * revenue per return flag over lineitems of high-value URGENT orders.
    * The selective order-key set is folded into a bit-packed Bloom filter
    * (groupBy word → bit_or of set bits — one map-side-combinable
    * aggregate, 2048-row result), broadcast, and applied to the fact scan
    * BEFORE the exact key join: at 100 TB this is the difference between
    * shuffling the full lineitem table into the join and shuffling only
    * the ~matching fraction (Spark's own runtime row-level filtering does
    * this under thresholds; the explicit operator makes the device
    * available where the optimizer declines — cross-format sources,
    * pre-computed filters reused across queries). No false negatives →
    * the final inner semi join keeps the result EXACT, so the oracle is
    * the plain semi-join SQL with no bloom replay needed; AnalyticsSpec
    * measures the pre-filter's actual selectivity to prove it prunes. */
  def bloomPruneJoin(s: SparkSession, d: String): DataFrame = {
    val sel = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0)
      .select("o_orderkey")
    bloomPruneLineitem(s, d, sel)
      .join(sel, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
  }

  /** The reusable pre-filter half: lineitem rows surviving the Bloom test
    * against `sel`'s o_orderkey set (superset of the true matches). */
  def bloomPruneLineitem(
      s: SparkSession, d: String, sel: DataFrame): DataFrame = {
    // xxhash64, NOT the md5 cross-engine device: the bloom layer never
    // reaches the oracle (the exact join decides the result), so the
    // hash only needs to be fast and consistent within Spark — and
    // xxhash64 is codegen'd, ~an order cheaper per fact row than md5.
    def hb(key: Column): Column = pmod(xxhash64(key), lit(BloomBits))
    val bits = sel
      .select(hb(col("o_orderkey")).as("hb"))
      .groupBy(shiftright(col("hb"), 6).as("word"))
      .agg(expr("bit_or(shiftleft(1L, CAST(hb % 64 AS INT)))").as("w"))
    Tables.lineitem(s, d)
      .withColumn("hb", hb(col("l_orderkey")))
      .withColumn("word", shiftright(col("hb"), 6))
      .join(broadcast(bits), Seq("word"))
      .filter(expr("(shiftright(w, CAST(hb % 64 AS INT)) & 1) = 1"))
      .drop("hb", "word", "w")
  }

  private val bloomPruneJoinSql =
    s"""SELECT l_returnflag, COUNT(*) AS n_lines,
       | CAST(SUM($revSql) AS DOUBLE) AS revenue
       |FROM lineitem
       |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
       |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000)
       |GROUP BY l_returnflag""".stripMargin

  /** Exact distinct users per event type via the two-phase salted distinct
    * (count distinct within (key, hash-salted value) groups, sum partials):
    * a key with millions of distinct values never sits in one task. */
  def skewDistinctUsers(s: SparkSession, d: String): DataFrame =
    graft.functions.Skew.skewSafeDistinctCount(
        Tables.events(s, d), col("event_type"), col("user_id"), 8, "n_users")
      .select(col("_k").as("event_type"), col("n_users"))

  private val skewDistinctUsersSql =
    """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events GROUP BY event_type""".stripMargin

  override def entries: Seq[(String, QueryFn, Option[String])] = Seq(
    ("range_join_price_tiers", rangeJoinPriceTiers _, Some(rangeJoinPriceTiersSql)),
    ("bloom_prune_join", bloomPruneJoin _, Some(bloomPruneJoinSql)),
    ("skew_salted_join_volume", saltedJoinVolume _, Some(saltedJoinVolumeSql)),
    ("skew_distinct_users", skewDistinctUsers _, Some(skewDistinctUsersSql)),
    ("q7_bination_volume", q7 _, Some(q7Sql)),
    ("q8_market_share", q8 _, Some(q8Sql)),
    ("q15_top_supplier", q15 _, Some(q15Sql)),
    ("q17_small_qty_revenue", q17 _, Some(q17Sql)),
    ("q1_pricing_summary", q1 _, Some(q1Sql)),
    ("q3_top_orders", q3 _, Some(q3Sql)),
    ("q5_local_supplier_volume", q5 _, Some(q5Sql)),
    ("q6_revenue_forecast", q6 _, Some(q6Sql)),
    ("q10_returned_items", q10 _, Some(q10Sql)),
    ("q13_customer_distribution", q13 _, Some(q13Sql)),
    ("q14_promo_effect", q14 _, Some(q14Sql)),
    ("q18_large_orders", q18 _, Some(q18Sql)),
    ("q19_bracket_predicates", q19 _, Some(q19Sql)),
    ("q4_order_priority", q4 _, Some(q4Sql)),
    ("anti_join_inactive_customers", antiJoin _, Some(antiJoinSql)),
    ("window_topk_per_group", topkPerGroup _, Some(topkPerGroupSql)),
    ("window_running_total", runningTotal _, Some(runningTotalSql)),
    ("rollup_nation_status", rollupAgg _, Some(rollupAggSql)),
    ("cube_priority_status", cubeAgg _, Some(cubeAggSql)),
    ("window_decile_per_nation", windowDecilePerNation _, Some(windowDecilePerNationSql)),
    ("distinct_supplier_parts", distinctParts _, Some(distinctPartsSql)),
    ("asof_join_latest_order", asofJoin _, Some(asofJoinSql)))
}
