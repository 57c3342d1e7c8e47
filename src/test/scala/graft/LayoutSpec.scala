package graft

import graft.sources.Layout
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bucketed layout must actually eliminate shuffles: co-bucketed joins
  * and per-key windows read pre-clustered buckets with no Exchange. */
class LayoutSpec extends SparkSpec {

  private val db = s"layout_test_${System.nanoTime()}"

  test("bucketed layout: key joins and LWW windows run shuffle-free") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      val events = Tables.events(spark, sf)
      Layout.writeBucketed(events, s"$db.events_b", "user_id", 8, Seq("ts"))
      val b = spark.table(s"$db.events_b")

      // per-key LWW window over the bucketed table: no shuffle
      val lww = b.withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))))
        .filter(col("rn") === 1)
      lww.collect()
      val lwwPlan = lww.queryExecution.executedPlan.toString()
      assert(!lwwPlan.contains("Exchange hashpartitioning"),
        s"LWW window over bucketed table must not shuffle:\n${lwwPlan.take(800)}")

      // co-bucketed self-join on the bucket key: no shuffle exchange
      // (disable broadcast so the bucket-aware sort-merge path is chosen,
      // as it would be at 100 TB where neither side broadcasts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      try {
        val agg = b.groupBy("user_id").agg(count(lit(1)).as("n"))
        val joined = b.join(agg, "user_id")
        joined.collect()
        val joinPlan = joined.queryExecution.executedPlan.toString()
        assert(!joinPlan.contains("Exchange hashpartitioning"),
          s"co-bucketed join must not shuffle:\n${joinPlan.take(800)}")
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)

      // results identical to the unbucketed computation
      val expected = events.groupBy("user_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = b.groupBy("user_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("incremental compaction merge over co-bucketed base+delta is exchange-free") {
    import graft.operators.WideColumn
    val db3 = s"layout_ic_${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db3")
    try {
      val cutoff = lit("2024-01-15").cast("timestamp")
      val ev = Tables.events(spark, sf)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      Layout.writeBucketed(
        WideColumn.compactLww(ev.filter(col("ts") < cutoff).withColumn("tomb", lit(0L))),
        s"$db3.base_c", "user_id", 8, Seq("event_type"))
      Layout.writeBucketed(
        WideColumn.compactLww(ev.filter(col("ts") >= cutoff).withColumn("tomb", lit(0L))),
        s"$db3.delta_c", "user_id", 8, Seq("event_type"))
      // broadcast off: prove the co-bucketed sort-merge path (at 100 TB the
      // base never broadcasts; a bucketed delta merges with NO exchange)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      try {
        val merged = WideColumn.mergeCompacted(
          spark.table(s"$db3.base_c"), spark.table(s"$db3.delta_c"))
        merged.collect()
        val plan = merged.queryExecution.executedPlan.toString()
        assert(!plan.contains("Exchange hashpartitioning"),
          s"incremental compaction must not shuffle the base:\n${plan.take(800)}")
        // defining property: incremental merge == one-shot recompaction
        val got = merged.filter(col("tomb") === 0L)
          .select("user_id", "event_type", "ts", "event_id").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3))).toSet
        val expected = WideColumn.compactLww(ev.withColumn("tomb", lit(0L)))
          .select("user_id", "event_type", "ts", "event_id").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3))).toSet
        assert(got == expected)
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db3 CASCADE")
  }

  test("time-partitioned layout prunes directories on time-range predicates") {
    val db2 = s"layout_tp_${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db2")
    try {
      Layout.writeTimePartitioned(Tables.events(spark, sf), s"$db2.events_tp", "ts")
      val t = spark.table(s"$db2.events_tp")
      val sliced = t.filter(col("p_date") === "2024-01-05")
      val plan = sliced.queryExecution.executedPlan.toString()
      assert("PartitionFilters: \\[[^\\]]*p_date".r.findFirstIn(plan).isDefined,
        s"date predicate must prune partitions:\n${plan.take(600)}")
      // partition pruning must not change results
      val expected = Tables.events(spark, sf)
        .filter(to_date(col("ts")) === "2024-01-05").count()
      assert(sliced.count() == expected && expected > 0)
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db2 CASCADE")
  }

  test("token function matches the wide-column token-range scan definition") {
    import org.apache.spark.sql.functions.lit
    val r = spark.range(1).select(Layout.token(lit(42L)).as("t")).head().getLong(0)
    assert(r == (42L * 2654435761L) % 1000000007L)
  }

  test("zValue is the exact bit interleave of its inputs") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(42)
    val cases = Seq((0L, 0L), (255L, 255L), (1L, 0L), (0L, 1L), (170L, 85L)) ++
      Seq.fill(20)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    def ref(a: Long, b: Long): Long =
      (0 until 8).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    cases.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 8).as("z"))
      .collect()
      .foreach { r =>
        assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1)),
          s"zValue(${r.getLong(0)}, ${r.getLong(1)}) = ${r.getLong(2)}")
      }
  }

  test("z-order layout prunes files on BOTH dimensions, single-dim sort on one") {
    def fileStats(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("l_suppkey")).cast("long").as("smin"),
        max(col("l_suppkey")).cast("long").as("smax"),
        min(col("l_partkey")).cast("long").as("pmin"),
        max(col("l_partkey")).cast("long").as("pmax"))
      .collect()
    // a suppkey band around the middle of the value range (SF-independent)
    val (sLo, sHi, pLo, pHi) = {
      val r = Tables.lineitem(spark, sf)
        .agg(min("l_suppkey"), max("l_suppkey"), min("l_partkey"), max("l_partkey")).head()
      def band(lo: Long, hi: Long) = {
        val mid = lo + (hi - lo) / 2; (mid, mid + math.max(1L, (hi - lo) / 10))
      }
      val s = band(r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)
      val p = band(r.getAs[Number](2).longValue, r.getAs[Number](3).longValue)
      (s._1, s._2, p._1, p._2)
    }
    def overlapFrac(st: Array[org.apache.spark.sql.Row],
        mn: String, mx: String, lo: Long, hi: Long) =
      st.count(r => r.getAs[Long](mn) <= hi && r.getAs[Long](mx) >= lo)
        .toDouble / st.length
    val z = fileStats(Layout.zorderedLineitemDir(spark, sf))
    assert(z.length >= 32, s"expected many z-files, got ${z.length}")
    // comparison layout: single-dim sort by partkey (the classic layout)
    val linDir = java.nio.file.Files.createTempDirectory("graft_lin").toString
    try {
      Tables.lineitem(spark, sf)
        .select("l_partkey", "l_suppkey", "l_returnflag")
        .repartitionByRange(64, col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite").parquet(linDir)
      val lin = fileStats(linDir)
      val zS = overlapFrac(z, "smin", "smax", sLo, sHi)
      val linS = overlapFrac(lin, "smin", "smax", sLo, sHi)
      // partkey-sorted files each span the full suppkey range → no pruning;
      // z-files cover key-space rectangles → a suppkey band skips most files
      assert(zS < linS && zS <= 0.85,
        s"z-order must prune on the SECOND dim: z=$zS vs linear=$linS")
      // and the z layout still prunes on partkey as well
      val zP = overlapFrac(z, "pmin", "pmax", pLo, pHi)
      assert(zP <= 0.85, s"z-order must prune on the first dim too: $zP")
    } finally {
      import java.nio.file._
      import java.util.Comparator
      Files.walk(Paths.get(linDir)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}
