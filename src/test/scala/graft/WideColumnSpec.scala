package graft

import graft.operators.WideColumn
import org.apache.spark.sql.functions._

class WideColumnSpec extends SparkSpec {

  test("every wide-column entry runs") {
    WideColumn.entries.foreach { case (name, fn, _) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      df.collect()
    }
  }

  test("CAS insert: applied iff key absent, existing rows always win") {
    val rows = WideColumn.casInsert(spark, sf).collect()
    assert(rows.length == 4)
    val existing = Tables.customer(spark, sf)
      .filter(col("c_custkey").isin(123L, 124L, 10000001L, 10000002L))
      .collect().map(r => r.getAs[Long]("c_custkey") -> r.getAs[String]("c_name")).toMap
    rows.foreach { r =>
      val key = r.getAs[Long]("user_key")
      assert(r.getAs[Boolean]("applied") == !existing.contains(key))
      assert(r.getAs[String]("final_name") ==
        existing.getOrElse(key, r.getAs[String]("proposed_name")))
    }
  }

  test("cursor page: strictly after the cursor, clustering order, one page") {
    // partition key 42 is empty at sf0.001 (like partitionLookup there);
    // the paging semantics need a populated partition → assert at sf01,
    // the driver's correctness scale
    val cutMs = java.sql.Timestamp.valueOf("2024-01-15 00:00:00").getTime
    val rows = WideColumn.pageAfterCursor(spark, sf01).orderBy("rn").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getAs[Long]("rn")).toSeq == (1L to rows.length))
    rows.foreach { r =>
      val ts = r.getAs[java.sql.Timestamp]("ts").getTime
      assert(ts < cutMs || (ts == cutMs && r.getAs[Long]("event_id") < 500000L))
    }
    val keys = rows.map(r => (r.getAs[java.sql.Timestamp]("ts").getTime,
      r.getAs[Long]("event_id")))
    assert(keys.sameElements(keys.sortBy(k => (-k._1, -k._2))), "not clustering DESC")
    // stitches with page 1: these are exactly the next rows of the full
    // partition read after the cursor position
    val full = WideColumn.partitionLookup(spark, sf01).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Long]("event_id")))
      .sortBy(k => (-k._1, -k._2))
    val expected = full.filter(k => k._1 < cutMs || (k._1 == cutMs && k._2 < 500000L))
      .take(20)
    assert(keys.sameElements(expected))
  }

  test("partition lookup returns only the requested partition, newest first") {
    val rows = WideColumn.partitionLookup(spark, sf)
      .orderBy("rn").collect()
    assert(rows.forall(_.getAs[Long]("user_id") == 42L))
    val tss = rows.map(_.getAs[java.sql.Timestamp]("ts").getTime)
    assert(tss.sameElements(tss.sorted(Ordering[Long].reverse)), "not clustering DESC")
  }

  test("LWW upsert keeps exactly one row per (user_id, event_type)") {
    val df = WideColumn.upsertLww(spark, sf)
    assert(df.groupBy("user_id", "event_type").count().filter(col("count") > 1).count() == 0)
  }

  test("batch insert upserts: second click write wins") {
    val rows = WideColumn.batchInsert(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("latest_value")).toMap
    assert(rows == Map("signup" -> 1.0, "click" -> 3.0))
  }

  test("tombstone delete: markers shadow old writes, newer writes survive") {
    val live = WideColumn.deleteTombstone(spark, sf).collect()
      .map(r => r.getString(1) -> r.getAs[java.sql.Timestamp]("write_ts")).toMap
    val tombTs = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val latest = WideColumn.upsertLww(spark, sf)
      .filter(col("user_id") === 42).collect()
      .map(r => r.getString(1) -> r.getAs[java.sql.Timestamp]("write_ts")).toMap
    latest.foreach { case (etype, ts) =>
      if (Set("click", "view")(etype) && !ts.after(tombTs))
        assert(!live.contains(etype), s"$etype written at $ts should be tombstoned")
      else {
        assert(live.contains(etype), s"$etype should survive")
        assert(live(etype) == ts, s"$etype must keep its latest write")
      }
    }
  }

  test("timeuuid generation: globally unique, per-partition monotonic, sequence in bounds") {
    val rows = WideColumn.timeuuidGen(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ids") == r.getAs[Long]("n_unique"),
        s"user ${r.getLong(0)}: duplicate generated ids")
      assert(r.getAs[Boolean]("monotonic"),
        s"user ${r.getLong(0)}: ids must increase along the clustering order")
      assert(r.getAs[Boolean]("seq_ok"),
        s"user ${r.getLong(0)}: per-(ms,node) sequence overflowed 10 bits")
    }
    // GLOBAL uniqueness, not just per-partition: min/max id ranges of
    // distinct users can interleave, so count distinct across everyone
    val n = Tables.events(spark, sf).count()
    val idFrame = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"),
        pmod(col("user_id"), lit(1024L)).as("node"))
      .withColumn("seq", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("ts_ms", "node").orderBy("user_id", "event_id"))
        .cast("long") - 1L)
      .select((col("ts_ms") * lit(1048576L) + col("node") * lit(1024L) + col("seq"))
        .as("gen_id"))
    assert(idFrame.distinct().count() == n, "generated ids must be globally unique")
  }

  test("consistency ladder: QUORUM is never staler than ONE, and truth wins") {
    val rows = WideColumn.quorumRead(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, one, q) = (r.getAs[Long]("n_keys"),
        r.getAs[Long]("one_stale"), r.getAs[Long]("quorum_stale"))
      assert(q <= one, s"${r.getString(0)}: quorum_stale $q > one_stale $one")
      assert(one <= n && q >= 0L)
    }
    // the 5% single-replica miss rate must show up as SOME ONE-staleness
    // at sf0.01 (10k writes × ~1/20), while double-misses are rare
    assert(rows.map(_.getAs[Long]("one_stale")).sum > 0L, "no ONE staleness seen")
  }

  test("read repair: repair counts bound by 2 per mismatched key, ids resolve") {
    val rows = WideColumn.readRepair(spark, sf01).collect()
    rows.foreach { r =>
      val (n, mism, reps) = (r.getAs[Long]("n_keys"),
        r.getAs[Long]("mismatched_keys"), r.getAs[Long]("replica_repairs"))
      assert(mism <= n)
      // the winning replica never repairs itself: ≤ 2 pushes per key
      assert(reps <= 2L * mism, s"${r.getString(0)}: $reps repairs for $mism keys")
      assert(r.getAs[Long]("resolved_id_sum") > 0L)
    }
  }

  test("hinted handoff: only the down node holds hints, and replay converges") {
    val rows = WideColumn.hintedHandoff(spark, sf01).collect()
    assert(rows.map(_.getAs[Long]("node")).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    rows.foreach { r =>
      val node = r.getAs[Long]("node")
      if (node == 2L) {
        assert(r.getAs[Long]("n_hints") > 0L, "down node collected no hints")
        assert(r.getAs[Long]("stale_keys_during_outage") > 0L,
          "outage produced no stale reads — the window model is broken")
      } else {
        assert(r.getAs[Long]("n_hints") == 0L)
        assert(r.getAs[Long]("stale_keys_during_outage") == 0L)
      }
      // replay is verified by RECONSTRUCTION (live ∪ hint-store LWW head
      // vs the original stream's head per key), not an arithmetic identity
      assert(r.getAs[Long]("post_replay_stale_keys") == 0L)
      assert(r.getAs[Boolean]("handoff_complete"))
    }
  }

  test("anti-entropy: per range, digest mismatch ⟺ a differing write exists") {
    // the Merkle claim the entry's doc makes (ADVICE r7): a token range's
    // digests disagree exactly when some write's presence differs between
    // the two replicas (xfer counts those writes). xfer>0 → mismatch can
    // only fail on an XOR hash collision of the differing set — assert it
    // doesn't on this corpus (no false negatives), and mismatch → xfer>0
    // structurally (identical member sets XOR to identical digests).
    val ranges = WideColumn.antiEntropyRanges(spark, sf01).collect()
    assert(ranges.nonEmpty)
    assert(ranges.exists(_.getAs[Boolean]("mismatch")),
      "corpus produced no divergent range — the presence model is broken")
    ranges.foreach { r =>
      val mismatch = r.getAs[Boolean]("mismatch")
      val xfer = r.getAs[Long]("xfer")
      assert(mismatch == (xfer > 0L),
        s"pair ${r.getAs[String]("pair")} bucket ${r.getAs[Long]("bucket")}: " +
          s"mismatch=$mismatch but xfer=$xfer — digest and membership disagree")
    }
  }

  test("vnode rebalance: rendezvous hashing moves rows ONLY to the new node") {
    val rows = WideColumn.vnodeRebalance(spark, sf01).collect()
    val moved = rows.filter(r => r.getAs[Long]("old_owner") != r.getAs[Long]("new_owner"))
    assert(moved.nonEmpty, "a 5th node must steal some vnodes")
    moved.foreach { r =>
      assert(r.getAs[Long]("new_owner") == 4L,
        s"old→old reshuffle detected (${r.getAs[Long]("old_owner")} → " +
          s"${r.getAs[Long]("new_owner")}): rendezvous must only steal for the new node")
    }
    // expected steal fraction is 1/5 of the OBSERVED ring (the data may
    // not populate all 64 vnodes at small scale); generous binomial bounds
    val totalVnodes = rows.map(_.getAs[Long]("n_vnodes")).sum
    val movedVnodes = moved.map(_.getAs[Long]("n_vnodes")).sum
    assert(totalVnodes > 0L && totalVnodes <= 64L)
    assert(movedVnodes * 100 >= totalVnodes * 5 && movedVnodes * 100 <= totalVnodes * 40,
      s"steal fraction $movedVnodes/$totalVnodes far from the expected 1/5")
  }

  test("partition-key filter is pushed to the parquet scan") {
    val plan = WideColumn.partitionLookup(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("user_id"), plan.take(500))
  }

  test("projection scan prunes to the 3 requested columns") {
    val plan = WideColumn.projectionScan(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("c_mktsegment"), "unused column not pruned:\n" + plan.take(500))
  }
}
