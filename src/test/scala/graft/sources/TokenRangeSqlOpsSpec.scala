package graft.sources.connector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL time travel (`VERSION AS OF` / `TIMESTAMP AS OF` through the
  * catalog's loadTable overloads) and the maintenance-procedure surface
  * (`CALL cat.system.<proc>(…)` — the nodetool/OPTIMIZE analog routed to
  * the TokenRangeOps primitives). */
class TokenRangeSqlOpsSpec extends SparkSpec {

  private def freshCat(tag: String): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_sqlops_$tag").toString
    val cat = s"graft_sqlops_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[TokenRangeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ks")
    (cat, wh)
  }

  test("insert='upsert': SQL INSERT replaces by key — CQL's INSERT semantic (r17)") {
    val (cat, wh) = freshCat("insup")
    spark.sql(s"""CREATE TABLE $cat.ks.t (pk BIGINT, v STRING)
      TBLPROPERTIES('pk'='pk', 'insert'='upsert')""")
    val path = new java.io.File(new java.io.File(wh, "ks"), "t").getAbsolutePath
    TokenRangeOps.enableChangeFeed(path)
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id) FROM range(0, 16)")
    val before = TokenRangeOps.liveFiles(path).toSet
    // the second INSERT overlaps keys 8..15: CQL semantics = replaced
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('b', id) FROM range(8, 24)")
    val after = TokenRangeOps.liveFiles(path).toSet
    assert(before.subsetOf(after),
      "insert-upsert is a BLIND write: no pre-existing file is read, " +
        "rewritten or retired — old generations are vector-suppressed")
    assert(TokenRangeSource.dvBindings(path).nonEmpty,
      "the overlapping keys' files must carry a key vector")
    val t = spark.sql(s"SELECT pk, v FROM $cat.ks.t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(t.size == 24, s"no key may duplicate, got ${t.size}")
    assert(t(3L) == "a3" && t(8L) == "b8" && t(15L) == "b15" && t(23L) == "b23")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ks.t").head().getLong(0) == 24L)
    // the change feed records TRUE update images for the replaced keys
    val feed = spark.sql(s"SELECT _change_type, pk, v FROM $cat.ks.`t$$changes`")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(feed.count(x => x._1 == "update_preimage" && x._2 == 8L && x._3 == "a8") == 1)
    assert(feed.count(x => x._1 == "update_postimage" && x._2 == 8L && x._3 == "b8") == 1)
    assert(feed.count(x => x._1 == "insert" && x._2 == 23L) == 1)
    // compaction applies the generations physically; result unchanged
    TokenRangeOps.compact(spark, path, "pk")
    assert(TokenRangeSource.dvBindings(path).isEmpty)
    assert(spark.sql(s"SELECT v FROM $cat.ks.t WHERE pk = 9").head().getString(0) == "b9")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ks.t").head().getLong(0) == 24L)
    // a DISJOINT insert stays a plain append (no vector, no read)
    val b2 = TokenRangeOps.liveFiles(path).toSet
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('c', id) FROM range(100, 104)")
    assert(TokenRangeSource.dvBindings(path).isEmpty,
      "disjoint keys need no vector — the append is already exact")
    assert(b2.subsetOf(TokenRangeOps.liveFiles(path).toSet))
    // refusals: clustered tables, unknown modes
    val ex = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.ks.bad (pk BIGINT, ck BIGINT, v STRING)
        TBLPROPERTIES('pk'='pk', 'ck'='ck', 'insert'='upsert')""")
    }
    assert(ex.getMessage.contains("unclustered"), ex.getMessage)
    val ex2 = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.ks.bad2 (pk BIGINT, v STRING)
        TBLPROPERTIES('pk'='pk', 'insert'='wat')""")
    }
    assert(ex2.getMessage.contains("'upsert'"), ex2.getMessage)
  }

  test("`t$history` metadata table: DESCRIBE HISTORY by name through plain SQL (r17)") {
    val (cat, wh) = freshCat("hist")
    spark.sql(s"CREATE TABLE $cat.ks.t (pk BIGINT, v STRING) " +
      "TBLPROPERTIES('pk'='pk', 'dml'='mor')")
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id) FROM range(0, 16)")
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('b', id) FROM range(16, 24)")
    spark.sql(s"DELETE FROM $cat.ks.t WHERE v = 'a3'") // position vector
    val path = new java.io.File(new java.io.File(wh, "ks"), "t").getAbsolutePath
    TokenRangeOps.compact(spark, path, "pk")
    val h = spark.sql(
      s"SELECT version, n_files, op, deletion_vectors " +
        s"FROM $cat.ks.`t$$history` ORDER BY version").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(h.map(_._1).toSeq == TokenRangeSource.versions(path),
      s"one row per retained version, got ${h.toSeq}")
    // the log ends (…appends, delete, compact); any bootstrap version
    // before the loads is an (empty) append
    assert(h.map(_._3).takeRight(2).toSeq == Seq("delete", "compact") &&
      h.map(_._3).dropRight(2).forall(_ == "append"),
      s"op kinds must match the commit log, got ${h.map(_._3).toSeq}")
    // the vector delete's version carries its binding census; the
    // compacted head is debt-free and merges the history's net content
    val del = h(h.length - 2); val cmp = h.last
    assert(del._4 >= 1 && cmp._4 == 0, h.toSeq.toString)
    assert(cmp._2 >= 1 && del._2 >= cmp._2,
      "compaction folds files; counts are per-version censuses")
    // committed_at is a real timestamp, non-decreasing with version
    val ts = spark.sql(s"SELECT committed_at FROM $cat.ks.`t$$history` " +
      "ORDER BY version").collect().map(_.getTimestamp(0).getTime)
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
    // read-only + shadowing contract: the suffix form resolves only
    // while no real table owns the name
    val ex = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.ks.`t$$history` VALUES (1, now(), 1, 'x', 0)")
    }
    assert(ex.getMessage != null)
  }

  test("VERSION AS OF / TIMESTAMP AS OF serve the pinned file list and the pinned schema") {
    val (cat, wh) = freshCat("tt")
    spark.sql(s"CREATE TABLE $cat.ks.t (pk BIGINT, v STRING) " +
      "TBLPROPERTIES('pk'='pk')")
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id) FROM range(0, 10)")
    val path = new java.io.File(new java.io.File(wh, "ks"), "t").getAbsolutePath
    val vAfterFirst = TokenRangeSource.versions(path).last
    val tAfterFirst = System.currentTimeMillis()
    Thread.sleep(20)
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id) FROM range(10, 25)")
    spark.sql(s"ALTER TABLE $cat.ks.t ADD COLUMNS (extra STRING)")
    // current view: 25 rows, 3 columns
    assert(spark.sql(s"SELECT * FROM $cat.ks.t").columns.length == 3)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.ks.t").head.getLong(0) == 25)
    // VERSION AS OF: the first commit's rows AND its pre-ALTER schema
    val pinned = spark.sql(s"SELECT * FROM $cat.ks.t VERSION AS OF $vAfterFirst")
    assert(pinned.columns.toSeq == Seq("pk", "v"),
      "the pin serves that version's OWN schema")
    assert(pinned.count() == 10)
    // TIMESTAMP AS OF resolves through the manifest mtimes
    val ts = spark.sql(
      s"SELECT COUNT(*) FROM $cat.ks.t TIMESTAMP AS OF " +
        s"timestamp_millis(${tAfterFirst})")
    assert(ts.head.getLong(0) == 10)
    // a version number beyond history refuses loudly
    assert(intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.ks.t VERSION AS OF 9999").collect()
    }.getMessage.contains("no version"))
  }

  test("CALL system.compact / set_retention / vacuum: maintenance through SQL") {
    val (cat, wh) = freshCat("proc")
    spark.sql(s"CREATE TABLE $cat.ks.t (pk BIGINT, v STRING) " +
      "TBLPROPERTIES('pk'='pk')")
    (0 until 4).foreach { r =>
      spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id) " +
        s"FROM range(${r * 10}, ${(r + 1) * 10})")
    }
    val path = new java.io.File(new java.io.File(wh, "ks"), "t").getAbsolutePath
    val filesBefore = TokenRangeSource.visibleRelFiles(path, None).size
    spark.sql(s"CALL $cat.system.compact('ks.t')")
    val byBucket = TokenRangeSource.visibleRelFiles(path, None)
      .groupBy(_._1).view.mapValues(_.size)
    assert(byBucket.values.forall(_ == 1),
      s"one file per bucket after CALL compact (before: $filesBefore)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.ks.t").head.getLong(0) == 40)
    // retention + vacuum through CALL
    spark.sql(s"CALL $cat.system.set_retention('ks.t', 2)")
    assert(TokenRangeOps.describeTable(path)("retention") == "2")
    val cur = TokenRangeSource.versions(path).last
    spark.sql(s"CALL $cat.system.vacuum('ks.t', ${cur})")
    assert(TokenRangeSource.versions(path) == Seq(cur),
      "vacuum through CALL retires history below retain_from")
    // unknown procedure refuses (Spark wraps it as FAILED_TO_LOAD_ROUTINE;
    // the cause carries the available list)
    val ex = intercept[Exception] { spark.sql(s"CALL $cat.system.nope('ks.t')") }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ causes(t.getCause)
    assert(causes(ex).exists(m =>
      m.contains("compact") || m.contains("FAILED_TO_LOAD_ROUTINE")))
  }

  test("CALL system.expire and enable_change_feed compose: expiry records its deletes") {
    val s2 = spark; import s2.implicits._
    val (cat, wh) = freshCat("exp")
    spark.sql(s"CREATE TABLE $cat.ks.ev (pk BIGINT, ts TIMESTAMP, v STRING) " +
      "TBLPROPERTIES('pk'='pk')")
    spark.sql(s"""INSERT INTO $cat.ks.ev
      SELECT id, timestamp_micros(CAST(id * 1000000 AS BIGINT)),
             concat('e', id) FROM range(0, 20)""")
    spark.sql(s"CALL $cat.system.enable_change_feed('ks.ev')")
    spark.sql(s"CALL $cat.system.expire('ks.ev', 'ts', ${10L * 1000000})")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.ks.ev").head.getLong(0) == 9,
      "ids 0..10 expire (ts <= cutoff), 11..19 stay")
    val path = new java.io.File(new java.io.File(wh, "ks"), "ev").getAbsolutePath
    val feed = spark.read
      .format(classOf[TokenRangeSource].getName)
      .option("pk", "pk").option("changeFeed", "true").load(path)
      .filter(col("_change_type") === "delete")
    assert(feed.count() == 11, "the expiry recorded its deleted rows")
  }
}
