package graft.sources.connector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL MERGE-ON-READ DML (r16): `TBLPROPERTIES('dml'='mor')` routes
  * UPDATE / MERGE / predicate-DELETE through `SupportsDelta` — matched
  * rows arrive row-classified, removals publish as a deletion vector
  * bound to exactly the files that held them, new images append.
  * Load-bearing claims:
  *   - a small SQL DELETE/UPDATE writes NO rewrite: every pre-existing
  *     data file survives by identity (UPDATE appends only its images);
  *   - results are exactly the copy-on-write table's results;
  *   - pk-changing UPDATEs move the row identity correctly;
  *   - MERGE classifies matched updates and unmatched inserts;
  *   - with the change feed on, the statement records TRUE update
  *     images;
  *   - compaction applies the accumulated vectors physically;
  *   - `dml='mor'` is refused on clustered tables (pk must be the whole
  *     row identity). */
class TokenRangeSqlMorSpec extends SparkSpec {

  private def freshCat(tag: String): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_mor_$tag").toString
    val cat = s"graft_mor_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[TokenRangeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ks")
    (cat, wh)
  }

  private def tablePath(wh: String, name: String): String =
    new java.io.File(new java.io.File(wh, "ks"), name).getAbsolutePath

  private def liveRel(path: String): Set[String] =
    TokenRangeOps.liveFiles(path).toSet

  test("mor UPDATE/DELETE write no rewrite: pre-existing files survive by identity") {
    val (cat, wh) = freshCat("ident")
    spark.sql(s"""CREATE TABLE $cat.ks.t (pk BIGINT, v STRING, n BIGINT)
      TBLPROPERTIES('pk'='pk', 'dml'='mor')""")
    (0 until 4).foreach { r =>
      spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id), id " +
        s"FROM range(${r * 32}, ${(r + 1) * 32})")
    }
    val path = tablePath(wh, "t")
    val before = liveRel(path)
    spark.sql(s"UPDATE $cat.ks.t SET n = -1 WHERE v = 'a100'")
    val afterUpd = liveRel(path)
    assert(before.subsetOf(afterUpd),
      "mor UPDATE must retire nothing — the old image is vector-suppressed")
    assert((afterUpd -- before).nonEmpty, "the new image appends")
    spark.sql(s"DELETE FROM $cat.ks.t WHERE n = 77")
    val afterDel = liveRel(path)
    assert(afterDel == afterUpd,
      "mor DELETE must neither add nor retire any data file")
    assert(TokenRangeSource.dvBindings(path).nonEmpty)
    val t = spark.sql(s"SELECT * FROM $cat.ks.t").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(t.size == 127 && t(100L) == -1L && !t.contains(77L) && t(99L) == 99L)
  }

  test("mor statements are result-equal to copy-on-write statements") {
    val (cat, wh) = freshCat("eq")
    for (name <- Seq("m", "c")) {
      val prop = if (name == "m") ", 'dml'='mor'" else ""
      spark.sql(s"""CREATE TABLE $cat.ks.$name (pk BIGINT, v STRING, n BIGINT)
        TBLPROPERTIES('pk'='pk'$prop)""")
      spark.sql(s"INSERT INTO $cat.ks.$name SELECT id, concat('a', id), id " +
        "FROM range(0, 64)")
      spark.sql(s"UPDATE $cat.ks.$name SET v = 'patched', n = n * 2 WHERE pk % 7 = 0")
      spark.sql(s"DELETE FROM $cat.ks.$name WHERE n >= 100")
      spark.sql(s"""MERGE INTO $cat.ks.$name AS t
        USING (SELECT id AS pk, concat('m', id) AS v, id * 100 AS n
               FROM range(40, 70)) AS s
        ON t.pk = s.pk
        WHEN MATCHED THEN UPDATE SET t.v = s.v, t.n = s.n
        WHEN NOT MATCHED THEN INSERT (pk, v, n) VALUES (s.pk, s.v, s.n)""")
    }
    val m = spark.sql(s"SELECT * FROM $cat.ks.m ORDER BY pk").collect().map(_.toSeq)
    val c = spark.sql(s"SELECT * FROM $cat.ks.c ORDER BY pk").collect().map(_.toSeq)
    assert(m.toSeq == c.toSeq, "merge-on-read must equal copy-on-write")
    // and the mor table never rewrote: its original files are all live
    assert(TokenRangeOps.liveFiles(tablePath(wh, "m")).size
      > TokenRangeOps.liveFiles(tablePath(wh, "c")).size,
      "the mor table accumulates generations; cow rewrites them")
  }

  test("pk-changing UPDATE moves the row identity (tombstone old, append new)") {
    val (cat, _) = freshCat("pkmove")
    spark.sql(s"""CREATE TABLE $cat.ks.t (pk BIGINT, v STRING)
      TBLPROPERTIES('pk'='pk', 'dml'='mor')""")
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id) FROM range(0, 10)")
    spark.sql(s"UPDATE $cat.ks.t SET pk = 1000 WHERE pk = 3")
    val keys = spark.sql(s"SELECT pk FROM $cat.ks.t").collect()
      .map(_.getLong(0)).toSet
    assert(!keys(3L) && keys(1000L) && keys.size == 10)
    assert(spark.sql(s"SELECT v FROM $cat.ks.t WHERE pk = 1000")
      .head().getString(0) == "a3")
  }

  test("mor DML records TRUE update images on a feed table; compact applies the vectors") {
    val (cat, wh) = freshCat("cdf")
    spark.sql(s"""CREATE TABLE $cat.ks.t (pk BIGINT, v STRING)
      TBLPROPERTIES('pk'='pk', 'dml'='mor')""")
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id) FROM range(0, 16)")
    val path = tablePath(wh, "t")
    TokenRangeOps.enableChangeFeed(path)
    spark.sql(s"UPDATE $cat.ks.t SET v = 'new5' WHERE pk = 5")
    spark.sql(s"DELETE FROM $cat.ks.t WHERE v = 'a9'")
    val feed = spark.sql(s"SELECT _change_type, pk, v FROM $cat.ks.`t$$changes`")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(feed.count(t => t._1 == "update_preimage" && t._2 == 5L && t._3 == "a5") == 1)
    assert(feed.count(t => t._1 == "update_postimage" && t._2 == 5L && t._3 == "new5") == 1)
    assert(feed.count(t => t._1 == "delete" && t._2 == 9L) == 1)
    // compaction applies the accumulated vectors and drops the bindings
    TokenRangeOps.compact(spark, path, "pk")
    assert(TokenRangeSource.dvBindings(path).isEmpty)
    val t = spark.sql(s"SELECT pk, v FROM $cat.ks.t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(t.size == 15 && t(5L) == "new5" && !t.contains(9L))
  }

  test("dml='mor' is refused on clustered tables; bad modes refused") {
    val (cat, _) = freshCat("refuse")
    val ex = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.ks.bad (pk BIGINT, ck BIGINT, v STRING)
        TBLPROPERTIES('pk'='pk', 'ck'='ck', 'dml'='mor')""")
    }
    assert(ex.getMessage.contains("unclustered"), ex.getMessage)
    val ex2 = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.ks.bad2 (pk BIGINT, v STRING)
        TBLPROPERTIES('pk'='pk', 'dml'='wat')""")
    }
    assert(ex2.getMessage.contains("'mor' or 'cow'"), ex2.getMessage)
  }
}
