package graft.sources.connector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL row-level DML through the DSv2 group-based copy-on-write surface
  * (r15 continuation): `UPDATE`, `MERGE INTO`, and DELETE with a
  * NON-KEY predicate — the statements CQL serves as UPDATE/DELETE and
  * the lakehouse formats serve through SupportsRowLevelOperations.
  * Load-bearing claims:
  *   - UPDATE with a pk predicate rewrites ONLY the owning bucket's
  *     files — every other bucket's files survive BY IDENTITY;
  *   - the rewrite is exact: updated rows change, same-bucket
  *     bystanders and other-bucket rows don't;
  *   - DELETE with a non-key predicate (refused by the metadata-only
  *     SupportsDelete path) takes the copy-on-write path and works;
  *   - MERGE INTO classifies matched/not-matched correctly;
  *   - the plain CDC tail classifies these commits as content-changing
  *     (fails loudly), proving the `#op` kind is stamped. */
class TokenRangeRowLevelSpec extends SparkSpec {

  private def freshCat(tag: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_rl_$tag").toString
    val cat = s"graft_rl_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[TokenRangeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ks")
    cat
  }

  private def tablePath(cat: String, name: String): String = {
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    new java.io.File(new java.io.File(wh, "ks"), name).getAbsolutePath
  }

  private def liveRel(path: String): Set[String] =
    TokenRangeSource.visibleRelFiles(path, None).map(_._2).toSet

  test("SQL UPDATE rewrites only the owning bucket's files; bystanders survive by identity") {
    val cat = freshCat("upd")
    spark.sql(s"""CREATE TABLE $cat.ks.t (pk BIGINT, v STRING, n BIGINT)
      TBLPROPERTIES('pk'='pk')""")
    // many keys spread over buckets, several files (one insert per batch)
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id), id * 10 " +
      "FROM range(0, 64)")
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id), id * 10 " +
      "FROM range(64, 128)")
    val path = tablePath(cat, "t")
    val before = liveRel(path)
    assert(before.size >= 2)
    spark.sql(s"UPDATE $cat.ks.t SET v = 'patched', n = n + 1 WHERE pk = 7")
    val t = spark.sql(s"SELECT * FROM $cat.ks.t").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(t(7L) == (("patched", 71L)))
    assert(t(8L) == (("a8", 80L)) && t(127L) == (("a127", 1270L)))
    assert(t.size == 128)
    // file-identity: every file in a bucket OTHER than pk=7's survives
    val after = liveRel(path)
    val bucket7 = s"tb=${TokenLayout.bucketOfValue(7L)}"
    val otherBefore = before.filterNot(_.startsWith(bucket7))
    assert(otherBefore.subsetOf(after),
      s"non-owning buckets must survive by identity: " +
        s"${(otherBefore -- after).take(3)} vanished")
    // runtime GROUP filtering: within the owning bucket only the file(s)
    // actually HOLDING pk=7 are rewritten — the second load's file (keys
    // 64..127) survives by identity even though it shares the bucket
    val retired = before -- after
    assert(retired.nonEmpty && retired.forall(_.startsWith(bucket7)),
      s"only owning-bucket files may retire, got $retired")
    assert(retired.size == 1,
      s"runtime group filtering must retire exactly the matching file: $retired")
  }

  test("runtime group filtering: a non-key UPDATE rewrites only the files holding matching rows") {
    val cat = freshCat("rgf")
    spark.sql(s"""CREATE TABLE $cat.ks.t (pk BIGINT, v STRING, n BIGINT)
      TBLPROPERTIES('pk'='pk')""")
    (0 until 4).foreach { r =>
      spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id), id " +
        s"FROM range(${r * 32}, ${(r + 1) * 32})")
    }
    val path = tablePath(cat, "t")
    val before = liveRel(path)
    // v = 'a100' is not pushable as a zone map (string) and names no pk —
    // WITHOUT runtime filtering this rewrites every file; WITH it, the
    // matching-rows subquery narrows the rewrite to row 100's one file
    spark.sql(s"UPDATE $cat.ks.t SET n = -1 WHERE v = 'a100'")
    val after = liveRel(path)
    val retired = before -- after
    assert(retired.size == 1,
      s"one matching file must be rewritten, got ${retired.size}: $retired")
    val t = spark.sql(s"SELECT * FROM $cat.ks.t").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(t(100L) == -1L && t(99L) == 99L && t.size == 128)
    // `_file` also serves as a plain metadata column (input_file_name)
    val files = spark.sql(s"SELECT DISTINCT _file FROM $cat.ks.t").count()
    assert(files == liveRel(path).size.toLong,
      "_file must surface one value per live file")
  }

  test("all-columns predicate: the group-filter subquery must not widen the retire set (ADVICE r15)") {
    // When the DML condition references EVERY table column, the runtime
    // group-filter subquery scan projects `_file` + all columns — the
    // same full-schema shape as the write-back scan — so it registers
    // its statically-pruned candidates too. The retire set must be the
    // INTERSECTION of registered sets (= the write-back scan's exact
    // runtime-narrowed set); the old union retired files whose rows were
    // never written back: silent loss of every non-matching row in them.
    val cat = freshCat("allc")
    spark.sql(s"""CREATE TABLE $cat.ks.t (pk BIGINT, v STRING, n BIGINT)
      TBLPROPERTIES('pk'='pk')""")
    (0 until 4).foreach { r =>
      spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id), id " +
        s"FROM range(${r * 32}, ${(r + 1) * 32})")
    }
    val path = tablePath(cat, "t")
    val before = liveRel(path)
    assert(before.size >= 4)
    // references pk, v AND n; no pk equality → no bucket prune, so the
    // subquery's static candidate set is ALL files while only row 100's
    // file holds a match
    spark.sql(s"UPDATE $cat.ks.t SET n = -1 " +
      "WHERE v = 'a100' AND n < 1000 AND pk < 1000")
    val after = liveRel(path)
    val retired = before -- after
    assert(retired.size == 1,
      s"only the matching file may retire, got ${retired.size}: $retired")
    val t = spark.sql(s"SELECT * FROM $cat.ks.t").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(t.size == 128, s"no rows may be lost, got ${t.size}")
    assert(t(100L) == -1L && t(99L) == 99L && t(127L) == 127L)
  }

  test("SQL DELETE with a non-key predicate takes the copy-on-write path") {
    val cat = freshCat("del")
    spark.sql(s"""CREATE TABLE $cat.ks.t (pk BIGINT, v STRING, n BIGINT)
      TBLPROPERTIES('pk'='pk')""")
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id), id * 10 " +
      "FROM range(0, 50)")
    // n >= 300 is NOT a pk predicate — canDeleteWhere refuses it, so this
    // exercises the row-level rewrite, not the metadata delete
    spark.sql(s"DELETE FROM $cat.ks.t WHERE n >= 300")
    val left = spark.sql(s"SELECT pk FROM $cat.ks.t").collect()
      .map(_.getLong(0)).sorted
    assert(left.toSeq == (0L until 30L))
  }

  test("MERGE INTO: matched rows update, unmatched insert — CQL's INSERT-is-upsert as one statement") {
    val cat = freshCat("mrg")
    spark.sql(s"""CREATE TABLE $cat.ks.t (pk BIGINT, v STRING, n BIGINT)
      TBLPROPERTIES('pk'='pk')""")
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id), id * 10 " +
      "FROM range(0, 20)")
    spark.sql(s"""MERGE INTO $cat.ks.t AS t
      USING (SELECT id AS pk, concat('m', id) AS v, id * 100 AS n
             FROM range(15, 25)) AS s
      ON t.pk = s.pk
      WHEN MATCHED THEN UPDATE SET t.v = s.v, t.n = s.n
      WHEN NOT MATCHED THEN INSERT (pk, v, n) VALUES (s.pk, s.v, s.n)""")
    val t = spark.sql(s"SELECT * FROM $cat.ks.t").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(t.size == 25)
    assert(t(3L) == (("a3", 30L)), "untouched rows keep their values")
    assert(t(17L) == (("m17", 1700L)), "matched rows take the source image")
    assert(t(23L) == (("m23", 2300L)), "unmatched source rows insert")
  }

  test("row-level commits stamp their #op kind: the plain CDC tail refuses them as content-changing") {
    val cat = freshCat("tail")
    spark.sql(s"""CREATE TABLE $cat.ks.t (pk BIGINT, v STRING, n BIGINT)
      TBLPROPERTIES('pk'='pk')""")
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id), id * 10 " +
      "FROM range(0, 16)")
    val path = tablePath(cat, "t")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rl_ck").toString
    def drain(): Long = {
      val got = new java.util.concurrent.atomic.AtomicLong(0)
      val q = spark.readStream
        .format(classOf[TokenRangeSource].getName)
        .option("pk", "pk").load(path)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.addAndGet(b.count()); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(); got.get()
    }
    assert(drain() == 16)
    spark.sql(s"UPDATE $cat.ks.t SET v = 'x' WHERE pk = 3")
    val ex = intercept[Exception] { drain() }
    assert(ex.getMessage.contains("content-changing rewrite (upsert)"),
      s"the UPDATE must stamp #op upsert, got: ${ex.getMessage}")
  }
}
