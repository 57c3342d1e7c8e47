package graft.sources.connector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MERGE-ON-READ deletion vectors (r16, VERDICT r15 next-round #1):
  * small DELETE/upsert publish a tiny pk sidecar bound to the affected
  * files instead of rewriting them — Cassandra's tombstone-merged-at-
  * read semantic, the lakehouse formats' deletion-vector shape.
  * Load-bearing claims:
  *   - a small DELETE writes NO data file (every live data file survives
  *     by identity) yet the rows disappear from every read shape
  *     (full scan, count-only scan, point lookup, ops rewrites);
  *   - merge-on-read results are hash-equal to copy-on-write results;
  *   - delete-then-reinsert serves the new row (bindings target only
  *     files present at bind time);
  *   - compaction APPLIES the vectors physically and drops the bindings;
  *   - a copy-on-write rewrite racing a vector commit CONFLICTS and
  *     re-runs (a rewrite that didn't merge the vector must never
  *     resurrect its deleted rows);
  *   - snapshot reads at a pre-vector version still serve the rows;
  *   - the plain CDC tail refuses a vector commit as content-changing,
  *     and the change feed serves its sidecar exactly. */
class TokenRangeDvSpec extends SparkSpec {

  private val fmt = classOf[TokenRangeSource].getName

  private def freshTable(tag: String, loads: Int = 4): String = {
    import org.apache.spark.sql.SaveMode
    val dir = java.nio.file.Files.createTempDirectory(s"graft_dv_$tag").toString
    (0 until loads).foreach { r =>
      spark.range(r * 32, (r + 1) * 32)
        .select(col("id").as("pk"), concat(lit("a"), col("id")).as("v"),
          (col("id") * 10).as("n"))
        .write.format(fmt).option("pk", "pk")
        .mode(if (r == 0) SaveMode.Overwrite else SaveMode.Append).save(dir)
    }
    dir
  }

  private def liveRel(path: String): Set[String] =
    TokenRangeSource.visibleRelFiles(path, None).map(_._2).toSet

  private def readAll(path: String) =
    spark.read.format(fmt).option("pk", "pk").load(path)

  test("small DELETE writes no data file; rows vanish from every read shape") {
    val dir = freshTable("nofile")
    val before = liveRel(dir)
    TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(7L, 40L, 99L))
    // merge-on-read: every pre-existing data file survives BY IDENTITY
    assert(liveRel(dir) == before,
      "a vector delete must not add or retire any data file")
    assert(TokenRangeSource.dvBindings(dir).nonEmpty,
      "the manifest must carry vector bindings")
    val t = readAll(dir)
    assert(t.count() == 125L, "count-only scan must merge vectors")
    val keys = t.select("pk").collect().map(_.getLong(0)).toSet
    assert(!keys(7L) && !keys(40L) && !keys(99L) && keys(8L) && keys(127L))
    // point lookup on a deleted key: bucket/bloom pruning may keep the
    // file, the vector must still suppress the row
    assert(t.filter(col("pk") === 7L).count() == 0L)
    assert(t.filter(col("pk") === 8L).count() == 1L)
    // projection WITHOUT the pk column still merges (reader reads pk
    // beside the projection for the suppression test)
    assert(t.select("v").filter(col("v") === "a7").count() == 0L)
  }

  test("merge-on-read is result-equal to copy-on-write") {
    val a = freshTable("eqdv")
    val b = freshTable("eqcow")
    TokenRangeOps.deleteKeys(spark, a, "pk", Seq(3L, 64L), mode = "dv")
    TokenRangeOps.deleteKeys(spark, b, "pk", Seq(3L, 64L), mode = "cow")
    val ra = readAll(a).orderBy("pk").collect().map(_.toSeq)
    val rb = readAll(b).orderBy("pk").collect().map(_.toSeq)
    assert(ra.toSeq == rb.toSeq)
    // and the upsert pair: dv-upsert ≡ cow-upsert
    val up = spark.range(60, 70)
      .select(col("id").as("pk"), lit("patched").as("v"), lit(-1L).as("n"))
    TokenRangeOps.upsert(spark, a, "pk", up, mode = "dv")
    TokenRangeOps.upsert(spark, b, "pk", up) // cow default
    val ua = readAll(a).orderBy("pk").collect().map(_.toSeq)
    val ub = readAll(b).orderBy("pk").collect().map(_.toSeq)
    assert(ua.toSeq == ub.toSeq)
    assert(readAll(a).filter(col("v") === "patched").count() == 10L)
  }

  test("dv-upsert appends without reading; old generations suppressed (LWW by storage shape)") {
    val dir = freshTable("ups")
    val before = liveRel(dir)
    val up = spark.range(10, 13)
      .select(col("id").as("pk"), lit("new").as("v"), lit(0L).as("n"))
    TokenRangeOps.upsert(spark, dir, "pk", up, mode = "dv")
    val after = liveRel(dir)
    assert(before.subsetOf(after), "dv-upsert must retire nothing")
    assert((after -- before).nonEmpty, "the incoming rows append as new files")
    val t = readAll(dir)
    assert(t.count() == 128L, "replaced keys must not duplicate")
    assert(t.filter(col("pk") === 11L).select("v").head().getString(0) == "new")
    assert(t.filter(col("pk") === 20L).select("v").head().getString(0) == "a20")
    // upsert the SAME key again: the second vector binds the first
    // upsert's file too — newest generation wins
    val up2 = spark.range(11, 12)
      .select(col("id").as("pk"), lit("newest").as("v"), lit(1L).as("n"))
    TokenRangeOps.upsert(spark, dir, "pk", up2, mode = "dv")
    val vs = readAll(dir).filter(col("pk") === 11L).collect()
    assert(vs.length == 1 && vs.head.getString(1) == "newest")
  }

  test("delete-then-reinsert serves the new row") {
    val dir = freshTable("reins")
    TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(5L), mode = "dv")
    assert(readAll(dir).filter(col("pk") === 5L).count() == 0L)
    spark.range(5, 6)
      .select(col("id").as("pk"), lit("back").as("v"), lit(0L).as("n"))
      .write.format(fmt).option("pk", "pk").mode("append").save(dir)
    val rows = readAll(dir).filter(col("pk") === 5L).collect()
    assert(rows.length == 1 && rows.head.getString(1) == "back",
      "a binding targets only files present at bind time — the reinserted row must serve")
  }

  test("compaction applies vectors physically and drops the bindings") {
    val dir = freshTable("cmp")
    TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(7L, 8L), mode = "dv")
    assert(TokenRangeSource.dvBindings(dir).nonEmpty)
    TokenRangeOps.compact(spark, dir, "pk")
    assert(TokenRangeSource.dvBindings(dir).isEmpty,
      "compaction retires the bound files — bindings must drop with them")
    val t = readAll(dir)
    assert(t.count() == 126L)
    assert(t.filter(col("pk").isin(7L, 8L)).count() == 0L,
      "the compacted rewrite must not resurrect vector-deleted rows")
  }

  test("a sidecar missing a pk column fails the rewrite loudly (no partial-grain over-delete, r19)") {
    val dir = freshTable("grain")
    TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(7L, 8L), mode = "dv")
    val dvRels = TokenRangeSource.dvBindings(dir).map(_._2).distinct
    assert(dvRels.nonEmpty)
    // corrupt every bound sidecar IN PLACE: rename its pk column, so the
    // resolved grain is missing the recorded pk — the rewrite read must
    // refuse the anti-join (a partial grain would over-delete rows that
    // merely share the remaining columns) instead of proceeding
    dvRels.foreach { rel =>
      val abs = new java.io.File(dir, rel).getAbsolutePath
      val corrupted = spark.read.parquet(abs).withColumnRenamed("pk", "qk")
      val tmp = java.nio.file.Files.createTempDirectory("graft_dv_corrupt").toString
      corrupted.write.mode("overwrite").parquet(tmp)
      // swap the sidecar contents for the corrupted copy
      import java.nio.file._
      import java.util.Comparator
      val target = Paths.get(abs)
      Files.walk(target).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      Files.createDirectories(target)
      Files.walk(Paths.get(tmp)).filter(p => Files.isRegularFile(p)).forEach(p =>
        Files.copy(p, target.resolve(p.getFileName.toString)))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    // the rewrite read (dvMergeLineaged) must refuse the partial grain —
    // key 7 so the cow rewrite touches a bucket the sidecar is bound to
    val e = intercept[Exception] {
      TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(7L), mode = "cow")
    }
    assert(messages(e).exists(_.contains("partial-grain")),
      s"expected the partial-grain refusal, got: ${messages(e).mkString(" | ")}")
    // and the task-reader path (loadDv) stays loud too
    val e2 = intercept[Exception] { TokenRangeOps.compact(spark, dir, "pk") }
    assert(messages(e2).exists(m =>
      m.contains("partial-grain") || m.contains("lacks pk column")),
      s"expected a loud pk-grain refusal, got: ${messages(e2).mkString(" | ")}")
  }

  test("a rewrite racing a vector commit conflicts and re-runs (no resurrection)") {
    val dir = freshTable("race")
    // install the race: after the upsert pins its snapshot, a vector
    // delete lands on the same bucket's files — the upsert's publish
    // must CONFLICT (unseen binding on a retired file) and re-run from
    // the post-vector snapshot
    var fired = false
    TokenRangeOps.onSnapshotPinned = () => {
      if (!fired) {
        fired = true
        TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(20L), mode = "dv")
      }
    }
    try {
      // pk=20's bucket: upsert a DIFFERENT key of the same bucket so the
      // rewrite reads and retires the file holding pk=20
      val sameBucketKey = (0L until 128L).find(k =>
        k != 20L && TokenLayout.bucketOfValue(k) == TokenLayout.bucketOfValue(20L)).get
      val up = spark.range(sameBucketKey, sameBucketKey + 1)
        .select(col("id").as("pk"), lit("upd").as("v"), lit(-5L).as("n"))
      TokenRangeOps.upsert(spark, dir, "pk", up) // cow: reads + retires
      val t = readAll(dir)
      assert(t.filter(col("pk") === 20L).count() == 0L,
        "the racing vector delete must survive the rewrite (no resurrection)")
      assert(t.filter(col("pk") === sameBucketKey).select("v")
        .head().getString(0) == "upd")
      assert(t.count() == 127L)
    } finally TokenRangeOps.onSnapshotPinned = () => ()
  }

  test("snapshot reads: a pre-vector version still serves the rows") {
    val dir = freshTable("snap")
    val v0 = TokenRangeSource.currentVersion(dir).get
    TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(42L), mode = "dv")
    assert(spark.read.format(fmt).option("pk", "pk")
      .option("version", v0.toString).load(dir)
      .filter(col("pk") === 42L).count() == 1L)
    assert(readAll(dir).filter(col("pk") === 42L).count() == 0L)
  }

  test("plain CDC tail refuses a vector commit; the change feed serves its sidecar") {
    val dir = freshTable("tail", loads = 1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dv_ck").toString
    def drain(): Long = {
      val got = new java.util.concurrent.atomic.AtomicLong(0)
      val q = spark.readStream.format(fmt).option("pk", "pk").load(dir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.addAndGet(b.count()); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(); got.get()
    }
    assert(drain() == 32)
    TokenRangeOps.enableChangeFeed(dir)
    TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(9L), mode = "dv")
    // the plain tail (fresh, no feed option) refuses the vector version
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_dv_ck2").toString
    val ex = intercept[Exception] {
      val q = spark.readStream.format(fmt).option("pk", "pk").load(dir)
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt2)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    assert(ex.getMessage.contains("content-changing rewrite (delete)"),
      s"vector delete must classify content-changing, got: ${ex.getMessage}")
    // the change feed serves the deleted row exactly
    val feed = spark.read.format(fmt).option("pk", "pk")
      .option("changeFeed", "true").load(dir)
      .filter(col(TokenRangeSource.ChangeTypeCol) === "delete")
    val del = feed.collect()
    assert(del.length == 1 && del.head.getAs[Long]("pk") == 9L)
  }

  test("composite keys: deleteTuples mode=dv suppresses exactly the tuples") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dv_tup").toString
    spark.range(0, 60)
      .select((col("id") % 6).as("a"), (col("id") / 6).cast("long").as("b"),
        col("id").as("n"))
      .write.format(fmt).option("pk", "a,b").mode("overwrite").save(dir)
    TokenRangeOps.deleteTuples(spark, dir, Seq("a", "b"),
      Seq(Seq(2L, 3L), Seq(5L, 0L)), mode = "dv")
    val t = spark.read.format(fmt).option("pk", "a,b").load(dir)
    assert(t.count() == 58L)
    assert(t.filter(col("a") === 2L && col("b") === 3L).count() == 0L)
    assert(t.filter(col("a") === 5L && col("b") === 0L).count() == 0L)
    assert(t.filter(col("a") === 2L && col("b") === 4L).count() == 1L)
  }

  test("a pk-less legacy table never takes the vector path (review r16: the silent brick)") {
    val s2 = spark; import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dv_legacy").toString
    // legacy layout: Spark's own committer, no manifest, NO recorded pk
    TokenLayout.writeTokenBucketed(
      (0L until 24L).map(i => (i, s"a$i")).toDF("pk", "v"), "pk", dir)
    assert(TokenRangeSource.recordedPk(dir).isEmpty)
    // explicit dv mode refuses loudly while no pk is recorded
    val ex = intercept[IllegalArgumentException] {
      TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(5L), mode = "dv")
    }
    assert(ex.getMessage.contains("recorded pk"), ex.getMessage)
    // auto mode must FALL BACK to copy-on-write (a vector would make
    // every read — including compaction — refuse for lack of the pk);
    // the cow rewrite's sink commit then RECORDS the pk, so later small
    // deletes graduate to the vector path legitimately
    TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(3L))
    assert(TokenRangeSource.dvBindings(dir).isEmpty,
      "no vector may publish without a recorded pk")
    val t = spark.read.format(fmt).option("pk", "pk").load(dir)
    assert(t.count() == 23L && t.filter(col("pk") === 3L).count() == 0L)
    assert(TokenRangeSource.recordedPk(dir).isDefined,
      "the cow rewrite records the pk — the table has graduated")
  }

  test("vector-only publishes carry bound buckets' segments by reference (no rewrite amplification)") {
    val dir = freshTable("segcarry")
    val mdir = new java.io.File(dir, "_manifests")
    def segs(): Set[String] =
      Option(new java.io.File(mdir, "segments").listFiles())
        .getOrElse(Array.empty).map(_.getName).toSet
    val before = segs()
    TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(7L), mode = "dv")
    assert(segs() == before,
      "a vector-only publish must write NO new segment files — bound " +
        "buckets carry by reference, only validated against the base")
  }

  test("describeTable reports the merge-on-read debt (deletion_vectors)") {
    val dir = freshTable("desc")
    assert(TokenRangeOps.describeTable(dir)("deletion_vectors") == "0")
    TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(7L), mode = "dv")
    val n = TokenRangeOps.describeTable(dir)("deletion_vectors").toInt
    assert(n >= 1, s"bindings must surface, got $n")
    TokenRangeOps.compact(spark, dir, "pk")
    assert(TokenRangeOps.describeTable(dir)("deletion_vectors") == "0",
      "compaction clears the debt")
  }

  test("MIXED grains on one file: key and position vectors compose (r17)") {
    import org.apache.spark.sql.SaveMode
    // a catalog mor table so SQL DML publishes POSITION vectors, while
    // deleteKeys publishes KEY vectors — both bound to the same files
    val wh = java.nio.file.Files.createTempDirectory("graft_dv_mixed").toString
    val cat = "graft_dv_mixed"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[TokenRangeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ks")
    spark.sql(s"""CREATE TABLE $cat.ks.t (pk BIGINT, v STRING)
      TBLPROPERTIES('pk'='pk', 'dml'='mor')""")
    spark.sql(s"INSERT INTO $cat.ks.t SELECT id, concat('a', id) FROM range(0, 64)")
    val path = new java.io.File(new java.io.File(wh, "ks"), "t").getAbsolutePath
    val before = TokenRangeOps.liveFiles(path).toSet
    // position vector: SQL predicate DELETE (row-grain)
    spark.sql(s"DELETE FROM $cat.ks.t WHERE v = 'a7'")
    // key vector: whole-partition point delete through the ops surface
    TokenRangeOps.deleteKeys(spark, path, "pk", Seq(9L), mode = "dv")
    assert(TokenRangeOps.liveFiles(path).toSet == before,
      "neither grain may rewrite or retire a data file")
    val grains = TokenRangeSource.dvBindings(path).map(_._2).distinct
    assert(grains.size == 2, s"two distinct vectors must bind, got $grains")
    // reads merge BOTH grains (scan, count, point lookups)
    val t = spark.sql(s"SELECT pk FROM $cat.ks.t").collect().map(_.getLong(0)).toSet
    assert(t.size == 62 && !t(7L) && !t(9L) && t(8L))
    assert(spark.sql(s"SELECT count(*) FROM $cat.ks.t").head().getLong(0) == 62L)
    // rewrites merge both grains too: compaction applies and drops both
    TokenRangeOps.compact(spark, path, "pk")
    assert(TokenRangeSource.dvBindings(path).isEmpty)
    val t2 = spark.sql(s"SELECT pk FROM $cat.ks.t").collect().map(_.getLong(0)).toSet
    assert(t2 == t, "compaction must neither resurrect nor over-delete")
  }

  test("vector sweep: a file past the binding bound auto-compacts (the policy ACTS on the debt)") {
    val dir = freshTable("sweep")
    // a tight bound so the test drives the threshold crossing
    TokenRangeOps.setVectorCompaction(dir, 3)
    // three point deletes of keys in the SAME bucket accumulate three
    // bindings on that bucket's files; the third commit's sweep must
    // compact them — without any manual compact call
    val byBucket = (0L until 128L).groupBy(TokenLayout.bucketOfValue)
    val ks = byBucket.values.find(_.size >= 3).get.take(3)
    TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(ks(0)), mode = "dv")
    TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(ks(1)), mode = "dv")
    assert(TokenRangeSource.dvBindings(dir).groupBy(_._1).values
      .exists(_.size == 2), "below the bound the debt accumulates")
    TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(ks(2)), mode = "dv")
    assert(TokenRangeSource.dvBindings(dir).isEmpty,
      "the third commit's sweep must compact the bound files and clear " +
        "the bindings")
    assert(TokenRangeOps.describeTable(dir)("deletion_vectors") == "0",
      "the describeTable debt signal returns to 0")
    // the compaction applied the vectors, never resurrected
    val t = readAll(dir)
    assert(t.count() == 125L)
    assert(t.filter(col("pk").isin(ks.map(Long.box): _*)).count() == 0L)
    // selectivity: only the victim files rewrote — the sweep publishes
    // as #op compact, content-preserving, so the plain CDC tail still
    // serves the table (no content-changing refusal from maintenance)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dv_sw").toString
    val got = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.format(fmt).option("pk", "pk").load(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.addAndGet(b.count()); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(got.get() == 125L, s"tail over the swept history, got ${got.get()}")
  }

  test("ops rewrites over vector-bound files never resurrect (ckRange/expire read merged)") {
    val dir = freshTable("opsmrg")
    TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(30L), mode = "dv")
    // a COW delete of a DIFFERENT key in the same bucket rewrites the
    // bound file — the rewrite must consume the vector, not resurrect 30
    val sameBucketKey = (0L until 128L).find(k =>
      k != 30L && TokenLayout.bucketOfValue(k) == TokenLayout.bucketOfValue(30L)).get
    TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(sameBucketKey), mode = "cow")
    val t = readAll(dir)
    assert(t.filter(col("pk").isin(30L, sameBucketKey)).count() == 0L)
    assert(t.count() == 126L)
    // and the binding for the rewritten file dropped with its file
    val liveRels = liveRel(dir)
    assert(TokenRangeSource.dvBindings(dir).forall { case (d, _) => liveRels(d) },
      "no binding may dangle on a retired file")
  }
}
