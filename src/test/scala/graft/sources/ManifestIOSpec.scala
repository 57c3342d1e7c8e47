package graft.sources.connector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The ManifestIO seam's SECOND implementation: a no-hardlink filesystem
  * (the documented exotic-FS fallback, where createExclusive cannot ride
  * `Files.createLink` and falls back to exists-check + ATOMIC_MOVE).
  * Driving the whole atomic-publish protocol through it proves the
  * PROTOCOL runs end-to-end without hard links — the seam's reason to
  * exist (VERDICT r12 #5) — and exercises the fallback branch the POSIX
  * default never reaches.
  *
  * Honesty note (r13 review): exists-check + rename is NOT a true CAS —
  * two claimers inside a stolen-lock double-holder window have a TOCTOU,
  * exactly as LocalManifestIO documents for its own no-hardlink branch.
  * A REAL alternative backend supplies an atomic conditional primitive
  * (object-store if-none-match PUT, HDFS create-no-overwrite); this test
  * impl proves protocol-compatibility, not lock-free concurrency. */
object NoHardLinkManifestIO extends ManifestIO {
  // counts fallback CAS decisions so the spec can prove this impl (not
  // the default) served the run
  val exclusiveCalls = new java.util.concurrent.atomic.AtomicInteger(0)

  override def listNames(dir: String): Seq[String] = LocalManifestIO.listNames(dir)
  override def read(path: String): String = LocalManifestIO.read(path)
  override def write(path: String, content: String): Unit =
    LocalManifestIO.write(path, content)
  override def moveAtomic(src: String, dst: String): Unit =
    LocalManifestIO.moveAtomic(src, dst)
  override def delete(path: String): Boolean = LocalManifestIO.delete(path)
  override def exists(path: String): Boolean = LocalManifestIO.exists(path)
  override def lastModified(path: String): Long = LocalManifestIO.lastModified(path)
  override def touch(path: String): Unit = LocalManifestIO.touch(path)

  override def createExclusive(path: String, content: String): Boolean = {
    exclusiveCalls.incrementAndGet()
    val target = java.nio.file.Paths.get(path)
    Option(target.getParent).foreach(java.nio.file.Files.createDirectories(_))
    // the no-hardlink recipe, verbatim: write-temp, re-check absence,
    // atomic rename (exclusive only under the commit lock)
    if (java.nio.file.Files.exists(target)) return false
    val tmp = java.nio.file.Files.createTempFile(target.getParent, "nhl-", ".tmp")
    try {
      java.nio.file.Files.write(tmp, content.getBytes("UTF-8"))
      if (java.nio.file.Files.exists(target)) false
      else {
        // a platform whose rename REFUSES existing targets reports the
        // race as a lost CAS rather than crashing the caller's loop
        try {
          java.nio.file.Files.move(tmp, target,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      }
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}

class ManifestIOSpec extends SparkSpec {
  private val fmt = classOf[TokenRangeSource].getName

  private def withNoHardLinks(body: => Unit): Unit = {
    val prev = TokenRangeSource.manifestIO
    TokenRangeSource.manifestIO = NoHardLinkManifestIO
    try body finally TokenRangeSource.manifestIO = prev
  }

  test("the full atomic-publish protocol runs on a no-hardlink ManifestIO") {
    withNoHardLinks {
      val s2 = spark; import s2.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_tr_nhl").toString
      val before = NoHardLinkManifestIO.exclusiveCalls.get()

      // append → read → second append → delete → compact → expire-free
      // vacuum: every commit flips through the fallback CAS
      (0L until 100L).map(i => (i, s"a$i")).toDF("pk", "v")
        .write.format(fmt).option("pk", "pk")
        .option("schema", "pk BIGINT, v STRING").mode("append").save(dir)
      def load = spark.read.format(fmt).option("pk", "pk").load(dir)
      assert(load.count() == 100)
      (100L until 120L).map(i => (i, s"b$i")).toDF("pk", "v")
        .write.format(fmt).option("pk", "pk").mode("append").save(dir)
      assert(load.count() == 120)
      TokenRangeOps.deleteKeys(spark, dir, "pk", Seq(5L, 50L, 105L))
      assert(load.count() == 117)
      TokenRangeOps.compact(spark, dir, "pk")
      val rows = load.collect().map(_.getAs[Long]("pk"))
      assert(rows.length == 117 && rows.toSet.intersect(Set(5L, 50L, 105L)).isEmpty)
      // snapshot history still resolves (segments + versions readable)
      val vs = TokenRangeSource.versions(dir)
      assert(vs.size >= 4)
      TokenRangeOps.vacuum(dir, vs.max)
      assert(load.count() == 117, "vacuum must not reap the live version's files")

      assert(NoHardLinkManifestIO.exclusiveCalls.get() > before,
        "the fallback impl must actually have served the CAS decisions")
    }
  }

  test("version hint: currentVersion on a long history is O(1) probes, not O(versions) listings (r17)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tr_hint").toString
    // a 1000-version history — Cassandra write rates reach this within
    // retention; resolution must not pay an O(versions) listing per plan
    val last = (1 to 1000).map(_ =>
      TokenRangeSource.publishManifest(dir, Nil, truncate = false)).last
    assert(last == 1000)
    object Counting extends ManifestIO {
      val lists = new java.util.concurrent.atomic.AtomicInteger(0)
      val reads = new java.util.concurrent.atomic.AtomicInteger(0)
      val probes = new java.util.concurrent.atomic.AtomicInteger(0)
      override def listNames(d: String): Seq[String] = {
        lists.incrementAndGet(); LocalManifestIO.listNames(d)
      }
      override def read(p: String): String = {
        reads.incrementAndGet(); LocalManifestIO.read(p)
      }
      override def exists(p: String): Boolean = {
        probes.incrementAndGet(); LocalManifestIO.exists(p)
      }
      override def write(p: String, c: String): Unit = LocalManifestIO.write(p, c)
      override def createExclusive(p: String, c: String): Boolean =
        LocalManifestIO.createExclusive(p, c)
      override def moveAtomic(s: String, d: String): Unit =
        LocalManifestIO.moveAtomic(s, d)
      override def delete(p: String): Boolean = LocalManifestIO.delete(p)
      override def lastModified(p: String): Long = LocalManifestIO.lastModified(p)
      override def touch(p: String): Unit = LocalManifestIO.touch(p)
    }
    val prev = TokenRangeSource.manifestIO
    TokenRangeSource.manifestIO = Counting
    try {
      assert(TokenRangeSource.currentVersion(dir) == Some(1000))
      assert(Counting.lists.get() == 0,
        s"hint resolution must not LIST the manifest dir, got ${Counting.lists.get()}")
      assert(Counting.probes.get() <= 4,
        s"hint resolution is one read + O(1) probes, got ${Counting.probes.get()}")
      // a STALE hint (racing publishes landed after the stamp) recovers
      // by forward probing — still no listing
      LocalManifestIO.write(new java.io.File(
        TokenRangeSource.manifestDir(dir), "version.hint").getPath, "997")
      Counting.lists.set(0); Counting.probes.set(0)
      assert(TokenRangeSource.currentVersion(dir) == Some(1000))
      assert(Counting.lists.get() == 0 && Counting.probes.get() <= 7)
      // a TORN/garbage hint falls back to the listing — correctness
      // never rests on the hint
      LocalManifestIO.write(new java.io.File(
        TokenRangeSource.manifestDir(dir), "version.hint").getPath, "wat")
      assert(TokenRangeSource.currentVersion(dir) == Some(1000))
    } finally TokenRangeSource.manifestIO = prev
    // history()/versions() (the full-history surfaces) still list — and
    // still agree with the hint-resolved current version
    assert(TokenRangeSource.versions(dir).last == 1000)
  }

  test("no-hardlink CAS refuses to replace an existing version (lost CAS, not lost update)") {
    withNoHardLinks {
      val dir = java.nio.file.Files.createTempDirectory("graft_tr_nhl2").toString
      val v1 = TokenRangeSource.publishManifest(dir,
        Seq("tb=1/a.parquet"), truncate = false)
      // a direct conflicting claim of the SAME version must lose, and the
      // loser's CAS loop must land at the next version — never replace
      val mdir = TokenRangeSource.manifestDir(dir).getPath
      val claimed = TokenRangeSource.manifestIO.createExclusive(
        new java.io.File(mdir, s"v$v1.manifest").getPath, "attacker\n")
      assert(!claimed, "an existing version must never be replaced")
      val v2 = TokenRangeSource.publishManifest(dir,
        Seq("tb=1/b.parquet"), truncate = false)
      assert(v2 == v1 + 1)
      assert(TokenRangeSource.visibleRelFiles(dir, Some(v2)).map(_._2)
        == Seq("tb=1/a.parquet", "tb=1/b.parquet"))
    }
  }
}
