package graft.sources.connector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-file pk BLOOM probes, r16 upgrades (VERDICT r15 #4/#5):
  *   - probe results are CACHED per immutable (file, column) — repeated
  *     point lookups (the workload blooms exist for) stop re-reading
  *     footer + bloom pages on every plan (spec counts actual reads);
  *   - COMPOSITE keys probe every component's bloom when the full tuple
  *     is bound (single equality or tuple multiget) and the keeps
  *     intersect — the sub-bucket prune TEXT/compound keys previously
  *     never got; partial equality stays unprobed (like bucket routing);
  *   - single-col multiget probe values are restricted to each file's
  *     OWNING bucket (another bucket's key can never be in this file). */
class TokenRangeBloomSpec extends SparkSpec {

  private val fmt = classOf[TokenRangeSource].getName

  test("bloom probes are cached per immutable file: the second identical point lookup reads zero footers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_cache").toString
    // several files per bucket so the probe has candidates to walk
    (0 until 3).foreach { r =>
      // one task per load → one file per (bucket, tranche): the
      // same-bucket-same-tranche probe below then provably hits the
      // SAME file as the first lookup
      spark.range(r * 64, (r + 1) * 64).coalesce(1)
        .select(col("id").as("pk"), concat(lit("u"), col("id")).as("v"))
        .write.format(fmt).option("pk", "pk")
        .mode(if (r == 0) "overwrite" else "append").save(dir)
    }
    def lookup(): Long =
      spark.read.format(fmt).option("pk", "pk").load(dir)
        .filter(col("pk") === 100L).count()
    assert(lookup() == 1L)
    val after1 = TokenRangeSource.bloomFooterReads.get()
    assert(lookup() == 1L)
    val after2 = TokenRangeSource.bloomFooterReads.get()
    assert(after2 == after1,
      s"the second identical plan must probe the CACHE, not the footers " +
        s"(reads went $after1 -> $after2)")
    // a different key in the SAME bucket (same candidate files) still
    // hits the cached blooms — the cache keys on (file, column), not on
    // the probed value
    // same bucket AND same tranche file (64..127): the zone-map prune
    // narrows candidates per probed key before the bloom, so a key from
    // another tranche would legitimately open that tranche's footer
    val sameBucket = (64L until 128L).find(k =>
      k != 100L && TokenLayout.bucketOfValue(k) == TokenLayout.bucketOfValue(100L)).get
    val hit = spark.read.format(fmt).option("pk", "pk").load(dir)
      .filter(col("pk") === sameBucket).count()
    assert(hit == 1L)
    assert(TokenRangeSource.bloomFooterReads.get() == after2,
      "a different probe value over the same files must not re-read")
  }

  test("composite full-equality lookup: per-component blooms keep a strict file subset within the owning bucket") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_comp").toString
    // pk=(a, b): three appends with DISJOINT component domains, so the
    // owning bucket accumulates several files of which only one can
    // contain any given tuple
    (0 until 3).foreach { r =>
      spark.range(r * 100, r * 100 + 40)
        .select(col("id").as("a"), (col("id") + 1000).as("b"),
          concat(lit("x"), col("id")).as("v"))
        .write.format(fmt).option("pk", "a,b")
        .mode(if (r == 0) "overwrite" else "append").save(dir)
    }
    val t = spark.read.format(fmt).option("pk", "a,b").load(dir)
    // the probed tuple lives in the SECOND tranche: its bucket may hold
    // files from all three, but components a=110/b=1110 exist only in one
    val q = t.filter(col("a") === 110L && col("b") === 1110L)
    assert(q.count() == 1L)
    val plan = q.queryExecution.executedPlan.toString()
    val pruned = "PrunedFiles: (\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(pruned.isDefined, s"plan must report the prune:\n${plan.take(900)}")
    val (kept, total) = (pruned.get.group(1).toInt, pruned.get.group(2).toInt)
    assert(kept == 1,
      s"per-component blooms must keep exactly the one file holding the " +
        s"tuple's components, kept $kept/$total")
    // PARTIAL equality (only `a`): no bucket routing, no bloom probe —
    // the result is exact through the residual filter
    assert(t.filter(col("a") === 110L).count() == 1L)
  }

  test("composite TEXT keys get the bloom prune too (zone maps cannot cover strings)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_txt").toString
    (0 until 3).foreach { r =>
      spark.range(r * 50, r * 50 + 30)
        .select(concat(lit("user"), col("id")).as("u"),
          concat(lit("dev"), col("id")).as("d"), col("id").as("n"))
        .write.format(fmt).option("pk", "u,d")
        .mode(if (r == 0) "overwrite" else "append").save(dir)
    }
    val t = spark.read.format(fmt).option("pk", "u,d").load(dir)
    val q = t.filter(col("u") === "user60" && col("d") === "dev60")
    assert(q.count() == 1L)
    val plan = q.queryExecution.executedPlan.toString()
    val pruned = "PrunedFiles: (\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(pruned.isDefined && pruned.get.group(1).toInt == 1,
      s"TEXT composite lookup must bloom-prune to one file:\n${plan.take(900)}")
  }

  test("SAI value blooms: non-key TEXT equality keeps a strict file subset (r17)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sai").toString
    // first tranche written BEFORE the index exists — its files carry no
    // value bloom and must be kept conservatively
    spark.range(0, 40).coalesce(1)
      .select(col("id").as("pk"), concat(lit("sess"), col("id")).as("session"),
        col("id").as("n"))
      .write.format(fmt).option("pk", "pk").mode("overwrite").save(dir)
    TokenRangeOps.createIndex(dir, "session")
    // post-declaration tranches with DISJOINT session domains: any given
    // session value exists in exactly one of them
    (1 until 4).foreach { r =>
      spark.range(r * 100, r * 100 + 40).coalesce(1)
        .select(col("id").as("pk"), concat(lit("sess"), col("id")).as("session"),
          col("id").as("n"))
        .write.format(fmt).option("pk", "pk").mode("append").save(dir)
    }
    val t = spark.read.format(fmt).option("pk", "pk").load(dir)
    // non-key TEXT equality: no bucket prune, no zone map (strings) —
    // the value bloom is the ONLY per-file prune, and it must drop every
    // post-declaration file of the other tranches
    val q = t.filter(col("session") === "sess210")
    assert(q.count() == 1L)
    val plan = q.queryExecution.executedPlan.toString()
    val pruned = "PrunedFiles: (\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(pruned.isDefined, s"plan must report the prune:\n${plan.take(900)}")
    val (kept, total) = (pruned.get.group(1).toInt, pruned.get.group(2).toInt)
    assert(kept < total,
      s"indexed TEXT equality must keep a STRICT subset, kept $kept/$total")
    // pre-declaration files (no bloom) keep conservatively: probing a
    // value that lives only there still finds it
    assert(t.filter(col("session") === "sess7").count() == 1L)
    // a value in NO file: every post-declaration file drops
    assert(t.filter(col("session") === "sess99999").count() == 0L)
    // IN-lists probe the value union; conjunction with pk equality
    // composes with the pk bloom (keeps intersect)
    assert(t.filter(col("session").isin("sess110", "sess210")).count() == 2L)
    assert(t.filter(col("pk") === 110L && col("session") === "sess110")
      .count() == 1L)
    // a compact AFTER declaring rebuilds every file's bloom, so the
    // pre-declaration tranche's values now prune too
    TokenRangeOps.compact(spark, dir, "pk")
    val q2 = t.filter(col("session") === "sess7")
    assert(q2.count() == 1L)
    // refusals: unknown column, unprobeable dtype
    val ex = intercept[IllegalArgumentException] {
      TokenRangeOps.createIndex(dir, "nope")
    }
    assert(ex.getMessage.contains("no column"), ex.getMessage)
  }

  test("tuple multiget probes component-value UNIONS; results exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_mg").toString
    (0 until 3).foreach { r =>
      spark.range(r * 100, r * 100 + 40)
        .select(col("id").as("a"), (col("id") + 1000).as("b"),
          col("id").as("n"))
        .write.format(fmt).option("pk", "a,b")
        .mode(if (r == 0) "overwrite" else "append").save(dir)
    }
    val t = spark.read.format(fmt).option("pk", "a,b").load(dir)
    val q = t.filter(
      (col("a") === 10L && col("b") === 1010L) ||
        (col("a") === 210L && col("b") === 1210L))
    assert(q.count() == 2L)
    assert(q.select("a").collect().map(_.getLong(0)).toSet == Set(10L, 210L))
  }
}
