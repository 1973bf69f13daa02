package graft
import org.apache.spark.sql.SparkSession
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

object Bench {

  /** JVM environment snapshot. The round-2 driver bench came in ~10x over
    * identical local runs with a bimodal per-query pattern (codegen-heavy
    * queries 10-50x slower, scan-shaped queries unaffected) — the signature
    * of a JIT code-cache / heap / core-count mismatch in the benching JVM,
    * not of the plans. Emitting the actual JVM configuration into the bench
    * JSON makes the next such discrepancy diagnosable from the artifact
    * alone.
    */
  private def envDiag(spark: SparkSession): (String, String) = {
    val rt = Runtime.getRuntime
    val args = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
    val codeCacheMax = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getName.contains("CodeHeap") || p.getName.contains("Code Cache"))
      .map(p => Option(p.getUsage).map(_.getMax).getOrElse(0L)).sum
    val gcMs = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
    val master = spark.sparkContext.master
    val json =
      s""""env":{"master":"$master","maxHeapMb":${rt.maxMemory / (1 << 20)},""" +
      s""""codeCacheMb":${codeCacheMax / (1 << 20)},"cores":${rt.availableProcessors},""" +
      f""""gcMs":$gcMs,"loadavgStart":$loadAvgAtStart,"loadavg":$loadAvg,"calibSec":$calibSec%.3f}"""
    val human = s"master=$master heap=${rt.maxMemory / (1 << 20)}m " +
      s"codeCache=${codeCacheMax / (1 << 20)}m cores=${rt.availableProcessors} " +
      f"gcMs=$gcMs loadavgStart=$loadAvgAtStart loadavgEnd=$loadAvg calibSec=$calibSec%.3f " +
      s"jvmArgs=${args.filter(a => a.startsWith("-X") || a.startsWith("-Xmx")).mkString(" ")}"
    (json, human)
  }

  /** Fixed CALIBRATION probe — the same data-independent Spark job every
    * round (xxhash64-sum over 400M generated rows, best of 2, measured
    * after warmup), so cross-round trend reads can normalize out BOX
    * drift: round 9's quiet box got uniformly ~1.5× slower across a
    * mid-round reboot and the headline total was unreadable without
    * within-round forensics. A query total divided by calibSec is
    * box-invariant up to scheduler noise. */
  @volatile private var calibSec: Double = -1.0
  private def calibrate(spark: SparkSession): Unit =
    calibSec = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      // bit_xor, not sum: ANSI mode overflows on summing full-range longs
      spark.range(400000000L).selectExpr("bit_xor(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e9
    }.min

  /** Load average sampled BEFORE any query runs (re-sampled after the
    * quiet-gate wait in main). The end-of-run loadavg is dominated by the
    * bench's own local[32] load (an idle box still ends near ~5), so only
    * the start sample distinguishes "another process was competing" from
    * "the bench used the machine it was given". Round-5's apparent 32%
    * regression was exactly this misreading. */
  @volatile private var loadAvgAtStart: Double = loadAvg

  /** 1-minute system load average — a bench JVM on an otherwise-idle
    * 32-core box should see ≲32 once warm; a value far above that means
    * ANOTHER process was competing for the machine during the run and the
    * timings measure contention, not the plans. */
  private def loadAvg: Double =
    try scala.io.Source.fromFile("/proc/loadavg").getLines().next()
      .split(" ").head.toDouble
    catch { case _: Throwable => -1.0 }

  private def gcMillis: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to every core: the driver harness is local[32]; a fallback of
    // a small constant would silently bench a quarter of the machine if the
    // env var is ever absent.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    // QUIET GATE (round-10 lesson: the checked-in driver bench shipped
    // from a loadavg-8.1 box and inflated tail queries 3-8×): rather than
    // only stamping contended=true after the fact, WAIT — bounded — for
    // the machine to go quiet before measuring anything. A run that
    // starts anyway after the wait budget still carries the honest
    // contended flag, so a quiet artifact is never overwritten silently
    // by a worse one without the flag saying so.
    val quietLimit = sys.env.getOrElse("SPARK_GRAFT_QUIET_LIMIT", "1.0").toDouble
    val quietWaitMs = sys.env.getOrElse("SPARK_GRAFT_QUIET_WAIT_SEC", "600").toLong * 1000L
    val waitT0 = System.currentTimeMillis()
    while (loadAvg > quietLimit &&
        System.currentTimeMillis() - waitT0 < quietWaitMs) {
      System.err.println(f"[bench] box busy: loadavg=$loadAvg%.2f > " +
        f"$quietLimit%.1f — waiting for quiet " +
        s"(${(System.currentTimeMillis() - waitT0) / 1000}s of ${quietWaitMs / 1000}s budget)")
      Thread.sleep(15000L)
    }
    loadAvgAtStart = loadAvg // the sample the contended flag judges
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup so the first measured query doesn't absorb
    // classloading + codegen compiler startup; calibrate BEFORE the
    // startup banner so no env line ever shows the -1 sentinel
    spark.range(1000000).selectExpr("sum(id)").collect()
    calibrate(spark)
    System.err.println(s"[bench] ${envDiag(spark)._2}")
    // best-of-2 per query: this container exhibits stochastic multi-×
    // single-task stalls unrelated to the plan; min-of-two is the
    // standard way to report the query's actual cost
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = picked.map { case (name, fn) =>
      System.err.println(s"[bench] start $name")
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val gc0 = gcMillis
        // noop sink (not count()): count() lets Catalyst prune every
        // unused projection column, under-measuring narrow compute-heavy
        // queries; the noop write computes all columns like Verify does
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] FAILED $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
              errors.getOrElseUpdate(name, e.getClass.getSimpleName)
              false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        val dgc = gcMillis - gc0
        if (dgc > 1000) System.err.println(f"[bench] $name gc=${dgc / 1000.0}%.1fs of $dt%.1fs")
        // drop frames persisted inside operators so queries are timed in
        // isolation and the block manager doesn't accumulate stale caches
        spark.catalog.clearCache()
        // ...and the RDD-level blocks clearCache never reaches: every
        // localCheckpoint(true) in the iterative kernels registers
        // MEMORY_AND_DISK blocks that are only released when the driver
        // GCs the RDD object and the ContextCleaner runs — across 232
        // queries the stale blocks squeeze the unified memory region the
        // live query's execution needs. No rep reuses a prior rep's
        // checkpoint RDDs (each rep replans from the query function), so
        // eager release keeps queries isolated, same as clearCache.
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        // a failed query must not bench as its (tiny) time-to-failure: a
        // naive parser would read ~0.1s "times" for broken queries as real
        // (the round-6 events breakage did exactly that) — record -1.
        if (ok) dt else -1.0
      }
      val good = runs.filter(_ >= 0)
      val best = if (good.nonEmpty) good.min else -1.0
      System.err.println(f"[bench] done $name in $best%.1fs (runs: ${runs.map(r => f"$r%.1f").mkString(", ")})")
      name -> best
    }
    // The driver captures only the TAIL of stdout (a few KB); for three
    // rounds the single long JSON line lost its FRONT (metric/value and
    // the first queries) to that window. Three-part fix:
    //   1. the full JSON is WRITTEN to BENCH_local_r<N>.json in the repo
    //      (committed → the judge always has complete data);
    //   2. stdout line 1 is the full JSON with "queries" FIRST, so if the
    //      front is truncated the surviving tail still carries total+env;
    //   3. the LAST stdout line is a short self-contained summary object
    //      (always inside any tail window, parseable alone).
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // failed queries carry -1 in "queries" and are excluded from the total
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val (envJson0, envHuman) = envDiag(spark)
    // Self-describing validity: the round-6 driver artifact ran with a
    // 91 GiB heap on a loadavg-3.9 box and recorded 7-80x blow-ups that
    // evaporated on a quiet re-run. Flag any run whose JVM or machine
    // deviates from the tuned shape (8 GiB heap, idle start) so trend
    // comparisons can skip contaminated artifacts without forensics.
    val tunedHeapMb = 8192L
    val heapMb = Runtime.getRuntime.maxMemory / (1 << 20)
    val contended = loadAvgAtStart > 1.0 || math.abs(heapMb - tunedHeapMb) > 512
    if (contended) System.err.println(
      f"[bench] WARNING contended/mistuned run: loadavgStart=$loadAvgAtStart%.2f " +
      s"(want <1), heapMb=$heapMb (want ~$tunedHeapMb) — timings measure " +
      "contention, not plans; re-run on a quiet box before comparing")
    val envJson = envJson0.dropRight(1) + s""","contended":$contended}"""
    val errJson = if (errors.isEmpty) ""
      else errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
        .mkString(""","errors":{""", ",", "}")
    System.err.println(s"[bench] end $envHuman contended=$contended")
    val localFile = try {
      // Only a run at the benchmark scale may replace the committed
      // artifact: local sf0.001/sf0.01 iteration runs used to clobber
      // BENCH_local_r<N>.json with numbers from the wrong scale (the
      // round-6 baseline-contamination lesson, generalized). Off-scale
      // runs keep the full JSON too — just under /tmp. A PARTIAL run
      // (SPARK_GRAFT_ONLY) is diverted the same way: a 3-query solo
      // measurement must never replace the committed 232-query artifact
      // (it did once in round 14 — recovered from the run log).
      val repo = if (sfDir.stripSuffix("/").endsWith("sf0.1") && only.isEmpty)
        new java.io.File("/root/repo")
        else new java.io.File("/tmp")
      val prior = Option(repo.listFiles).getOrElse(Array.empty[java.io.File])
        .flatMap(f => "^BENCH_r0*(\\d+)\\.json$".r.findFirstMatchIn(f.getName)
          .map(_.group(1).toInt))
      val next = if (prior.isEmpty) 1 else prior.max + 1
      val f0 = new java.io.File(repo, s"BENCH_local_r$next.json")
      // A contended capture must NEVER replace a quiet one (rounds 11+12:
      // the close-out run clobbered the committed quiet artifact with a
      // loadavg-7 capture whose per-query numbers were unusable). If the
      // target already holds a contended:false run and THIS run is
      // contended, divert to a suffixed file — the quiet artifact stays.
      val f =
        if (contended && f0.exists() &&
            java.nio.file.Files.readString(f0.toPath).contains("\"contended\":false"))
          new java.io.File(repo, s"BENCH_local_r${next}_contended.json")
        else f0
      if (f ne f0) System.err.println(
        s"[bench] refusing to overwrite quiet $f0 with a contended run; writing $f")
      java.nio.file.Files.writeString(f.toPath,
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs$errJson,$envJson,"sf":"$sfDir"}%n""")
      f.toString
    } catch { case _: Throwable => "" } // read-only checkout: stdout still carries everything
    println(f"""{"queries":$qs$errJson,"metric":"total","value":$total%.3f,"unit":"sec",$envJson,"sf":"$sfDir"}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec",$envJson,"sf":"$sfDir","queries_file":"$localFile"}""")
    spark.stop()
  }
}
