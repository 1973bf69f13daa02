package graft

import org.apache.spark.sql.SparkSession

/** Session configuration shared by Verify, Bench, tests and library users.
  *
  * Everything here is sized for the driver's `local[32]` harness but chosen
  * so the same settings generalize to a multi-executor cluster:
  *   - AQE on: runtime coalescing / skew-join splitting replaces hand-tuned
  *     partition counts at 100 TB.
  *   - `nanosAsLong`: the `events` table carries parquet TIMESTAMP(NANOS),
  *     which Spark's vectorized reader does not support natively; reading it
  *     as a nanosecond Long keeps event-time arithmetic exact (no µs
  *     truncation), which the sessionization and interval-join operators
  *     rely on for determinism.
  */
object GraftSession {

  /** Apply the standard graft tuning to an existing builder. */
  def tune(b: SparkSession.Builder, shufflePartitions: Int = 32): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE is disabled INSIDE cached plans unless this is on, so every
      // persist() in the iterative kernels (PageRank/HITS/CC edge and
      // node tables) froze the full spark.sql.shuffle.partitions count
      // into the cache, and every downstream stage paid one task per
      // frozen partition per iteration. With it on, AQE right-sizes the
      // cached plan's output by bytes — the scale-adaptive behavior this
      // session already asks for everywhere else (measured: directed
      // PageRank 2.9 s → 0.9 s at sf0.1; only partitioning changes,
      // never values).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      // Straggler mitigation for CLUSTER deployments: speculative
      // re-launch of the slowest quartile. NOTE: a no-op under local[N]
      // (TaskSchedulerImpl only starts the speculation thread when
      // !isLocal), so it cannot mask local measurements; on a real
      // cluster it engages. All graft tasks are either pure or idempotent
      // side-effect writers, so duplicate attempts are safe.
      .config("spark.speculation", "true")
      .config("spark.speculation.multiplier", "3")
      .config("spark.speculation.quantile", "0.75")
      // bucketed-table layouts (sources.Bucketing) need a writable
      // warehouse; keep it out of the working tree
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")

  /** Standalone session for tests / ad-hoc runs. */
  def local(threads: Int = 4): SparkSession = {
    val s = tune(
      SparkSession.builder().master(s"local[$threads]").appName("graft"),
      shufflePartitions = math.max(4, threads)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Defensive runtime re-apply for sessions we did not build (the driver
    * may hand `SparkEntry.queries` a vanilla session). All of these confs
    * are runtime-settable SQLConfs.
    */
  def ensureRuntimeConfs(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // see tune(): lets AQE right-size cached-plan output partitioning
    spark.conf.set(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    // Iterative operators (connected components, PageRank) materialize a
    // per-round checkpoint, and eager checkpoints keep whatever partition
    // count the shuffle produced — AQE coalescing does not reach across
    // the checkpoint boundary. On a vanilla session the 200-partition
    // default made the 3-iteration PageRank ~11× slower (40 s vs 3.6 s at
    // sf0.1 on 32 cores: per-task overhead × tiny partitions × rounds).
    // Resize only if still at Spark's literal default so an explicitly
    // tuned session keeps its choice.
    if (spark.conf.get("spark.sql.shuffle.partitions") == "200")
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(4, Runtime.getRuntime.availableProcessors).toString)
    // Optimizer upgrade for plain `max_by`: rewrite to the hash-aggregable
    // native argmax (see graft.plans.RewriteMaxBy). extraOptimizations is
    // runtime-mutable, so vanilla sessions get it too; guard against
    // double registration on repeated ensure calls.
    //
    // API NOTE (session-wide side effect): this mutates the optimizer of
    // the WHOLE session, including queries a library user runs outside
    // graft — semantics are preserved (same winners modulo max_by's
    // documented tie nondeterminism; -0.0/0.0 orderings tie exactly like
    // Spark SQL comparison, see ArgMaxByOrd.cmp), but a user who wants a
    // pristine optimizer can set spark.graft.rewriteMaxBy=false before
    // the first graft call.
    val rewriteEnabled = spark.conf
      .getOption("spark.graft.rewriteMaxBy").forall(_.toBoolean)
    if (rewriteEnabled &&
        !spark.experimental.extraOptimizations.contains(graft.plans.RewriteMaxBy))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteMaxBy
    val boundedLevEnabled = spark.conf
      .getOption("spark.graft.rewriteBoundedLev").forall(_.toBoolean)
    if (boundedLevEnabled && !spark.experimental.extraOptimizations
        .contains(graft.plans.RewriteBoundedLevenshtein))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteBoundedLevenshtein
    spark
  }
}
