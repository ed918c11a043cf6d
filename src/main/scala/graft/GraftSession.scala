package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Local mode is a stand-in for a multi-executor cluster: shuffle partitions
  * scale with cores (never the 200 default), AQE stays on (runtime coalesce +
  * skew-join splitting — the Spark analog of the reference's
  * `schedule(dynamic,2048)` load balancing, /root/reference/inc/pagerank.hxx:202).
  */
object GraftSession {
  /** Shuffle/spill directory: tmpfs when available (env GRAFT_LOCAL_DIR
    * overrides). This sandbox's /tmp sits on a virtualized block device —
    * at 32 cores a ~2 GB/superstep shuffle through the hypervisor turns
    * 60%+ of CPU into system time and caps scaling; /dev/shm is the
    * single-box analog of the per-executor local NVMe every real cluster
    * node gives its shuffle service. Shuffle files are reclaimed by the
    * ContextCleaner as lineage is truncated each superstep, so residency
    * stays bounded. */
  private def localDir: String = sys.env.getOrElse("GRAFT_LOCAL_DIR", {
    val shm = new java.io.File("/dev/shm")
    // Capacity-gated: a superstep shuffles ~2 GB here and the cleaner lags a
    // superstep behind — on hosts with a small tmpfs (Docker's 64 MB /dev/shm
    // default) preferring it would fail mid-job with ENOSPC, so require a
    // sane floor of headroom before leaving the default tmpdir.
    val floorBytes = 8L * 1024 * 1024 * 1024
    if (shm.isDirectory && shm.canWrite && shm.getUsableSpace >= floorBytes)
      "/dev/shm/graft-spark"
    else System.getProperty("java.io.tmpdir")
  })

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft-linkgraph")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // rank vectors are checkpointed per superstep for lineage truncation
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      // The ContextCleaner is weak-reference-driven: shuffle/broadcast/
      // accumulator registrations (and their on-disk files) are reclaimed
      // only after a GC collects the owning object. On this 48 GB fixed
      // pre-touched heap the live set is ~1-2 GB, old-gen collections
      // essentially never trigger organically, and driver-side objects that
      // survive a few young GCs get promoted and sit uncollected — with the
      // default 30min periodic GC a long-lived incremental stream
      // accumulated ~76k tmpfs shuffle files and hundreds of map-output
      // registrations in under an hour. A 2-minute periodic full GC costs
      // ~100 ms on this live set and keeps residency bounded.
      .config("spark.cleaner.periodicGC.interval", "2min")
      // NOTE: do NOT set spark.shuffle.sort.bypassMergeThreshold=0 here.
      // It was tried session-wide (to spare the dynamic loop's near-empty
      // message shuffles the bypass writer's 32-files-per-map-task setup
      // cost) and it moved the DataFrame engine's large SQL exchanges onto
      // UnsafeShuffleWriter, whose 64 MB on-heap pages are HUMONGOUS
      // allocations on a 48 GB G1 heap — young GC degraded to ~1.7 s per
      // collection ("G1 Humongous Allocation"), DataFrame supersteps ran
      // ~15× slower, and a full bench died on a 267 s GC freeze. The
      // near-empty-shuffle fix is scoped to the dynamic message shuffles
      // instead (CsrDynamic.msgShuffle forces the sort path per-shuffle
      // via a map-side combine); SQL exchanges keep the zero-allocation
      // bypass writer they were measured green with.
      // Survive multi-minute whole-JVM stalls (hypervisor steal / GC): the
      // default spark.network.timeout=120s lets HeartbeatReceiver remove the
      // local-mode "executor driver" after one long stall — observed as a
      // 267 s freeze killing a 58-min bench run ("Removing executor driver
      // with no recent heartbeats: 267394 ms exceeds timeout 120000"). On a
      // real cluster the same setting is standard straggler tolerance; in
      // local mode removing the only executor is pure self-destruction.
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "20s")
      // Long-running iterative workloads emit thousands of tiny jobs; with
      // the default 10k listener queue the appStatus queue overflows and
      // DROPPED stage/job-completion events leave the AppStatusListener's
      // live-entity maps growing forever (observed: 41M live RDDInfo
      // objects / ~17 GB after ~70 endurance batches). A larger queue plus
      // tight retention caps keeps the status store bounded; the UI is
      // disabled anyway.
      .config("spark.scheduler.listenerbus.eventqueue.capacity", "30000")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "10000")
      .config("spark.ui.dagGraph.retainedRootRDDs", "20")
      .config("spark.sql.ui.retainedExecutions", "50")

  /** NOTE: does NOT detach the AppStatusListener — `sc.statusTracker` (and
    * a console progress bar, if enabled) keep working for framework users.
    * Long-lived iterative drivers that never read the status store should
    * opt in to the detach via [[tameStatusListener]] (Bench does, forced)
    * or `GRAFT_TAME_STATUS=1`; the retention caps in [[builder]] bound the
    * store for everyone else. */
  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    tameStatusListener(s)
    s
  }

  /** On sessions with the UI disabled, detach the AppStatusListener —
    * nothing reads its store, and on long-running iterative workloads it
    * leaks driver memory unboundedly once its event queue saturates (see
    * org.apache.spark.GraftSparkBridge.detachAppStatusListener).
    *
    * SIDE EFFECT: a detached listener means `sc.statusTracker` and any
    * other status-store consumer silently observe an empty store, so this
    * is opt-in (ADVICE r4): it fires only when `force = true` (the bench
    * mains, which own their sessions end-to-end) or the user set
    * `GRAFT_TAME_STATUS=1`; it never fires while the UI is enabled. */
  def tameStatusListener(s: SparkSession, force: Boolean = false): Unit = {
    val optedIn = force || sys.env.get("GRAFT_TAME_STATUS").contains("1")
    if (optedIn && !s.sparkContext.getConf.getBoolean("spark.ui.enabled", true))
      org.apache.spark.GraftSparkBridge.detachAppStatusListener(s.sparkContext)
  }
}
