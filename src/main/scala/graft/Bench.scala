package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.EdgeOps
import graft.util.Ckpt._
import graft.ingest.WebGraphFixture
import graft.model.PagerankOptions
import graft.pagerank.{CsrDynamic, CsrPageRank, PageRank}
import graft.pagerank.CsrPageRank.CsrGraph
import graft.pagerank.CsrDynamic.CsrState

/** Benchmark main — prints ONE JSON line.
  *
  * North metric (BASELINE.json / BASELINE.md): edges/sec per PageRank
  * superstep, with throughput scaling efficiency ≥ 0.8 from N to 4N
  * parallelism. No real cluster exists in this sandbox, so the
  * two-cluster-size criterion is evidenced by running the identical job at
  * local[N] and local[4N] on the same deterministic fixture (protocol in
  * BASELINE.md; mirrors the reference's thread-doubling scaling,
  * /root/reference/README.md:20).
  *
  * Protocol notes (round 5 — the round-4 protocol measured well but did not
  * FIT: the driver's re-run was killed on timeout mid-phase-3 and, because
  * the single emit ran only at the very end, the official artifact recorded
  * `rc: 124, parsed: null`. Three changes own the fix):
  *  1. INCREMENTAL EMIT. After every completed phase the full field set so
  *     far is rewritten to BENCH_LAST.json (with a `phases_completed`
  *     marker) and a JVM shutdown hook is armed with the same snapshot: a
  *     kill at ANY point still prints a parseable compact line on stdout
  *     (SIGTERM runs shutdown hooks) and leaves a parseable mirror file.
  *     The final line is printed exactly once on a normal exit.
  *  2. WALL-CLOCK BUDGET. GRAFT_BENCH_BUDGET_SECS (default 2400) is checked
  *     before each phase, each scaling pair, and each dynamic batch; when
  *     the remaining budget cannot cover the next unit plus the reserve the
  *     later phases need, the run skips forward and emits what finished.
  *  3. SMALLER DEFAULTS sized to fit ~40 min on this box: 5 scaling pairs
  *     (was 7) of 6 supersteps (was 8), 5 oracled dynamic batches (was 10),
  *     3 sweep batches per fraction (was 5), and the fixed-cost
  *     decomposition probe + no-op floor measurement run only under
  *     GRAFT_BENCH_PROBE=1.
  *
  * Measurement protocol (unchanged from round 4 where not noted):
  *  - each scaling pair is an (N-core run, 4N-core run) measured
  *    back-to-back so slow-hour noise hits both sides of a ratio;
  *  - ONE warmup pair runs first (shorter: 4 supersteps) and is excluded
  *    (JVM JIT + page-cache fill inflate whichever side runs first);
  *  - pair ORDER ALTERNATES (N-first on odd pairs, 4N-first on even) so
  *    monotone drift (thermal, background load) cancels across the median;
  *  - BOTH estimators ship with equal prominence and the headline
  *    `scaling_efficiency_n_to_4n` is the MIN of the two (ADVICE r4): the
  *    min-step ratio (tightest uninterfered-rate bound; stall bursts are
  *    additive) and the median-step ratio (robust to the min's asymmetric
  *    stall exposure — 4-core steps run ~4× longer, so stalls contaminate
  *    the 4-core minimum more often, inflating the min-step ratio
  *    one-directionally). The acceptance criterion is stated over both.
  *  - Absolute `throughput_n/4n` are MEDIANS over pairs (best-of ships
  *    separately as `*_best`) — max-of-pairs was a systematically
  *    optimistic point estimate (VERDICT r4 wrong #5).
  *  - The dynamic experiment follows the reference loop exactly
  *    (/root/reference/main.cxx:47-107): per batch, a FRESH static baseline
  *    is run on the updated graph and every technique's L1 error is
  *    measured against a high-precision oracle on that same graph
  *    (main.cxx:85,55). One 1e-15 run serves as both (the 1e-10 crossing
  *    wall/iters are recorded mid-run). Speedups are per-batch ratios —
  *    baseline and technique share the same minutes-window — summarized by
  *    their median.
  *  - The reference's batch-FRACTION axis (/root/reference/main.sh:54-56,
  *    README.md:12: 1e-5/1e-4/1e-3·|E|): after the oracled 1e-4 track, the
  *    SAME carried engines advance through 1e-5 and 1e-3 slices with a
  *    per-batch 1e-10 static baseline (timing only — the L1 evidence lives
  *    on the 1e-4 track).
  *  - The dynamic engine measured is [[CsrDynamic]] (the PagerankOptions
  *    .useCsr route of the public dynamicFrontier/Prune API, carried-state
  *    form). The DataFrame-superstep dynamic variants are correctness-
  *    verified (DuckDB oracles, ScalaTest) but floored at O(|V|) rows ×
  *    4-5 jobs per superstep — measured only when GRAFT_BENCH_DF_BATCHES>0.
  *
  * Emit contract (S6): stdout carries ONLY headline scalars (≤ ~1.5 KB —
  * the round driver tails the last 2,000 chars of output; r3's 2,770-char
  * line arrived decapitated and the official artifact recorded
  * `parsed: null`). The full per-batch arrays ship in BENCH_LAST.json.
  */
object Bench {

  // ---- incremental-emit machinery (VERDICT r4 item 1) ---------------------
  @volatile private var finalEmitted = false
  @volatile private var snapshot: Seq[(String, String, Boolean)] = Nil
  private val hookArmed = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** On SIGTERM/normal exit without a final emit (the driver's timeout kill
    * lands as SIGTERM, which DOES run shutdown hooks), print the compact
    * line of the last COMPLETED phase so the driver's stdout tail still
    * parses. A normal run prints exactly once (finalEmitted guards). */
  private def armShutdownHook(): Unit =
    if (hookArmed.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        if (!finalEmitted && snapshot.nonEmpty) {
          printCompact(snapshot)
          Console.out.flush()
        }
      }))

  private def session(cores: Int, forPagerank: Boolean): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = GraftSession.builder(s"local[$cores]", cores)
    if (forPagerank) {
      // The superstep plan is fixed and both join sides are pre-partitioned:
      // AQE's per-job re-planning only adds latency here (measured 2.9×
      // slower at local[8]), and a shuffled hash join beats re-sorting the
      // big cached edge table every superstep (measured ~15-20%).
      b.config("spark.sql.adaptive.enabled", "false")
      b.config("spark.sql.join.preferSortMergeJoin", "false")
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftSession.tameStatusListener(s, force = true)
    s
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.filterNot(_.isNaN).sorted
    if (s.isEmpty) Double.NaN
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  private def arr(xs: Seq[Double], fmt: String = "%.3f"): String =
    xs.map(v => if (v.isNaN) "null" else fmt.format(v)).mkString("[", ",", "]")

  /** Whole-process CPU seconds (diagnosing stall vs bandwidth saturation). */
  private def procCpuSecs(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        b.getProcessCpuTime / 1e9
      case _ => Double.NaN
    }

  /** Cumulative hypervisor steal time (core-seconds) from /proc/stat —
    * time this guest's vCPUs were runnable but not scheduled by the host.
    * Steal bursts are the one interference mode invisible to everything
    * else we ship (the step trace shows a slow step, busy-cores barely
    * moves); measured bursts on this box reach ~125 core-seconds inside a
    * 30-second window. 0.0 where unavailable (non-Linux). */
  private def stealCoreSecs(): Double =
    try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines()
        .next().trim.split("\\s+")
      if (f.length > 8) f(8).toDouble / 100.0 else 0.0
    } catch { case _: Throwable => 0.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    if (sys.env.get("GRAFT_BENCH_ENDURANCE").contains("1")) {
      enduranceMain(cpus)
      return
    }
    armShutdownHook()
    // ---- wall-clock budget (VERDICT r4 item 1b) --------------------------
    val budgetSecs =
      sys.env.getOrElse("GRAFT_BENCH_BUDGET_SECS", "2400").toDouble
    val tStart = System.nanoTime()
    def remainingSecs: Double = budgetSecs - (System.nanoTime() - tStart) / 1e9

    // Sized so per-superstep compute dominates scheduler fixed overhead at
    // local[4] (≈62M edges, ≥30 s iteration phase) — the scaling-efficiency
    // measurement is meaningless when a superstep is all task-launch latency.
    val benchPages = sys.env.getOrElse("GRAFT_BENCH_PAGES", "12000000").toLong
    val convergePages = sys.env.getOrElse("GRAFT_BENCH_CONVERGE_PAGES", "4000000").toLong
    val throughputSteps = sys.env.getOrElse("GRAFT_BENCH_STEPS", "6").toInt
    val pairs = sys.env.getOrElse("GRAFT_BENCH_PAIRS", "5").toInt
    val weakPages = sys.env.getOrElse("GRAFT_BENCH_WEAK_PAGES",
      (benchPages / 10).toString).toLong
    val probeEnabled = sys.env.get("GRAFT_BENCH_PROBE").contains("1")

    val qTimes = scala.collection.mutable.LinkedHashMap[String, Double]()
    val onlyScaling = sys.env.get("GRAFT_BENCH_ONLY_SCALING").contains("1")

    // (key -> (rendered value, compact?)) in insertion order; re-putting a
    // key updates it in place so later phases can refine earlier fields.
    val fields =
      scala.collection.mutable.LinkedHashMap[String, (String, Boolean)]()
    def put(k: String, v: String, compact: Boolean = true): Unit =
      fields(k) = (v, compact)
    val phasesDone = scala.collection.mutable.ArrayBuffer[String]()
    def currentFields: Seq[(String, String, Boolean)] =
      fields.map { case (k, (v, c)) => (k, v, c) }.toSeq
    /** Phase checkpoint: record the phase, rewrite the mirror file with
      * everything measured so far, and arm the shutdown snapshot. Never
      * prints — the driver contract is ONE stdout line. */
    def phaseDone(name: String): Unit = {
      phasesDone += name
      put("phases_completed",
        phasesDone.map("\"" + _ + "\"").mkString("[", ",", "]"))
      val snap = currentFields
      writeMirror(snap, "BENCH_LAST.json")
      snapshot = snap
      System.err.println(f"[bench] phase '$name' done, elapsed ${
        (System.nanoTime() - tStart) / 1e9}%.0f s, remaining $remainingSecs%.0f s")
    }

    put("metric", "\"edges_per_sec_per_superstep_local32\"")
    put("value", "0")
    put("unit", "\"edges/sec/superstep\"")
    // protocol marker (ADVICE r4): the denominator changed from total-time
    // (r1-r3) to min-step (r4+) — artifacts are not cross-comparable without
    // this tag.
    put("protocol", "\"r5\"")
    put("denominator", "\"min_step\"")
    put("sf", "\"" + sfDir + "\"")
    put("bench_pages", benchPages.toString)

    // ---- Phase 1: headline relational/text/graph queries on the sf dir ----
    val headline = Seq("q_degree_distribution", "q_indegree", "q_triangle_count",
      "q_pagerank_iter3", "q_dedup_exact", "q_token_count", "q_text_quality",
      "q_minhash_lsh", "q_ann_bruteforce", "q_connected_components")
    if (!onlyScaling) {
      val s = session(cpus, forPagerank = false)
      headline.foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          val (_, dt) = time { fn(s, sfDir).collect() }
          qTimes(name) = dt
        }
      }
      put("queries", headline.flatMap(k => qTimes.get(k).map(v =>
        "\"" + k + f"""\":$v%.3f""")).mkString("{", ",", "}"))
      phaseDone("queries")
    }

    // ---- Phase 2: PageRank throughput at N and 4N cores ------------------
    // The fixture (with self-loops) is materialized to parquet ONCE so each
    // measurement session pays a parquet scan, not a 74M-row generate+dedupe.
    val fixtureDir = java.nio.file.Files
      .createTempDirectory("graft-bench-fixture").toString
    val weakDir = java.nio.file.Files
      .createTempDirectory("graft-bench-weak").toString
    locally {
      val s = session(cpus, forPagerank = true)
      def writeFixture(pages: Long, dir: String): Unit =
        EdgeOps.withSelfLoops(
          WebGraphFixture.edgesOnly(s, pages).toDF().select("src", "dst"),
          s.range(pages).select(col("id")))
          .write.mode("overwrite").parquet(dir)
      writeFixture(benchPages, fixtureDir)
      writeFixture(weakPages, weakDir)
      // global JIT/codegen warmup (the JVM is shared by all sessions)
      val warmY = EdgeOps.withSelfLoops(
        WebGraphFixture.edgesOnly(s, benchPages / 40).toDF().select("src", "dst"),
        s.range(benchPages / 40).select(col("id")))
      new PageRank(s, PagerankOptions(tolerance = 0.0, maxIterations = 2)).static(warmY)
      new PageRank(s, PagerankOptions(tolerance = 0.0, maxIterations = 2,
        useCsr = true)).static(warmY)
    }
    // Drain the fixture write's dirty pages BEFORE measurement starts: the
    // ~GB parquet write otherwise flushes asynchronously for minutes and the
    // writeback competes with the first scaling pair for the memory bus (the
    // r5 stress-test run's warmup + pair 1 both sat in exactly such a window).
    try { new ProcessBuilder("sync").start().waitFor() }
    catch { case _: Throwable => () }
    Thread.sleep(3000)
    phaseDone("fixture")

    /** One measured throughput run: `steps` full supersteps on the parquet
      * fixture (tolerance 0 = stop rule off, pure sweep).
      *
      * The headline throughput is |E| / MIN(per-superstep wall) — the
      * standard min-of-identical-repeats timing methodology: the supersteps
      * are byte-identical work (fixed plan, AQE off, stop rule off), and on
      * a shared/virtualized box interference is strictly ADDITIVE
      * (hypervisor steal, GC freezes, co-tenant cache pollution can only
      * slow a step, never speed it up), so the fastest step is the tightest
      * lower-bound estimate of the uninterfered steady-state rate. The
      * MEDIAN-step throughput ships with equal prominence (ADVICE r4): the
      * min is exposed to asymmetric stall contamination (N-core steps run
      * ~4× longer than 4N-core steps, so stall bursts hit the N-side
      * minimum more often and inflate the ratio one-directionally), and a
      * real scaling property should clear the bar on both estimators.
      * @return (edges/sec/superstep [min-step], ditto [median-step],
      *          compute secs, |E|, busy-cores, per-step secs,
      *          steal fraction of the side's core-capacity) */
    def throughputRun(cores: Int, useCsr: Boolean, dir: String,
        steps: Int = throughputSteps)
        : (Double, Double, Double, Long, Double, Seq[Double], Double) = {
      val s = session(cores, forPagerank = true)
      val y = s.read.parquet(dir).cache()
      val nEdges = y.count()
      val opts = PagerankOptions(tolerance = 0.0, maxIterations = steps)
      val cpu0 = procCpuSecs()
      val steal0 = stealCoreSecs()
      val w0 = System.nanoTime()
      val stats =
        if (!useCsr) {
          val pr = new PageRank(s, opts)
          val ls = pr.buildLinks(y)
          pr.static(y, Some(ls)).stats
        } else {
          val c = new CsrPageRank(s, opts)
          val g = c.build(y)
          c.staticOnGraph(g).stats
        }
      val sec = stats.computeTimeMs / 1e3
      val stepSecs = stats.stepTimesMs.map(_ / 1e3)
      val minStep =
        if (stepSecs.nonEmpty) stepSecs.min else sec / steps
      val medianStep =
        if (stepSecs.nonEmpty) median(stepSecs) else sec / steps
      val wall = (System.nanoTime() - w0) / 1e9
      val busyCores = (procCpuSecs() - cpu0) / math.max(wall, 1e-9)
      val stealFrac =
        (stealCoreSecs() - steal0) / math.max(wall * cores, 1e-9)
      // settle between measurements: let the ContextCleaner drain and the
      // heap quiesce so one run's teardown doesn't bill the next run
      s.stop()
      System.gc()
      Thread.sleep(1000)
      (nEdges.toDouble / minStep, nEdges.toDouble / medianStep, sec, nEdges,
        busyCores, stepSecs, stealFrac)
    }

    val coresN = sys.env.getOrElse("GRAFT_BENCH_CORES_N", "4").toInt
    val cores4N = sys.env.getOrElse("GRAFT_BENCH_CORES_4N", (coresN * 4).toString).toInt

    val stepTraces = scala.collection.mutable.ArrayBuffer[(String, Seq[Double])]()

    /** One back-to-back pair; `nFirst` controls order (alternated by the
      * caller to cancel monotone drift).
      * @return (thrN min-step, thr4N min-step, |E|, busyN, busy4N,
      *          median-step pair ratio, thrN median-step, thr4N median-step,
      *          stealFracN, stealFrac4N) */
    def measurePair(nFirst: Boolean, steps: Int = throughputSteps)
        : (Double, Double, Long, Double, Double, Double, Double, Double,
           Double, Double) =
      if (nFirst) {
        val (thrN, thrNMed, _, _, busyN, stN, sfN) =
          throughputRun(coresN, useCsr = false, fixtureDir, steps)
        val (thr4N, thr4NMed, _, nE, busy4N, st4N, sf4N) =
          throughputRun(cores4N, useCsr = false, fixtureDir, steps)
        stepTraces += (("n", stN)); stepTraces += (("4n", st4N))
        (thrN, thr4N, nE, busyN, busy4N, thr4NMed / (4.0 * thrNMed),
          thrNMed, thr4NMed, sfN, sf4N)
      } else {
        val (thr4N, thr4NMed, _, nE, busy4N, st4N, sf4N) =
          throughputRun(cores4N, useCsr = false, fixtureDir, steps)
        val (thrN, thrNMed, _, _, busyN, stN, sfN) =
          throughputRun(coresN, useCsr = false, fixtureDir, steps)
        stepTraces += (("4n", st4N)); stepTraces += (("n", stN))
        (thrN, thr4N, nE, busyN, busy4N, thr4NMed / (4.0 * thrNMed),
          thrNMed, thr4NMed, sfN, sf4N)
      }

    // ---- Phase 3: scaling pairs ------------------------------------------
    // warmup pair: measured and shipped, EXCLUDED from the median; runs
    // fewer supersteps (it exists for JIT/page-cache fill, not estimation)
    val ((warm, warmSecs)) = time(measurePair(nFirst = true,
      steps = math.min(4, throughputSteps)))
    val effWarmup = warm._2 / (4.0 * warm._1)
    // Pair loop with three defenses hardened after the r5 stress-test run
    // (headline 0.751 from 3 pairs, one of which sat in a sustained
    // co-tenancy window that slowed the ENTIRE 4N-side run 3x — even the
    // min-step estimator cannot reject interference that covers every step
    // of one side):
    //  (1) PRE-REGISTERED pair-validity gate on INDEPENDENT signals: a
    //      pair is invalid when (a) either side's process-CPU busy-cores
    //      falls below 0.75x that side's median across pairs (CPU theft
    //      starves THIS process), or (b) either side's window saw
    //      hypervisor STEAL above 5% of that side's core-capacity
    //      (/proc/stat col 9 delta; measured bursts on this box reach ~125
    //      core-seconds in a 30-second window, invisible to busy-cores).
    //      Both signals are measured facts about the window, not the ratio
    //      itself; the gate is symmetric (an N-side stall, which would
    //      INFLATE the ratio, is discarded by the same rules), and the
    //      busy-cores arm is relative, so it can only remove episodic
    //      interference, never a systematic engine property (if every pair
    //      is equally starved, the medians move with them and all pairs
    //      stay valid). All pairs + flags + ungated aggregates ship for
    //      audit.
    //  (2) replacement pairs: the loop targets `pairs` VALID pairs and may
    //      run up to `pairs + 2` total.
    //  (3) budget estimates use the FASTEST observed pair (the last pair's
    //      time is stall-inflated exactly when pairs are being lost), with
    //      a hard guarantee of 4 measured pairs and a scaling-phase
    //      sub-budget so replacements cannot starve the dynamic phases.
    val pairReserve = 700.0
    val scalingBudget =
      sys.env.getOrElse("GRAFT_BENCH_SCALING_SECS", "1150").toDouble
    val tScaling0 = System.nanoTime()
    def scalingElapsed: Double = (System.nanoTime() - tScaling0) / 1e9
    val pairResults = scala.collection.mutable.ArrayBuffer[
      (Double, Double, Long, Double, Double, Double, Double, Double,
       Double, Double)]()
    val pairSecs = scala.collection.mutable.ArrayBuffer[Double]()
    def estPairSecs: Double =
      if (pairSecs.isEmpty) warmSecs * 1.6 else pairSecs.min
    val stealGate = 0.05
    def validFlags: Seq[Boolean] = {
      val stealOk = pairResults.map(p =>
        p._9 <= stealGate && p._10 <= stealGate)
      if (pairResults.size < 3) stealOk.toSeq
      else {
        val medBN = median(pairResults.map(_._4).toSeq)
        val medB4 = median(pairResults.map(_._5).toSeq)
        pairResults.zip(stealOk).map { case (p, sOk) =>
          sOk && p._4 >= 0.75 * medBN && p._5 >= 0.75 * medB4 }.toSeq
      }
    }
    var i = 1
    while (i <= pairs + 2 && validFlags.count(identity) < pairs &&
        (pairResults.size < 2 ||
          (pairResults.size < 4 && remainingSecs > estPairSecs * 1.2) ||
          (scalingElapsed + estPairSecs * 1.3 < scalingBudget &&
            remainingSecs > estPairSecs * 1.3 + pairReserve))) {
      val (p, dt) = time(measurePair(nFirst = i % 2 == 1))
      pairResults += p
      pairSecs += dt
      i += 1
    }
    val flags = validFlags
    val excluded = flags.count(f => !f)
    if (pairResults.size < pairs || excluded > 0)
      System.err.println(s"[bench] scaling: ${pairResults.size} pairs" +
        s" measured, $excluded gated out (cpu starvation / steal)")
    // if the gate would leave fewer than 2 pairs, fall back to all pairs
    val usedPairs = {
      val v = pairResults.zip(flags).collect { case (p, true) => p }.toSeq
      if (v.size >= 2) v else pairResults.toSeq
    }
    val nE = pairResults.head._3
    val effPairs = pairResults.map(p => p._2 / (4.0 * p._1)).toSeq
    val effPairsMedianStep = pairResults.map(_._6).toSeq
    val effMinStep = median(usedPairs.map(p => p._2 / (4.0 * p._1)))
    val effMedianStep = median(usedPairs.map(_._6))
    // headline = MIN of the two estimators (criterion: BOTH ≥ 0.8)
    val efficiency = math.min(effMinStep, effMedianStep)
    // absolute throughputs: MEDIANS over valid pairs; best-of ships labeled
    val thrNMedian = median(usedPairs.map(_._1))
    val thr4NMedian = median(usedPairs.map(_._2))
    val thrNBest = usedPairs.map(_._1).max
    val thr4NBest = usedPairs.map(_._2).max
    val busyN = median(usedPairs.map(_._4))
    val busy4N = median(usedPairs.map(_._5))

    put("value", thr4NMedian.round.toString) // refined by the local32 run
    put("value_source", "\"pairs_4n_median\"")
    put("bench_edges", nE.toString)
    put("cores_n", coresN.toString)
    put("cores_4n", cores4N.toString)
    put("throughput_n", thrNMedian.round.toString)
    put("throughput_4n", thr4NMedian.round.toString)
    put("throughput_n_best", thrNBest.round.toString, compact = false)
    put("throughput_4n_best", thr4NBest.round.toString, compact = false)
    put("eff_warmup", f"$effWarmup%.3f")
    put("eff_pairs", arr(effPairs))
    put("eff_pairs_median_step", arr(effPairsMedianStep))
    put("eff_pairs_excluded", excluded.toString)
    put("eff_pairs_valid",
      flags.map(f => if (f) "1" else "0").mkString("[", ",", "]"))
    put("pair_busy_n", arr(pairResults.map(_._4).toSeq, "%.1f"),
      compact = false)
    put("pair_busy_4n", arr(pairResults.map(_._5).toSeq, "%.1f"),
      compact = false)
    put("pair_steal_n", arr(pairResults.map(_._9).toSeq, "%.3f"),
      compact = false)
    put("pair_steal_4n", arr(pairResults.map(_._10).toSeq, "%.3f"),
      compact = false)
    // ungated aggregates (all pairs, no validity gate) — audit trail
    put("scaling_efficiency_min_step_all", f"${median(effPairs)}%.3f",
      compact = false)
    put("scaling_efficiency_median_step_all",
      f"${median(effPairsMedianStep)}%.3f", compact = false)
    put("scaling_efficiency_min_step", f"$effMinStep%.3f")
    put("scaling_efficiency_median_step", f"$effMedianStep%.3f")
    put("scaling_efficiency_n_to_4n", f"$efficiency%.3f")
    put("cpu_busy_cores_n", f"$busyN%.1f")
    put("cpu_busy_cores_4n", f"$busy4N%.1f")
    // full per-superstep traces (run order, incl. warmup pair) — the audit
    // trail for BOTH per-run estimators (min- and median-superstep): a box
    // stall shows up as one fat outlier step, not as a scaling regression
    put("scaling_step_secs", stepTraces.map { case (side, st) =>
      "{\"side\":\"" + side + "\",\"steps\":" + arr(st) + "}"
    }.mkString("[", ",", "]"), compact = false)
    phaseDone("scaling")

    // ---- Phase 4: single-run points (8→32 pair, CSR, size scaling) -------
    if (remainingSecs > 300) {
      // the bus-saturated 8→32 point, one back-to-back pair; 32-core side
      // also supplies the headline local[32] throughput
      val (thr8, _, sec8, _, _, _, _) = throughputRun(8, useCsr = false, fixtureDir)
      val (thr32, _, sec32, _, _, _, _) = throughputRun(32, useCsr = false, fixtureDir)
      qTimes("pagerank_throughput_local8") = sec8
      qTimes("pagerank_throughput_local32") = sec32
      val eff832 = thr32 / (4.0 * thr8)
      put("value", thr32.round.toString)
      put("value_source", "\"local32_run\"", compact = false)
      put("throughput_local8", thr8.round.toString)
      put("throughput_local32", thr32.round.toString)
      put("eff_8_32_bus_saturated", f"$eff832%.3f")

      // CSR fast path: absolute throughput at both core counts + the
      // size-scaling point (fixed 32 cores, |E| × ~10) — the local-box
      // evidence axis for the CSR engine, whose sub-second supersteps
      // saturate the single shared memory bus before 32 cores.
      val (csr8, _, csrSec8, _, _, _, _) = throughputRun(8, useCsr = true, fixtureDir)
      val (csr32, _, csrSec32, _, _, _, _) = throughputRun(32, useCsr = true, fixtureDir)
      val (csrSmall32, _, csrSmallSec, weakEdges, _, _, _) =
        throughputRun(32, useCsr = true, weakDir)
      qTimes("pagerank_csr_local8") = csrSec8
      qTimes("pagerank_csr_local32") = csrSec32
      qTimes("pagerank_csr_local32_small") = csrSmallSec
      val csrSizeEff = csr32 / csrSmall32
      put("csr_throughput_local8", csr8.round.toString)
      put("csr_throughput_local32", csr32.round.toString)
      put("csr_small_edges", weakEdges.toString, compact = false)
      put("csr_small_throughput_local32", csrSmall32.round.toString, compact = false)
      put("csr_size_scaling_eff", f"$csrSizeEff%.3f")
      put("csr_speedup_vs_dataframe", f"${csr32 / thr32}%.2f")
      phaseDone("points")
    } else System.err.println("[bench] budget: skipping 8/32 + CSR points")

    if (onlyScaling) {
      put("queries", qTimes.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
        .mkString("{", ",", "}"), compact = false)
      emitFinal(currentFields)
      SparkSession.getActiveSession.foreach(_.stop())
      return
    }

    // ---- Phase 5: the reference's dynamic batch experiment, CSR engine ----
    // (/root/reference/main.cxx:47-107, main.sh:21,54-56: insertion batches
    // of batchFraction·|E|, ranks carried per technique, per-batch fresh
    // static baseline + high-precision oracle on the updated graph.)
    if (remainingSecs <= 420) {
      System.err.println("[bench] budget: skipping the dynamic track entirely")
      emitFinal(currentFields)
      return
    }
    val nBatches = sys.env.getOrElse("GRAFT_BENCH_BATCHES", "5").toInt
    val sweepBatches = sys.env.getOrElse("GRAFT_BENCH_SWEEP_BATCHES", "3").toInt
    val oracleTol = 1e-15 // per-vertex error ≤ tol/(1−P) ⇒ L1 ≤ |V|·6.7e-15
    val s = session(cpus, forPagerank = true)
    val staged = WebGraphFixture.edgesOnly(s, convergePages).toDF().cache()
    val m = staged.count()

    // batch schedule: the oracled 1e-4 track, then the reference's fraction
    // sweep (1e-5 smallest-batch regime first — it is the most
    // scheduling-sensitive — then 1e-3)
    val schedule: Seq[(Double, Int, Boolean)] =
      Seq((1e-4, nBatches, true)) ++
        (if (sweepBatches > 0) Seq((1e-5, sweepBatches, false),
          (1e-3, sweepBatches, false))
        else Seq.empty)
    val sliceLens: Seq[Long] = schedule.flatMap { case (f, n, _) =>
      Seq.fill(n)(math.max(1L, (m * f).toLong))
    }
    val totalTail = sliceLens.sum
    val cut0 = m - totalTail
    // seq is sparse (k*64+pos): translate row-count cuts into seq cuts with
    // per-cut quantiles over the ordered stream (exact enough, one pass).
    val cuts: IndexedSeq[Long] = {
      val cumRows = sliceLens.scanLeft(cut0)(_ + _)
      val fracs = cumRows.map(_.toDouble / m)
      val row = staged.agg(expr(
        s"approx_percentile(seq, array(${fracs.mkString(",")}), 1000000)"))
        .collect()(0).getSeq[Long](0)
      row.toIndexedSeq.init :+ Long.MaxValue
    }
    val verts = s.range(convergePages).select(col("id"))
    val x0 = EdgeOps.withSelfLoops(
      staged.where(col("seq") < cuts(0)).select("src", "dst"), verts).cache()

    // One DataFrame-superstep static converge on the base graph: the r1/r2-
    // comparable wall number and the cross-engine speedup denominator.
    val pr = new PageRank(s)
    val ls0 = pr.buildLinks(x0)
    val (dfStaticRun, tDfStatic) = time { pr.static(x0, Some(ls0)) }
    qTimes("pagerank_static_converge_1e10") = tDfStatic
    put("dataframe_static_converge_secs", f"$tDfStatic%.1f")
    put("static_converge_iters", dfStaticRun.stats.iterations.toString)

    // Optional legacy DataFrame-superstep dynamic track (default OFF — the
    // DataFrame superstep is floored at O(|V|)+4-5 jobs per superstep
    // regardless of frontier; CsrDynamic is the engine for dynamic).
    val dfBatches = sys.env.getOrElse("GRAFT_BENCH_DF_BATCHES", "0").toInt

    val dyn = new CsrDynamic(s)
    val csr = new CsrPageRank(s)
    val oracleCsr = new CsrPageRank(s, PagerankOptions(tolerance = oracleTol))
    val ((g0, csrStaticRun, st0), tCsrStatic) = time {
      val g = csr.build(x0)
      val (run, st) = dyn.staticWithState(g)
      (g, run, st)
    }
    qTimes("pagerank_csr_static_converge") = tCsrStatic
    put("csr_static_base_secs", f"$tCsrStatic%.3f", compact = false)
    put("csr_static_converge_iters",
      csrStaticRun.stats.iterations.toString, compact = false)
    phaseDone("dynamic_setup")

    def batchIns(b: Int, existing: DataFrame): DataFrame = staged
      .where(col("seq") >= cuts(b) && col("seq") < cuts(b + 1))
      .select("src", "dst").dropDuplicates("src", "dst")
      .join(existing, Seq("src", "dst"), "left_anti")

    /** L1 distance between a carried state's ranks and aligned oracle rank
      * blocks (same partitioner, same sorted srcs — one tiny job). */
    def l1Err(st: org.apache.spark.rdd.RDD[CsrState],
        oracle: org.apache.spark.rdd.RDD[Array[Double]]): Double =
      st.zipPartitions(oracle) { (aIt, bIt) =>
        val a = aIt.next().rank
        val b = bIt.next()
        var sum = 0.0
        var i = 0
        while (i < a.length) { sum += math.abs(a(i) - b(i)); i += 1 }
        Iterator.single(sum)
      }.sum()

    var gDf = g0; var stDf = st0
    var gDfp = g0; var stDfp = st0
    // per-fraction accumulators: fraction -> (stat, df, dfp)
    final case class FracAcc(
        stat: scala.collection.mutable.ArrayBuffer[Double] =
          scala.collection.mutable.ArrayBuffer.empty,
        df: scala.collection.mutable.ArrayBuffer[Double] =
          scala.collection.mutable.ArrayBuffer.empty,
        dfp: scala.collection.mutable.ArrayBuffer[Double] =
          scala.collection.mutable.ArrayBuffer.empty)
    val fracAcc = scala.collection.mutable.LinkedHashMap[Double, FracAcc]()
    val statSecs = new scala.collection.mutable.ArrayBuffer[Double]
    val oracleSecs = new scala.collection.mutable.ArrayBuffer[Double]
    val csrDfSecs = new scala.collection.mutable.ArrayBuffer[Double]
    val csrDfpSecs = new scala.collection.mutable.ArrayBuffer[Double]
    val csrDfComputeSecs = new scala.collection.mutable.ArrayBuffer[Double]
    val csrDfpComputeSecs = new scala.collection.mutable.ArrayBuffer[Double]
    val l1Df = new scala.collection.mutable.ArrayBuffer[Double]
    val l1Dfp = new scala.collection.mutable.ArrayBuffer[Double]
    var csrDfIters, csrDfpIters, statIters = 0
    // fixed-cost decomposition (VERDICT r3 item 6): distributed supersteps
    // and their critical-path kernel time, per variant, on the oracled track
    var dfSteps, dfpSteps = 0L
    var dfKernelNs, dfpKernelNs = 0L
    CsrDynamic.peakActive.set(0L)
    CsrDynamic.peakActiveEdges.set(0L)

    def tagOf(f: Double): String =
      if (f >= 1e-3) "1e3" else if (f >= 1e-4) "1e4" else "1e5"

    /** (Re-)publish the dynamic-track fields from the accumulators gathered
      * so far — called after each completed fraction so a later kill still
      * ships a complete 1e-4 track. */
    def putDynamicFields(): Unit = {
      val dfSpeedups = statSecs.zip(csrDfSecs).map { case (st, t) => st / t }
      val dfpSpeedups = statSecs.zip(csrDfpSecs).map { case (st, t) => st / t }
      qTimes("pagerank_csr_df_per_batch") = median(csrDfSecs.toSeq)
      qTimes("pagerank_csr_dfp_per_batch") = median(csrDfpSecs.toSeq)
      qTimes("pagerank_csr_static_per_batch") = median(statSecs.toSeq)
      put("n_batches", statSecs.size.toString)
      put("batch_edges", sliceLens.head.toString)
      put("csr_df_speedup_vs_csr_static", f"${median(dfSpeedups.toSeq)}%.2f")
      put("csr_dfp_speedup_vs_csr_static", f"${median(dfpSpeedups.toSeq)}%.2f")
      put("csr_df_speedup_vs_df_static",
        f"${tDfStatic / median(csrDfSecs.toSeq)}%.2f")
      put("csr_dfp_speedup_vs_df_static",
        f"${tDfStatic / median(csrDfpSecs.toSeq)}%.2f")
      put("l1_err_df_max", f"${if (l1Df.isEmpty) Double.NaN else l1Df.max}%.3e")
      put("l1_err_dfp_max", f"${if (l1Dfp.isEmpty) Double.NaN else l1Dfp.max}%.3e")
      fracAcc.foreach { case (f, acc2) =>
        val tag = tagOf(f)
        val dfMed = median(acc2.stat.toSeq.zip(acc2.df.toSeq).map(p => p._1 / p._2))
        val dfpMed = median(acc2.stat.toSeq.zip(acc2.dfp.toSeq).map(p => p._1 / p._2))
        put(s"csr_df_speedup_frac_$tag", f"$dfMed%.2f")
        put(s"csr_dfp_speedup_frac_$tag", f"$dfpMed%.2f")
        put(s"frac_${tag}_static_secs", arr(acc2.stat.toSeq), compact = false)
        put(s"frac_${tag}_df_secs", arr(acc2.df.toSeq), compact = false)
        put(s"frac_${tag}_dfp_secs", arr(acc2.dfp.toSeq), compact = false)
      }
      val dfStepWall =
        if (dfSteps > 0) csrDfComputeSecs.sum / dfSteps else Double.NaN
      val dfStepKernel =
        if (dfSteps > 0) dfKernelNs / 1e9 / dfSteps else Double.NaN
      val dfpStepWall =
        if (dfpSteps > 0) csrDfpComputeSecs.sum / dfpSteps else Double.NaN
      val dfpStepKernel =
        if (dfpSteps > 0) dfpKernelNs / 1e9 / dfpSteps else Double.NaN
      put("dfp_step_wall_secs", f"$dfpStepWall%.3f")
      put("dfp_step_kernel_secs", f"$dfpStepKernel%.3f")
      put("all_query_secs", qTimes.map { case (k, v) =>
        "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}"), compact = false)
      put("csr_static_batch_secs", arr(statSecs.toSeq), compact = false)
      put("csr_oracle_batch_secs", arr(oracleSecs.toSeq), compact = false)
      put("csr_static_avg_iters",
        f"${statIters.toDouble / math.max(1, statSecs.size)}%.1f", compact = false)
      put("csr_df_batch_secs", arr(csrDfSecs.toSeq), compact = false)
      put("csr_dfp_batch_secs", arr(csrDfpSecs.toSeq), compact = false)
      put("csr_df_compute_secs", arr(csrDfComputeSecs.toSeq), compact = false)
      put("csr_dfp_compute_secs", arr(csrDfpComputeSecs.toSeq), compact = false)
      put("csr_df_avg_iters",
        f"${csrDfIters.toDouble / math.max(1, csrDfSecs.size)}%.1f", compact = false)
      put("csr_dfp_avg_iters",
        f"${csrDfpIters.toDouble / math.max(1, csrDfpSecs.size)}%.1f", compact = false)
      put("l1_err_df", arr(l1Df.toSeq, "%.3e"), compact = false)
      put("l1_err_dfp", arr(l1Dfp.toSeq, "%.3e"), compact = false)
      put("csr_df_speedup_per_batch", arr(dfSpeedups.toSeq, "%.2f"), compact = false)
      put("csr_dfp_speedup_per_batch", arr(dfpSpeedups.toSeq, "%.2f"), compact = false)
      put("df_step_wall_secs", f"$dfStepWall%.3f", compact = false)
      put("df_step_kernel_secs", f"$dfStepKernel%.3f", compact = false)
      put("df_supersteps", dfSteps.toString, compact = false)
      put("dfp_supersteps", dfpSteps.toString, compact = false)
      put("peak_affected_verts", CsrDynamic.peakActive.get().toString,
        compact = false)
      put("peak_affected_edges", CsrDynamic.peakActiveEdges.get().toString,
        compact = false)
    }

    var xEdges = x0
    var b = 0
    var firstBatch = true
    var outOfTime = false
    var lastBatchSecs = 90.0 // prior until the first batch is measured
    schedule.foreach { case (fraction, count, withOracle) =>
      val acc = fracAcc.getOrElseUpdate(fraction, FracAcc())
      var done = 0
      // the sweep reserve is smaller: past the oracled track, each skipped
      // batch only costs sweep coverage, not the headline numbers
      val reserve = if (withOracle) 120.0 else 60.0
      while (done < count && !outOfTime) {
        if (acc.stat.nonEmpty && remainingSecs < lastBatchSecs * 1.3 + reserve) {
          outOfTime = true
          System.err.println(s"[bench] budget: stopping dynamic track at " +
            s"fraction $fraction after ${acc.stat.size} batches")
        } else {
          val tBatch0 = System.nanoTime()
          val ins = batchIns(b, xEdges).cache()
          ins.count()
          val none = ins.limit(0)
          // techniques first (same minutes-window as their baseline below)
          val ss0 = CsrDynamic.superstepRuns.get()
          val kn0 = CsrDynamic.kernelCritNanos.get()
          val ((gDf2, csrDfRun, stDf2), tD) =
            time(dyn.applyBatch(gDf, stDf, ins, none, prune = false))
          val ss1 = CsrDynamic.superstepRuns.get()
          val kn1 = CsrDynamic.kernelCritNanos.get()
          val ((gDfp2, csrDfpRun, stDfp2), tP) =
            time(dyn.applyBatch(gDfp, stDfp, ins, none, prune = true))
          acc.df += tD
          acc.dfp += tP
          if (withOracle) {
            dfSteps += ss1 - ss0; dfKernelNs += kn1 - kn0
            dfpSteps += CsrDynamic.superstepRuns.get() - ss1
            dfpKernelNs += CsrDynamic.kernelCritNanos.get() - kn1
            csrDfSecs += tD; csrDfIters += csrDfRun.stats.iterations
            csrDfComputeSecs += csrDfRun.stats.computeTimeMs / 1e3
            csrDfpSecs += tP; csrDfpIters += csrDfpRun.stats.iterations
            csrDfpComputeSecs += csrDfpRun.stats.computeTimeMs / 1e3
            // fresh static baseline + oracle on the updated graph (one run:
            // the 1e-10 crossing is the baseline, the 1e-15 tail the oracle)
            val ((_, oracleRanks, crossSecs, crossIts), tOracle) =
              time(oracleCsr.staticDetailed(gDf2, crossTol = 1e-10))
            if (crossIts >= 0) {
              statSecs += crossSecs
              statIters += crossIts
              acc.stat += crossSecs
            } else {
              // never crossed 1e-10 before maxIterations — do NOT fold -1
              // into the aggregates (ADVICE r3); record the hole as NaN
              System.err.println(s"[bench] batch $b: oracle run never crossed 1e-10")
              statSecs += Double.NaN
              acc.stat += Double.NaN
            }
            oracleSecs += tOracle
            l1Df += l1Err(stDf2, oracleRanks)
            l1Dfp += l1Err(stDfp2, oracleRanks)
            oracleRanks.unpersist(false)
          } else {
            // timing-only baseline at the engine's own 1e-10 tolerance
            val ((_, baseRanks, _, _), tBase) =
              time(csr.staticDetailed(gDf2, crossTol = 0.0))
            baseRanks.unpersist(false)
            acc.stat += tBase
          }
          if (!firstBatch) { // the first batch's inputs are the shared g0/st0
            gDf.blocks.unpersist(false); stDf.unpersist(false)
            gDfp.blocks.unpersist(false); stDfp.unpersist(false)
          }
          gDf = gDf2; stDf = stDf2
          gDfp = gDfp2; stDfp = stDfp2
          // ckpt (not cache): the carried plan/lineage would otherwise deepen
          // by one batch per batch — quadratic analysis cost over long streams.
          // The SUPERSEDED generation's checkpoint blocks are freed explicitly
          // (GraftBridge.freeCkpt) — the CacheManager doesn't track them, so
          // they'd otherwise strand ~|E| rows per batch until a periodic GC.
          val prevX = xEdges
          val nextX = EdgeOps.applyBatch(xEdges, ins, none).ckpt()
          xEdges = nextX
          if (prevX ne x0) org.apache.spark.sql.GraftBridge.freeCkpt(prevX)
          ins.unpersist()
          // carried structures arrive lineage-free from applyBatch (in-engine
          // pre-materialization truncation); the old every-10-batches
          // localCheckpoint().count() here was a silent no-op — see the
          // endurance loop's note.
          firstBatch = false
          b += 1
          done += 1
          lastBatchSecs = (System.nanoTime() - tBatch0) / 1e9
        }
      }
      if (acc.stat.nonEmpty) {
        putDynamicFields()
        phaseDone(if (withOracle) "dynamic_1e4" else s"sweep_${tagOf(fraction)}")
      }
    }

    // ---- Phase 6 (opt-in): fixed-cost decomposition probe ----------------
    // A dynamic superstep's wall = critical-path kernel time (measured in-
    // task) + the scheduling/shuffle-management floor. The floor's lower
    // bound is measured directly: a fresh 2-stage, 32-task shuffle job doing
    // no work (same stage shape as a superstep — map side feeding a hash-
    // partitioned exchange). Each measurement builds a NEW RDD: re-counting
    // a materialized shuffle would skip the map stage and undercount.
    // Opt-in (GRAFT_BENCH_PROBE=1): it costs minutes the driver's budget
    // does not have; the committed builder artifact carries the numbers.
    if (probeEnabled && remainingSecs > 180) {
      def noopJob(): Double = {
        val t0 = System.nanoTime()
        s.sparkContext.parallelize(0 until 32, 32)
          .map(i => (i, 1))
          .partitionBy(new org.apache.spark.HashPartitioner(32))
          .foreachPartition(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      val noopSecs = (0 until 21).map(_ => noopJob())
      val floorSecs = median(noopSecs.drop(1))
      put("superstep_floor_secs", f"$floorSecs%.3f")
      put("noop_job_secs", arr(noopSecs.drop(1), "%.3f"), compact = false)

      // One instrumented DFP batch (a ~1e-4 deterministic DELETION slice,
      // so no staged insertions are consumed) with a stage listener
      // attached: attributes each superstep's wall to (a) time inside
      // stages (stage submission→completion), (b) executor task run time,
      // (c) GC — the remainder of (wall − stage wall) is driver/DAGScheduler
      // dead time between stages, the irreducible synchronous-superstep
      // floor.
      val stageWallMs = new java.util.concurrent.atomic.AtomicLong
      val stageRunMs = new java.util.concurrent.atomic.AtomicLong
      val stageGcMs = new java.util.concurrent.atomic.AtomicLong
      val stageCnt = new java.util.concurrent.atomic.AtomicLong
      val stageTaskCnt = new java.util.concurrent.atomic.AtomicLong
      // per-callsite buckets: stage name -> (stages, wallMs, execRunMs) —
      // separates the two per-superstep stages from the one-off splice/fold
      val stagesByName =
        new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
      val probeListener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wall = (for (sub <- si.submissionTime; com <- si.completionTime)
            yield com - sub).getOrElse(0L)
          stageWallMs.addAndGet(wall)
          stageRunMs.addAndGet(si.taskMetrics.executorRunTime)
          stageGcMs.addAndGet(si.taskMetrics.jvmGCTime)
          stageCnt.incrementAndGet()
          stageTaskCnt.addAndGet(si.numTasks.toLong)
          val bucket = stagesByName.computeIfAbsent(si.name, _ => new Array[Long](3))
          bucket.synchronized {
            bucket(0) += 1
            bucket(1) += wall
            bucket(2) += si.taskMetrics.executorRunTime
          }
        }
      }
      val probeDel = xEdges
        .where(col("src") =!= col("dst"))
        .where(pmod(xxhash64(col("src"), col("dst")), lit(10000L)) === 0L)
        .cache()
      probeDel.count()
      val probeNone = probeDel.limit(0)
      val pss0 = CsrDynamic.superstepRuns.get()
      val pkn0 = CsrDynamic.kernelCritNanos.get()
      s.sparkContext.addSparkListener(probeListener)
      val ((gProbe, probeRun, stProbe), tProbeWall) =
        time(dyn.applyBatch(gDfp, stDfp, probeNone, probeDel, prune = true))
      Thread.sleep(2000) // listener bus is async — let it drain
      s.sparkContext.removeSparkListener(probeListener)
      val probeSteps = math.max(1L, CsrDynamic.superstepRuns.get() - pss0)
      val probeKernelSecs = (CsrDynamic.kernelCritNanos.get() - pkn0) / 1e9
      val probeLoopSecs = probeRun.stats.computeTimeMs / 1e3
      gProbe.blocks.unpersist(false)
      stProbe.unpersist(false)
      probeDel.unpersist()
      put("probe_batch_wall_secs", f"$tProbeWall%.3f", compact = false)
      put("probe_loop_secs", f"$probeLoopSecs%.3f", compact = false)
      put("probe_supersteps", probeSteps.toString, compact = false)
      put("probe_kernel_crit_secs", f"$probeKernelSecs%.3f", compact = false)
      put("probe_stage_wall_secs", f"${stageWallMs.get / 1e3}%.3f", compact = false)
      put("probe_exec_run_secs", f"${stageRunMs.get / 1e3}%.3f", compact = false)
      put("probe_gc_secs", f"${stageGcMs.get / 1e3}%.3f", compact = false)
      put("probe_stages", stageCnt.get.toString, compact = false)
      put("probe_tasks", stageTaskCnt.get.toString, compact = false)
      locally {
        import scala.jdk.CollectionConverters._
        val byName = stagesByName.asScala.toSeq
          .sortBy { case (_, bkt) => -bkt(1) }
          .map { case (name, bkt) =>
            val safe = name.replace("\\", "\\\\").replace("\"", "\\\"")
            s""""$safe":{"n":${bkt(0)},"wall_ms":${bkt(1)},"exec_run_ms":${bkt(2)}}"""
          }.mkString("{", ",", "}")
        put("probe_stage_breakdown", byName, compact = false)
      }
      phaseDone("probe")
    }

    // ---- Optional: legacy DataFrame-superstep dynamic track --------------
    if (dfBatches > 0 && remainingSecs > 300) {
      val dfSecs = new scala.collection.mutable.ArrayBuffer[Double]
      val dfpSecs = new scala.collection.mutable.ArrayBuffer[Double]
      var dfIters, dfpIters = 0
      var ls = ls0
      var prevDf = dfStaticRun.ranks
      var prevDfp = dfStaticRun.ranks
      var xLinks = ls.links.select("src", "dst")
      for (bb <- 0 until math.min(dfBatches, nBatches)) {
        val ins = batchIns(bb, xLinks).cache()
        val none = ins.limit(0)
        val lsY = pr.updateLinks(ls, ins, none)
        val yLinks = lsY.links.select("src", "dst")
        val (dfRun, tDf) = time {
          pr.dynamicFrontier(xLinks, yLinks, ins, none, prevDf, Some(lsY))
        }
        val (dfpRun, tDfp) = time {
          pr.dynamicFrontierPrune(xLinks, yLinks, ins, none, prevDfp, Some(lsY))
        }
        dfSecs += tDf; dfpSecs += tDfp
        dfIters += dfRun.stats.iterations; dfpIters += dfpRun.stats.iterations
        prevDf = dfRun.ranks; prevDfp = dfpRun.ranks
        ls = lsY; xLinks = yLinks
        ins.unpersist()
      }
      qTimes("pagerank_dynamic_frontier_converge") = dfSecs.sum / dfSecs.size
      qTimes("pagerank_dfp_converge") = dfpSecs.sum / dfpSecs.size
      put("df_batch_secs", arr(dfSecs.toSeq), compact = false)
      put("dfp_batch_secs", arr(dfpSecs.toSeq), compact = false)
      put("df_avg_iters",
        f"${dfIters.toDouble / math.max(1, dfSecs.size)}%.1f", compact = false)
      put("dfp_avg_iters",
        f"${dfpIters.toDouble / math.max(1, dfpSecs.size)}%.1f", compact = false)
      phaseDone("df_legacy")
    }

    emitFinal(currentFields)
    s.stop()
  }

  /** Endurance mode (GRAFT_BENCH_ENDURANCE=1): the reference's
    * BATCH_LENGTH=100 regime (/root/reference/main.sh:21) on the carried
    * CSR engine — 100 batches of 1e-5·|E| insertions, L1 error vs a fresh
    * 1e-15 oracle every `sampleEvery` batches. The claim under test: the
    * terminal S-delta fold keeps the carried "exact S" invariant from
    * drifting, so the sampled L1 stays FLAT across the stream. */
  private def enduranceMain(cpus: Int): Unit = {
    val pages = sys.env.getOrElse("GRAFT_BENCH_CONVERGE_PAGES", "1000000").toLong
    val nBatches = sys.env.getOrElse("GRAFT_BENCH_BATCHES", "100").toInt
    val sampleEvery = sys.env.getOrElse("GRAFT_BENCH_SAMPLE_EVERY", "10").toInt
    val fraction = 1e-5
    val s = session(cpus, forPagerank = true)
    val staged = WebGraphFixture.edgesOnly(s, pages).toDF().cache()
    val m = staged.count()
    val batchLen = math.max(1L, (m * fraction).toLong)
    val cut0 = m - nBatches.toLong * batchLen
    val cuts: IndexedSeq[Long] = {
      val fracs = (0 to nBatches).map(i => (cut0 + i.toLong * batchLen).toDouble / m)
      val row = staged.agg(expr(
        s"approx_percentile(seq, array(${fracs.mkString(",")}), 1000000)"))
        .collect()(0).getSeq[Long](0)
      row.toIndexedSeq.init :+ Long.MaxValue
    }
    val verts = s.range(pages).select(col("id"))
    val x0 = EdgeOps.withSelfLoops(
      staged.where(col("seq") < cuts(0)).select("src", "dst"), verts).cache()
    val dyn = new CsrDynamic(s)
    val csr = new CsrPageRank(s)
    val oracleCsr = new CsrPageRank(s, PagerankOptions(tolerance = 1e-15))
    val g0 = csr.build(x0)
    val (_, st0) = dyn.staticWithState(g0)
    var gDf = g0; var stDf = st0
    var gDfp = g0; var stDfp = st0
    var xEdges = x0
    val dfSecs = new scala.collection.mutable.ArrayBuffer[Double]
    val dfpSecs = new scala.collection.mutable.ArrayBuffer[Double]
    val sampleBatch = new scala.collection.mutable.ArrayBuffer[Int]
    val l1Df = new scala.collection.mutable.ArrayBuffer[Double]
    val l1Dfp = new scala.collection.mutable.ArrayBuffer[Double]
    // Per-batch drift diagnostics (added after the first shipped 100-batch
    // artifact showed batch wall growing ~20x while L1 stayed flat): split
    // the growth between "more supersteps" (engine/marking semantics) and
    // "per-superstep overhead growth" (driver-global accumulation), and
    // between kernel time and everything else.
    val dfIters = new scala.collection.mutable.ArrayBuffer[Int]
    val dfpIters = new scala.collection.mutable.ArrayBuffer[Int]
    val dfKern = new scala.collection.mutable.ArrayBuffer[Double]
    val dfpKern = new scala.collection.mutable.ArrayBuffer[Double]
    val gcMs = new scala.collection.mutable.ArrayBuffer[Double]
    val shufStages = new scala.collection.mutable.ArrayBuffer[Long]
    val diskShuf = new scala.collection.mutable.ArrayBuffer[Long]
    val gcEvery = sys.env.getOrElse("GRAFT_BENCH_GC_EVERY", "0").toInt
    if (gcEvery > 0) CsrDynamic.trackDeps = true
    def gcTimeMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def l1(st: org.apache.spark.rdd.RDD[CsrState],
        oracle: org.apache.spark.rdd.RDD[Array[Double]]): Double =
      st.zipPartitions(oracle) { (aIt, bIt) =>
        val a = aIt.next().rank
        val o = bIt.next()
        var sum = 0.0
        var i = 0
        while (i < a.length) { sum += math.abs(a(i) - o(i)); i += 1 }
        Iterator.single(sum)
      }.sum()
    // Incremental emit (r5 protocol step 0 applied here too): rounds 4-5 lost
    // two full ~60-min endurance runs to silent kills because the artifact was
    // written ONCE at the end. Rewrite ENDURANCE.json after every oracle
    // sample so a kill at any point still ships every sample measured so far.
    def emitPartial(batchesCompleted: Int, done: Boolean): Unit = {
      val fields = Seq(
        ("metric", "\"endurance_l1_drift\"", true),
        ("value", f"${if (l1Df.isEmpty) Double.NaN else l1Df.max}%.3e", true),
        ("unit", "\"l1_error\"", true),
        ("pages", pages.toString, true),
        ("n_batches", nBatches.toString, true),
        ("batches_completed", batchesCompleted.toString, true),
        ("complete", done.toString, true),
        ("batch_edges", batchLen.toString, true),
        ("sample_batches", sampleBatch.mkString("[", ",", "]"), true),
        ("l1_err_df", arr(l1Df.toSeq, "%.3e"), true),
        ("l1_err_dfp", arr(l1Dfp.toSeq, "%.3e"), true),
        ("df_secs_first10", arr(dfSecs.take(10).toSeq), true),
        ("df_secs_last10", arr(dfSecs.takeRight(10).toSeq), true),
        ("df_batch_secs", arr(dfSecs.toSeq), false),
        ("dfp_batch_secs", arr(dfpSecs.toSeq), false),
        ("df_iters", dfIters.mkString("[", ",", "]"), false),
        ("dfp_iters", dfpIters.mkString("[", ",", "]"), false),
        ("df_kernel_secs", arr(dfKern.toSeq), false),
        ("dfp_kernel_secs", arr(dfpKern.toSeq), false),
        ("gc_ms_per_batch", arr(gcMs.toSeq, "%.0f"), false),
        ("gc_every", gcEvery.toString, false),
        ("shuffle_stages_per_batch", shufStages.mkString("[", ",", "]"), false),
        ("disk_shuffle_blocks_per_batch", diskShuf.mkString("[", ",", "]"), false))
      // endurance is a supplementary artifact — never clobber the round
      // driver's BENCH_LAST.json mirror
      writeMirror(fields, "ENDURANCE.json")
    }
    for (b <- 0 until nBatches) {
      val ins = staged
        .where(col("seq") >= cuts(b) && col("seq") < cuts(b + 1))
        .select("src", "dst").dropDuplicates("src", "dst")
        .join(xEdges, Seq("src", "dst"), "left_anti").cache()
      ins.count()
      val none = ins.limit(0)
      CsrDynamic.batchTag = s"b${b + 1}-"
      val gc0 = gcTimeMs
      val kc0 = CsrDynamic.kernelCritNanos.get()
      val ((gDf2, runD, stDf2), tD) =
        time(dyn.applyBatch(gDf, stDf, ins, none, prune = false))
      val kcD = CsrDynamic.kernelCritNanos.get()
      val ((gDfp2, runP, stDfp2), tP) =
        time(dyn.applyBatch(gDfp, stDfp, ins, none, prune = true))
      val kcP = CsrDynamic.kernelCritNanos.get()
      dfSecs += tD; dfpSecs += tP
      dfIters += runD.stats.iterations; dfpIters += runP.stats.iterations
      dfKern += (kcD - kc0) / 1e9; dfpKern += (kcP - kcD) / 1e9
      gcMs += (gcTimeMs - gc0).toDouble
      val reg = org.apache.spark.scheduler.GraftSchedulerDiag
        .registrySizes(s.sparkContext)
      shufStages += reg("shuffle_map_stages")
      diskShuf += reg("disk_shuffle_blocks")
      System.err.println(f"[endurance] batch ${b + 1}/$nBatches " +
        f"df $tD%.2fs/${runD.stats.iterations}it/${(kcD - kc0) / 1e9}%.2fk " +
        f"dfp $tP%.2fs/${runP.stats.iterations}it/${(kcP - kcD) / 1e9}%.2fk " +
        f"gc ${gcTimeMs - gc0}ms " +
        f"reg ${reg("shuffle_map_stages")}st/${reg("shuffle_statuses")}ss/" +
        f"${reg("disk_shuffle_blocks")}sf/${reg("disk_broadcast_blocks")}bb/" +
        f"${reg("persistent_rdds")}pr")
      if ((b + 1) % sampleEvery == 0 || b == nBatches - 1) {
        val (_, oracleRanks, _, _) = oracleCsr.staticDetailed(gDf2, crossTol = 0.0)
        sampleBatch += b
        l1Df += l1(stDf2, oracleRanks)
        l1Dfp += l1(stDfp2, oracleRanks)
        oracleRanks.unpersist(false)
        emitPartial(b + 1, done = false)
        System.err.println(f"[endurance] sample at batch ${b + 1}: " +
          f"l1_df ${l1Df.last}%.3e l1_dfp ${l1Dfp.last}%.3e")
      }
      if (b > 0) {
        gDf.blocks.unpersist(false); stDf.unpersist(false)
        gDfp.blocks.unpersist(false); stDfp.unpersist(false)
      }
      gDf = gDf2; stDf = stDf2; gDfp = gDfp2; stDfp = stDfp2
      val prevX = xEdges
      xEdges = EdgeOps.applyBatch(xEdges, ins, none).ckpt()
      if (prevX ne x0) org.apache.spark.sql.GraftBridge.freeCkpt(prevX)
      ins.unpersist()
      // NOTE: no end-of-batch `rdd.localCheckpoint().count()` truncation
      // here anymore — that idiom on an already-materialized RDD is
      // silently a NO-OP (RDD.doCheckpoint is one-shot per RDD; it already
      // ran, checkpoint-less, at first materialization), which is exactly
      // how the stream leaked every batch's shuffle registrations. The
      // engine now truncates each carried structure AT its materializing
      // job (CsrDynamic.applyBatchImpl/runLoop), so carried state arrives
      // here already lineage-free.
      // hypothesis knob: ContextCleaner's shuffle/accumulator/broadcast
      // reclamation is weak-reference-driven — on a large pre-touched heap
      // GC can be rare enough that driver-global registries grow for the
      // whole stream. Forcing a GC every K batches tests that directly.
      if (gcEvery > 0 && (b + 1) % gcEvery == 0) {
        System.gc()
        val (live, total, labels) = CsrDynamic.liveDeps
        System.err.println(s"[endurance] post-gc shuffle deps live $live/$total" +
          s" labels=${labels.take(60).mkString(",")}")
      }
    }
    val fields = Seq(
      ("metric", "\"endurance_l1_drift\"", true),
      ("value", f"${if (l1Df.isEmpty) Double.NaN else l1Df.max}%.3e", true),
      ("unit", "\"l1_error\"", true),
      ("pages", pages.toString, true),
      ("n_batches", nBatches.toString, true),
      ("batches_completed", nBatches.toString, true),
      ("complete", "true", true),
      ("batch_edges", batchLen.toString, true),
      ("sample_batches", sampleBatch.mkString("[", ",", "]"), true),
      ("l1_err_df", arr(l1Df.toSeq, "%.3e"), true),
      ("l1_err_dfp", arr(l1Dfp.toSeq, "%.3e"), true),
      ("df_secs_first10", arr(dfSecs.take(10).toSeq), true),
      ("df_secs_last10", arr(dfSecs.takeRight(10).toSeq), true),
      ("df_batch_secs", arr(dfSecs.toSeq), false),
      ("dfp_batch_secs", arr(dfpSecs.toSeq), false),
      ("df_iters", dfIters.mkString("[", ",", "]"), false),
      ("dfp_iters", dfpIters.mkString("[", ",", "]"), false),
      ("df_kernel_secs", arr(dfKern.toSeq), false),
      ("dfp_kernel_secs", arr(dfpKern.toSeq), false),
      ("gc_ms_per_batch", arr(gcMs.toSeq, "%.0f"), false),
      ("gc_every", gcEvery.toString, false),
      ("shuffle_stages_per_batch", shufStages.mkString("[", ",", "]"), false),
      ("disk_shuffle_blocks_per_batch", diskShuf.mkString("[", ",", "]"), false))
    // endurance is a supplementary artifact — never clobber the round
    // driver's BENCH_LAST.json mirror
    emit(fields, mirror = "ENDURANCE.json")
    s.stop()
  }

  /** The driver contract: ONE bare JSON line on stdout — compact fields
    * only, runtime-guarded under the driver's 2,000-char tail capture — and
    * the FULL field set mirrored to a JSON file. */
  private def render(fs: Seq[(String, String)]): String =
    fs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  private def printCompact(fields: Seq[(String, String, Boolean)]): Unit = {
    var compact = render(fields.filter(_._3).map(f => (f._1, f._2)))
    if (compact.length > 1900) {
      // hard guard: never ship a decapitated line (r3's parsed:null)
      System.err.println(s"[bench] compact line ${compact.length} chars — " +
        "dropping queries field to fit the 2000-char tail capture")
      compact = render(fields.filter(f => f._3 && f._1 != "queries")
        .map(f => (f._1, f._2)))
    }
    println(compact)
  }

  private def writeMirror(fields: Seq[(String, String, Boolean)],
      mirror: String): Unit = {
    val full = render(fields.map(f => (f._1, f._2)))
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(mirror), full + "\n")
    catch { case _: Throwable => () }
  }

  private def emit(fields: Seq[(String, String, Boolean)],
      mirror: String = "BENCH_LAST.json"): Unit = {
    printCompact(fields)
    writeMirror(fields, mirror)
  }

  /** Final emit on the normal exit path: print once, mirror, and disarm the
    * shutdown hook's duplicate print. */
  private def emitFinal(fields: Seq[(String, String, Boolean)]): Unit = {
    emit(fields)
    finalEmitted = true
  }
}
