package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.EdgeOps
import graft.ingest.WebGraphFixture
import graft.model.PagerankOptions
import graft.pagerank.PageRank

/** Benchmark main — prints ONE JSON line.
  *
  * North metric (BASELINE.json / BASELINE.md): edges/sec per PageRank
  * superstep, with throughput scaling efficiency ≥ 0.8 from N to 4N
  * parallelism. No real cluster exists in this sandbox, so the
  * two-cluster-size criterion is evidenced by running the identical job at
  * local[8] (N) and local[32] (4N) on the same deterministic fixture
  * (protocol in BASELINE.md; mirrors the reference's thread-doubling
  * scaling, /root/reference/README.md:20).
  *
  * Throughput is measured over a fixed number of full supersteps (per-
  * superstep work of static PR is iteration-invariant), after a warm-up
  * run, matching the reference's repeat-averaging
  * (/root/reference/inc/_utility.hxx:113-119). Convergence-to-1e-10 is
  * reported separately (iterations + wall) at the 4N level.
  */
object Bench {

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
    s
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Sized so per-superstep compute dominates scheduler fixed overhead at
    // local[8] (≈6.4M edges) — the scaling-efficiency measurement is
    // meaningless when a superstep is all task-launch latency.
    val benchPages = sys.env.getOrElse("GRAFT_BENCH_PAGES", "12000000").toLong
    val convergePages = sys.env.getOrElse("GRAFT_BENCH_CONVERGE_PAGES", "4000000").toLong
    val throughputSteps = sys.env.getOrElse("GRAFT_BENCH_STEPS", "15").toInt

    val qTimes = scala.collection.mutable.LinkedHashMap[String, Double]()

    val onlyScaling = sys.env.get("GRAFT_BENCH_ONLY_SCALING").contains("1")

    // ---- Phase 1: headline relational/text/graph queries on the sf dir ----
    if (!onlyScaling) {
      val s = session(cpus, forPagerank = false)
      val headline = Seq("q_degree_distribution", "q_indegree", "q_triangle_count",
        "q_pagerank_iter3", "q_dedup_exact", "q_token_count", "q_text_quality",
        "q_minhash_lsh", "q_ann_bruteforce", "q_connected_components")
      headline.foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          val (_, dt) = time { fn(s, sfDir).collect() }
          qTimes(name) = dt
        }
      }
    }

    // ---- Phase 2: PageRank throughput at N (local[8]) and 4N (local[32]) --
    def pagerankThroughput(cores: Int): (Double, Double, Long) = {
      val s = session(cores, forPagerank = true)
      // warm-up on a small fixture (JIT/codegen warm; discarded) — warming
      // on the full fixture would rebuild the 62M-edge cache twice.
      val warmY = EdgeOps.withSelfLoops(
        WebGraphFixture.edgesOnly(s, benchPages / 12).toDF().select("src", "dst"),
        s.range(benchPages / 12).select(col("id")))
      new PageRank(s, PagerankOptions(tolerance = 0.0, maxIterations = 3)).static(warmY)
      val staged = WebGraphFixture.edgesOnly(s, benchPages).toDF()
      val verts = s.range(benchPages).select(col("id"))
      val y = EdgeOps.withSelfLoops(staged.select("src", "dst"), verts)
        .cache()
      val nEdges = y.count()
      // measured: fixed number of full supersteps (compute phase only —
      // the one-time links materialization is counted as init)
      val run = new PageRank(s,
        PagerankOptions(tolerance = 0.0, maxIterations = throughputSteps)).static(y)
      val sec = run.stats.computeTimeMs / 1e3
      val edgesPerSecPerStep = nEdges.toDouble * run.stats.iterations / sec
      (edgesPerSecPerStep, sec, nEdges)
    }

    val (thr8, sec8, nE) = pagerankThroughput(8)
    qTimes("pagerank_throughput_local8") = sec8
    val (thr32, sec32, _) = pagerankThroughput(32)
    qTimes("pagerank_throughput_local32") = sec32
    val efficiency = thr32 / (4.0 * thr8)

    if (onlyScaling) {
      println(s"""{"metric":"edges_per_sec_per_superstep_local32","value":${thr32.round},""" +
        s""""unit":"edges/sec/superstep","bench_pages":$benchPages,"bench_edges":$nE,""" +
        s""""throughput_local8":${thr8.round},"throughput_local32":${thr32.round},""" +
        f""""scaling_efficiency_n_to_4n":$efficiency%.3f}""")
      SparkSession.getActiveSession.foreach(_.stop())
      return
    }

    // ---- Phase 3: convergence + dynamic-frontier run at 4N --------------
    // Batch regime mirrors the reference (insertion batches of 1e-4·|E|,
    // /root/reference/main.sh:54-56): base = all but the last 1e-4 of the
    // edge stream, batch = that tail.
    val s = session(cpus, forPagerank = true)
    val staged = WebGraphFixture.edgesOnly(s, convergePages).toDF().cache()
    val m = staged.count()
    val cut = staged.agg(expr(s"approx_percentile(seq, 0.9999, 100000)"))
      .collect()(0) match { case r => r.getLong(0) }
    val verts = s.range(convergePages).select(col("id"))
    val x = EdgeOps.withSelfLoops(
      staged.where(col("seq") < cut).select("src", "dst"), verts).cache()
    val y = EdgeOps.withSelfLoops(staged.select("src", "dst"), verts).cache()
    val ins = staged.where(col("seq") >= cut).select("src", "dst")
    val none = ins.limit(0)

    val pr = new PageRank(s)
    val (prevRun, tStaticX) = time { pr.static(x) }
    qTimes("pagerank_static_converge_1e10") = tStaticX
    val prev = prevRun.ranks
    val (dfRun, tDf) = time { pr.dynamicFrontier(x, y, ins, none, prev) }
    qTimes("pagerank_dynamic_frontier_converge") = tDf
    val speedupDfVsStatic = tStaticX / tDf

    val qs = qTimes.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"edges_per_sec_per_superstep_local32","value":${thr32.round},""" +
        s""""unit":"edges/sec/superstep","queries":$qs,"sf":"$sfDir",""" +
        s""""bench_pages":$benchPages,"bench_edges":$nE,""" +
        s""""throughput_local8":${thr8.round},"throughput_local32":${thr32.round},""" +
        f""""scaling_efficiency_n_to_4n":$efficiency%.3f,""" +
        s""""static_converge_iters":${prevRun.stats.iterations},""" +
        s""""df_converge_iters":${dfRun.stats.iterations},""" +
        f""""df_speedup_vs_static":$speedupDfVsStatic%.2f}"""
    println(json)
    s.stop()
  }
}
