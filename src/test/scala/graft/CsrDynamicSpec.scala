package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.EdgeOps
import graft.ingest.WebGraphFixture
import graft.model.PagerankOptions
import graft.pagerank.{CsrDynamic, CsrPageRank, PageRank}

/** CSR dynamic-frontier engine (push-based delta propagation over
  * partition-local CSR blocks) vs the DataFrame DF/DF-P variants and the
  * in-memory oracle. */
class CsrDynamicSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def selfLooped(edges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
    (edges ++ vs.map(v => (v, v))).distinct
  }

  /** Base fixture: real web graph at 250 pages, batch = the tail of the
    * deterministic stream (same protocol as the bench). */
  def fixture(p: Long = 250L): (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    val raw = WebGraphFixture.rawEdges(p).distinct
    val verts = (0L until p)
    val all = (raw ++ verts.map(v => (v, v))).distinct
    val cut = (raw.size * 0.9).toInt
    val ins = raw.drop(cut).filterNot(raw.take(cut).contains)
      .filterNot { case (a, b) => a == b }
    val base = all.filterNot(e => ins.contains(e))
    (base, ins)
  }

  test("CSR DF after one insertion batch: allclose oracle + DataFrame DF") {
    val (base, ins) = fixture()
    val y = (base ++ ins).distinct
    val xDf = TestSpark.edgesDf(spark, base)
    val insDf = TestSpark.edgesDf(spark, ins)
    val none = insDf.limit(0)

    val dyn = new CsrDynamic(spark)
    val g0 = new CsrPageRank(spark).build(xDf)
    val (staticRun, st0) = dyn.staticWithState(g0)
    val (g1, dfRun, _) = dyn.applyBatch(g0, st0, insDf, none, prune = false)
    assert(g1.nEdges === y.size)

    val got = TestSpark.collectRanks(dfRun.ranks)
    val want = Oracle.pagerank(new Oracle.G(y), tol = 1e-100)
    assert(got.size === want.size)
    assert(Oracle.allclose(got, want, 1e-6), s"maxDiff=${Oracle.maxDiff(got, want)}")

    // vs DataFrame DF (same variant, same tolerances)
    val pr = new PageRank(spark)
    val prev = pr.static(xDf).ranks
    val dfDataframe = TestSpark.collectRanks(
      pr.dynamicFrontier(xDf, TestSpark.edgesDf(spark, y), insDf, none, prev).ranks)
    assert(Oracle.allclose(got, dfDataframe, 1e-9),
      s"maxDiff=${Oracle.maxDiff(got, dfDataframe)}")
  }

  test("decomposition counters: supersteps and kernel critical-path advance") {
    val (base, ins) = fixture()
    val xDf = TestSpark.edgesDf(spark, base)
    val insDf = TestSpark.edgesDf(spark, ins)
    val none = insDf.limit(0)
    val dyn = new CsrDynamic(spark)
    val g0 = new CsrPageRank(spark).build(xDf)
    val (_, st0) = dyn.staticWithState(g0)
    val ss0 = CsrDynamic.superstepRuns.get()
    val kn0 = CsrDynamic.kernelCritNanos.get()
    CsrDynamic.peakActive.set(0L)
    val (_, run, _) = dyn.applyBatch(g0, st0, insDf, none, prune = false)
    val steps = CsrDynamic.superstepRuns.get() - ss0
    assert(steps === run.stats.iterations.toLong)
    assert(CsrDynamic.kernelCritNanos.get() - kn0 > 0L)
    assert(CsrDynamic.peakActive.get() > 0L)
    // kernel critical path can never exceed the loop's wall time
    assert((CsrDynamic.kernelCritNanos.get() - kn0) / 1e6 <=
      run.stats.computeTimeMs)
  }

  test("CSR DF-P (pruning) after a mixed insertion+deletion batch: allclose oracle") {
    val (base, ins) = fixture(200L)
    // delete a few non-self-loop base edges
    val del = base.filter { case (a, b) => a != b && a % 13 == 0 }.take(8)
    val y = (base.filterNot(del.contains) ++ ins).distinct
    val xDf = TestSpark.edgesDf(spark, base)

    val dyn = new CsrDynamic(spark)
    val g0 = new CsrPageRank(spark).build(xDf)
    val (_, st0) = dyn.staticWithState(g0)
    val (g1, run, _) = dyn.applyBatch(g0, st0,
      TestSpark.edgesDf(spark, ins), TestSpark.edgesDf(spark, del),
      prune = true)
    assert(g1.nEdges === y.size)
    val got = TestSpark.collectRanks(run.ranks)
    val want = Oracle.pagerank(new Oracle.G(y), tol = 1e-100)
    assert(Oracle.allclose(got, want, 2e-6), s"maxDiff=${Oracle.maxDiff(got, want)}")
  }

  test("multi-batch carry: 3 consecutive batches stay allclose the fresh static run") {
    val p = 200L
    val raw = WebGraphFixture.rawEdges(p).distinct.filter { case (a, b) => a != b }
    val verts = (0L until p).map(v => (v, v))
    val cut = (raw.size * 0.85).toInt
    val base = (raw.take(cut) ++ verts).distinct
    val batches = raw.drop(cut).grouped(math.max(1, (raw.size - cut) / 3 + 1)).toSeq

    val dyn = new CsrDynamic(spark)
    var g = new CsrPageRank(spark).build(TestSpark.edgesDf(spark, base))
    var (_, st) = dyn.staticWithState(g)
    var edges = base
    for (b <- batches) {
      val ins = b.filterNot(edges.contains)
      edges = (edges ++ ins).distinct
      val insDf = TestSpark.edgesDf(spark, ins)
      val (g2, run, st2) = dyn.applyBatch(g, st, insDf, insDf.limit(0),
        prune = false)
      g = g2; st = st2
      val got = TestSpark.collectRanks(run.ranks)
      val want = Oracle.pagerank(new Oracle.G(edges), tol = 1e-100)
      assert(Oracle.allclose(got, want, 2e-6),
        s"maxDiff=${Oracle.maxDiff(got, want)} after batch")
    }
  }

  test("PagerankOptions.useCsr routes dynamicFrontier/Prune through the CSR engine, identical results") {
    val (base, ins) = fixture(200L)
    val y = (base ++ ins).distinct
    val xDf = TestSpark.edgesDf(spark, base)
    val yDf = TestSpark.edgesDf(spark, y)
    val insDf = TestSpark.edgesDf(spark, ins)
    val none = insDf.limit(0)
    val want = Oracle.pagerank(new Oracle.G(y), tol = 1e-100)

    val prCsr = new PageRank(spark, PagerankOptions(useCsr = true))
    val prevCsr = prCsr.static(xDf).ranks
    val gotDf = TestSpark.collectRanks(
      prCsr.dynamicFrontier(xDf, yDf, insDf, none, prevCsr).ranks)
    assert(gotDf.size === want.size)
    assert(Oracle.allclose(gotDf, want, 1e-6),
      s"maxDiff=${Oracle.maxDiff(gotDf, want)}")
    val gotDfp = TestSpark.collectRanks(
      prCsr.dynamicFrontierPrune(xDf, yDf, insDf, none, prevCsr).ranks)
    assert(Oracle.allclose(gotDfp, want, 2e-6),
      s"maxDiff=${Oracle.maxDiff(gotDfp, want)}")

    // and value-identical (within residual tolerance) to the DataFrame path
    val prDf = new PageRank(spark)
    val prevDf = prDf.static(xDf).ranks
    val dfPath = TestSpark.collectRanks(
      prDf.dynamicFrontier(xDf, yDf, insDf, none, prevDf).ranks)
    assert(Oracle.allclose(gotDf, dfPath, 1e-9),
      s"maxDiff=${Oracle.maxDiff(gotDf, dfPath)}")

    // Dynamic Traversal through the CSR route (fixed-frontier mode)
    val gotDt = TestSpark.collectRanks(
      prCsr.dynamicTraversal(xDf, yDf, insDf, none, prevCsr).ranks)
    assert(Oracle.allclose(gotDt, want, 1e-6),
      s"maxDiff=${Oracle.maxDiff(gotDt, want)}")
  }

  test("one-shot runFromSeeds equals carried-state applyBatch (same batch, same fixpoint)") {
    val (base, ins) = fixture(150L)
    val y = (base ++ ins).distinct
    val xDf = TestSpark.edgesDf(spark, base)
    val yDf = TestSpark.edgesDf(spark, y)
    val insDf = TestSpark.edgesDf(spark, ins)
    val none = insDf.limit(0)

    val dyn = new CsrDynamic(spark)
    val g0 = new CsrPageRank(spark).build(xDf)
    val (_, st0) = dyn.staticWithState(g0)
    val (_, carried, _) = dyn.applyBatch(g0, st0, insDf, none, prune = false)

    val oneShot = new PageRank(spark, PagerankOptions(useCsr = true))
      .dynamicFrontier(xDf, yDf, insDf, none,
        new PageRank(spark, PagerankOptions(useCsr = true)).static(xDf).ranks)
    val a = TestSpark.collectRanks(carried.ranks)
    val b = TestSpark.collectRanks(oneShot.ranks)
    assert(Oracle.allclose(a, b, 1e-9), s"maxDiff=${Oracle.maxDiff(a, b)}")
  }

  test("batch touching a vertex outside the universe raises UniverseGrowthRequired") {
    val base = selfLooped(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val dyn = new CsrDynamic(spark)
    val g0 = new CsrPageRank(spark).build(TestSpark.edgesDf(spark, base))
    val (_, st0) = dyn.staticWithState(g0)
    val novel = TestSpark.edgesDf(spark, Seq((1L, 99L)))
    val ex = intercept[org.apache.spark.SparkException] {
      dyn.applyBatch(g0, st0, novel, novel.limit(0), prune = false)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(
      _.isInstanceOf[CsrDynamic.UniverseGrowthRequired]))
  }

  test("sparse push path (maxDenseBytes=0) matches the dense path") {
    val (base, ins) = fixture(150L)
    val xDf = TestSpark.edgesDf(spark, base)
    val insDf = TestSpark.edgesDf(spark, ins)
    val none = insDf.limit(0)
    def runWith(dyn: CsrDynamic): Map[Long, Double] = {
      val g0 = new CsrPageRank(spark).build(xDf)
      val (_, st0) = dyn.staticWithState(g0)
      val (_, run, _) = dyn.applyBatch(g0, st0, insDf, none, prune = false)
      TestSpark.collectRanks(run.ranks)
    }
    val dense = runWith(new CsrDynamic(spark))
    val sparse = runWith(new CsrDynamic(spark, graft.model.PagerankOptions(),
      maxDenseBytes = 0))
    // delta-application order differs between the two emit layouts → ulp
    assert(Oracle.allclose(dense, sparse, 1e-12),
      s"maxDiff=${Oracle.maxDiff(dense, sparse)}")
  }

  test("empty batch is a fixpoint no-op (1 superstep, ranks unchanged)") {
    val base = selfLooped(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val dyn = new CsrDynamic(spark)
    val g0 = new CsrPageRank(spark).build(TestSpark.edgesDf(spark, base))
    val (staticRun, st0) = dyn.staticWithState(g0)
    val none = TestSpark.edgesDf(spark, Seq.empty[(Long, Long)])
    val (_, run, _) = dyn.applyBatch(g0, st0, none, none, prune = false)
    assert(run.stats.iterations <= 1)
    val a = TestSpark.collectRanks(run.ranks)
    val b = TestSpark.collectRanks(staticRun.ranks)
    assert(Oracle.allclose(a, b, 0.0))
  }

  test("deleting a non-existent edge is a no-op (reference no-op contract)") {
    val base = selfLooped(Seq((1L, 2L), (2L, 3L)))
    val dyn = new CsrDynamic(spark)
    val g0 = new CsrPageRank(spark).build(TestSpark.edgesDf(spark, base))
    val (staticRun, st0) = dyn.staticWithState(g0)
    val ghostDel = TestSpark.edgesDf(spark, Seq((1L, 3L))) // not an edge
    val none = ghostDel.limit(0)
    val (g1, run, _) = dyn.applyBatch(g0, st0, none, ghostDel, prune = false)
    assert(g1.nEdges === base.size)
    val a = TestSpark.collectRanks(run.ranks)
    val b = TestSpark.collectRanks(staticRun.ranks)
    assert(Oracle.allclose(a, b, 1e-9))
  }

  /** Count ShuffleDependencies reachable from an RDD's lineage. */
  private def reachableShuffleDeps(root: org.apache.spark.rdd.RDD[_]): Int = {
    val seen = scala.collection.mutable.Set.empty[Int]
    def go(r: org.apache.spark.rdd.RDD[_]): Int =
      if (!seen.add(r.id)) 0
      else r.dependencies.map {
        case s: org.apache.spark.ShuffleDependency[_, _, _] => 1 + go(s.rdd)
        case d => go(d.rdd)
      }.sum
    go(root)
  }

  test("stream-safety: carried structures carry no shuffle lineage " +
      "(the silent-no-op localCheckpoint leak, fixed r5)") {
    // An indefinite batch loop holds only the returned (graph, state) pair.
    // If either retains ShuffleDependencies from the batch that built it,
    // the ContextCleaner can never unregister those shuffles (the deps stay
    // strongly reachable) and a long stream accumulates map-output
    // registrations + shuffle files without bound — measured pre-fix as
    // ~14 permanently-live deps per batch and per-batch wall growing ~20x
    // across 100 endurance batches. The fix truncates each carried
    // structure AT its materializing job; this pins the invariant.
    val (base, ins) = fixture()
    val xDf = TestSpark.edgesDf(spark, base)
    val insDf = TestSpark.edgesDf(spark, ins)
    val none = insDf.limit(0)
    val dyn = new CsrDynamic(spark)
    val g0 = new CsrPageRank(spark).build(xDf)
    val (_, st0) = dyn.staticWithState(g0)
    assert(reachableShuffleDeps(st0) === 0,
      "bootstrap state retains the static run's superstep chain")
    val (g1, _, st1) = dyn.applyBatch(g0, st0, insDf, none, prune = false)
    assert(reachableShuffleDeps(st1) === 0,
      "carried state retains the batch's superstep chain")
    assert(reachableShuffleDeps(g1.blocks) === 0,
      "carried blocks retain the splice's batch shuffles")
  }
}
