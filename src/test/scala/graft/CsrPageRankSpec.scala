package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.EdgeOps
import graft.ingest.WebGraphFixture
import graft.model.PagerankOptions
import graft.pagerank.{CsrPageRank, PageRank}

/** The partition-local CSR fast path must be VALUE-IDENTICAL to the
  * DataFrame superstep (allclose 1e-12, same iteration count) — it is a
  * physical-plan swap, not a semantic variant. */
class CsrPageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def selfLooped(edges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
    (edges ++ vs.map(v => (v, v))).distinct
  }

  val line4 = selfLooped(Seq((1L, 2L), (2L, 3L), (3L, 4L)))

  test("CSR static == DataFrame static on line4 (allclose 1e-12, same iters)") {
    val edges = TestSpark.edgesDf(spark, line4)
    val df = new PageRank(spark).static(edges)
    val csr = new CsrPageRank(spark).static(edges)
    val a = TestSpark.collectRanks(csr.ranks)
    val b = TestSpark.collectRanks(df.ranks)
    assert(a.keySet === b.keySet)
    assert(Oracle.allclose(a, b, 1e-12), s"maxDiff=${Oracle.maxDiff(a, b)}")
    assert(csr.stats.iterations === df.stats.iterations)
    // per-superstep wall trace (throughput protocols divide by its min)
    assert(csr.stats.stepTimesMs.length === csr.stats.iterations)
    assert(df.stats.stepTimesMs.length === df.stats.iterations)
    assert(csr.stats.stepTimesMs.forall(_ > 0.0))
  }

  test("CSR static == DataFrame static on the web fixture (incl. hub skew)") {
    val P = 400L
    val pages = WebGraphFixture.pages(spark, P).toDF()
    val (dict, staged) = EdgeOps.stage(pages)
    val y = EdgeOps.withSelfLoops(EdgeOps.simple(staged), dict.select("id"))
      .cache()
    val df = new PageRank(spark).static(y)
    val csr = new CsrPageRank(spark).static(y)
    val a = TestSpark.collectRanks(csr.ranks)
    val b = TestSpark.collectRanks(df.ranks)
    assert(a.size === P)
    assert(Oracle.allclose(a, b, 1e-12), s"maxDiff=${Oracle.maxDiff(a, b)}")
    assert(csr.stats.iterations === df.stats.iterations)
  }

  test("sparse sweep (packed-key map, maxDenseBytes=0) == dense sweep") {
    val star = selfLooped((1L to 150L).map(i => (i, 0L)) ++ Seq((0L, 1L)))
    val edges = TestSpark.edgesDf(spark, star)
    val dense = TestSpark.collectRanks(new CsrPageRank(spark).static(edges).ranks)
    val sparse = TestSpark.collectRanks(
      new CsrPageRank(spark, PagerankOptions(), maxDenseBytes = 0L)
        .static(edges).ranks)
    assert(Oracle.allclose(sparse, dense, 1e-12),
      s"maxDiff=${Oracle.maxDiff(sparse, dense)}")
    val want = Oracle.pagerank(new Oracle.G(star), tol = 1e-100)
    assert(Oracle.allclose(sparse, want, 1e-6))
  }

  test("fixed-step throughput mode (tolerance=0) runs exactly maxIterations") {
    val edges = TestSpark.edgesDf(spark, line4)
    val opts = PagerankOptions(tolerance = 0.0, maxIterations = 4)
    val run = new CsrPageRank(spark, opts).static(edges)
    assert(run.stats.iterations === 4)
    val dfRun = new PageRank(spark, opts).static(edges)
    val a = TestSpark.collectRanks(run.ranks)
    val b = TestSpark.collectRanks(dfRun.ranks)
    assert(Oracle.allclose(a, b, 1e-12))
  }

  test("useCsr option dispatches PageRank.static through the CSR path") {
    val edges = TestSpark.edgesDf(spark, line4)
    val run = new PageRank(spark, PagerankOptions(useCsr = true)).static(edges)
    val want = Oracle.pagerank(new Oracle.G(line4), tol = 1e-100)
    assert(Oracle.allclose(TestSpark.collectRanks(run.ranks), want, 1e-6))
  }

  test("L1 residual mode converges on the CSR path too") {
    val edges = TestSpark.edgesDf(spark, line4)
    val run = new CsrPageRank(spark,
      PagerankOptions(useL1Residual = true)).static(edges)
    val want = Oracle.pagerank(new Oracle.G(line4), tol = 1e-100)
    assert(Oracle.allclose(TestSpark.collectRanks(run.ranks), want, 1e-6))
  }
}
