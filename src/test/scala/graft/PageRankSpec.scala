package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.EdgeOps
import graft.ingest.WebGraphFixture
import graft.model.PagerankOptions
import graft.pagerank.PageRank

class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def selfLooped(edges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
    (edges ++ vs.map(v => (v, v))).distinct
  }

  val line4 = selfLooped(Seq((1L, 2L), (2L, 3L), (3L, 4L)))

  test("static PageRank on line4 matches the in-memory reference oracle (allclose 1e-6)") {
    val pr = new PageRank(spark)
    val got = TestSpark.collectRanks(
      pr.static(TestSpark.edgesDf(spark, line4)).ranks)
    val want = Oracle.pagerank(new Oracle.G(line4), tol = 1e-100)
    assert(Oracle.allclose(got, want, 1e-6),
      s"maxDiff=${Oracle.maxDiff(got, want)}")
  }

  test("static PageRank ranks sum to 1 (self-loops ⇒ no dangling mass)") {
    val pr = new PageRank(spark)
    val run = pr.static(TestSpark.edgesDf(spark, line4))
    val s = run.ranks.agg(sum("rank")).collect()(0).getDouble(0)
    assert(math.abs(s - 1.0) < 1e-8)
    assert(run.stats.iterations > 1 && run.stats.finalResidual < 1e-10)
  }

  test("static PageRank on the synthetic web fixture matches the oracle end-to-end") {
    val P = 300L
    val pages = WebGraphFixture.pages(spark, P).toDF()
    val (dict, staged) = EdgeOps.stage(pages)
    val allVerts = dict.select(col("id"))
    val y = EdgeOps.withSelfLoops(EdgeOps.simple(staged), allVerts)

    val got = TestSpark.collectRanks(new PageRank(spark).static(y).ranks)

    val urlToId = dict.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oEdges = selfLooped(
      WebGraphFixture.rawEdges(P).map { case (s, d) =>
        (urlToId(WebGraphFixture.url(s)), urlToId(WebGraphFixture.url(d)))
      } ++ (0L until P).map(k => (urlToId(WebGraphFixture.url(k)),
        urlToId(WebGraphFixture.url(k)))))
    val want = Oracle.pagerank(new Oracle.G(oEdges), tol = 1e-100)
    assert(got.size === P)
    assert(Oracle.allclose(got, want, 1e-6),
      s"maxDiff=${Oracle.maxDiff(got, want)}")
  }

  test("salted two-phase hub aggregation is value-identical to the one-phase plan") {
    // Star into a hub (+ a tail) so one dst dominates in-degree; force the
    // salted plan with a tiny hubThreshold and compare against the default
    // (one-phase) plan and the oracle. Only fp summation order differs.
    val star = selfLooped(
      (1L to 200L).map(i => (i, 0L)) ++ Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    val edges = TestSpark.edgesDf(spark, star)
    val unsalted = TestSpark.collectRanks(new PageRank(spark).static(edges).ranks)
    val saltedPr = new PageRank(spark, PagerankOptions(hubThreshold = Some(10L)))
    val saltedRanks = TestSpark.collectRanks(saltedPr.static(edges).ranks)
    assert(Oracle.allclose(saltedRanks, unsalted, 1e-12),
      s"maxDiff=${Oracle.maxDiff(saltedRanks, unsalted)}")
    val want = Oracle.pagerank(new Oracle.G(star), tol = 1e-100)
    assert(Oracle.allclose(saltedRanks, want, 1e-6))
  }

  test("salted plan also exact under dynamic frontier (sweep filter + salt)") {
    val base = selfLooped((1L to 100L).map(i => (i, 0L)) ++ Seq((0L, 5L)))
    val ins = Seq((7L, 9L), (9L, 23L))
    val y = selfLooped(base ++ ins)
    val xDf = TestSpark.edgesDf(spark, base)
    val yDf = TestSpark.edgesDf(spark, y)
    val insDf = TestSpark.edgesDf(spark, ins)
    val none = insDf.limit(0)
    val opts = PagerankOptions(hubThreshold = Some(10L))
    val prev = new PageRank(spark, opts).static(xDf).ranks
    val got = TestSpark.collectRanks(
      new PageRank(spark, opts).dynamicFrontier(xDf, yDf, insDf, none, prev).ranks)
    val want = Oracle.pagerank(new Oracle.G(y), tol = 1e-100)
    assert(Oracle.allclose(got, want, 1e-6), s"maxDiff=${Oracle.maxDiff(got, want)}")
  }

  test("incremental LinkState (buildLinks + updateLinks) matches a fresh build") {
    val base = selfLooped(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L)))
    val ins = Seq((3L, 1L), (1L, 4L))
    val del = Seq((2L, 4L))
    val y = selfLooped(base.filterNot(del.contains) ++ ins)
    val xDf = TestSpark.edgesDf(spark, base)
    val yDf = TestSpark.edgesDf(spark, y)
    val insDf = TestSpark.edgesDf(spark, ins)
    val delDf = TestSpark.edgesDf(spark, del)

    val pr = new PageRank(spark)
    val lsX = pr.buildLinks(xDf)
    val lsY = pr.updateLinks(lsX, insDf, delDf)
    val fresh = pr.buildLinks(yDf)
    // identical link rows + degrees + counts
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("src", "dst", "outDeg").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(lsY.links) === rows(fresh.links))
    assert(lsY.n === fresh.n && lsY.nEdges === fresh.nEdges)

    // and DF over the incremental state converges to the true fixpoint
    val prev = pr.static(xDf, Some(lsX)).ranks
    val got = TestSpark.collectRanks(
      pr.dynamicFrontier(xDf, yDf, insDf, delDf, prev, Some(lsY)).ranks)
    val want = Oracle.pagerank(new Oracle.G(y), tol = 1e-100)
    assert(Oracle.allclose(got, want, 1e-6), s"maxDiff=${Oracle.maxDiff(got, want)}")
  }

  test("incremental LinkState carries the salt column when hubs are present") {
    val star = selfLooped((1L to 200L).map(i => (i, 0L)) ++ Seq((0L, 1L)))
    val ins = Seq((5L, 7L))
    val y = selfLooped(star ++ ins)
    val pr = new PageRank(spark, PagerankOptions(hubThreshold = Some(10L)))
    val lsX = pr.buildLinks(TestSpark.edgesDf(spark, star))
    assert(lsX.hubs.isDefined)
    val lsY = pr.updateLinks(lsX, TestSpark.edgesDf(spark, ins),
      TestSpark.edgesDf(spark, ins).limit(0))
    assert(lsY.links.columns.contains("salt"))
    val prev = pr.static(TestSpark.edgesDf(spark, star), Some(lsX)).ranks
    val got = TestSpark.collectRanks(pr.dynamicFrontier(
      TestSpark.edgesDf(spark, star), TestSpark.edgesDf(spark, y),
      TestSpark.edgesDf(spark, ins), TestSpark.edgesDf(spark, ins).limit(0),
      prev, Some(lsY)).ranks)
    val want = Oracle.pagerank(new Oracle.G(y), tol = 1e-100)
    assert(Oracle.allclose(got, want, 1e-6), s"maxDiff=${Oracle.maxDiff(got, want)}")
  }

  test("L1 residual mode also converges to the same fixpoint") {
    val pr = new PageRank(spark, PagerankOptions(useL1Residual = true))
    val got = TestSpark.collectRanks(
      pr.static(TestSpark.edgesDf(spark, line4)).ranks)
    val want = Oracle.pagerank(new Oracle.G(line4), tol = 1e-100)
    assert(Oracle.allclose(got, want, 1e-6))
  }
}
