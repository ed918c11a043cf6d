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

  test("L1 residual mode also converges to the same fixpoint") {
    val pr = new PageRank(spark, PagerankOptions(useL1Residual = true))
    val got = TestSpark.collectRanks(
      pr.static(TestSpark.edgesDf(spark, line4)).ranks)
    val want = Oracle.pagerank(new Oracle.G(line4), tol = 1e-100)
    assert(Oracle.allclose(got, want, 1e-6))
  }
}
