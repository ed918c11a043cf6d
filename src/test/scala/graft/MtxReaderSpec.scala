package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.EdgeOps
import graft.ingest.MtxReader
import graft.pagerank.PageRank

/** MatrixMarket reader: header/banner semantics, symmetric echo, weight
  * discard, eager vertex range — then PageRank over an MTX graph vs the
  * in-memory oracle (the reference's own pipeline shape,
  * /root/reference/inc/mtx.hxx:210-250). */
class MtxReaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def write(lines: Seq[String]): String = {
    val f = Files.createTempDirectory("graft-mtx").resolve("g.mtx")
    Files.writeString(f, lines.mkString("\n") + "\n")
    f.toString
  }

  test("general (asymmetric) weighted file: weights discarded, size line skipped") {
    val path = write(Seq(
      "%%MatrixMarket matrix coordinate real general",
      "% a comment",
      "4 4 5",
      "1 2 0.5",
      "2 3 1.5",
      "3 1 2.0",
      "4 1 9.9",
      "1 2 7.0" // duplicate edge with different weight
    ))
    val g = MtxReader.read(spark, path)
    assert(!g.symmetric && g.rows === 4 && g.cols === 4 && g.size === 5)
    val edges = g.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(edges.sorted === Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).sorted)
    assert(EdgeOps.simple(g.edges).count() === 4)
    assert(g.vertexRange(spark).as[Long].collect().sorted === Array(1L, 2L, 3L, 4L))
  }

  test("symmetric file echoes reversed edges (reference readMtxDo contract)") {
    val path = write(Seq(
      "%%MatrixMarket matrix coordinate pattern symmetric",
      "3 3 3",
      "2 1",
      "3 1",
      "3 3" // diagonal: echo collapses on dedupe
    ))
    val g = MtxReader.read(spark, path)
    assert(g.symmetric)
    val edges = EdgeOps.simple(g.edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges === Set((2L, 1L), (1L, 2L), (3L, 1L), (1L, 3L), (3L, 3L)))
  }

  test("header parses past a 100-line leading comment block") {
    val path = write(
      Seq("%%MatrixMarket matrix coordinate pattern symmetric") ++
        (1 to 100).map(i => s"% long SuiteSparse-style banner line $i") ++
        Seq("3 3 2", "2 1", "3 1"))
    val g = MtxReader.read(spark, path)
    assert(g.symmetric && g.rows === 3 && g.size === 2)
    assert(EdgeOps.simple(g.edges).count() === 4)
  }

  test("PageRank over an MTX graph matches the in-memory oracle") {
    val rnd = new graft.ingest.SplitMix64(11L)
    val n = 9L
    val body = (0 until 40).map { _ =>
      s"${Math.floorMod(rnd.nextLong(), n) + 1} ${Math.floorMod(rnd.nextLong(), n) + 1}"
    }
    val path = write(
      s"%%MatrixMarket matrix coordinate pattern general" +: s"$n $n 40" +: body)
    val g = MtxReader.read(spark, path)
    val y = EdgeOps.withSelfLoops(EdgeOps.simple(g.edges), g.vertexRange(spark))
    val got = TestSpark.collectRanks(new PageRank(spark).static(y).ranks)
    val edgeSeq = body.map { l =>
      val f = l.split(" "); (f(0).toLong, f(1).toLong)
    }
    val withLoops = (edgeSeq ++ (1L to n).map(v => (v, v))).distinct
    val want = Oracle.pagerank(new Oracle.G(withLoops), tol = 1e-100)
    assert(got.keySet === want.keySet)
    assert(Oracle.allclose(got, want, 1e-6),
      s"maxDiff=${Oracle.maxDiff(got, want)}")
  }
}
