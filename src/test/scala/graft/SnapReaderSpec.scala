package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.EdgeOps
import graft.ingest.SnapReader
import graft.pagerank.PageRank

/** SNAP temporal reader: parse semantics + a replay of the reference's
  * batch loop (/root/reference/main.cxx:74-106) from a .txt fixture through
  * the same staged-table path the synthetic fixture uses. */
class SnapReaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic small temporal file: header comments, blank lines, an
    * optional third (timestamp) column, duplicate lines, 1-based ids. */
  private def writeFixture(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-snap")
    val f = dir.resolve("edges.txt")
    Files.writeString(f, lines.mkString("\n") + "\n")
    f.toString
  }

  test("parses u v [t] body lines in order; skips comments/blanks without a seq slot") {
    val path = writeFixture(Seq(
      "# SNAP-style header",
      "% another header",
      "1 2 1000",
      "",
      "2 3",
      "3 1 1002",
      "1 2 1003", // duplicate edge, later timestamp
      "  4 1 1004" // leading whitespace
    ))
    val got = SnapReader.read(spark, path)
      .orderBy("seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L, 0L), (2L, 3L, 1L), (3L, 1L, 2L),
      (1L, 2L, 3L), (4L, 1L, 4L)))
    assert(SnapReader.vertexRange(spark, 4).as[Long].collect().sorted
      === Array(1L, 2L, 3L, 4L))
  }

  test("replays the reference batch loop from a temporal file (90% base + 2 batches)") {
    // 30 body lines over ids 1..8, including duplicates — same protocol as
    // main.cxx: base = first 90%, then batch slices, eager vertex range.
    val rnd = new graft.ingest.SplitMix64(7L)
    val rows = 8L
    val lines = (0 until 30).map { i =>
      val u = Math.floorMod(rnd.nextLong(), rows) + 1
      val v = Math.floorMod(rnd.nextLong(), rows) + 1
      s"$u $v ${1000 + i}"
    }
    val path = writeFixture("# temporal" +: lines)
    val snap = SnapReader.read(spark, path).cache()
    val m = snap.count()
    assert(m === 30)

    val verts = SnapReader.vertexRange(spark, rows)
    val cut0 = (0.9 * m).toLong // 27
    val batchLen = 2L
    def slice(lo: Long, hi: Long) =
      snap.where($"seq" >= lo && $"seq" < hi).select("src", "dst")

    var x = EdgeOps.withSelfLoops(EdgeOps.simple(slice(0, cut0)), verts)
    val pr = new PageRank(spark)
    var ranks = pr.static(x).ranks
    var lo = cut0
    while (lo < m) {
      val hi = math.min(lo + batchLen, m)
      val ins = EdgeOps.tidyInsertions(slice(lo, hi), x)
      val y = EdgeOps.applyBatch(x, ins, ins.limit(0))
      ranks = pr.dynamicFrontier(x, y, ins, ins.limit(0), ranks).ranks
      x = y
      lo = hi
    }

    // final ranks must allclose the in-memory oracle on the full edge set
    val allEdges = snap.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val withLoops = (allEdges ++ (1L to rows).map(v => (v, v))).distinct
    val want = Oracle.pagerank(new Oracle.G(withLoops), tol = 1e-100)
    val got = TestSpark.collectRanks(ranks)
    assert(got.keySet === want.keySet)
    assert(Oracle.allclose(got, want, 2e-6),
      s"maxDiff=${Oracle.maxDiff(got, want)}")
  }
}
