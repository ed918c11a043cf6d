package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.PagerankOptions
import graft.pagerank.{Checkpointer, PageRank}

/** Durable checkpoint/resume (north rule: runs resume mid-iteration). */
class CheckpointSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def selfLooped(edges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
    (edges ++ vs.map(v => (v, v))).distinct
  }
  val line4 = selfLooped(Seq((1L, 2L), (2L, 3L), (3L, 4L)))

  test("per-superstep manifest + rank parquet; resume mid-iteration reaches the same fixpoint") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val edges = TestSpark.edgesDf(spark, line4)

    // Phase 1: a run KILLED mid-iteration (maxIterations=5 simulates the kill)
    val partial = new PageRank(spark, PagerankOptions(maxIterations = 5,
      checkpointDir = Some(dir))).static(edges)
    assert(partial.stats.iterations === 5)

    val resume = Checkpointer.latest(spark, dir)
    assert(resume.isDefined)
    assert(resume.get.superstep === 5)
    assert(resume.get.residual > 0)

    // Phase 2: resume from the manifest's rank vector (warm start) and run
    // to convergence — must match an uninterrupted run allclose 1e-6.
    val resumed = new PageRank(spark).naiveDynamic(edges, resume.get.ranks)
    val direct = new PageRank(spark).static(edges)
    val a = TestSpark.collectRanks(resumed.ranks)
    val b = TestSpark.collectRanks(direct.ranks)
    assert(Oracle.allclose(a, b, 1e-6), s"maxDiff=${Oracle.maxDiff(a, b)}")
    // resume did less work than starting over
    assert(resumed.stats.iterations < direct.stats.iterations)
  }

  test("manifest records one line per superstep when checkpointEvery=1") {
    val dir = Files.createTempDirectory("graft-ckpt2").toString
    new PageRank(spark, PagerankOptions(maxIterations = 3, checkpointEvery = 1,
      checkpointDir = Some(dir))).static(TestSpark.edgesDf(spark, line4))
    val lines = Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/MANIFEST.jsonl"))
    assert(lines.size === 3)
    assert((1 to 3).forall(i => lines.get(i - 1).contains(s""""superstep":$i""")))
  }

  test("checkpointEvery=5 with maxIterations=10 writes exactly 2 manifest lines; resume exact") {
    val dir = Files.createTempDirectory("graft-ckpt3").toString
    val edges = TestSpark.edgesDf(spark, line4)
    val run = new PageRank(spark, PagerankOptions(maxIterations = 10,
      checkpointEvery = 5, checkpointDir = Some(dir))).static(edges)
    assert(run.stats.iterations === 10)
    val lines = Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/MANIFEST.jsonl"))
    assert(lines.size === 2)
    assert(lines.get(0).contains(""""superstep":5"""))
    assert(lines.get(1).contains(""""superstep":10"""))
    // the checkpointed final vector IS the run's final vector (exact)
    val resume = Checkpointer.latest(spark, dir).get
    val a = TestSpark.collectRanks(resume.ranks)
    val b = TestSpark.collectRanks(run.ranks)
    assert(Oracle.allclose(a, b, 0.0), s"maxDiff=${Oracle.maxDiff(a, b)}")
  }
}
