package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.MetricsCsv

/** Log→CSV post-processing (the reference's process.js analog) over
  * SnapMain-shaped JSON lines. */
class MetricsCsvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flattens per-batch technique objects to one row per (batch, technique)") {
    val dir = Files.createTempDirectory("graft-metrics")
    val f = dir.resolve("log.jsonl")
    def tech(s: Double, it: Int, e: Double) =
      s"""{"secs":$s,"iters":$it,"l1_err":$e}"""
    val line = (b: Int) =>
      s"""{"batch":$b,"edges":4,"static":${tech(1.5, 80, 1e-9)},""" +
        s""""naiveDynamic":${tech(0.9, 40, 2e-9)},""" +
        s""""dynamicTraversal":${tech(0.8, 38, 3e-9)},""" +
        s""""dynamicFrontier":${tech(0.5, 34, 4e-8)},""" +
        s""""dynamicFrontierPrune":${tech(0.3, 17, 5e-7)}}"""
    Files.writeString(f, line(0) + "\n" + line(1) + "\n")

    val rows = MetricsCsv.flatten(spark, f.toString).collect()
    assert(rows.length === 10) // 2 batches × 5 techniques
    val first = rows.head
    assert(first.getAs[Long]("batch") === 0L)
    assert(rows.map(_.getAs[String]("technique")).distinct.sorted ===
      MetricsCsv.Techniques.sorted.toArray)
    val dfp = rows.find(r => r.getAs[Long]("batch") == 1L &&
      r.getAs[String]("technique") == "dynamicFrontierPrune").get
    assert(dfp.getAs[Double]("secs") === 0.3)
    assert(dfp.getAs[Long]("iters") === 17L)
    assert(dfp.getAs[Double]("l1_err") === 5e-7)
  }
}
