package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.graph.EdgeOps
import graft.ingest.WebGraphFixture
import graft.model.PagerankOptions
import graft.pagerank.PageRank

/** Temporary measurement harness: per-superstep wall time across
  * (cores × pages) to separate parallel work from fixed overhead.
  * sbt "runMain graft.tools.ScaleProbe" */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val pagesList = sys.env.getOrElse("PROBE_PAGES", "1000000,4000000")
      .split(",").map(_.toLong)
    val coresList = sys.env.getOrElse("PROBE_CORES", "8,32")
      .split(",").map(_.toInt)
    val steps = sys.env.getOrElse("PROBE_STEPS", "10").toInt
    val aqe = !sys.env.get("GRAFT_AQE").contains("0")
    for (pages <- pagesList; cores <- coresList) {
      SparkSession.getActiveSession.foreach(_.stop())
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val parts = sys.env.get("PROBE_PARTS").map(_.toInt).getOrElse(cores)
      val b = GraftSession.builder(s"local[$cores]", parts)
        .config("spark.default.parallelism", parts.toString)
        .config("spark.sql.adaptive.enabled", aqe.toString)
      sys.env.get("PROBE_SHJ").foreach(v =>
        b.config("spark.sql.join.preferSortMergeJoin", (v != "1").toString))
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      // stage accounting: executor-run-time vs wall tells us scheduler gap
      val stageTime = new java.util.concurrent.atomic.AtomicLong()
      val stageCount = new java.util.concurrent.atomic.AtomicLong()
      val taskCount = new java.util.concurrent.atomic.AtomicLong()
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stageTime.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
          stageCount.incrementAndGet()
          taskCount.addAndGet(e.stageInfo.numTasks)
        }
      })
      val staged = WebGraphFixture.edgesOnly(s, pages).toDF()
      val verts = s.range(pages).select(col("id"))
      val y = EdgeOps.withSelfLoops(staged.select("src", "dst"), verts)
      val useCsr = sys.env.get("PROBE_CSR").contains("1")
      val opts = PagerankOptions(tolerance = 0.0, maxIterations = steps,
        useCsr = useCsr)
      new PageRank(s, opts).static(y) // warmup incl. links build
      stageTime.set(0); stageCount.set(0); taskCount.set(0)
      val run = new PageRank(s, opts).static(y)
      val secPerStep = run.stats.computeTimeMs / 1e3 / run.stats.iterations
      val busy = stageTime.get / 1e3 / (run.stats.computeTimeMs / 1e3 * cores)
      println(f"[probe] pages=$pages cores=$cores aqe=$aqe " +
        f"init=${run.stats.initTimeMs / 1e3}%.2fs secPerStep=$secPerStep%.3f " +
        f"stages/step=${stageCount.get.toDouble / steps}%.1f " +
        f"tasks/step=${taskCount.get.toDouble / steps}%.1f " +
        f"coreUtilization=$busy%.2f")
    }
    SparkSession.getActiveSession.foreach(_.stop())
  }
}
