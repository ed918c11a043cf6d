package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.graph.EdgeOps
import graft.ingest.WebGraphFixture
import graft.pagerank.{CsrDynamic, CsrPageRank}

/** TEMPORARY r6 measurement harness for the dynamic-batch regime the bench's
  * fraction sweep times (csr_dfp_speedup_frac_1e5): replays a run of
  * 1e-5·|E| insertion batches through carried DF/DF-P state, exactly like
  * Bench's sweep loop, and prints per-batch walls + supersteps. In-JVM
  * paired across env-toggled variants is not possible for GRAFT_DYN_FUSE
  * (read at CsrDynamic construction), so pass it per-process and compare
  * medians across interleaved process runs. Kept in-tree as committed
  * measurement evidence cited by OPTIMIZATION_r06.md.
  *
  * Env: AB_PAGES (4000000), AB_CORES (32), AB_BATCHES (4), AB_FRACTION (1e-5)
  */
object CsrAb {
  def main(args: Array[String]): Unit = {
    val pages = sys.env.getOrElse("AB_PAGES", "4000000").toLong
    val cores = sys.env.getOrElse("AB_CORES", "32").toInt
    val nBatches = sys.env.getOrElse("AB_BATCHES", "4").toInt
    val fraction = sys.env.getOrElse("AB_FRACTION", "1e-5").toDouble
    val s = GraftSession.builder(s"local[$cores]", cores)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    GraftSession.tameStatusListener(s, force = true)

    val staged = WebGraphFixture.edgesOnly(s, pages).toDF().cache()
    val m = staged.count()
    val batchLen = math.max(1L, (m * fraction).toLong)
    val cut0 = m - (nBatches.toLong + 1) * batchLen
    val cuts: IndexedSeq[Long] = {
      val fracs = (0 to nBatches + 1).map(i =>
        (cut0 + i.toLong * batchLen).toDouble / m)
      val row = staged.agg(expr(
        s"approx_percentile(seq, array(${fracs.mkString(",")}), 1000000)"))
        .collect()(0).getSeq[Long](0)
      row.toIndexedSeq.init :+ Long.MaxValue
    }
    val verts = s.range(pages).select(col("id"))
    val x0 = EdgeOps.withSelfLoops(
      staged.where(col("seq") < cuts(0)).select("src", "dst"), verts).cache()
    val dyn = new CsrDynamic(s)
    val csr = new CsrPageRank(s)
    val g0 = csr.build(x0)
    val (_, st0) = dyn.staticWithState(g0)
    var gDf = g0; var stDf = st0
    var gDfp = g0; var stDfp = st0
    var xEdges = x0
    println(s"[csrab] pages=$pages edges=$m batchLen=$batchLen " +
      s"fuse=${sys.env.getOrElse("GRAFT_DYN_FUSE", "default")}")
    for (b <- 0 to nBatches) {
      val ins = staged
        .where(col("seq") >= cuts(b) && col("seq") < cuts(b + 1))
        .select("src", "dst").dropDuplicates("src", "dst")
        .join(xEdges, Seq("src", "dst"), "left_anti").cache()
      ins.count()
      val none = ins.limit(0)
      val t0 = System.nanoTime()
      val (gDf2, runD, stDf2) = dyn.applyBatch(gDf, stDf, ins, none, prune = false)
      val t1 = System.nanoTime()
      val (gDfp2, runP, stDfp2) = dyn.applyBatch(gDfp, stDfp, ins, none, prune = true)
      val t2 = System.nanoTime()
      val tag = if (b == 0) "warm" else s"b$b"
      println(f"[csrab] $tag df ${(t1 - t0) / 1e9}%.3fs/${runD.stats.iterations}it " +
        f"dfp ${(t2 - t1) / 1e9}%.3fs/${runP.stats.iterations}it")
      if (b > 0) {
        gDf.blocks.unpersist(false); stDf.unpersist(false)
        gDfp.blocks.unpersist(false); stDfp.unpersist(false)
      }
      gDf = gDf2; stDf = stDf2; gDfp = gDfp2; stDfp = stDfp2
      xEdges = EdgeOps.applyBatch(xEdges, ins, none).localCheckpoint()
      xEdges.count()
      ins.unpersist()
    }
    s.stop()
  }
}
