package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.graph.EdgeOps
import graft.ingest.SnapReader
import graft.model.PagerankOptions
import graft.pagerank.PageRank
import graft.util.Ckpt._

/** spark-submit main replaying the reference experiment on a real SNAP
  * temporal edge file — `runExperiment` (/root/reference/main.cxx:47-107)
  * over graft's engine, so the reference's five corpora
  * (/root/reference/main.sh:46-50) run unchanged:
  *
  *   SnapMain <file> <rows> <size> <batchFraction> [nBatches=10]
  *
  * Protocol per the reference: base graph = first 90% of the `size` body
  * lines (+ self-loops over the eager 1..rows universe); then `nBatches`
  * insertion batches of `batchFraction·size` lines each; per batch every
  * technique re-ranks from ITS carried rank register (main.cxx:69-72,
  * 100-103) and is scored by L1 error against a fresh 1e-15 static oracle
  * on the updated graph (main.cxx:85,55). One JSON line per batch.
  *
  * Env: SPARK_GRAFT_CPUS (default 32), GRAFT_SNAP_USECSR=1 to route the
  * engine through the partition-local CSR fast paths.
  */
object SnapMain {

  final case class TechResult(secs: Double, iters: Int, l1: Double)

  def l1Err(a: DataFrame, oracle: DataFrame): Double =
    a.select(col("id"), col("rank"))
      .join(oracle.select(col("id"), col("rank").as("o")), "id")
      .agg(sum(abs(col("rank") - col("o")))).collect()(0).getDouble(0)

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** The experiment loop; returns per-batch (technique → result) maps so
    * tests can assert on it. */
  def run(spark: SparkSession, file: String, rows: Long, size: Long,
      batchFraction: Double, nBatches: Int,
      opts: PagerankOptions = PagerankOptions(),
      emit: String => Unit = println): Seq[Map[String, TechResult]] = {
    val snap = SnapReader.read(spark, file).where(col("seq") < size).cache()
    val verts = SnapReader.vertexRange(spark, rows).cache()
    val base90 = (0.9 * size).toLong
    val batchLen = math.max(1L, (batchFraction * size).toLong)
    val pr = new PageRank(spark, opts)
    val oracleOpts = opts.copy(tolerance = 1e-15)
    val prOracle = new PageRank(spark, oracleOpts)

    var x = EdgeOps.withSelfLoops(
      EdgeOps.simple(snap.where(col("seq") < base90).select("src", "dst")),
      verts).ckpt()
    // per-technique rank registers, initialized from the base-graph oracle
    // (main.cxx:68-72)
    val r0 = prOracle.static(x).ranks
    var rNd = r0; var rDt = r0; var rDf = r0; var rDfp = r0

    val out = Seq.newBuilder[Map[String, TechResult]]
    var b = 0
    var lo = base90
    while (b < nBatches && lo < size) {
      val hi = math.min(lo + batchLen, size)
      val ins = EdgeOps.tidyInsertions(
        snap.where(col("seq") >= lo && col("seq") < hi).select("src", "dst"),
        x).ckpt()
      val none = ins.limit(0)
      val y = EdgeOps.applyBatch(x, ins, none).ckpt()
      val oracle = prOracle.static(y).ranks.ckpt()

      val (st, tSt) = time(pr.static(y))
      val (nd, tNd) = time(pr.naiveDynamic(y, rNd))
      val (dt, tDt) = time(pr.dynamicTraversal(x, y, ins, none, rDt))
      val (df, tDf) = time(pr.dynamicFrontier(x, y, ins, none, rDf))
      val (dfp, tDfp) = time(pr.dynamicFrontierPrune(x, y, ins, none, rDfp))
      val m = Map(
        "static" -> TechResult(tSt, st.stats.iterations, l1Err(st.ranks, oracle)),
        "naiveDynamic" -> TechResult(tNd, nd.stats.iterations, l1Err(nd.ranks, oracle)),
        "dynamicTraversal" -> TechResult(tDt, dt.stats.iterations, l1Err(dt.ranks, oracle)),
        "dynamicFrontier" -> TechResult(tDf, df.stats.iterations, l1Err(df.ranks, oracle)),
        "dynamicFrontierPrune" -> TechResult(tDfp, dfp.stats.iterations, l1Err(dfp.ranks, oracle)))
      out += m
      emit(s"""{"batch":$b,"edges":${hi - lo},""" + m.map { case (k, v) =>
        f""""$k%s":{"secs":${v.secs}%.3f,"iters":${v.iters}%d,"l1_err":${v.l1}%.3e}"""
      }.mkString(",") + "}")
      // carry registers + swap x↔y (main.cxx:100-105)
      rNd = nd.ranks; rDt = dt.ranks; rDf = df.ranks; rDfp = dfp.ranks
      x = y
      lo = hi
      b += 1
    }
    out.result()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: SnapMain <file> <rows> <size> <batchFraction> [nBatches=10]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    val useCsr = sys.env.get("GRAFT_SNAP_USECSR").contains("1")
    run(spark, args(0), args(1).toLong, args(2).toLong, args(3).toDouble,
      if (args.length > 4) args(4).toInt else 10,
      PagerankOptions(useCsr = useCsr))
    spark.stop()
  }
}
