package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.graph.EdgeOps
import graft.util.Ckpt._
import graft.model.PagerankOptions
import graft.pagerank.PageRank

/** Structured-Streaming front end for dynamic PageRank.
  *
  * The reference consumes a temporal edge file in prefix order and applies
  * insertion-only batches (/root/reference/main.cxx:74-106). The streaming
  * analog: `readStream` over a staged-edge directory (one file ≈ one batch),
  * `foreachBatch` applying each micro-batch as an edge insertion batch and
  * re-ranking with the Dynamic Frontier variant against the previous ranks —
  * exactly the reference's per-batch loop (§3.2), driven by Spark's source
  * sequencing, checkpointing and exactly-once batch replay instead of a
  * hand-written file cursor.
  *
  * State across batches (current edge set + rank vector) is held as
  * checkpointed DataFrames; with `PagerankOptions.checkpointDir` set, ranks
  * are additionally durable per superstep, so a killed stream resumes from
  * (streaming offset log, rank manifest).
  */
/** @param vertexUniverse all vertex ids known upfront (the url dictionary).
  *   Mirrors the reference's eager vertex range — the temporal loader adds
  *   vertices 1..rows BEFORE any batch (/root/reference/inc/snap.hxx:133) and
  *   self-loops cover them all (/root/reference/main.cxx:127-128), so N (and
  *   the teleport term C0=(1−P)/N) never changes across batches. Without a
  *   fixed universe, vertices introduced mid-stream would silently change C0
  *   for never-swept vertices, breaking the DF approximation guarantee. */
class IncrementalPageRank(spark: SparkSession,
    vertexUniverse: DataFrame,
    opts: PagerankOptions = PagerankOptions()) {

  @volatile private var edges: DataFrame = _
  @volatile private var ranks: DataFrame = _
  @volatile private var batchesApplied: Int = 0

  def currentRanks: DataFrame = ranks
  def currentEdges: DataFrame = edges
  def batches: Int = batchesApplied

  /** Apply one insertion batch (u,v rows) to the running state. */
  def applyBatch(batch: DataFrame): Unit = synchronized {
    val pr = new PageRank(spark, opts)
    val ins = batch.select("src", "dst")
    if (edges == null) {
      // first batch bootstraps the base graph — static rank over the full
      // vertex universe (self-loops for every known vertex, like the
      // reference driver's pre-step)
      edges = EdgeOps.withSelfLoops(EdgeOps.simple(ins), vertexUniverse)
        .ckpt()
      ranks = pr.static(edges).ranks
    } else {
      val x = edges
      val y = EdgeOps.applyBatch(x, ins, ins.limit(0)).ckpt()
      ranks = pr.dynamicFrontier(x, y, ins, ins.limit(0), ranks).ranks
      edges = y
    }
    batchesApplied += 1
  }

  /** Run over a directory of staged-edge parquet files, one file per
    * trigger (the deterministic batch replay). Returns the query; callers
    * use `processAllAvailable()` for synchronous tests. */
  def run(stagedDir: String, streamCheckpointDir: String): StreamingQuery = {
    val schema = "src LONG, dst LONG, seq LONG"
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stagedDir)
      .writeStream
      .option("checkpointLocation", streamCheckpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => applyBatch(batch) }
      .start()
  }
}
