package org.apache.spark.scheduler

import org.apache.spark.{MapOutputTrackerMaster, SparkContext}
import org.apache.spark.storage.BlockId

/** Read-only sizes of the driver-global registries that can grow across a
  * long-lived stream of small jobs (sibling of
  * [[org.apache.spark.GraftSparkBridge]]; lives in the `scheduler` package
  * because `DAGScheduler.shuffleIdToMapStage` is `private[scheduler]`).
  *
  * Motivation (measured): the 100-batch endurance artifact showed per-batch
  * wall growing ~20× across the stream while iterations, kernel time, and
  * L1 error stayed flat — i.e. the growth was per-superstep DRIVER overhead,
  * not engine work. Each dynamic superstep registers one shuffle; a shuffle
  * is unregistered only when the ContextCleaner collects its
  * ShuffleDependency, and `DAGScheduler.shuffleIdToMapStage` holds the
  * dependency (and through it the whole superstep RDD chain) STRONGLY until
  * then, so reclamation is at the mercy of GC timing on a 48 GB pre-touched
  * heap. These counters make that accumulation observable per batch instead
  * of inferred from wall-clock drift. */
object GraftSchedulerDiag {

  /** Sizes of the registries touched by every job/stage submission, plus a
    * breakdown of on-disk block files (shuffle data+index / broadcast /
    * other). All O(registry size) reads, no mutation. Diagnostic-only, and
    * the DAGScheduler maps are mutated concurrently by the event loop —
    * each read is Try-guarded (−1 on a racing resize) so a rare race can
    * never crash the measuring run (ADVICE r5). */
  def registrySizes(sc: SparkContext): Map[String, Long] = {
    import scala.util.Try
    def safe(f: => Long): Long = Try(f).getOrElse(-1L)
    val dag = sc.dagScheduler
    val mot = sc.env.mapOutputTracker.asInstanceOf[MapOutputTrackerMaster]
    def diskCounts: (Long, Long, Long) = {
      var shuffleFiles = 0L
      var broadcastBlocks = 0L
      var otherBlocks = 0L
      sc.env.blockManager.diskBlockManager.getAllBlocks().foreach { b: BlockId =>
        if (b.isShuffle) shuffleFiles += 1
        else if (b.isBroadcast) broadcastBlocks += 1
        else otherBlocks += 1
      }
      (shuffleFiles, broadcastBlocks, otherBlocks)
    }
    val (shuffleFiles, broadcastBlocks, otherBlocks) =
      Try(diskCounts).getOrElse((-1L, -1L, -1L))
    def memCounts: (Long, Long) = {
      var memBroadcast = 0L
      var memOther = 0L
      sc.env.blockManager.getMatchingBlockIds(_ => true).foreach { b =>
        if (b.isBroadcast) memBroadcast += 1 else memOther += 1
      }
      (memBroadcast, memOther)
    }
    val (memBroadcast, memOther) = Try(memCounts).getOrElse((-1L, -1L))
    Map(
      "shuffle_map_stages" -> safe(dag.shuffleIdToMapStage.size.toLong),
      "stage_id_to_stage" -> safe(dag.stageIdToStage.size.toLong),
      "shuffle_statuses" -> safe(mot.shuffleStatuses.size.toLong),
      "persistent_rdds" -> safe(sc.persistentRdds.size.toLong),
      "disk_shuffle_blocks" -> shuffleFiles,
      "disk_broadcast_blocks" -> broadcastBlocks,
      "disk_other_blocks" -> otherBlocks,
      "mgr_broadcast_blocks" -> memBroadcast,
      "mgr_other_blocks" -> memOther)
  }
}
