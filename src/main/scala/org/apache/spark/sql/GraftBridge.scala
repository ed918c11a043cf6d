package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge into Spark's `private[sql]` internals. Standard pattern for
  * libraries that ship native Catalyst expressions against Spark 4's
  * Column-node API. Nothing else in this package.
  *
  * `localCheckpointNoStats` exists because `Dataset.checkpoint` propagates
  * the ORIGIN plan's estimated `Statistics` into the resulting `LogicalRDD`
  * (ExistingRDD.scala, `originStats`). In an iterative algorithm the
  * size-in-bytes estimate then compounds multiplicatively across supersteps
  * (each superstep joins the rank vector 2-3×, so the BigInt exponent
  * triples per iteration) until Catalyst's stats visitor spends minutes
  * multiplying million-bit integers. Dropping the inherited stats resets
  * the leaf to `defaultSizeInBytes`, which is what a fresh scan would report.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager local checkpoint with origin statistics stripped.
    * @param serialized store partitions serialized (MEMORY_AND_DISK_SER) —
    *   one byte array per block instead of one object per row; use for
    *   large scan-only state (the edge table) to keep GC scan cost flat. */
  def localCheckpointNoStats(df: DataFrame, serialized: Boolean = false): DataFrame = {
    val level =
      if (serialized) org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val ck = df.localCheckpoint(true, level).asInstanceOf[classic.Dataset[Row]]
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val stripped = lr.copy()(
          session = ck.sparkSession.asInstanceOf[classic.SparkSession],
          originStats = None,
          originConstraints = None)
        classic.Dataset.ofRows(ck.sparkSession.asInstanceOf[classic.SparkSession],
          stripped)
      case _ => ck
    }
  }

  /** Release the persisted blocks behind a locally-checkpointed DataFrame.
    * `df.unpersist` consults only the CacheManager, which does NOT track
    * checkpoint blocks — without this, a loop that re-checkpoints carried
    * state every batch (Bench's 100-batch endurance stream) strands one
    * ~|E|-sized block generation per batch until the ContextCleaner's
    * periodic GC (default every 30 min) happens to run, and a 48 GB heap
    * OOMs first.
    *
    * PRECONDITION (caller contract — this is UNRECOVERABLE): the freed
    * DataFrame's lineage was already truncated by its local checkpoint, so
    * once the blocks are dropped the RDD can NEVER be recomputed. Call this
    * only when (a) nothing will read `df` again, and (b) every SUCCESSOR
    * derived from `df` has been EAGERLY materialized first (its own
    * `.ckpt()`/`localCheckpoint(true)` action completed) — a lazy successor
    * whose first action runs after this call will fail with missing blocks.
    * Bench's batch loops satisfy this by checkpointing `nextX` eagerly
    * before freeing `prevX`. */
  def freeCkpt(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
