package graft.util

import org.apache.spark.sql.{DataFrame, GraftBridge}

/** Eager local checkpoint for iterative loops.
  *
  * `df.ckpt()` = `localCheckpoint(eager = true)` + origin-statistics strip
  * (see GraftBridge.localCheckpointNoStats): truncates lineage so iterative
  * plans stay bounded, AND resets the inherited size estimate so Catalyst's
  * stats (BigInt sizeInBytes) can't compound multiplicatively across
  * supersteps — without the strip, a rank vector joined 2-3× per superstep
  * reaches million-bit size estimates in ~20 iterations and the optimizer
  * grinds in BigInteger.multiply.
  *
  * On a multi-executor cluster, pair with the durable Checkpointer (rank
  * manifests) — localCheckpoint alone does not survive executor loss.
  */
object Ckpt {
  implicit final class CkptOps(private val df: DataFrame) extends AnyVal {
    def ckpt(): DataFrame = GraftBridge.localCheckpointNoStats(df)
    /** Serialized storage — for large scan-only state (edge tables): one
      * byte buffer per block instead of per-row objects, flat GC cost. */
    def ckptSer(): DataFrame =
      GraftBridge.localCheckpointNoStats(df, serialized = true)
  }
}
