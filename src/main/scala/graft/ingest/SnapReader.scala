package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SNAP temporal edge-list reader — the reference's ingestion format
  * (/root/reference/inc/snap.hxx:41-109): whitespace-separated text lines
  * `u v [t]` consumed in PREFIX order (line order IS the clock; the optional
  * trailing timestamp/weight column is parsed and discarded, exactly like
  * the reference's readTemporalDo). The result is the engine's staged-edge
  * shape `(src, dst, seq)` with `seq` = 0-based body-line index, so the
  * whole temporal protocol (base graph = first 90% of lines, batches =
  * consecutive `batchFraction·size` slices, /root/reference/main.cxx:74-106)
  * runs unchanged over a real SNAP corpus file:
  *
  *   base   = snap.where($"seq" < 0.9 * size)
  *   batchB = snap.where($"seq" >= cut(b) && $"seq" < cut(b + 1))
  *
  * Scale shape: `textFile` splits the file across partitions (the reference
  * parses 131072-line chunks in parallel, inc/snap.hxx:79-103);
  * `zipWithIndex` assigns global line offsets deterministically from the
  * per-split counts (one tiny extra job), so `seq` is stable across runs and
  * partitionings. Comment lines (`#`/`%`, SNAP headers) and blank lines are
  * skipped without consuming a seq slot.
  */
object SnapReader {

  /** Read a SNAP temporal file (or directory of them) as (src, dst, seq). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.textFile(path)
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("%"))
      .zipWithIndex()
      .map { case (l, i) =>
        val f = l.split("\\s+")
        (f(0).toLong, f(1).toLong, i)
      }
      .toDF("src", "dst", "seq")
  }

  /** Eager vertex range `1..rows` — the reference's temporal loader adds
    * every vertex id up front, BEFORE any batch (addVerticesIfU(1, rows+1),
    * /root/reference/inc/snap.hxx:133), which pins N (and the teleport term)
    * across the whole batch sequence. */
  def vertexRange(spark: SparkSession, rows: Long): DataFrame =
    spark.range(1L, rows + 1L).select(col("id"))
}
