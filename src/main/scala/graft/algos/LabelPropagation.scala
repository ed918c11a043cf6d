package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Ckpt._

/** Synchronous label propagation (community detection).
  *
  * Semantics (SURVEY.md §2.9, fixed so outputs are exactly checkable):
  * init label = vertex id; each synchronous round every vertex adopts the
  * MODE (most frequent) label among its neighbors on the symmetrized graph,
  * ties broken by the SMALLEST label — fully deterministic. Runs a fixed
  * number of rounds (sync LP on bipartite-ish structures can oscillate, so
  * a fixed round count is the deterministic, published-definition choice).
  *
  * Scale shape per round: one O(|E|) join against the cached src-partitioned
  * edge table, a two-key count aggregation (map-side combined; hub skew is
  * absorbed because each (dst,label) key is pre-reduced per partition), and
  * a per-vertex top-1 window over the (dst,label) counts — window partitions
  * are per-vertex, so no single-partition bottleneck.
  */
object LabelPropagation {

  def run(spark: SparkSession, symEdges: DataFrame,
      rounds: Int = 10): DataFrame = {
    val parts = spark.sparkContext.defaultParallelism
    val edges = symEdges.select("src", "dst")
      .repartition(parts, col("src")).ckpt()
    val verts = edges.select(col("src").as("id")).distinct()
      .ckpt()

    // localCheckpoint every round — eager lineage truncation (the round
    // plan references `labels` twice; same pattern as PageRank).
    var labels = verts.select(col("id"), col("id").as("label"))
      .repartition(parts, col("id")).ckpt()

    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val counts = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("id").orderBy(desc("n"), asc("label"))
      val mode = counts.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).select(col("id"), col("label"))
      // isolated vertices (none after self-loop-free symmetrize of a
      // connected fixture, but keep total): retain previous label.
      val next = labels.withColumnRenamed("label", "prevLabel")
        .join(mode, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("prevLabel")).as("label"),
          col("prevLabel"))
        .ckpt()
      val changed = next.where(col("label") =!= col("prevLabel")).count()
      labels = next.select("id", "label").repartition(parts, col("id"))
        .ckpt()
      r += 1
      converged = changed == 0
    }
    labels
  }
}
