package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Ckpt._

/** Connected components via Hash-Min label propagation to fixpoint.
  *
  * Required by the north rule (BASELINE.json) alongside PageRank; semantics
  * per SURVEY.md §2.9: on the SYMMETRIZED graph, every vertex's label is the
  * minimum vertex id in its component — "must match exactly".
  *
  * Each round a vertex takes min(own label, neighbors' labels); rounds ≤
  * graph diameter. Per round: one O(|E|) join that reuses the cached,
  * src-partitioned symmetric edge table (only the O(|V|) label vector is
  * exchanged) + one O(|V|) aggregation — the same scale shape as the
  * PageRank superstep. Convergence is detected with a changed-count
  * aggregate, not a collect.
  */
object ConnectedComponents {

  /** @param symEdges symmetrized simple edges (src,dst) — [[graft.graph.EdgeOps.symmetrize]]
    * @return (id, component) with component = min id in the component */
  def run(spark: SparkSession, symEdges: DataFrame,
      checkpointEvery: Int = 10): DataFrame = {
    val parts = spark.sparkContext.defaultParallelism
    val edges = symEdges.select("src", "dst")
      .repartition(parts, col("src")).ckpt()
    val verts = edges.select(col("src").as("id")).distinct()
      .ckpt()

    // localCheckpoint every round: the round plan references `labels`
    // twice, so without eager lineage truncation the logical plan doubles
    // per round (same pattern as the PageRank superstep).
    var labels = verts.select(col("id"), col("id").as("component"))
      .repartition(parts, col("id")).ckpt()

    var changed = 1L
    while (changed > 0) {
      // min over {neighbors' labels} per vertex, then compare with own.
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("component")).as("nbrMin"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbrMin"), col("component")))
            .as("component"))
        .repartition(parts, col("id")).ckpt()
      changed = next.join(labels.withColumnRenamed("component", "prev"), Seq("id"))
        .where(col("component") =!= col("prev")).count()
      labels = next
    }
    labels
  }
}
