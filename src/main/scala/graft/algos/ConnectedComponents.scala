package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Ckpt._

/** Connected components via Hash-Min with pointer doubling (shortcutting).
  *
  * Required by the north rule (BASELINE.json) alongside PageRank; semantics
  * per SURVEY.md §2.9: on the SYMMETRIZED graph, every vertex's label is the
  * minimum vertex id in its component — "must match exactly".
  *
  * Each round does two label updates:
  *   (1) hash-min:  comp(v) ← min(comp(v), min over neighbors u of comp(u))
  *       — one O(|E|) join that reuses the cached src-partitioned edge table
  *       (only the O(|V|) label vector is exchanged) + an O(|V|) aggregation;
  *   (2) shortcut (pointer doubling): comp(v) ← comp(comp(v))
  *       — an O(|V|) self-lookup join.
  * Step (2) roughly doubles the already-contracted distance each round, so
  * the round count is O(log d) in the graph diameter d — plain hash-min is
  * O(d), a scale-killer on high-diameter graphs (10⁴-long crawl-frontier
  * chains ⇒ 10⁴ rounds; with shortcutting ≈ log₂ rounds — see
  * AlgosSpec's chain fixture). Convergence is detected with a changed-count
  * aggregate, not a collect.
  *
  * Correctness: comp values are always ids of vertices in the same component
  * and ≥ the component minimum m; comp(m) = m forever (hash-min never
  * lowers it below m and starts at m). At the combined fixpoint comp is
  * constant across every edge, hence constant per component, hence = m.
  *
  * Scale note: late rounds make the shortcut join's key (the component id)
  * skewed — a giant component funnels its |C| rows through one join key.
  * CC therefore runs under the default session where AQE skew-join splitting
  * is ON (GraftSession), the Spark analog of the reference's dynamic
  * scheduling (/root/reference/inc/pagerank.hxx:202).
  */
object ConnectedComponents {

  /** @param symEdges symmetrized simple edges (src,dst) — [[graft.graph.EdgeOps.symmetrize]]
    * @return (id, component) with component = min id in the component */
  def run(spark: SparkSession, symEdges: DataFrame): DataFrame =
    runWithRounds(spark, symEdges)._1

  /** [[run]] plus the number of rounds to fixpoint (for the O(log d) bound
    * asserted in AlgosSpec's chain fixture). */
  def runWithRounds(spark: SparkSession, symEdges: DataFrame): (DataFrame, Int) = {
    val parts = spark.sparkContext.defaultParallelism
    val edges = symEdges.select("src", "dst")
      .repartition(parts, col("src")).ckpt()
    val verts = edges.select(col("src").as("id")).distinct()
      .ckpt()

    // localCheckpoint every round: the round plan references `labels`
    // multiple times, so without eager lineage truncation the logical plan
    // doubles per round (same pattern as the PageRank superstep).
    var labels = verts.select(col("id"), col("id").as("component"))
      .repartition(parts, col("id")).ckpt()

    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      // (1) hash-min over neighbors.
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("component")).as("nbrMin"))
      // Materialized: the shortcut step reads it twice (as the vector and as
      // the parent lookup) — without ckpt the O(|E|) hash-min join would run
      // twice per round. `prev` (the round's starting label) rides along so
      // the convergence check below is a narrow filter-count over the
      // checkpointed round output instead of a join job per round.
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbrMin"), col("component")))
            .as("component"),
          col("component").as("prev"))
        .repartition(parts, col("id")).ckpt()
      // (2) shortcut: comp ← comp(comp). Labels are always existing vertex
      // ids, so the lookup always hits; left+coalesce keeps it total anyway.
      val next = stepped
        .join(stepped.select(col("id").as("component"),
          col("component").as("comp2")), Seq("component"), "left")
        .select(col("id"),
          coalesce(col("comp2"), col("component")).as("component"),
          col("prev"))
        .repartition(parts, col("id")).ckpt()
      changed = next.where(col("component") =!= col("prev")).count()
      labels = next.select("id", "component")
      rounds += 1
    }
    (labels, rounds)
  }
}
