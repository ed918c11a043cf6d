package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Triangle counting on the symmetrized simple graph without self-loops
  * (SURVEY.md §2.9). Global count and per-vertex counts.
  *
  * Standard degree-ordered orientation (the skew-proof formulation used by
  * every published distributed TC): order vertices by (degree, id); keep
  * each undirected edge once, directed low→high. Every triangle then has
  * exactly one wedge at its lowest-ordered vertex, and each oriented vertex
  * has out-degree O(sqrt(|E|)) max — the wedge join cannot blow up on hubs,
  * which is exactly the "degree-aware edge blocking" the north rule asks for.
  *
  * Plan: oriented ⨝ oriented (wedge enumeration, join on the middle vertex)
  * → semi-join against oriented edges (closing edge existence).
  */
object TriangleCount {

  /** @param symEdges symmetrized simple edges — both (u,v) and (v,u) present,
    *                 self-loops allowed (they are dropped here). */
  def oriented(symEdges: DataFrame): DataFrame = {
    val e = symEdges.select("src", "dst").where(col("src") =!= col("dst"))
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    // rank vertices by (deg, id); orient edge toward the higher rank
    val ranked = e
      .join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sdeg"), Seq("src"))
      .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddeg"), Seq("dst"))
    ranked.where(col("sdeg") < col("ddeg") ||
        (col("sdeg") === col("ddeg") && col("src") < col("dst")))
      .select("src", "dst")
  }

  /** Global triangle count. */
  def global(spark: SparkSession, symEdges: DataFrame): Long = {
    val o = oriented(symEdges).persist(StorageLevel.MEMORY_AND_DISK)
    // wedges a->b, b->c; close with a->c
    val ab = o.select(col("src").as("a"), col("dst").as("b"))
    val bc = o.select(col("src").as("b"), col("dst").as("c"))
    val n = ab.join(bc, Seq("b"))
      .join(o.select(col("src").as("a"), col("dst").as("c")), Seq("a", "c"),
        "left_semi")
      .count()
    o.unpersist(false)
    n
  }

  /** Per-vertex triangle counts (vertices in ≥1 triangle; global = Σ/3). */
  def perVertex(spark: SparkSession, symEdges: DataFrame): DataFrame = {
    val o = oriented(symEdges).persist(StorageLevel.MEMORY_AND_DISK)
    val ab = o.select(col("src").as("a"), col("dst").as("b"))
    val bc = o.select(col("src").as("b"), col("dst").as("c"))
    val tris = ab.join(bc, Seq("b"))
      .join(o.select(col("src").as("a"), col("dst").as("c")), Seq("a", "c"),
        "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = tris.select(col("a").as("id"))
      .union(tris.select(col("b").as("id")))
      .union(tris.select(col("c").as("id")))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    counts
  }
}
