package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MatrixMarket coordinate reader — the reference's static-graph ingestion
  * format (/root/reference/inc/mtx.hxx:39-193).
  *
  * Semantics mirrored exactly:
  *  - header: comment lines start with `%`; the `%%MatrixMarket matrix
  *    coordinate <field> <symmetry>` banner declares symmetry (`symmetric`
  *    or `skew-symmetric` ⇒ echo, mtx.hxx:50); the first non-comment line
  *    is `rows cols size`;
  *  - body: `u v [w]` (1-based ids); the optional weight is parsed and
  *    discarded for the unweighted graph (mtx.hxx:128-132);
  *  - symmetric ⇒ every body edge also emits its reverse (mtx.hxx:135-136);
  *  - the eager vertex universe is `1..max(rows, cols)` (mtx.hxx:226's
  *    addVertices span), exposed as [[MtxGraph.vertexRange]].
  *
  * Scale shape: the header is read driver-side (first file split only);
  * the body parses distributed across text splits (the reference's OMP
  * variant parses 131072-line chunks in parallel, mtx.hxx:158-187). Unlike
  * [[SnapReader]] there is no temporal order to preserve, so no
  * zipWithIndex pass is needed.
  */
object MtxReader {

  /** Parsed MTX graph: edge list (possibly with duplicates — dedupe is
    * [[graft.graph.EdgeOps.simple]]'s job, like the reference's update()),
    * plus the declared header geometry. */
  final case class MtxGraph(edges: DataFrame, symmetric: Boolean,
      rows: Long, cols: Long, size: Long) {
    def n: Long = math.max(rows, cols)
    /** Eager vertex range 1..max(rows,cols) (reference adds all of them
      * before any edge). */
    def vertexRange(spark: SparkSession): DataFrame =
      spark.range(1L, n + 1L).select(col("id"))
  }

  def read(spark: SparkSession, path: String): MtxGraph = {
    import spark.implicits._
    val sc = spark.sparkContext
    val all = sc.textFile(path)
    // Header (driver-side): scan to the FIRST non-comment line, however long
    // the leading comment block is (SuiteSparse exports can carry hundreds
    // of '%' lines — a fixed 64-line probe threw on them). Doubling take()
    // keeps the common case to one tiny job.
    var probe = 64
    var head = all.take(probe)
    while (!head.exists(l => !l.startsWith("%") && l.trim.nonEmpty) &&
        head.length == probe) {
      probe *= 8
      head = all.take(probe)
    }
    val banner = head.find(_.startsWith("%%")).getOrElse("")
    val bannerF = banner.trim.split("\\s+")
    val symmetric = bannerF.length >= 5 &&
      (bannerF(4) == "symmetric" || bannerF(4) == "skew-symmetric")
    val sizeLine = head.find(l => !l.startsWith("%") && l.trim.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        s"$path: no MTX size line (rows cols size)"))
    val sf = sizeLine.trim.split("\\s+")
    val (rows, cols, size) = (sf(0).toLong, sf(1).toLong, sf(2).toLong)
    // Body (distributed): non-comment lines minus the one size line — the
    // size line is globally the FIRST non-comment line, so drop global
    // index 0 (zipWithIndex = one tiny extra job for the per-split counts;
    // a split-local drop would break when a small file's first split holds
    // only header lines).
    val sym = symmetric
    val body = all
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("%"))
      .zipWithIndex().filter(_._2 > 0)
      .flatMap { case (l, _) =>
        val f = l.split("\\s+")
        val u = f(0).toLong
        val v = f(1).toLong // optional weight f(2) parsed-and-discarded
        if (sym) Iterator((u, v), (v, u)) else Iterator.single((u, v))
      }
    MtxGraph(body.toDF("src", "dst"), symmetric, rows, cols, size)
  }
}
