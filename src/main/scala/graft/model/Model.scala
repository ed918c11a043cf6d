package graft.model

/** Core data model for the graft link-graph engine.
  *
  * Mirrors the abstractions of the reference (puzzlef/pagerank-openmp-dynamic)
  * re-expressed as Spark Dataset row types — see SURVEY.md §1.4:
  *  - `DiGraph<K,V,E>`  (reference /root/reference/inc/Graph.hxx:17-372) → `Dataset[Edge]`
  *  - rank vector `vector<V>` (inc/pagerank.hxx:343)                    → `Dataset[Rank]`
  *  - `PagerankOptions` defaults (inc/pagerank.hxx:24-55, main.cxx:62-64).
  */

/** One directed edge. The reference keys vertices as uint32; we use Long ids
  * assigned by a deterministic dense dictionary (UrlDictionary). */
final case class Edge(src: Long, dst: Long)

/** A staged edge with a deterministic global sequence number — replays the
  * reference's temporal-prefix protocol (/root/reference/inc/snap.hxx:41-58:
  * base graph = first 90% of lines, batches = next fraction·|E| lines). */
final case class StagedEdge(src: Long, dst: Long, seq: Long)

/** Per-vertex PageRank value (reference: vector<double> over span). */
final case class Rank(id: Long, rank: Double)

/** Per-vertex out-degree (the divisor in the PR kernel; the reference
  * pre-annotates it on the transposed graph, inc/transpose.hxx:79-100). */
final case class Degree(id: Long, outDeg: Long)

/** A Common-Crawl-style web page row (BASELINE.json input_hint). */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** PageRank options — defaults exactly as the reference driver:
  *  damping 0.85, maxIterations 500 (/root/reference/inc/pagerank.hxx:52),
  *  tolerance 1e-10 (L∞ stop, main.cxx:62, inc/pagerank.hxx:364),
  *  frontierTolerance / pruneTolerance 1e-6 (main.cxx:63-64).
  *
  * `useL1Residual`: the north rule's text says "1e-10 L1 residual"; the
  * reference's in-loop check is L∞ (L1 is only the reported error metric) —
  * both are available, defaulting to the reference's L∞ (SURVEY.md §2.5).
  */
final case class PagerankOptions(
    damping: Double = 0.85,
    tolerance: Double = 1e-10,
    frontierTolerance: Double = 1e-6,
    pruneTolerance: Double = 1e-6,
    maxIterations: Int = 500,
    useL1Residual: Boolean = false,
    checkpointEvery: Int = 10,
    checkpointDir: Option[String] = None,
    /** In-degree above which a dst is treated as a hub and its contribution
      * aggregation is salted two-phase (None = auto: max(1M, |E|/parts/4)).
      * Set low only in tests to force the salted plan at toy scale. */
    hubThreshold: Option[Long] = None,
    /** Route PageRank through the partition-local CSR engine instead of the
      * DataFrame superstep — identical results. Static sweeps run one
      * packed-primitive shuffle + one job per superstep
      * ([[graft.pagerank.CsrPageRank]]); the dynamic variants (DF / DF-P /
      * DT) run O(frontier) push supersteps ([[graft.pagerank.CsrDynamic]]),
      * and the streaming front end carries the frozen graph across
      * micro-batches. */
    useCsr: Boolean = false)

/** Result of one PageRank run — mirrors the reference's PagerankResult
  * (/root/reference/inc/pagerank.hxx:64-113): converged ranks, iteration
  * count, and phase timings (init / mark / compute, in ms).
  *
  * `stepTimesMs` is the per-superstep wall-time trace (empty where an
  * engine doesn't record it). Throughput protocols derive edges/sec from
  * per-superstep statistics rather than total time: on shared/virtualized
  * hosts a single multi-second whole-box stall (hypervisor steal, GC
  * freeze) inside a 6-superstep window otherwise poisons the entire
  * measurement, and the steady-state superstep rate — not the stall — is
  * what transfers to a cluster. Bench ships BOTH the MIN-superstep rate
  * (tightest uninterfered-rate bound; interference is strictly additive)
  * and the MEDIAN-superstep rate (robust to the min's asymmetric stall
  * exposure across core counts), and the headline scaling efficiency is
  * the more conservative of the two. */
final case class PagerankStats(
    iterations: Int,
    initTimeMs: Double,
    markTimeMs: Double,
    computeTimeMs: Double,
    finalResidual: Double,
    stepTimesMs: Seq[Double] = Nil)
