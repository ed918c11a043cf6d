package graft.ingest

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Page

/** Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1-2).
  *
  * Schema is exactly BASELINE.json's input_hint:
  *   (url string, warc_ts timestamp, html binary, text string, lang string).
  *
  * Link structure of page k is a seeded splitmix64 stream on (seed, k):
  *  - out-degree ~ Zipf-tailed (Pareto inverse-CDF, α=1.2), capped at 64
  *    (heavy-tailed hubs exercise skew handling, SURVEY.md §7.4 R4);
  *  - ~20% of links retarget to the top 0.1% of ids (hub in-degree skew);
  *  - ~1% of pages emit no links (dangling candidates — the engine adds
  *    self-loops exactly like the reference driver,
  *    /root/reference/main.cxx:127-128, /root/reference/inc/selfLoop.hxx:60-66);
  *  - ~5% duplicate hrefs on a page (exercises edge dedupe, the analog of the
  *    reference's LazyBitset merge, /root/reference/inc/_bitset.hxx:245-262).
  *
  * The `text` column is the byte-exact extraction target: title, each anchor
  * text, and body text joined by "\n" with no trailing newline. The engine's
  * generic [[LinkExtractor.extractText]] must reproduce it byte-identically
  * (north-rule per-row invariant).
  */
object WebGraphFixture {
  val Seed = 42L
  val MaxOutDegree = 64
  val NumSites = 10

  def url(k: Long): String = s"https://site${k % NumSites}.example/p/$k"

  /** Deterministic out-link target page-ids of page k (with duplicates kept —
    * dedupe is the engine's job). */
  def linkTargets(k: Long, numPages: Long): Seq[Long] = {
    if (k % 97 == 0) return Seq.empty // ~1% dangling candidates
    val rng = new SplitMix64(SplitMix64.mix(Seed, k))
    val u = math.max(rng.nextDouble(), 1e-12)
    // Pareto inverse-CDF with α=1.2 ⇒ Zipf-like tail on out-degrees.
    val d = math.min(1 + math.pow(u, -1.0 / 1.2).toLong, MaxOutDegree.toLong).toInt
    val hubs = math.max(1L, numPages / 1000L)
    val out = new Array[Long](d)
    var i = 0
    while (i < d) {
      val toHub = rng.nextDouble() < 0.20
      val t =
        if (toHub) Math.floorMod(rng.nextLong(), hubs)
        else Math.floorMod(rng.nextLong(), numPages)
      out(i) =
        if (i > 0 && rng.nextDouble() < 0.05) out(i - 1) // duplicate href
        else t
      i += 1
    }
    out.toSeq
  }

  /** Fixed epoch 2025-04-10T00:00:00Z + k seconds (UTC). */
  def warcTs(k: Long): Timestamp = new Timestamp(1744243200000L + k * 1000L)

  def anchorText(t: Long): String = s"t$t"
  def title(k: Long): String = s"p$k"
  def body(k: Long): String = s"body $k"

  def html(k: Long, numPages: Long): String = {
    val sb = new StringBuilder
    sb.append("<html><head><title>").append(title(k)).append("</title></head><body>")
    linkTargets(k, numPages).foreach { t =>
      sb.append("<a href=\"").append(url(t)).append("\">").append(anchorText(t)).append("</a>")
    }
    sb.append("<p>").append(body(k)).append("</p></body></html>")
    sb.toString
  }

  /** Ground-truth visible text (independent construction — the extractor is
    * a generic tag-stripper; both must agree byte-for-byte). */
  def text(k: Long, numPages: Long): String =
    (title(k) +: linkTargets(k, numPages).map(anchorText) :+ body(k)).mkString("\n")

  def lang(k: Long): String = if (k % 20 == 0) "de" else "en"

  def page(k: Long, numPages: Long): Page =
    Page(url(k), warcTs(k), html(k, numPages).getBytes(StandardCharsets.UTF_8),
      text(k, numPages), lang(k))

  /** Distributed generation: spark.range(P) → map — no driver-side loop, no
    * wall-clock; scales linearly with partitions. */
  def pages(spark: SparkSession, numPages: Long): Dataset[Page] = {
    import spark.implicits._
    spark.range(0L, numPages, 1L, spark.sparkContext.defaultParallelism)
      .map(k => page(k, numPages))
  }

  /** Ground-truth edge list in page-id space (src,dst, duplicates kept),
    * used by tests to validate extraction end-to-end. */
  def rawEdges(numPages: Long): Seq[(Long, Long)] =
    (0L until numPages).flatMap(k => linkTargets(k, numPages).map(t => (k, t)))

  /** Fast path for benchmarks: the same deterministic graph WITHOUT the
    * html round-trip (page ids are the vertex ids), with the temporal `seq`
    * = (k * MaxOutDegree + position) order key — ordered like the staged
    * table, dense ranking skipped (slicing uses quantiles of the count). */
  def edgesOnly(spark: SparkSession, numPages: Long): Dataset[graft.model.StagedEdge] = {
    import spark.implicits._
    spark.range(0L, numPages, 1L, spark.sparkContext.defaultParallelism)
      .flatMap { k =>
        linkTargets(k, numPages).zipWithIndex.map { case (t, i) =>
          graft.model.StagedEdge(k, t, k * MaxOutDegree + i)
        }
      }
  }
}
