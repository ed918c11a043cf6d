package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hyperlink + visible-text extraction from raw page HTML.
  *
  * Spark-first: both extractors are pure `Column` expressions built from
  * codegen'd built-ins (`regexp_extract_all` / `transform` / `filter` /
  * `array_join`) — no Scala UDF, so they stay inside whole-stage codegen and
  * push down through Catalyst (SURVEY.md §2.9 "Link extraction").
  *
  * Determinism contract (north rule): extraction is a pure function of the
  * html bytes; `extractText` must reproduce the pages table's `text` column
  * byte-identically (verified per-row in LinkExtractorSpec).
  */
object LinkExtractor {

  /** html binary column → UTF-8 string. */
  def htmlStr(html: Column): Column = decode(html, "UTF-8")

  /** All href values of `<a href="...">` anchors, in document order
    * (duplicates kept — graph dedupe is a separate operator, mirroring the
    * reference's lazy adjacency merge /root/reference/inc/_bitset.hxx:245-262). */
  def hrefs(html: Column): Column =
    regexp_extract_all(htmlStr(html), lit("<a\\s+href=\"([^\"]*)\""), lit(1))

  /** Visible text: every text node (maximal run between a '>' and a '<'),
    * trimmed, empties dropped, joined with "\n" — no trailing newline. */
  def extractText(html: Column): Column =
    array_join(
      filter(
        transform(regexp_extract_all(htmlStr(html), lit(">([^<>]*)<"), lit(1)),
          s => trim(s)),
        s => s =!= ""),
      "\n")

  /** pages(url, html, …) → link pairs (src_url, dst_url, pos).
    * `pos` is the in-document anchor index — combined with the page order it
    * defines the deterministic global edge sequence used to replay the
    * reference's temporal-prefix protocol (/root/reference/inc/snap.hxx:41-58). */
  def links(pages: DataFrame): DataFrame =
    pages
      .select(col("url").as("src_url"),
        posexplode(hrefs(col("html"))).as(Seq("pos", "dst_url")))
}
