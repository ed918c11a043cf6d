package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.EdgeOps
import graft.ingest.{DenseId, LinkExtractor, WebGraphFixture}

class LinkExtractorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val P = 500L
  lazy val pages = WebGraphFixture.pages(spark, P).toDF().cache()

  test("extracted text is byte-identical to the pages.text column (north-rule invariant)") {
    val mism = pages
      .select(col("url"), col("text"),
        LinkExtractor.extractText(col("html")).as("extracted"))
      .where(col("text") =!= col("extracted") ||
        length(col("text")) =!= length(col("extracted")))
      .count()
    assert(mism === 0L)
    // byte-level check on a sample (string equality above is already
    // code-point exact; verify UTF-8 bytes too)
    val rows = pages.select(col("text"),
      LinkExtractor.extractText(col("html")).as("e")).limit(50).collect()
    rows.foreach { r =>
      assert(java.util.Arrays.equals(
        r.getString(0).getBytes("UTF-8"), r.getString(1).getBytes("UTF-8")))
    }
  }

  test("extraction is deterministic across runs") {
    val a = pages.select(LinkExtractor.extractText(col("html"))).collect().map(_.getString(0))
    val b = pages.select(LinkExtractor.extractText(col("html"))).collect().map(_.getString(0))
    assert(a.toSeq === b.toSeq)
  }

  test("href extraction reproduces the ground-truth link structure") {
    val links = LinkExtractor.links(pages)
      .select(col("src_url"), col("dst_url")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    val expect = WebGraphFixture.rawEdges(P)
      .map { case (s, d) => (WebGraphFixture.url(s), WebGraphFixture.url(d)) }
      .sorted
    assert(links === expect)
  }

  test("url dictionary: dense ids [0,n), deterministic bijection") {
    val dict = DenseId.urlDictionary(pages.select("url"))
    val ids = dict.select("id").as[Long].collect().sorted
    assert(ids === (0L until P).toArray)
    val dict2 = DenseId.urlDictionary(pages.select("url"))
    assert(dict.collect().toSet === dict2.collect().toSet)
  }

  test("staged edges: seq is a dense deterministic total order; batch slicing exact") {
    val (dict, staged) = EdgeOps.stage(pages)
    val m = staged.count()
    val seqs = staged.select("seq").as[Long].collect().sorted
    assert(seqs === (0L until m).toArray)
    // ground truth edge multiset via the dictionary
    val urlToId = dict.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = WebGraphFixture.rawEdges(P)
      .map { case (s, d) => (urlToId(WebGraphFixture.url(s)), urlToId(WebGraphFixture.url(d))) }
      .sorted
    val got = staged.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === expect)
  }

  test("pages fixture honours the declared schema and langs") {
    assert(pages.columns.toSeq === Seq("url", "warc_ts", "html", "text", "lang"))
    val langs = pages.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs("de") === P / 20)
    assert(langs("en") === P - P / 20)
  }
}
