package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.EdgeOps
import graft.ingest.{PagesTable, WebGraphFixture}

/** Pages catalog table: bucket-partitioned parquet with the Iceberg format
  * seam (SURVEY.md §7.1 step 2) — write, layout, byte-identical read-back,
  * ingest-path equivalence, bucket-pruned point lookup. */
class PagesTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 120L
  private lazy val tableDir = {
    val dir = Files.createTempDirectory("graft-pages-table").toString
    PagesTable.write(WebGraphFixture.pages(spark, P).toDF(), dir, buckets = 8)
    dir
  }

  test("write produces a bucket-partitioned layout; read returns the input_hint schema") {
    val parts = new java.io.File(tableDir).listFiles()
      .filter(_.getName.startsWith(s"${PagesTable.BucketCol}="))
    assert(parts.nonEmpty && parts.length <= 8)
    val back = PagesTable.read(spark, tableDir)
    assert(back.columns.toSeq === Seq("url", "warc_ts", "html", "text", "lang"))
    assert(back.count() === P)
  }

  test("read-back pages are byte-identical (text and html) to the source rows") {
    val back = PagesTable.read(spark, tableDir)
      .select("url", "text", "html").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getAs[Array[Byte]](2)))
      .toMap
    val src = WebGraphFixture.pages(spark, P).toDF()
      .select("url", "text", "html").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getAs[Array[Byte]](2)))
      .toMap
    assert(back.keySet === src.keySet)
    src.foreach { case (u, (t, h)) =>
      assert(back(u)._1 === t, s"text mismatch for $u")
      assert(java.util.Arrays.equals(back(u)._2, h), s"html mismatch for $u")
    }
  }

  test("ingest path over the table equals ingest over the in-memory fixture") {
    val (dictT, stagedT) = EdgeOps.stage(PagesTable.read(spark, tableDir))
    val (dictM, stagedM) = EdgeOps.stage(WebGraphFixture.pages(spark, P).toDF())
    assert(dictT.count() === dictM.count())
    val a = stagedT.select("src", "dst", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = stagedM.select("src", "dst", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("point lookup prunes to the url's bucket partition") {
    val u = WebGraphFixture.url(17L)
    val row = PagesTable.lookup(spark, tableDir, u, buckets = 8)
    assert(row.count() === 1)
    // the plan carries the partition filter on the bucket column
    val plan = row.queryExecution.executedPlan.toString
    assert(plan.contains(PagesTable.BucketCol))
  }
}
