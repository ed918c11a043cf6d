package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed catalog table for the pages corpus, partitioned by an
  * Iceberg-style `bucket(url)` transform — SURVEY.md §7.1 step 2's
  * "partitioned table with a format seam".
  *
  * The physical format is a SEAM, not a hard dependency: no Iceberg runtime
  * jar ships in /opt/spark/jars (zero-egress sandbox), so the default writer
  * emits plain parquet partitioned by an explicit
  * `url_bucket = pmod(xxhash64(url), buckets)` column — the same layout an
  * Iceberg `PARTITIONED BY (bucket(N, url))` spec produces (hash-bucketed,
  * pruning-friendly point lookups). Setting env `GRAFT_TABLE_FORMAT=iceberg`
  * (with the runtime jar on the classpath) routes the identical DataFrame
  * through `format("iceberg")` unchanged; readers are format-agnostic.
  *
  * Scale shape: the bucket count bounds file-listing fan-out and gives
  * url-point-lookup partition pruning; within a bucket, parquet row-group
  * statistics prune further. A 100 TB corpus would use O(10⁴-10⁵) buckets;
  * the column is derived, never stored logic — `read` hides it.
  */
object PagesTable {

  val BucketCol = "url_bucket"

  /** Physical format seam (env GRAFT_TABLE_FORMAT, default parquet). */
  def format: String = sys.env.getOrElse("GRAFT_TABLE_FORMAT", "parquet")

  def bucketOf(urlCol: org.apache.spark.sql.Column, buckets: Int)
      : org.apache.spark.sql.Column =
    pmod(xxhash64(urlCol), lit(buckets.toLong))

  /** Write the pages table (input_hint schema: url, warc_ts, html, text,
    * lang) hash-bucketed by url. */
  def write(pages: DataFrame, path: String, buckets: Int = 16): Unit =
    pages
      .withColumn(BucketCol, bucketOf(col("url"), buckets))
      .write.format(format).mode("overwrite")
      .partitionBy(BucketCol)
      .save(path)

  /** Read the pages table back in the input_hint column order (the derived
    * bucket column stays available to the planner for partition pruning
    * upstream of this projection, but is not part of the logical schema). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(format).load(path)
      .select("url", "warc_ts", "html", "text", "lang")

  /** Point-lookup of one url with explicit bucket pruning: only the url's
    * bucket directory is scanned. */
  def lookup(spark: SparkSession, path: String, url: String,
      buckets: Int = 16): DataFrame =
    spark.read.format(format).load(path)
      .where(col(BucketCol) === bucketOf(lit(url), buckets) &&
        col("url") === url)
      .select("url", "warc_ts", "html", "text", "lang")
}
