package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Experiment-log → CSV post-processor — the analog of the reference's
  * `process.js` (/root/reference/process.js:45-104), which regex-parses the
  * harness log into per-(graph, technique) CSV rows. Here the "log" is
  * already structured ([[SnapMain]]'s one-JSON-line-per-batch output), so
  * this is a DataFrame flatten: one CSV row per (batch, technique) with
  * wall seconds, iterations and L1 error vs the per-batch oracle.
  *
  *   MetricsCsv <snapmain-output.jsonl> <out-dir>
  */
object MetricsCsv {

  val Techniques: Seq[String] = Seq("static", "naiveDynamic",
    "dynamicTraversal", "dynamicFrontier", "dynamicFrontierPrune")

  /** Flatten the per-batch JSON lines to (batch, edges, technique, secs,
    * iters, l1_err) rows. */
  def flatten(spark: SparkSession, jsonlPath: String): DataFrame = {
    val df = spark.read.json(jsonlPath)
    Techniques
      .filter(df.columns.contains)
      .map(t => df.select(col("batch"), col("edges"),
        lit(t).as("technique"),
        col(s"`$t`.secs").as("secs"),
        col(s"`$t`.iters").as("iters"),
        col(s"`$t`.l1_err").as("l1_err")))
      .reduce(_ unionByName _)
      .orderBy("batch", "technique")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: MetricsCsv <in.jsonl> <out-dir>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.GraftSession.local(cpus)
    flatten(spark, args(0))
      .coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(args(1))
    spark.stop()
  }
}
