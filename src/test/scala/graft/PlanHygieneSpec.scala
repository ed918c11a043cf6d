package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Plan-shape assertions — the "would this survive a 100× scale-up" checks:
  * filters and projections must reach the parquet scan, scalar text ops must
  * stay inside whole-stage codegen, and small frontier-style semi-joins must
  * plan as broadcast joins (no shuffle of the big side). */
class PlanHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docsPath = "/root/testdata/sf0.001/documents.parquet"

  test("filter + projection push down to the parquet scan") {
    val plan = spark.read.parquet(docsPath)
      .where($"lang" === "en").select($"doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"columns not pruned:\n$plan")
  }

  test("text analysis has no UDF barrier (native expressions only)") {
    // Note: langId uses higher-order functions (filter over split), which
    // are CodegenFallback in Spark — the projection itself interprets, but
    // the scan stays codegen'd/columnar and no UDF serialization happens.
    val plan = TextOps.analyze(spark.read.parquet(docsPath))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) ColumnarToRow") || plan.contains("WholeStageCodegen"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    // our custom Catalyst expression is planned natively
    assert(plan.contains("rollinghashmin"), plan)
  }

  test("small-side semi-join plans as broadcast (frontier pattern, big side not shuffled)") {
    val big = spark.range(100000).select($"id".as("src"), ($"id" + 1).as("dst"))
    val frontier = spark.range(10).select($"id".as("dst"))
    val plan = big.join(broadcast(frontier), Seq("dst"), "left_semi")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // only the broadcast exchange, no shuffle exchange of the big side
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("PR contribution aggregation plans map-side partial aggregation") {
    val edges = spark.range(1000).select(
      pmod($"id", lit(100)).as("src"), pmod($"id" * 7, lit(100)).as("dst"))
    val degs = edges.groupBy("src").count()
    val plan = edges.join(degs, "src")
      .groupBy("dst").agg(sum(lit(1.0) / $"count"))
      .queryExecution.executedPlan.toString
    // partial_sum before the exchange = map-side combine (absorbs hub skew)
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"), plan)
  }
}
