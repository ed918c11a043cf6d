package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level contract checks for the driver harness: every query runs,
  * returns rows, and every oracleSql key exists in queries. Exact-match
  * verification against DuckDB happens in the driver (Verify + CORRECTNESS);
  * the algorithmic content is verified by the per-operator specs. */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("every query has exactly one of: a DuckDB oracle, or a justification") {
    val sql = SparkEntry.oracleSql.keySet
    val just = SparkEntry.oracleJustification.keySet
    val both = sql & just
    assert(both.isEmpty, s"queries with oracle AND justification: $both")
    val uncovered = SparkEntry.queries.keySet -- sql -- just
    assert(uncovered.isEmpty,
      s"queries with neither oracle nor no-oracle justification: $uncovered")
    val stale = just -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"justifications without queries: $stale")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
       if !name.startsWith("q_pagerank_web")) {
    test(s"query $name runs on sf0.001 and returns rows") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q_pagerank_web_static runs and sums to ~1") {
    val df = SparkEntry.queries("q_pagerank_web_static")(spark, sfDir)
    val s = df.agg(org.apache.spark.sql.functions.sum("rank"))
      .collect()(0).getDouble(0)
    assert(math.abs(s - 1.0) < 1e-4)
  }
}
