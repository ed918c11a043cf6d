package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Local mode is a stand-in for a multi-executor cluster: shuffle partitions
  * scale with cores (never the 200 default), AQE stays on (runtime coalesce +
  * skew-join splitting — the Spark analog of the reference's
  * `schedule(dynamic,2048)` load balancing, /root/reference/inc/pagerank.hxx:202).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft-linkgraph")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // rank vectors are checkpointed per superstep for lineage truncation
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")

  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
