package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.graph.EdgeOps
import graft.ingest.WebGraphFixture
import graft.pagerank.{CsrDynamic, CsrPageRank}

/** Temporary measurement harness for the DYNAMIC superstep's fixed cost:
  * runs one DFP deletion batch with a per-callsite stage listener and
  * prints where each superstep's wall goes (message-shuffle map stage vs
  * sweep stage vs scheduling gap). Toggles:
  *   PROBE_PAGES (200000), PROBE_CORES (32), PROBE_KRYO=1 (spark.serializer
  *   = KryoSerializer for the RDD shuffle path).
  * sbt "runMain graft.tools.DynProbe" */
object DynProbe {
  def main(args: Array[String]): Unit = {
    val pages = sys.env.getOrElse("PROBE_PAGES", "200000").toLong
    val cores = sys.env.getOrElse("PROBE_CORES", "32").toInt
    val kryo = sys.env.get("PROBE_KRYO").contains("1")
    val b = GraftSession.builder(s"local[$cores]", cores)
    if (kryo) {
      b.config("spark.serializer",
        "org.apache.spark.serializer.KryoSerializer")
      b.config("spark.kryo.registrationRequired", "false")
    }
    // extra confs: PROBE_CONF="spark.shuffle.compress=false,spark.x=y"
    sys.env.get("PROBE_CONF").foreach(_.split(",").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k, v)
      })
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    val staged = WebGraphFixture.edgesOnly(s, pages).toDF()
    val verts = s.range(pages).select(col("id"))
    val x = EdgeOps.withSelfLoops(staged.select("src", "dst"), verts).cache()
    x.count()
    val dyn = new CsrDynamic(s)
    val g0 = new CsrPageRank(s).build(x)
    val (_, st0) = dyn.staticWithState(g0)
    val del = x.where(col("src") =!= col("dst"))
      .where(pmod(xxhash64(col("src"), col("dst")), lit(10000L)) === 0L)
      .cache()
    println(s"[dynprobe] pages=$pages cores=$cores kryo=$kryo delEdges=${del.count()}")
    val none = del.limit(0)

    val stagesByName =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for (sub <- si.submissionTime; com <- si.completionTime)
          yield com - sub).getOrElse(0L)
        val bucket =
          stagesByName.computeIfAbsent(si.name, _ => new Array[Long](4))
        bucket.synchronized {
          bucket(0) += 1
          bucket(1) += wall
          bucket(2) += si.taskMetrics.executorRunTime
          bucket(3) += si.taskMetrics.shuffleWriteMetrics.writeTime / 1000000L
        }
      }
    }
    // paired in-JVM A/B: the SAME batch against the SAME base state, run
    // alternately with the adaptive push and the dense-only push — box
    // noise (this sandbox's wall times swing ±2× run-to-run) hits both
    // sides of each pair; report per-variant medians.
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
    val dynAdaptive = dyn
    val dynDense = new CsrDynamic(s, adaptivePush = false)
    def oneRun(d: CsrDynamic): (Double, Double, Int) = {
      val ss0 = CsrDynamic.superstepRuns.get()
      val kn0 = CsrDynamic.kernelCritNanos.get()
      val (gN, run, stN) = d.applyBatch(g0, st0, none, del, prune = true)
      val kern = (CsrDynamic.kernelCritNanos.get() - kn0) / 1e9
      gN.blocks.unpersist(false)
      stN.unpersist(false)
      (run.stats.computeTimeMs / 1e3, kern,
        (CsrDynamic.superstepRuns.get() - ss0).toInt)
    }
    oneRun(dynAdaptive) // warmup (JIT both kernels)
    oneRun(dynDense)
    val aLoops = collection.mutable.ArrayBuffer[Double]()
    val aKerns = collection.mutable.ArrayBuffer[Double]()
    val dLoops = collection.mutable.ArrayBuffer[Double]()
    val dKerns = collection.mutable.ArrayBuffer[Double]()
    s.sparkContext.addSparkListener(listener)
    for (r <- 0 until reps) {
      val first = r % 2 == 0
      val (l1, k1, n1) = oneRun(if (first) dynAdaptive else dynDense)
      val (l2, k2, n2) = oneRun(if (first) dynDense else dynAdaptive)
      val (al, ak, dl, dk) =
        if (first) (l1, k1, l2, k2) else (l2, k2, l1, k1)
      println(f"[dynprobe] pair$r adaptive=$al%.2fs/$ak%.3fs " +
        f"dense=$dl%.2fs/$dk%.3fs steps=$n1/$n2")
      aLoops += al; aKerns += ak; dLoops += dl; dKerns += dk
    }
    Thread.sleep(2000)
    s.sparkContext.removeSparkListener(listener)
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    println(f"[dynprobe] MEDIANS adaptiveLoop=${med(aLoops.toSeq)}%.2fs " +
      f"denseLoop=${med(dLoops.toSeq)}%.2fs " +
      f"adaptiveKern=${med(aKerns.toSeq)}%.3fs denseKern=${med(dKerns.toSeq)}%.3fs")
    import scala.jdk.CollectionConverters._
    stagesByName.asScala.toSeq.sortBy { case (_, v) => -v(1) }.take(6)
      .foreach { case (name, v) =>
        println(f"[dynprobe]   $name%-45s n=${v(0)}%3d wall=${v(1)}%6dms " +
          f"execRun=${v(2)}%7dms shufWrite=${v(3)}%5dms")
      }
    s.stop()
  }
}
