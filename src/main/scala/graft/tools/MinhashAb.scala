package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import graft.GraftSession
import graft.dedup.Dedup

/** TEMPORARY r6 A/B: old vs new minhash signature build + LSH tail, same
  * session, alternating, noop-style count sink. Kept in-tree as committed
  * measurement evidence cited by OPTIMIZATION_r06.md. */
object MinhashAb {
  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val s = GraftSession.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val n = 5; val k = 32
    def oldSig: DataFrame = {
      val sh = Dedup.shingles(docs.repartition(32, col("doc_id")), n)
      val mins = (0 until k).map(i =>
        min(xxhash64(lit(i), col("shingle"))).as(s"m$i"))
      sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
        .select(col("doc_id"),
          array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
    }
    def newSig: DataFrame = Dedup.minhash(docs, n, k)
    // warmup both shapes once
    oldSig.write.format("noop").mode("overwrite").save()
    newSig.write.format("noop").mode("overwrite").save()
    for (i <- 0 until 3) {
      val (_, tOld) = time(oldSig.write.format("noop").mode("overwrite").save())
      val (_, tNew) = time(newSig.write.format("noop").mode("overwrite").save())
      println(f"[ab] sig round $i old $tOld%.3f new $tNew%.3f")
    }
    def lsh: DataFrame = Dedup.minhashLsh(docs, n, k, 8, 0.5)
    lsh.write.format("noop").mode("overwrite").save()
    for (i <- 0 until 3) {
      val (_, tL) = time(lsh.write.format("noop").mode("overwrite").save())
      println(f"[ab] full lsh round $i new $tL%.3f")
    }
    s.stop()
  }
}
