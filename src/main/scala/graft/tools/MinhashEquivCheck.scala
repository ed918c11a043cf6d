package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.GraftSession
import graft.dedup.Dedup

/** TEMPORARY r6 equivalence check: old (explode + 32 min-agg) minhash +
  * old (dedup-then-score) LSH vs the rewritten Dedup — byte-identical rows
  * required on both sf dirs. Kept in-tree as the committed equivalence
  * evidence cited by OPTIMIZATION_r06.md. */
object MinhashEquivCheck {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local(32)
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val n = 5; val k = 32; val bands = 8; val rows = k / bands
      // --- old minhash (r5 shape) ---
      val sh = Dedup.shingles(docs, n)
      val mins = (0 until k).map(i =>
        min(xxhash64(lit(i), col("shingle"))).as(s"m$i"))
      val oldSig = sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
        .select(col("doc_id"),
          array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val newSig = Dedup.minhash(docs, n, k)
      val sigDiff = oldSig.join(newSig.withColumnRenamed("sig", "sig2"), "doc_id")
        .where(not(col("sig") === col("sig2"))).count() +
        math.abs(oldSig.count() - newSig.count())
      // --- old LSH tail (dedup with sigs riding, then score) ---
      val banded0 = oldSig.select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          bnd => aggregate(slice(col("sig"), bnd * rows + 1, lit(rows)),
            xxhash64(bnd), (acc, x) => xxhash64(acc, x))))
          .as(Seq("band", "bucket")))
      val l = banded0.select(col("doc_id").as("a"), col("sig").as("siga"),
        col("band"), col("bucket"))
      val r = banded0.select(col("doc_id").as("b"), col("sig").as("sigb"),
        col("band"), col("bucket"))
      val oldCand = l.join(r, Seq("band", "bucket")).where(col("a") < col("b"))
        .dropDuplicates("a", "b")
      val oldLsh = oldCand.select(col("a"), col("b"),
          (size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y),
            eq => eq)).cast("double") / k).as("sim"))
        .where(col("sim") >= 0.5)
      val newLsh = Dedup.minhashLsh(docs, n, k, bands, threshold = 0.5)
      val lshDiff = oldLsh.union(newLsh).except(oldLsh.intersect(newLsh)).count() +
        math.abs(oldLsh.count() - newLsh.count())
      println(s"EQUIV $dir sigDiff=$sigDiff lshDiff=$lshDiff " +
        s"(sig rows ${newSig.count()}, lsh rows ${newLsh.count()})")
      oldSig.unpersist()
    }
    s.stop()
  }
}
