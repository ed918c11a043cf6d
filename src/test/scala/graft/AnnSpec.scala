package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Ann

class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding".cast("array<double>").as("embedding")).cache()

  def queries(n: Int) = emb.limit(n)
    .select($"vec_id".as("qid"), $"embedding".as("qvec"))

  test("cosine of a vector with itself is 1") {
    val c = emb.limit(5)
      .select(Ann.cosine($"embedding", $"embedding").as("c"))
      .collect().map(_.getDouble(0))
    assert(c.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("brute-force top-k matches a driver-side oracle") {
    val k = 5
    val got = Ann.bruteForceTopK(emb, queries(3), k)
      .select("qid", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val all = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map(p => p._1 * p._2).sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    for (q <- all.keys.toSeq.sorted.take(3)) {
      val want = all.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(all(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
      val gotQ = (1 to k).map(r => got((q, r)))
      assert(gotQ === want, s"query $q")
    }
  }

  test("LSH top-k achieves decent recall vs brute force and only returns real neighbors") {
    // The sf0.001 embeddings are near-random (true top-10 cosine ≈ 0.25-0.4),
    // so hyperplane-LSH needs few bits / many tables at this toy scale:
    // P(hit) ≈ 1-(1-(1-θ/π)^3)^8 ≈ 0.85 at cos 0.3. At corpus scale the
    // (nBits, nTables) trade-off moves the other way.
    val k = 10
    val q = queries(5)
    val bf = Ann.bruteForceTopK(emb, q, k).select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(emb, q, k, nBits = 3, nTables = 8)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall >= 0.6, s"recall=$recall")
    assert(lsh.subsetOf(lsh ++ bf)) // only real (qid, vec_id) pairs, ranked
  }

  test("near-dup pairs are symmetric-free (a<b) and above threshold") {
    val pairs = Ann.nearDupPairs(emb.limit(200), threshold = 0.8,
      nBits = 4, nTables = 4).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.8)
    }
  }

  test("LSH signatures are deterministic across evaluations") {
    val s1 = Ann.index(emb.limit(50), nBits = 6, nTables = 2)
      .select("vec_id", "table", "bucket").collect().toSet
    val s2 = Ann.index(emb.limit(50), nBits = 6, nTables = 2)
      .select("vec_id", "table", "bucket").collect().toSet
    assert(s1 === s2)
  }
}
