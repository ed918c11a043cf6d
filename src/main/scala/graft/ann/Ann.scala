package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *    set against the (huge) corpus, one scan, per-query top-k via window.
  *    The corpus is never shuffled; the only exchange is O(|queries|·k).
  *  - [[lshTopK]] — the scale path: seeded random-hyperplane signatures
  *    bucket the corpus once (linear scan, cacheable); queries probe only
  *    their bucket(s), then exact-rerank within candidates. Recall/cost is
  *    tuned by (nBits, nTables).
  *
  * Dot products use `aggregate(zip_with(...))` — pure codegen'd expressions,
  * no UDF.
  */
object Ann {

  /** Cosine similarity of two array<float|double> columns. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** Per-query top-k over a scored (qid, vec_id, <scoreCol>) frame WITHOUT
    * a per-qid window: a `row_number() over (partition by qid)` funnels
    * every scored corpus row of a query through ONE reduce partition — a
    * full-corpus single-key shuffle per query at scale. Instead the partial
    * selection runs TRULY map-side: a bounded per-qid ordered buffer inside
    * `mapPartitions` (no stage-1 exchange at all — r3's
    * `groupBy(qid, partition) → collect_list → slice` removed the funnel
    * but still carried each group's FULL row list through the partial-agg
    * exchange), so only ≤ k rows per (qid, input partition) ever leave a
    * task. The final merge then folds ≤ parts·k rows per query. Ordering:
    * score desc, vec_id asc on ties. Output: (qid, vec_id, <scoreCol>,
    * rank 1..k). */
  def topK(scored: DataFrame, k: Int, scoreCol: String = "cos"): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // worst-first natural order (score asc, vec_id desc) so head() is the
    // eviction candidate; "best" = highest score, ties to the smaller id
    val worstFirst: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long.reverse)
    val partial = scored
      .select(col("qid").cast("long"), col("vec_id").cast("long"),
        col(scoreCol).cast("double"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        val heaps = new scala.collection.mutable.HashMap[
          Long, java.util.TreeSet[(Double, Long)]]()
        it.foreach { case (qid, vid, s) =>
          val h = heaps.getOrElseUpdate(qid,
            new java.util.TreeSet[(Double, Long)](worstFirst))
          if (h.size < k) h.add((s, vid))
          else if (worstFirst.compare((s, vid), h.first()) > 0) {
            h.pollFirst(); h.add((s, vid))
          }
        }
        heaps.iterator.flatMap { case (qid, h) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          val hi = h.iterator()
          while (hi.hasNext) { val t = hi.next(); out += ((qid, t._2, t._1)) }
          out.iterator
        }
      }
      .toDF("qid", "vec_id", scoreCol)
    val item = struct(col(scoreCol), (-col("vec_id")).as("negid"), col("vec_id"))
    partial
      .groupBy("qid")
      .agg(slice(sort_array(collect_list(item), asc = false), 1, k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("qid"), col("t").getField("vec_id").as("vec_id"),
        col("t").getField(scoreCol).as(scoreCol),
        (col("i") + 1).cast("int").as("rank"))
  }

  /** Exact top-k cosine neighbors of each query.
    * @param corpus  (vec_id, embedding)
    * @param queries (qid, qvec) — small enough to broadcast
    * @return (qid, vec_id, cos, rank) rank 1..k, ties broken by vec_id asc */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(queries.select(col("qid"), col("qvec"))))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("embedding"), col("qvec")).as("cos"))
    topK(scored, k, "cos")
  }

  /** Seeded random hyperplane for bit i of table t: each component is a
    * single deterministic xxhash64-derived uniform weight in [-1,1) — NOT
    * gaussian. Uniform-cube hyperplanes bias bucket recall slightly vs true
    * Gaussian SimHash, which only shifts the recall/cost trade-off; results
    * stay exact because every candidate is exact-reranked. */
  private def hyperplaneSign(vec: Column, table: Int, bit: Int): Column = {
    // h(v) = Σ_j v[j] * g(table,bit,j)  where g is a seeded pseudo-random
    // weight in [-1,1): xxhash64(table,bit,j) scaled.
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (v, j) => v * (call_function("xxhash64", lit(table * 64 + bit), j)
          .cast("double") / lit(9.223372036854776e18))),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** nBits-bit signature for one LSH table. */
  def signature(vec: Column, table: Int, nBits: Int): Column =
    (0 until nBits).map(b =>
      hyperplaneSign(vec, table, b) * lit(1 << b)).reduce(_ + _)

  /** Bucket the corpus: one row per (table, bucket, vec). */
  def index(corpus: DataFrame, nBits: Int = 8, nTables: Int = 4): DataFrame =
    corpus.select(col("vec_id"), col("embedding"),
        explode(array((0 until nTables).map(t =>
          struct(lit(t).as("table"),
            signature(col("embedding"), t, nBits).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("embedding"),
        col("tb.table").as("table"), col("tb.bucket").as("bucket"))

  /** Approximate top-k: probe each query's bucket in every table, union
    * candidates, exact-rerank. Same output shape as [[bruteForceTopK]]. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 8, nTables: Int = 4): DataFrame = {
    val idx = index(corpus, nBits, nTables)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val qIdx = queries.select(col("qid"), col("qvec"),
        explode(array((0 until nTables).map(t =>
          struct(lit(t).as("table"),
            signature(col("qvec"), t, nBits).as("bucket"))): _*)).as("tb"))
      .select(col("qid"), col("qvec"),
        col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    val cands = idx.join(broadcast(qIdx), Seq("table", "bucket"))
      .where(col("vec_id") =!= col("qid"))
      .dropDuplicates("qid", "vec_id")
    val scored = cands.select(col("qid"), col("vec_id"),
      cosine(col("embedding"), col("qvec")).as("cos"))
    topK(scored, k, "cos")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, LSH-bucketed
    * (exact within-bucket verify): the embedding analog of MinHash dedup.
    * Buckets over `maxBucket` rows are dropped+logged (whole-bucket,
    * deterministic) — see [[graft.dedup.Dedup.capBuckets]]. */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
      nBits: Int = 8, nTables: Int = 4, maxBucket: Int = 10000): DataFrame = {
    val idx = graft.dedup.Dedup.capBuckets(
      index(corpus, nBits, nTables).persist(StorageLevel.MEMORY_AND_DISK),
      Seq("table", "bucket"), maxBucket, "nearDupPairs")
    val l = idx.select(col("table"), col("bucket"),
      col("vec_id").as("a"), col("embedding").as("va"))
    val r = idx.select(col("table"), col("bucket"),
      col("vec_id").as("b"), col("embedding").as("vb"))
    l.join(r, Seq("table", "bucket")).where(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
