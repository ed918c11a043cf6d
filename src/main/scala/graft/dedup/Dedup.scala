package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Document deduplication for training-data pipelines — exact and near-dup.
  *
  * Scale notes (100 TB): exact dedup is a single hash aggregation over the
  * content hash (never the raw text — group keys stay 8 bytes). Near-dup
  * goes shingle→MinHash→band-bucket join, which is linear in corpus size +
  * candidate pairs; the quadratic all-pairs verify only ever runs inside a
  * bucket. No driver-side loops anywhere.
  */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.dedup")

  /** Cap LSH candidate generation: buckets with more than `maxBucket` rows
    * are dropped (whole-bucket, deterministic) and LOGGED, never silently
    * exploded — a single degenerate bucket (empty/boilerplate docs sharing a
    * band signature) would otherwise self-join quadratically and stall one
    * task at corpus scale. Near-dup pairs inside a dropped bucket usually
    * still surface via their other bands; exact duplicates belong to
    * [[exact]] anyway. Returns the rows of `banded` in surviving buckets. */
  private[graft] def capBuckets(banded: DataFrame, keys: Seq[String],
      maxBucket: Int, what: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // The over-cap bucket set is count-bounded (≤ |corpus|/maxBucket keys) —
    // collect it once into a LOCAL relation instead of caching a DataFrame
    // that would leak in long-lived sessions (one leaked cache entry per
    // minhashLsh/simhashPairs/nearDupPairs call otherwise).
    val over = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bn")).where(col("bn") > maxBucket)
      .select(keys.map(col) :+ col("bn"): _*)
    val overRows = over.collect()
    if (overRows.isEmpty) return banded
    val dropped = overRows.map(_.getLong(keys.size)).sum
    log.warn(s"$what: dropped ${overRows.length} LSH bucket(s) over " +
      s"$maxBucket rows ($dropped rows total) from candidate generation")
    val spark = banded.sparkSession
    val keySchema = org.apache.spark.sql.types.StructType(
      over.schema.fields.take(keys.size))
    val local = spark.createDataFrame(
      java.util.Arrays.asList(overRows.map(r =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq.take(keys.size))): _*),
      keySchema)
    banded.join(broadcast(local), keys, "left_anti")
  }

  /** A small corpus read from one or two files arrives as one or two input
    * splits, so every per-document heavy projection (k·|shingles| hashes per
    * row) runs on a single core regardless of cluster size. Spread it ONLY
    * when the scan under-splits relative to the session's parallelism —
    * guide §2.5's "input skew: repartition immediately after the read". At
    * scale the scan already yields ≥ parallelism splits and this is a no-op
    * (no extra shuffle of the text payload). Hash-partition on doc_id:
    * deterministic under task retry (guide §2.5 warns on rand-derived
    * keys), and skew-free for distinct ids. */
  private[graft] def spreadSmallInput(documents: DataFrame): DataFrame = {
    val parts = documents.sparkSession.sparkContext.defaultParallelism
    if (documents.rdd.getNumPartitions < parts)
      documents.repartition(parts, col("doc_id"))
    else documents
  }

  /** Exact dedup: keep the smallest doc_id per identical text. Grouping by
    * xxhash64(text) keeps shuffle keys fixed-width; hash collisions are
    * resolved by grouping on (hash, text) — same plan shape, exact result. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .withColumn("h", xxhash64(col("text")))
      .groupBy(col("h"), col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dupes"))
      .select("keep_id", "dupes")

  /** Character n-gram shingles of the lowercased text, distinct, hashed to
    * 64-bit. `(doc_id, shingle)` exploded rows. */
  def shingles(documents: DataFrame, n: Int = 5): DataFrame = {
    val t = lower(col("text"))
    val grams = transform(
      sequence(lit(0), greatest(length(t) - n, lit(0))),
      i => xxhash64(t.substr(i + 1, lit(n))))
    documents.select(col("doc_id"), explode(array_distinct(grams)).as("shingle"))
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.
    * Quadratic in the worst case — the exact verifier for tests / the final
    * within-bucket step of LSH. Pairs (a<b, jaccard). */
  def ngramJaccard(documents: DataFrame, n: Int = 5,
      threshold: Double = 0.0): DataFrame = {
    val sh = shingles(documents, n).persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = sh.select(col("doc_id").as("a"), col("shingle"))
    val b = sh.select(col("doc_id").as("b"), col("shingle"))
    val common = a.join(b, Seq("shingle")).where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    val out = common
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), Seq("a"))
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), Seq("b"))
      .select(col("a"), col("b"),
        (col("common").cast("double") /
          (col("sza") + col("szb") - col("common"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
    out
  }

  /** MinHash signature: k independent min-hashes of the shingle set, as the
    * standard xxhash64(seed_i, shingle) permutation approximation. Returns
    * (doc_id, sig: array<long>).
    *
    * Computed as ONE per-row fold over the document's shingle array — no
    * explode, no |docs|·|shingles|-row shuffle, no k-wide aggregation: the
    * r5 shape (explode → groupBy(doc_id) with 32 min-agg columns) shuffled
    * every (doc, shingle) pair and spent seconds compiling the 32-column
    * aggregate; this shape is a single narrow projection (guide §2.3/§2.4 —
    * the signature of a document never needed to leave its row). Seeds and
    * min-fold semantics are unchanged: element i of `sig` is
    * min over distinct shingles of xxhash64(i: int, shingle), with the same
    * shingle hashing as [[shingles]]. Every document emits a row (the
    * shingle array is never empty: sequence(0, max(len-n, 0)) has ≥ 1
    * element), exactly as the exploded form did. */
  def minhash(documents: DataFrame, n: Int = 5, k: Int = 32): DataFrame = {
    val d = spreadSmallInput(documents)
    val t = lower(col("text"))
    val grams = array_distinct(transform(
      sequence(lit(0), greatest(length(t) - n, lit(0))),
      i => xxhash64(t.substr(i + 1, lit(n)))))
    val seeds = typedLit((0 until k).toArray)
    val init = typedLit(Array.fill(k)(Long.MaxValue))
    d.select(col("doc_id"),
      aggregate(grams, init, (acc, g) =>
        zip_with(acc, seeds, (m, s) => least(m, xxhash64(s, g)))).as("sig"))
  }

  /** MinHash-LSH near-duplicate pairs: band the signature (bands×rows=k),
    * bucket-join on banded hash, verify candidates by signature similarity.
    * (a<b, simEstimate = fraction of matching minhashes). */
  def minhashLsh(documents: DataFrame, n: Int = 5, k: Int = 32,
      bands: Int = 8, threshold: Double = 0.7,
      maxBucket: Int = 10000): DataFrame = {
    require(k % bands == 0)
    val rows = k / bands
    val sig = minhash(documents, n, k).persist(StorageLevel.MEMORY_AND_DISK)
    // Band key = xxhash64 folded over the band's minhash slice NUMERICALLY
    // (a string render of the slice would materialize per-row garbage just
    // to feed the hash). Same bucketing semantics: equal slices ⇒ equal
    // keys; cross-band collisions are keyed apart by seeding with `bnd`.
    val banded0 = sig.select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          bnd => aggregate(slice(col("sig"), bnd * rows + 1, lit(rows)),
            xxhash64(bnd), (acc, x) => xxhash64(acc, x))))
          .as(Seq("band", "bucket")))
    val banded = capBuckets(banded0, Seq("band", "bucket"), maxBucket,
      "minhashLsh")
    val l = banded.select(col("doc_id").as("a"), col("sig").as("siga"),
      col("band"), col("bucket"))
    val r = banded.select(col("doc_id").as("b"), col("sig").as("sigb"),
      col("band"), col("bucket"))
    // Project the (scalar) similarity BEFORE deduping candidate pairs: a
    // dropDuplicates carrying the two array<long> signature columns plans as
    // a SortAggregate (first() over arrays is not hash-aggregable) — an
    // extra sort of every candidate row; deduping (a, b, sim) keeps the
    // whole pipeline in HashAggregates (guide §2.4). `sim` is deterministic
    // per pair, so dedup-then-score and score-then-dedup are identical.
    val cand = l.join(r, Seq("band", "bucket")).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        (size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y),
          eq => eq)).cast("double") / k).as("sim"))
      .dropDuplicates("a", "b")
    cand.where(col("sim") >= threshold)
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of token
    * hashes. Pure expression: for each bit, sum(±1 per token) > 0. */
  def simhashCol(text: Column): Column = {
    val tokens = filter(split(lower(text), "\\s+"), t => t =!= "")
    val hashes = transform(tokens, t => xxhash64(t))
    val bits = sequence(lit(0), lit(63))
    // shiftright/shiftleft with a Column shift amount need call_function
    // (the Scala helpers only take Int shifts).
    val bitvals = transform(bits, b =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc +
          when(call_function("shiftright", h, b).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L)) > 0, lit(1L)).otherwise(lit(0L)))
    aggregate(zip_with(bitvals, bits, (v, b) => call_function("shiftleft", v, b)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs: bucket on 4 × 16-bit sub-bands (any exact
    * sub-band match is a candidate — standard Hamming-LSH), then verify
    * Hamming distance ≤ maxHamming. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 10000): DataFrame = {
    // same under-split spread as minhash: the 64-bit-per-token majority
    // vote is the heavy per-row projection here (guide §2.5)
    val withSig = spreadSmallInput(documents)
      .select(col("doc_id"), simhashCol(col("text")).as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded0 = withSig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("band", "bucket")))
    val banded = capBuckets(banded0, Seq("band", "bucket"), maxBucket,
      "simhashPairs")
    val l = banded.select(col("doc_id").as("a"), col("sig").as("siga"),
      col("band"), col("bucket"))
    val r = banded.select(col("doc_id").as("b"), col("sig").as("sigb"),
      col("band"), col("bucket"))
    val hamming = size(filter(
      transform(sequence(lit(0), lit(63)),
        b => call_function("shiftright",
          col("siga").bitwiseXOR(col("sigb")), b).bitwiseAND(1)),
      x => x === 1))
    l.join(r, Seq("band", "bucket")).where(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .select(col("a"), col("b"), hamming.as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
