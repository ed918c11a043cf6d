package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  lazy val media = Multimodal.mediaFromDocuments(docs).cache()

  test("media table schema: opaque binary + typed metadata") {
    assert(media.schema("bytes").dataType.typeName === "binary")
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("image features: one row per image, fixed feature dim, deterministic") {
    val f1 = Multimodal.imageFeatures(spark, media, featureDim = 8).collect()
    val nImages = media.where($"kind" === "image").count()
    assert(f1.length.toLong === nImages)
    assert(f1.forall(_.features.length === 8))
    val f2 = Multimodal.imageFeatures(spark, media, featureDim = 8).collect()
    assert(f1.map(_.doc_id).sorted === f2.map(_.doc_id).sorted)
    val m1 = f1.map(r => r.doc_id -> r.meanLuma).toMap
    val m2 = f2.map(r => r.doc_id -> r.meanLuma).toMap
    assert(m1 === m2)
  }

  test("resize changes the feature dimension, keeps rows") {
    val r = Multimodal.resizeImages(spark, media, newDim = 4).collect()
    assert(r.forall(_.features.length === 4))
  }

  test("audio features carry sample rate and rms in [0,1]") {
    val a = Multimodal.audioFeatures(spark, media).collect()
    assert(a.nonEmpty)
    assert(a.forall(x => x.rms >= 0.0 && x.rms <= 1.0))
    assert(a.forall(_.sampleRateHz === 16000))
  }

  test("frame sampling: durationMs-driven frame counts, capped") {
    val frames = Multimodal.sampleFrames(spark, media, everyMs = 5000,
      maxFrames = 4).toDF()
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .join(media.where($"kind" === "video").select("doc_id", "durationMs"), "doc_id")
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val expect = math.min(math.max(r.getAs[Int]("durationMs") / 5000, 1), 4)
      assert(r.getAs[Long]("n") === expect.toLong)
    }
  }

  test("batched map preserves partitioning (no shuffle in the plan)") {
    val plan = Multimodal.imageFeatures(spark, media, featureDim = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
