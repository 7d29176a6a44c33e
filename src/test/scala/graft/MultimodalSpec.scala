package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("mm_features: schema, byte counts, and unit-norm features") {
    val res = Multimodal.mmFeatures(spark, sf)
    assert(res.columns.toSeq ===
      Seq("doc_id", "width", "height", "n_bytes", "feature_fp", "feature_norm",
        "resized_fp", "n_frames"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("len"))
    val joined = res.join(docs, "doc_id")
      .filter(col("n_bytes") =!= col("len"))
    assert(joined.count() === 0) // ascii text: 1 byte per char
    res.collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("feature_norm") - 1.0) < 1e-9)
      assert(r.getAs[String]("feature_fp").split(",").length === 16)
      assert(r.getAs[String]("resized_fp").split(",").length === 8)
      val expectFrames = ((r.getAs[Int]("n_bytes") + 255) / 256 + 3) / 4
      assert(r.getAs[Int]("n_frames") === expectFrames)
    }
  }

  test("decode stub is deterministic") {
    val b = "hello world".getBytes("UTF-8")
    assert(Multimodal.decodeStub(b).toSeq === Multimodal.decodeStub(b).toSeq)
  }
}
