package graft

import org.apache.spark.sql.functions._

import graft.llm.Multimodal

/** Multimodal binary-column plumbing: metadata extraction, batched
  * decode/feature pass (stub decoder), frame sampling.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "PNG-ish payload"))
    .toDF("doc_id", "text")

  test("binary metadata: byte length, sha, magic tag") {
    val out = Multimodal.withBinaryMetadata(docs, "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("byte_len") == 11)
    assert(out(0).getAs[String]("content_sha") ==
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
    assert(out(0).getAs[String]("format_tag") == "6865") // "he"
  }

  test("decodeFeatures: stable schema, deterministic stub features") {
    val out = Multimodal.decodeFeatures(
      Multimodal.withBinaryMetadata(docs, "text"), "doc_id")
    assert(out.schema.fieldNames.toSeq == Seq("id", "byte_len", "features"))
    val rows = out.orderBy("id").collect()
    assert(rows.length == 2)
    val f1 = rows(0).getSeq[Float](2)
    assert(f1.length == Multimodal.FeatureDim)
    // deterministic: second run yields identical features
    val again = Multimodal.decodeFeatures(
      Multimodal.withBinaryMetadata(docs, "text"), "doc_id")
      .orderBy("id").collect()(0).getSeq[Float](2)
    assert(f1 == again)
  }

  test("sampleFrames emits every nth frame index") {
    val assets = Seq((1L, 10), (2L, 1)).toDF("asset_id", "frames")
    val out = Multimodal.sampleFrames(assets, "asset_id", "frames", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(out == Set((1L, 0), (1L, 4), (1L, 8), (2L, 0)))
  }
}
