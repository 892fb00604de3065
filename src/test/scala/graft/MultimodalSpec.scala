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

  /** Minimal RIFF/WAVE writer: 16-bit PCM, interleaved samples. */
  private def wavBytes(samples: Array[Short], rate: Int,
                       channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1); buf.putShort(channels.toShort)
    buf.putInt(rate); buf.putInt(rate * channels * 2)
    buf.putShort((channels * 2).toShort); buf.putShort(16)
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  test("decodeAudioFeatures: real WAV/PCM decode, RMS of a known sine") {
    val rate = 8000
    val amp = 0.5
    val mono = Array.tabulate(rate)(i =>
      (amp * 32767 * math.sin(2 * math.Pi * 440 * i / rate)).toShort)
    // stereo: same signal in both channels → identical features
    val stereo = mono.flatMap(s => Array(s, s))
    val rows = Seq(
      (1L, wavBytes(mono, rate)),
      (2L, wavBytes(stereo, rate, channels = 2)),
      (3L, "not a wav at all, just bytes".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val out = Multimodal.decodeAudioFeatures(rows, "doc_id")
      .orderBy("id").collect()

    val expectedRms = amp / math.sqrt(2)
    for (r <- out.take(2)) {
      assert(r.getInt(1) == rate)
      assert(r.getLong(2) == rate.toLong)
      val rms = r.getSeq[Float](3)
      assert(rms.length == Multimodal.FeatureDim)
      rms.foreach(v => assert(math.abs(v - expectedRms) < 0.02,
        s"window RMS $v vs $expectedRms"))
    }
    // corrupt payload is DATA: null fields, no exception
    assert(out(2).isNullAt(1) && out(2).isNullAt(3))
  }
}
