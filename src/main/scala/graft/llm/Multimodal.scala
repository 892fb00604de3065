package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract plumbing.
  *
  * The decode step itself is STUBBED (no image/audio libraries in this
  * environment) with a deterministic fake — but the Spark-side contract
  * is real: schema, batched per-partition execution (the Scala analog of
  * `mapInPandas`: one iterator pass per partition, no per-row task
  * overhead, no driver collect), and partition sizing controls.
  */
object Multimodal {

  /** Attach a binary payload column + extracted metadata. In production
    * the payload arrives from parquet/binaryFile sources; here text bytes
    * stand in. Metadata extraction is expression-only (codegen'd).
    */
  def withBinaryMetadata(df: DataFrame, payloadCol: String): DataFrame = {
    val blob = encode(col(payloadCol), "UTF-8")
    df.withColumn("payload", blob)
      .withColumn("byte_len", length(blob).cast("long"))
      .withColumn("content_sha", sha2(blob, 256))
      // magic-byte sniffing pattern (real formats: 89504E47=PNG etc.)
      .withColumn("format_tag", hex(substring(blob, 1, 2)))
  }

  val FeatureDim = 16

  /** Batched "decode + feature extract" over binary payloads — the
    * mapInPandas-shaped pass. The real decoder is a stub: a deterministic
    * hash-seeded pseudo-feature vector, so tests exercise the plumbing
    * (schema, batching, partitioning) with stable outputs.
    */
  def decodeFeatures(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("byte_len", LongType),
      StructField("features", ArrayType(FloatType))))
    val in = df.select(col(idCol).cast("long").as("id"), col("payload"))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    in.mapPartitions { rows =>
      // One pass per partition; in production this is where a native
      // decoder batch-processes the payloads.
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        Row(id, payload.length.toLong, fakeDecode(payload))
      }
    }(encoder)
  }

  /** STUB decoder: deterministic pseudo-features from payload bytes.
    * Replace with a real image/audio decode in production.
    */
  private def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < FeatureDim) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      out(j) = ((h & 0xffff).toFloat / 0xffff.toFloat) - 0.5f
      j += 1
    }
    out
  }

  /** Frame-sampling plumbing: given per-asset frame counts, emit
    * (asset, frame_idx) rows for every nth frame — the fan-out shape a
    * video pipeline needs before per-frame decode. Pure expressions.
    */
  def sampleFrames(df: DataFrame, idCol: String, frameCountCol: String,
                   everyNth: Int): DataFrame =
    df.select(col(idCol),
        explode(sequence(lit(0), greatest(col(frameCountCol) - 1, lit(0)),
          lit(everyNth))).as("frame_idx"))
}
